"""GenerationEngine under open-loop Poisson load, on the chip.

Usage: python benchmarks/serving_bench.py [offered_rate ...]
Default reproduces the round-4 ladder (BASELINE.md): 100 200 400 550 700.
Text-only payloads — per-request ROI-feature uploads measure the axon
relay (~60 MB/s), not the engine; see BASELINE.md round-4 serving notes
for the feature-payload levers (bf16 features, wider window).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    args = [a for a in sys.argv[1:]]
    engines = ["static"]
    if "--continuous" in args:
        args.remove("--continuous")
        engines = ["continuous"]
    if "--ab" in args:
        args.remove("--ab")
        engines = ["static", "continuous"]
    rates = [float(a) for a in args] or [100, 200, 400, 550, 700]
    for engine in engines:
        print(f"== {engine} ==")
        print(f"{'offered/s':>10} {'sustained/s':>12} "
              f"{'p50_ms':>8} {'p99_ms':>8}")
        for r in rates:
            res = bench.bench_serving(target_rate=r, engine=engine)
            print(f"{res['offered']:>10} {res['sustained']:>12} "
                  f"{res['p50_ms']:>8} {res['p99_ms']:>8}", flush=True)


if __name__ == "__main__":
    main()
