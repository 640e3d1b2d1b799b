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
    rates = [float(a) for a in sys.argv[1:]] or [100, 200, 400, 550, 700]
    print(f"{'offered/s':>10} {'sustained/s':>12} {'p50_ms':>8} {'p99_ms':>8}")
    for r in rates:
        res = bench.bench_serving(target_rate=r)
        print(f"{res['offered']:>10} {res['sustained']:>12} "
              f"{res['p50_ms']:>8} {res['p99_ms']:>8}", flush=True)


if __name__ == "__main__":
    main()
