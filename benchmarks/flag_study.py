"""XLA compiler-option A/B study on the plain-128 fine-tune train step.

The round-4 ceiling study (BASELINE.md) puts the remaining headroom
inside the matmul-bearing fusion slice (76% internal efficiency) — the
territory XLA's scheduler/fusion heuristics own. The round-3 verdict
named an XLA flag study as one of the levers; this runs it honestly.

Mechanism note (first attempt refuted): ``XLA_FLAGS`` is parsed by the
LOCAL XLA client, which over the axon tunnel is a CPU-only build — every
``--xla_tpu_*`` flag dies with "Unknown flag" before reaching the TPU.
The channel that DOES reach the remote compiler is per-compile
``compiler_options`` (PJRT env_option_overrides, validated server-side:
a bogus name errors the compile RPC). So each variant here is
``step.lower(...).compile(compiler_options=...)`` in ONE process —
which also removes the cross-process drift that forced the old
subprocess design to bracket every variant with baseline re-runs.

Timing protocol: variants are still interleaved with baseline re-TIMES
(same compiled executable, re-measured) because the shared tunnel host
drifts; judge each variant against its bracketing baselines.

Usage:  python benchmarks/flag_study.py [--batch 128] [--iters 24]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = [
    ("latency_hiding_scheduler",
     {"xla_tpu_enable_latency_hiding_scheduler": "True"}),
    ("scoped_vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("scoped_vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("aggressive_opt_barrier",
     {"xla_tpu_aggressive_opt_barrier_removal": "True"}),
    ("dot_dot_fusion_dup", {"xla_tpu_dot_dot_fusion_duplicated": "True"}),
    ("rwb_fusion_off", {"xla_tpu_rwb_fusion": "False"}),
    ("async_all_combiners",
     {"xla_tpu_enable_async_collective_fusion": "True"}),
    ("vector_load_fusion_off",
     {"xla_tpu_vector_load_fusion_limit": "0"}),
]


def time_compiled(compiled, state, dev_batch, key, iters, reps):
    """min-of-reps mean step time. The step donates its state argument, so
    thread the returned state; the caller gets it back for the next run."""
    best = float("inf")
    for _ in range(reps):
        state, m = compiled(state, dev_batch, key)
        float(m["loss"])  # sync
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = compiled(state, dev_batch, key)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import bench
    jax = bench._setup_jax()
    from benchmarks.step_itemize import build_step

    step, state, dev_batch, _ = build_step(jax, args.batch)
    key = jax.random.PRNGKey(0)
    lowered = step.lower(state, dev_batch, key)

    base_exec = lowered.compile()
    state = jax.device_put(state)  # fresh, un-donated copy for the loop
    results = []
    b_ms, state = time_compiled(base_exec, state, dev_batch, key,
                                args.iters, args.reps)
    print(f"{'baseline':<28} {b_ms:6.2f} ms", flush=True)
    for name, opts in VARIANTS:
        try:
            var_exec = lowered.compile(compiler_options=opts)
        except Exception as e:
            print(f"{name:<28} COMPILE FAILED: {str(e)[:120]}", flush=True)
            results.append((name, None, None))
            continue
        v_ms, state = time_compiled(var_exec, state, dev_batch, key,
                                    args.iters, args.reps)
        # re-time the baseline executable right after (drift bracket)
        b2_ms, state = time_compiled(base_exec, state, dev_batch, key,
                                     args.iters, args.reps)
        bracket = (b_ms + b2_ms) / 2
        print(f"{name:<28} {v_ms:6.2f} ms vs bracketing baseline "
              f"{bracket:6.2f} ms  ({(v_ms / bracket - 1) * 100:+.1f}%)",
              flush=True)
        results.append((name, v_ms, bracket))
        b_ms = b2_ms
    best = [(n, v, b) for n, v, b in results if v is not None]
    if best:
        n, v, b = min(best, key=lambda r: r[1] / r[2])
        print(json.dumps({"best_variant": n, "variant_ms": v,
                          "bracket_baseline_ms": b,
                          "delta_pct": (v / b - 1) * 100}))


if __name__ == "__main__":
    main()
