"""XLA flag A/B study on the plain-128 fine-tune train step.

The round-4 ceiling study (BASELINE.md) puts the remaining headroom
inside the matmul-bearing fusion slice (76% internal efficiency) — the
territory XLA's scheduler/fusion heuristics own. The round-3 verdict
named an XLA flag study as one of the levers; this runs it honestly:

- XLA_FLAGS is read once per process, so every variant runs in a fresh
  subprocess (same interpreter, same script, --worker mode).
- Cross-process absolute numbers drift up to 20% on the shared tunnel
  host (BASELINE.md round-4 measurement note), so variants are
  INTERLEAVED with baseline re-runs and judged against the bracketing
  baselines, not a single anchor.
- The persistent compile cache keys on the flag set, so repeated
  baseline runs recompile nothing.

Usage:   python benchmarks/flag_study.py            # full study
         python benchmarks/flag_study.py --worker   # internal
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    ("baseline", ""),
    ("latency_hiding_scheduler",
     "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("scoped_vmem_32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("scoped_vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("fusion_cost_model",
     "--xla_tpu_enable_experimental_fusion_cost_model=true"),
    ("dot_dot_fusion_dup", "--xla_tpu_dot_dot_fusion_duplicated=true"),
    ("rwb_fusion_off", "--xla_tpu_rwb_fusion=false"),
]


def worker(batch=128, iters=24, reps=2):
    import numpy as np
    import bench
    jax = bench._setup_jax()
    from benchmarks.step_itemize import build_step
    step, state, dev_batch, _ = build_step(jax, batch)
    key = jax.random.PRNGKey(0)
    state, m = step(state, dev_batch, key)
    float(m["loss"])  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, dev_batch, key)
        float(m["loss"])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(json.dumps({"step_ms": best * 1e3, "loss": float(m["loss"])}))


def run_variant(name, flags):
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    if flags:
        env["XLA_FLAGS"] = (base + " " + flags).strip()
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            env=env, capture_output=True, text=True, timeout=900)
    except subprocess.TimeoutExpired:
        return None, "timeout"
    for line in reversed(out.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)["step_ms"], None
    err = (out.stderr.splitlines() or ["no output"])[-1][:160]
    return None, err


def main():
    if "--worker" in sys.argv:
        worker()
        return
    results = []
    for name, flags in VARIANTS[1:]:
        # bracket every variant with a baseline run (drift cancellation)
        b_ms, _ = run_variant("baseline", "")
        v_ms, err = run_variant(name, flags)
        results.append((name, b_ms, v_ms, err))
        if v_ms is None:
            print(f"{name:<28} FAILED: {err}", flush=True)
        else:
            print(f"{name:<28} baseline {b_ms:6.2f} ms  variant {v_ms:6.2f}"
                  f" ms  ({(v_ms / b_ms - 1) * 100:+.1f}%)", flush=True)
    print("\nnote: judge each row against its own bracketing baseline;"
          " cross-row absolute drift is real on this host.")


if __name__ == "__main__":
    main()
