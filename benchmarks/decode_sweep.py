"""Beam-5 decode throughput batch sweep (bench.py protocol).

Usage: python benchmarks/decode_sweep.py [batch ...]
Default sweep reproduces the round-4 table (BASELINE.md): 96..192.
Device-resident inputs; median of 3 timed reps of 5 iterations each.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    batches = [int(a) for a in sys.argv[1:]] or \
        [96, 112, 128, 144, 160, 176, 192]
    jax = bench._setup_jax()
    from kmbart_tpu.config import bart_base_config
    from kmbart_tpu.generation.api import generate
    from kmbart_tpu.models.conditional import init_conditional_params

    cfg = bart_base_config()
    params = jax.device_put(
        init_conditional_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    kwargs = dict(max_length=bench.MAX_LEN, num_beams=bench.BEAMS,
                  early_stopping=True, rng=jax.device_put(jax.random.PRNGKey(0)))
    print(f"{'batch':>6} {'sent/s':>8} {'step_ms':>8}")
    for B in batches:
        batch = bench._decode_batch(jax, cfg, B, rng)
        out = generate(params, cfg, batch, **kwargs)  # compile + warm
        np.asarray(out)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                out = generate(params, cfg, batch, **kwargs)
            np.asarray(out)
            reps.append(time.perf_counter() - t0)
        dt = sorted(reps)[1]
        print(f"{B:>6} {B * 5 / dt:>8.1f} "
              f"{dt / 5 / (bench.MAX_LEN - 1) * 1e3:>8.3f}", flush=True)


if __name__ == "__main__":
    main()
