"""Measure sequence parallelism's memory claim (round-4 verdict #6).

Compiles the TP-2 train step with and without the Megatron-SP sharding
constraints (parallel/sp.py) on the forced 8-CPU-device mesh
(DP4 x TP2) and reports XLA's compiled memory analysis side by side —
the activation/temp allocation delta IS the SP claim (each TP shard
stops holding replicated [B, T, D] LN/dropout/residual tiles). Run:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python benchmarks/sp_memory.py [--batch 32]

Numbers land in BASELINE.md (round-5 SP section).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402

ENC_LEN, DEC_LEN = 72, 40


def lowered_step(jax, cfg, mesh, sp_on, batch, params):
    from kmbart_tpu.models.conditional import conditional_loss
    from kmbart_tpu.parallel import sp
    from kmbart_tpu.parallel.tp import train_state_shardings
    from kmbart_tpu.parallel.train_step import build_train_step
    from kmbart_tpu.training.adamw import adamw
    from kmbart_tpu.training.state import TrainState

    def loss_fn(p, b, r):
        loss, _ = conditional_loss(p, cfg, b, train=True, rng=r)
        return loss, {}

    shardings = train_state_shardings(mesh, params)
    step = build_train_step(loss_fn, adamw(lr=1e-5), mesh=mesh,
                            param_specs=shardings, donate=True)
    state = TrainState.create(params)
    ctx = sp.sequence_parallel(mesh) if sp_on else _null()
    with ctx:
        return step.lower(state, batch, jax.random.PRNGKey(0))


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")
    from kmbart_tpu.config import bart_base_config
    from kmbart_tpu.models.conditional import init_conditional_params
    from kmbart_tpu.parallel.mesh import make_mesh

    cfg = bart_base_config()
    mesh = make_mesh(model_parallel=2)
    B = args.batch
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 50000, (B, ENC_LEN)).astype(np.int32)
    ids[:, 1:31] = cfg.img_feat_id
    dec = rng.integers(4, 50000, (B, DEC_LEN)).astype(np.int32)
    batch = {
        "input_ids": ids,
        "attention_mask": np.ones((B, ENC_LEN), np.int32),
        "image_features": rng.normal(size=(B, cfg.max_img_num,
                                           cfg.image_feature_size)
                                     ).astype(np.float32),
        "decoder_input_ids": dec,
        "decoder_attention_mask": np.ones((B, DEC_LEN), np.int32),
        "labels": dec.copy(),
    }
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    out = {}
    for name, sp_on in (("tp2", False), ("tp2+sp", True)):
        compiled = lowered_step(jax, cfg, mesh, sp_on, batch, params
                                ).compile()
        ma = compiled.memory_analysis()
        out[name] = ma
        print(f"{name}: temp {ma.temp_size_in_bytes/2**20:8.1f} MiB  "
              f"output {ma.output_size_in_bytes/2**20:8.1f} MiB  "
              f"args {ma.argument_size_in_bytes/2**20:8.1f} MiB  "
              f"(per device)")
    a, b = out["tp2"], out["tp2+sp"]
    d = a.temp_size_in_bytes - b.temp_size_in_bytes
    print(f"SP temp-allocation saving: {d/2**20:.1f} MiB per device "
          f"({d/max(a.temp_size_in_bytes,1)*100:.1f}% of the TP2 step's "
          f"temps at batch {B})")


if __name__ == "__main__":
    main()
