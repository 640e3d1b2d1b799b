"""Same-process A/B of the fused FFN kernel (ops/pallas_ffn.py).

Two variants of the plain fine-tune train step, compiled side by side
and timed interleaved (the lm_ce_ab.py convention):

  composite — KMBART_NO_FUSED_FFN=1 (dense -> gelu -> dense, the
              round-4/5 shipping FFN)
  fused     — Pallas fc1->gelu->fc2 forward + backward, [rows, ffn_dim]
              intermediates VMEM-resident both directions

Also cross-checks on-chip numerics (loss + global grad-norm^2 vs the
composite on the same batch — the kernel's poly-erf GELU and tiled fp32
accumulation differ from the composite by bf16-rounding order only).

Usage: python benchmarks/ffn_ab.py [--batch 128] [--iters 24] [--reps 2]
       [--large]  (BART-large recipe shapes: micro 32, d=1024, 16 heads)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENC_LEN, DEC_LEN = 72, 40


def _set_variant_env(variant):
    os.environ.pop("KMBART_NO_FUSED_FFN", None)
    if variant == "composite":
        os.environ["KMBART_NO_FUSED_FFN"] = "1"


def build(jax, cfg, variant):
    from kmbart_tpu.models.conditional import conditional_loss
    from kmbart_tpu.parallel.train_step import build_train_step
    from kmbart_tpu.training.adamw import adamw

    _set_variant_env(variant)

    def loss_fn(p, b, r):
        loss, _ = conditional_loss(p, cfg, b, train=True, rng=r)
        return loss, {}

    return build_train_step(loss_fn, adamw(lr=1e-5), donate=True)


def grad_probe(jax, cfg, variant, params, batch):
    from kmbart_tpu.models.conditional import conditional_loss

    _set_variant_env(variant)

    def f(p, b):
        return conditional_loss(p, cfg, b, train=False)[0]

    loss, grads = jax.jit(jax.value_and_grad(f))(params, batch)
    gn2 = jax.tree.reduce(
        lambda a, g: a + jax.numpy.sum(g.astype(jax.numpy.float32) ** 2),
        grads, 0.0)
    return float(loss), float(gn2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--large", action="store_true")
    args = ap.parse_args()

    os.makedirs("/tmp/kmbart_jaxcache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/kmbart_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from kmbart_tpu.config import bart_base_config, bart_large_config
    from kmbart_tpu.models.conditional import init_conditional_params
    from kmbart_tpu.training.state import TrainState

    cfg = bart_large_config() if args.large else bart_base_config()
    B = 32 if args.large and args.batch == 128 else args.batch
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 50000, (B, ENC_LEN)).astype(np.int32)
    ids[:, 1:31] = cfg.img_feat_id
    dec = rng.integers(4, 50000, (B, DEC_LEN)).astype(np.int32)
    batch = jax.device_put({
        "input_ids": ids,
        "attention_mask": np.ones((B, ENC_LEN), np.int32),
        "image_features": rng.normal(size=(B, cfg.max_img_num,
                                           cfg.image_feature_size)
                                     ).astype(np.float32),
        "decoder_input_ids": dec,
        "decoder_attention_mask": np.ones((B, DEC_LEN), np.int32),
        "labels": dec.copy(),
    })
    key = jax.random.PRNGKey(0)

    variants = ("composite", "fused")
    dev_params = jax.device_put(params)
    base_loss, base_gn2 = grad_probe(jax, cfg, "composite", dev_params, batch)
    loss, gn2 = grad_probe(jax, cfg, "fused", dev_params, batch)
    print(f"# numerics fused: loss rel {abs(loss-base_loss)/abs(base_loss):.2e}"
          f"  gradnorm2 rel {abs(gn2-base_gn2)/abs(base_gn2):.2e}", flush=True)

    steps = {}
    for v in variants:
        # env flags are read at TRACE time: build + compile under the flag
        steps[v] = build(jax, cfg, v)
        state = TrainState.create(
            jax.tree.map(lambda a: jax.numpy.array(a), params))
        state, m = steps[v](state, batch, key)
        float(m["loss"])
        del state

    def time_variant(v):
        state = TrainState.create(
            jax.tree.map(lambda a: jax.numpy.array(a), params))
        state, m = steps[v](state, batch, key)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = steps[v](state, batch, key)
        float(m["loss"])
        return (time.perf_counter() - t0) / args.iters * 1e3

    results = {v: [] for v in variants}
    for rep in range(args.reps):
        for v in variants:
            ms = time_variant(v)
            results[v].append(ms)
            print(f"# rep {rep} {v}: {ms:.2f} ms/step", flush=True)
    for v in variants:
        ms = min(results[v])
        print(f"{v}: best {ms:.2f} ms/step = {B / ms * 1e3:.1f} samples/s")


if __name__ == "__main__":
    main()
