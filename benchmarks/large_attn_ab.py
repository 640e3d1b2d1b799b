"""BART-large (16-head) fused-attention study — round-4 verdict #2.

The round-3 gate capped the fused train-attention kernel at 12 heads on a
single measurement of the per-head-loop layout. This harness re-measures
at 16 heads with the variants the verdict asked for:

  1. isolated attention fwd+bwd at BART-large shapes (B x 72 self,
     B x 40 causal, 40 -> 72 cross), composite XLA chain vs the Pallas
     kernel with head-group G in {16 (one program, round-3 layout),
     8, 4, 2} (KMBART_FUSED_ATTN_GROUP grid split);
  2. the full BART-large train step (micro-batch 32 x accum 4, the
     BASELINE.md recipe) with the best kernel variant forced on via
     KMBART_FUSED_ATTN_HEADS_MAX=16 vs the shipping composite.

Usage: python benchmarks/large_attn_ab.py [--iters 30] [--reps 3]
       [--skip-step]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 64
HEADS, D = 16, 1024
SHAPES = [("self72", 72, 72, False), ("dec40", 40, 40, True),
          ("cross40x72", 40, 72, False)]


def composite_attention(q, k, v, key_mask, num_heads, causal):
    """The XLA path the model takes without the kernel: head-split retile,
    batched einsum chain, merge (mirrors ops/attention.py attention_core)."""
    import jax.numpy as jnp
    b, tq, d = q.shape
    tk = k.shape[1]
    hd = d // num_heads
    scale = hd ** -0.5
    qh = (q * jnp.asarray(scale, q.dtype)).reshape(b, tq, num_heads, hd)
    kh = k.reshape(b, tk, num_heads, hd)
    vh = v.reshape(b, tk, num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32)
    bias = jnp.where(key_mask.astype(bool), 0.0, -1e9)[:, None, None, :]
    s = s + bias
    if causal:
        qpos = jnp.arange(tq)[:, None]
        kpos = jnp.arange(tk)[None, :]
        s = jnp.where(kpos <= qpos, s, -1e9)
    p = (jnp.exp(s - s.max(-1, keepdims=True)))
    p = (p / p.sum(-1, keepdims=True)).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    return o.reshape(b, tq, d)


def bench_isolated(jax, iters, reps):
    import jax.numpy as jnp
    from kmbart_tpu.ops.pallas_train_attention import train_attention_flat

    rng = np.random.default_rng(0)
    results = {}
    for name, tq, tk, causal in SHAPES:
        q = jnp.asarray(rng.normal(size=(B, tq, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, tk, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, tk, D)), jnp.bfloat16)
        mask = jnp.ones((B, tk), jnp.int32)
        g_seed = jnp.asarray(rng.normal(size=(B, tq, D)), jnp.bfloat16)

        def make(fn):
            def loss(q_, k_, v_):
                o = fn(q_, k_, v_)
                return jnp.sum((o * g_seed).astype(jnp.float32))
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        variants = {"composite": make(
            lambda q_, k_, v_: composite_attention(q_, k_, v_, mask,
                                                   HEADS, causal))}
        for group in (16, 8, 4, 2):
            if group == HEADS:
                os.environ.pop("KMBART_FUSED_ATTN_GROUP", None)
            else:
                os.environ["KMBART_FUSED_ATTN_GROUP"] = str(group)
            # fresh jit per group: the env var is read at trace time
            fn = make(lambda q_, k_, v_, c=causal: train_attention_flat(
                q_, k_, v_, mask, num_heads=HEADS, causal=c))
            jax.block_until_ready(fn(q, k, v))     # compile under this env
            variants[f"fused_g{group}"] = fn
        os.environ.pop("KMBART_FUSED_ATTN_GROUP", None)

        # numerics: each fused variant vs composite
        ref = variants["composite"](q, k, v)
        for vn, fn in variants.items():
            if vn == "composite":
                continue
            got = fn(q, k, v)
            rel = max(
                float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b.astype(jnp.float32)))
                      / (jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-9))
                for a, b in zip(got, ref))
            print(f"# {name} {vn}: max grad rel dev {rel:.2e}", flush=True)

        best = {}
        for rep in range(reps):
            for vn, fn in variants.items():
                jax.block_until_ready(fn(q, k, v))
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = fn(q, k, v)
                jax.block_until_ready(out)
                ms = (time.perf_counter() - t0) / iters * 1e3
                best[vn] = min(best.get(vn, 1e9), ms)
        results[name] = best
        comp = best["composite"]
        row = "  ".join(f"{vn}={ms:.3f}ms({ms / comp * 100:.0f}%)"
                        for vn, ms in best.items())
        print(f"{name}: {row}", flush=True)
    return results


def bench_full_step(variant_env, iters=10):
    """One full BART-large accum-recipe step time under the given env, in a
    fresh interpreter so trace-time env flags apply cleanly."""
    import json
    import subprocess
    code = r"""
import json, os, sys, time
import numpy as np
sys.path.insert(0, %r)
import jax
os.makedirs("/tmp/kmbart_jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/kmbart_jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from kmbart_tpu.config import bart_large_config
from kmbart_tpu.models.conditional import conditional_loss, init_conditional_params
from kmbart_tpu.parallel.train_step import build_train_step
from kmbart_tpu.training.adamw import adamw
from kmbart_tpu.training.state import TrainState
cfg = bart_large_config()
rng = np.random.default_rng(0)
B = 128
def loss_fn(p, b, r):
    loss, _ = conditional_loss(p, cfg, b, train=True, rng=r)
    return loss, {}
step = build_train_step(loss_fn, adamw(lr=1e-5), donate=True, grad_accum_steps=4)
ids = rng.integers(4, 50000, (B, 72)).astype(np.int32)
ids[:, 1:31] = cfg.img_feat_id
dec = rng.integers(4, 50000, (B, 40)).astype(np.int32)
batch = jax.device_put({
    "input_ids": ids, "attention_mask": np.ones((B, 72), np.int32),
    "image_features": rng.normal(size=(B, cfg.max_img_num, cfg.image_feature_size)).astype(np.float32),
    "decoder_input_ids": dec, "decoder_attention_mask": np.ones((B, 40), np.int32),
    "labels": dec.copy()})
key = jax.random.PRNGKey(0)
state = TrainState.create(init_conditional_params(jax.random.PRNGKey(0), cfg))
state, m = step(state, batch, key); float(m["loss"])
iters = %d
best = 1e9
for rep in range(2):
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, key)
    float(m["loss"])
    best = min(best, (time.perf_counter() - t0) / iters * 1e3)
print(json.dumps({"ms": best, "loss": float(m["loss"])}))
""" % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), iters)
    env = dict(os.environ)
    env.update(variant_env)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=1200)
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        return json.loads(line)
    except Exception:
        print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
        raise


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-step", action="store_true")
    ap.add_argument("--step-group", default=None,
                    help="only run the full-step A/B for this group value")
    args = ap.parse_args()

    os.makedirs("/tmp/kmbart_jaxcache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/kmbart_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    bench_isolated(jax, args.iters, args.reps)

    if args.skip_step:
        return
    combos = [("composite", {"KMBART_NO_FUSED_ATTN": "1"})]
    groups = [args.step_group] if args.step_group else ["16", "4"]
    for gname in groups:
        env = {"KMBART_FUSED_ATTN_HEADS_MAX": "16"}
        if gname != "16":
            env["KMBART_FUSED_ATTN_GROUP"] = gname
        combos.append((f"fused_g{gname}", env))
    # interleaved reps (fresh subprocess each) absorb host drift
    for name, env in combos:
        res = bench_full_step(env)
        print(f"step {name}: {res['ms']:.2f} ms "
              f"(loss {res['loss']:.4f})", flush=True)


if __name__ == "__main__":
    main()
