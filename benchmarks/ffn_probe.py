"""Feasibility probe: can a fused Pallas FFN forward beat the XLA composite?

Round-5 step itemization (BASELINE.md "the 76% matmul slice") named the
encoder FFN matmul fusions as the largest remaining inefficiency: the
down-proj bf16[128,72,3072]x[3072,768] fusion runs at 104-106 TF/s (53%
of the 197 TF/s v5e MXU peak) and the up-proj at 122-125 TF/s, both
carrying convert+reduce epilogues the round-4 flag study could not move.
This probe measures, in isolation at the exact step shapes:

  composite   dense(bf16, fp32 acc) -> gelu -> dense   (models/bart.py:203)
  pallas      one kernel: per (row-tile, F-tile) program computes
              a = x @ W1_f + b1_f on the MXU, h = gelu(a) in VMEM, and
              accumulates y += h @ W2_f in fp32 VMEM scratch — the
              [N, F] intermediate is never re-read from HBM and both
              epilogues run inside the MXU loop.

Go/no-go gate for wiring the kernel into the train step.
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gelu(x):
    return x * 0.5 * (1.0 + jax.lax.erf(x / np.sqrt(2.0).astype(np.float32)))


# Pallas TPU has no erf lowering; Abramowitz-Stegun 7.1.26 in fp32
# (|err| <= 1.5e-7, ~400x below one bf16 ULP at |erf|~1).
_AS = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _erf_poly(z):
    s = jnp.sign(z)
    z = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (_AS[0] + t * (_AS[1] + t * (_AS[2] + t * (_AS[3] + t * _AS[4]))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def gelu_poly(x16):
    z = x16.astype(jnp.float32)
    return (z * 0.5 * (1.0 + _erf_poly(z * np.float32(1 / np.sqrt(2.0))))
            ).astype(x16.dtype)


def composite(x, w1, b1, w2, b2):
    a = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    h = gelu(a.astype(jnp.bfloat16))
    y = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
    return y.astype(jnp.bfloat16)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, acc_ref, *, nf):
    j = pl.program_id(1)
    a = jax.lax.dot_general(
        x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    a = a + b1_ref[...].astype(jnp.float32)
    h = gelu_poly(a.astype(jnp.bfloat16))
    contrib = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = contrib

    @pl.when(j > 0)
    def _acc():
        acc_ref[...] += contrib

    @pl.when(j == nf - 1)
    def _flush():
        y_ref[...] = (acc_ref[...] + b2_ref[...].astype(jnp.float32)
                      ).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_f"))
def pallas_ffn(x, w1, b1, w2, b2, tile_n=512, tile_f=512):
    n, d = x.shape
    f = w1.shape[1]
    grid = (n // tile_n, f // tile_f)
    return pl.pallas_call(
        functools.partial(_kernel, nf=grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, tile_f), lambda i, j: (0, j)),
            pl.BlockSpec((1, tile_f), lambda i, j: (0, j)),
            pl.BlockSpec((tile_f, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_n, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, w1, b1, w2, b2)


def bench(fn, args, iters=50):
    # dependency chain (y feeds the next call's x) so iterations cannot
    # overlap or dedupe, closed by a scalar device-to-host fetch — under
    # the axon tunnel block_until_ready alone does NOT drain the queue
    # (the lm_ce_ab.py convention is float(loss) before/after the loop)
    x = args[0]
    x = fn(x, *args[1:])
    float(x[0, 0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *args[1:])
    float(x[0, 0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)

    for name, (n, d, f) in [("enc b128", (9216, 768, 3072)),
                            ("dec b128", (5120, 768, 3072)),
                            ("large-enc b64", (4608, 1024, 4096))]:
        ks = jax.random.split(key, 5)
        x = jax.random.normal(ks[0], (n, d), jnp.bfloat16)
        w1 = jax.random.normal(ks[1], (d, f), jnp.bfloat16) * 0.02
        b1 = jax.random.normal(ks[2], (1, f), jnp.float32)
        w2 = jax.random.normal(ks[3], (f, d), jnp.bfloat16) * 0.02
        b2 = jax.random.normal(ks[4], (1, d), jnp.float32)
        flops = 2 * 2 * n * d * f

        comp = jax.jit(composite)
        t_comp = bench(comp, (x, w1, b1, w2, b2), args.iters)
        y_ref = comp(x, w1, b1, w2, b2)
        print(f"{name}: composite {t_comp:.3f} ms  "
              f"{flops / t_comp / 1e9:.0f} TF/s")

        for tn, tf in [(512, 512), (1024, 512), (512, 1024)]:
            if n % tn or f % tf:
                continue
            try:
                fn = functools.partial(pallas_ffn, tile_n=tn, tile_f=tf)
                t = bench(fn, (x, w1, b1, w2, b2), args.iters)
                y = fn(x, w1, b1, w2, b2)
                err = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                            - y_ref.astype(jnp.float32))))
                print(f"{name}: pallas tn={tn} tf={tf} {t:.3f} ms  "
                      f"{flops / t / 1e9:.0f} TF/s  maxerr {err:.4f}  "
                      f"({t_comp / t * 100 - 100:+.1f}%)")
            except Exception as e:  # noqa: BLE001 — probe reports and moves on
                print(f"{name}: pallas tn={tn} tf={tf} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
