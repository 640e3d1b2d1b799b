"""Fused residual-add + LayerNorm with a custom VJP (Pallas, TPU).

Motivation (round-3 v5e train profile, BART-base batch 128): every
residual+LN site lowered to an XLA backward fusion of ~0.33 ms — 6.6x the
~0.05 ms its HBM traffic justifies — because one fusion mixes per-ROW
statistics (the LN means) with per-COLUMN reductions (dscale/dbias), and
XLA picks an iteration order that serves neither. With 12+ sites that was
~4-6 ms/step of pure VPU/layout overhead.

This kernel computes ``y = LN(a + b) * scale + bias`` in one row-tiled
pass and, in backward, produces dx plus the dscale/dbias column partials
accumulated across row tiles in VMEM — one read of (dy, s) total.

Semantics match ops/layers.layer_norm(a + b): the sum is formed in the
input dtype (bf16 in the default policy — the saved residual ``s`` is
that same rounded sum, so backward statistics are bit-identical to
forward's), statistics are fp32, output is written in the input dtype.
Gradient flows identically to both addends (d a == d b); the caller
routes d b through its dropout VJP.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(n):
    for t in (512, 256, 128, 64, 32, 16, 8):
        if n % t == 0:
            return t
    return None


def _fwd_kernel(a_ref, b_ref, scale_ref, bias_ref, y_ref, s_ref, *, eps):
    # the VPU (and interpret mode) evaluates a bf16 add at f32 precision
    # in-register; round explicitly so the saved s AND the statistics see
    # exactly the bf16 sum the unfused reference computes
    s = (a_ref[...].astype(jnp.float32)
         + b_ref[...].astype(jnp.float32)).astype(s_ref.dtype)
    s_ref[...] = s
    sf = s.astype(jnp.float32)
    mean = jnp.mean(sf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(sf - mean), axis=1, keepdims=True)
    xhat = (sf - mean) * jax.lax.rsqrt(var + eps)
    y = xhat * scale_ref[...].astype(jnp.float32) \
        + bias_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(dy_ref, s_ref, scale_ref, dx_ref, dsc_ref, dbi_ref, *, eps):
    i = pl.program_id(0)
    sf = s_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    D = sf.shape[1]
    mean = jnp.mean(sf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(sf - mean), axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (sf - mean) * rstd
    g = dy * scale_ref[...].astype(jnp.float32)
    m1 = jnp.mean(g, axis=1, keepdims=True)
    m2 = jnp.mean(g * xhat, axis=1, keepdims=True)
    dx = rstd * (g - m1 - xhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    # column partials accumulated across the row-tile grid (revisited block)
    psc = jnp.sum(dy * xhat, axis=0, keepdims=True)
    pbi = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dsc_ref[...] = psc
        dbi_ref[...] = pbi

    @pl.when(i != 0)
    def _():
        dsc_ref[...] += psc
        dbi_ref[...] += pbi


def _fwd_call(a, b, scale, bias, eps):
    N, D = a.shape
    TR = _pick_tile(N)
    y, s = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(N // TR,),
        in_specs=[
            pl.BlockSpec((TR, D), lambda i: (i, 0)),
            pl.BlockSpec((TR, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TR, D), lambda i: (i, 0)),
            pl.BlockSpec((TR, D), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, D), a.dtype),
            jax.ShapeDtypeStruct((N, D), a.dtype),
        ],
    )(a, b, scale.reshape(1, D), bias.reshape(1, D))
    return y, s


def _bwd_call(dy, s, scale, eps):
    N, D = s.shape
    TR = _pick_tile(N)
    dx, dsc, dbi = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(N // TR,),
        in_specs=[
            pl.BlockSpec((TR, D), lambda i: (i, 0)),
            pl.BlockSpec((TR, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TR, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, D), dy.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
    )(dy, s, scale.reshape(1, D))
    return dx, dsc.reshape(D), dbi.reshape(D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def residual_layer_norm(a, b, scale, bias, eps=1e-5):
    """LN(a + b) * scale + bias over the last axis; a/b [..., D]."""
    y, _ = _rln_fwd(a, b, scale, bias, eps)
    return y


def _rln_fwd(a, b, scale, bias, eps):
    shape = a.shape
    D = shape[-1]
    y, s = _fwd_call(a.reshape(-1, D), b.reshape(-1, D), scale, bias, eps)
    return y.reshape(shape), (s, scale, shape)


def _rln_bwd(eps, res, dy):
    s, scale, shape = res
    D = shape[-1]
    dx, dsc, dbi = _bwd_call(dy.reshape(-1, D), s, scale, eps)
    dx = dx.reshape(shape)
    return dx, dx, dsc.astype(scale.dtype), dbi.astype(scale.dtype)


residual_layer_norm.defvjp(_rln_fwd, _rln_bwd)


def residual_layer_norm_reference(a, b, scale, bias, eps=1e-5):
    """Unfused composition (the semantics target; used off-TPU)."""
    from kmbart_tpu.ops.layers import layer_norm
    return layer_norm(a + b, scale, bias, eps=eps)


def rln_supported(a, min_rows=1024):
    """Kernel constraints: TPU backend, 2D-able with lane-aligned D and a
    row count divisible by a supported tile. ``min_rows`` keeps the tiny
    decode-step shapes on the XLA path (per-call grid overhead would eat
    the win there; the kernel targets the [B*T, D] training shapes)."""
    if jax.default_backend() != "tpu":
        return False
    D = a.shape[-1]
    n = 1
    for d in a.shape[:-1]:
        n *= d
    return D % 128 == 0 and n >= min_rows and _pick_tile(n) is not None


def fused_residual_ln(a, b, scale, bias, eps=1e-5):
    """Dispatch: Pallas kernel on TPU, reference composition elsewhere."""
    if rln_supported(a):
        return residual_layer_norm(a, b, scale, bias, eps)
    return residual_layer_norm_reference(a, b, scale, bias, eps)
