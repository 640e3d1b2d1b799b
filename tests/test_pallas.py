"""Pallas flash-attention kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmbart_tpu.ops.attention import attention_core, padding_bias
from kmbart_tpu.ops.pallas_attention import (
    flash_attention, flash_self_attention, flash_supported)


def _qkv(np_rng, B=2, T=16, H=4, hd=8, Tk=None):
    Tk = Tk or T
    q = np_rng.normal(size=(B, T, H, hd)).astype(np.float32)
    k = np_rng.normal(size=(B, Tk, H, hd)).astype(np.float32)
    v = np_rng.normal(size=(B, Tk, H, hd)).astype(np.float32)
    return q, k, v


def test_flash_matches_xla_core(np_rng):
    q, k, v = _qkv(np_rng)
    B, T, H, hd = q.shape
    mask = np.ones((B, T), np.int32)
    mask[1, -5:] = 0
    ref = attention_core(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         padding_bias(jnp.asarray(mask)), dtype=jnp.float32)

    def to_bh(x):
        return jnp.asarray(x).transpose(0, 2, 1, 3).reshape(B * H, -1, hd)

    key_bias = jnp.repeat(
        jnp.where(jnp.asarray(mask).astype(bool), 0.0, -1e9), H, axis=0)
    out = flash_attention(to_bh(q), to_bh(k), to_bh(v), key_bias,
                          block_q=8, block_k=8, interpret=True)
    out = out.reshape(B, H, T, hd).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_flash_cross_attention_shape(np_rng):
    q, k, v = _qkv(np_rng, T=8, Tk=24)
    B, T, H, hd = q.shape
    mask = np.ones((B, 24), np.int32)
    out = flash_self_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               jnp.asarray(mask), interpret=True,
                               dtype=jnp.float32)
    ref = attention_core(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         padding_bias(jnp.asarray(mask)), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_flash_gating():
    # CPU backend -> never selected (tests keep running the XLA path)
    assert not flash_supported(16, 16, 8, 0.0, False, True)


def test_flash_causal_matches_xla(np_rng):
    from kmbart_tpu.ops.attention import causal_bias
    q, k, v = _qkv(np_rng, T=16)
    B, T, H, hd = q.shape
    mask = np.ones((B, T), np.int32)
    mask[0, -3:] = 0
    bias = causal_bias(T, T) + padding_bias(jnp.asarray(mask))
    ref = attention_core(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         bias, dtype=jnp.float32)
    out = flash_self_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               jnp.asarray(mask), causal=True,
                               interpret=True, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_flash_gradients_match_xla(np_rng):
    """Custom VJP (Pallas fwd, XLA bwd) must match grads of the XLA core."""
    q, k, v = _qkv(np_rng, B=1, T=16, H=2, hd=8)
    mask = np.ones((1, 16), np.int32)
    mask[0, -4:] = 0

    def loss_flash(q, k, v):
        out = flash_self_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray(mask),
                                   causal=True, interpret=True,
                                   dtype=jnp.float32)
        return jnp.sum(out ** 2)

    def loss_xla(q, k, v):
        from kmbart_tpu.ops.attention import causal_bias
        bias = causal_bias(16, 16) + padding_bias(jnp.asarray(mask))
        out = attention_core(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                             bias, dtype=jnp.float32)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_residual_ln_kernel_matches_reference(np_rng):
    """Fused residual+LN (ops/pallas_ln.py): forward and all four
    gradients must match the layer_norm(a+b) composition, in fp32 and
    bf16, through the Pallas kernel (interpret mode on CPU)."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    import kmbart_tpu.ops.pallas_ln as pln

    orig = pl.pallas_call
    # route the kernel through the interpreter so CPU tests execute it
    with_interp = functools.partial(orig, interpret=True)
    pln.pl.pallas_call = with_interp
    try:
        for dtype in (jnp.float32, jnp.bfloat16):
            N, D = 64, 256
            a = jnp.asarray(np_rng.normal(size=(4, 16, D)), dtype)
            b = jnp.asarray(np_rng.normal(size=(4, 16, D)), dtype)
            scale = jnp.asarray(np_rng.normal(size=(D,)).astype(np.float32))
            bias = jnp.asarray(np_rng.normal(size=(D,)).astype(np.float32))

            y = pln.residual_layer_norm(a, b, scale, bias)
            ref = pln.residual_layer_norm_reference(a, b, scale, bias)
            tol = 1e-6 if dtype == jnp.float32 else 2e-2
            np.testing.assert_allclose(np.asarray(y, np.float32),
                                       np.asarray(ref, np.float32),
                                       rtol=tol, atol=tol)

            def loss_k(a, b, s, bi):
                return jnp.sum(jnp.sin(
                    pln.residual_layer_norm(a, b, s, bi).astype(jnp.float32)))

            def loss_r(a, b, s, bi):
                return jnp.sum(jnp.sin(pln.residual_layer_norm_reference(
                    a, b, s, bi).astype(jnp.float32)))

            gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(a, b, scale, bias)
            gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(a, b, scale, bias)
            # bf16 bands are set by the rounding of the bf16 dx outputs /
            # per-tile f32 reduction regrouping, measured ~2.5% of scale
            bf16_atol = (0.12, 0.12, 0.6, 0.3)
            for (k, r), at in zip(zip(gk, gr), bf16_atol):
                np.testing.assert_allclose(np.asarray(k, np.float32),
                                           np.asarray(r, np.float32),
                                           rtol=5e-2 if dtype == jnp.bfloat16
                                           else 2e-5,
                                           atol=at if dtype == jnp.bfloat16
                                           else 2e-5)
    finally:
        pln.pl.pallas_call = orig
