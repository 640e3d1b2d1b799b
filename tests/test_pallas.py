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
