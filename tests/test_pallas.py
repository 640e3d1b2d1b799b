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


def test_pallas_top_k_matches_lax(np_rng):
    from kmbart_tpu.ops.pallas_topk import pallas_top_k
    x = np_rng.normal(size=(3, 4096)).astype(np.float32)
    x[0, 77] = x[0, 203] = 11.0  # ties -> lowest index
    x[1, -1] = 50.0
    v1, i1 = jax.lax.top_k(jnp.asarray(x), 10)
    v2, i2 = pallas_top_k(jnp.asarray(x), 10, interpret=True)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_beam_decode_self_attention_matches_xla(np_rng):
    """Fused gather+insert+attention step == the XLA op sequence."""
    import jax
    import jax.numpy as jnp
    from kmbart_tpu.ops.pallas_decode_attention import (
        beam_decode_self_attention)

    B, T, D, H = 10, 16, 128, 4
    hd = D // H
    kc = np_rng.normal(size=(B, T, D)).astype(np.float32)
    vc = np_rng.normal(size=(B, T, D)).astype(np.float32)
    nk = np_rng.normal(size=(B, D)).astype(np.float32)
    nv = np_rng.normal(size=(B, D)).astype(np.float32)
    q = (np_rng.normal(size=(B, D)) * hd ** -0.5).astype(np.float32)
    ridx = np_rng.permutation(B).astype(np.int32)
    ci = 7

    out, ck, cv = beam_decode_self_attention(
        jnp.asarray(q), jnp.asarray(kc, jnp.bfloat16),
        jnp.asarray(vc, jnp.bfloat16), jnp.asarray(nk), jnp.asarray(nv),
        ci, ridx, num_heads=H, interpret=True)

    k = kc[ridx].copy()
    v = vc[ridx].copy()
    k[:, ci] = nk
    v[:, ci] = nv
    qb = q.reshape(B, H, hd).astype(jnp.bfloat16).astype(np.float32)
    kb = k.reshape(B, T, H, hd).astype(jnp.bfloat16).astype(np.float32)
    scores = np.einsum("bhd,bthd->bht", qb, kb)
    scores[:, :, ci + 1:] = -1e9
    e = np.exp(scores - scores.max(-1, keepdims=True))
    p = (e / e.sum(-1, keepdims=True))
    ref_out = np.einsum("bht,bthd->bhd", p,
                        v.reshape(B, T, H, hd)).reshape(B, D)

    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-2)
    np.testing.assert_array_equal(
        np.asarray(ck), np.asarray(jnp.asarray(k, jnp.bfloat16)))
    np.testing.assert_array_equal(
        np.asarray(cv), np.asarray(jnp.asarray(v, jnp.bfloat16)))
