"""Fused train-attention kernel correctness (interpret mode on CPU).

Covers ops/pallas_train_attention.py: forward parity vs the composite XLA
attention_core, both backward forms (the transpose-free Tq==Tk recompute
and the 5-dot cross-attention form), causal masking, and the selection
gate. Parity target is the same HF 3.0.2 SelfAttention math as
ops/attention.py (reference src/model/modules.py:8-14).
"""

import jax
import jax.numpy as jnp
import numpy as np

from kmbart_tpu.ops.attention import (attention_core, causal_bias,
                                      merge_heads, padding_bias, split_heads)
from kmbart_tpu.ops.pallas_train_attention import (
    train_attention_flat, train_attention_supported)


def _flat_qkv(np_rng, B=2, Tq=16, Tk=None, H=4, hd=8):
    Tk = Tk or Tq
    D = H * hd
    q = np_rng.normal(size=(B, Tq, D)).astype(np.float32)
    k = np_rng.normal(size=(B, Tk, D)).astype(np.float32)
    v = np_rng.normal(size=(B, Tk, D)).astype(np.float32)
    return q, k, v


def _composite(q_flat, k_flat, v_flat, mask, H, causal=False):
    bias = padding_bias(jnp.asarray(mask))
    if causal:
        bias = bias + causal_bias(q_flat.shape[1], k_flat.shape[1])
    out = attention_core(split_heads(jnp.asarray(q_flat), H),
                         split_heads(jnp.asarray(k_flat), H),
                         split_heads(jnp.asarray(v_flat), H),
                         bias, dtype=jnp.float32)
    return merge_heads(out)


def test_fused_matches_composite_self(np_rng):
    q, k, v = _flat_qkv(np_rng)
    mask = np.ones((2, 16), np.int32)
    mask[1, -5:] = 0
    ref = _composite(q, k, v, mask, H=4)
    out = train_attention_flat(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               jnp.asarray(mask), num_heads=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_fused_matches_composite_causal(np_rng):
    q, k, v = _flat_qkv(np_rng)
    mask = np.ones((2, 16), np.int32)
    mask[0, -3:] = 0
    ref = _composite(q, k, v, mask, H=4, causal=True)
    out = train_attention_flat(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               jnp.asarray(mask), num_heads=4, causal=True,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_fused_matches_composite_cross(np_rng):
    # Tq != Tk exercises the 5-dot backward form's forward too
    q, k, v = _flat_qkv(np_rng, Tq=8, Tk=24)
    mask = np.ones((2, 24), np.int32)
    mask[1, -7:] = 0
    ref = _composite(q, k, v, mask, H=4)
    out = train_attention_flat(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               jnp.asarray(mask), num_heads=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_fused_no_mask(np_rng):
    q, k, v = _flat_qkv(np_rng, B=1, Tq=8)
    ref = _composite(q, k, v, np.ones((1, 8), np.int32), H=4)
    out = train_attention_flat(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               None, num_heads=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def _grad_pair(q, k, v, mask, H, causal):
    def loss_fused(q, k, v):
        out = train_attention_flat(q, k, v, jnp.asarray(mask), num_heads=H,
                                   causal=causal, interpret=True)
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_composite(q, k, v, mask, H, causal=causal) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    return g1, g2


def test_fused_gradients_square_causal(np_rng):
    """Tq == Tk: the transposed-side recompute backward."""
    q, k, v = _flat_qkv(np_rng, B=2, Tq=16, H=2, hd=8)
    mask = np.ones((2, 16), np.int32)
    mask[0, -4:] = 0
    g1, g2 = _grad_pair(q, k, v, mask, H=2, causal=True)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_gradients_square_padded(np_rng):
    q, k, v = _flat_qkv(np_rng, B=2, Tq=16, H=2, hd=8)
    mask = np.ones((2, 16), np.int32)
    mask[1, -6:] = 0
    g1, g2 = _grad_pair(q, k, v, mask, H=2, causal=False)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_gradients_cross(np_rng):
    """Tq != Tk: the 5-dot backward form."""
    q, k, v = _flat_qkv(np_rng, B=2, Tq=8, Tk=24, H=2, hd=8)
    mask = np.ones((2, 24), np.int32)
    mask[0, -9:] = 0
    g1, g2 = _grad_pair(q, k, v, mask, H=2, causal=False)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_under_remat(np_rng):
    """jax.checkpoint over the custom-VJP kernel (the cfg.remat scan path)
    must still produce the composite gradients."""
    q, k, v = _flat_qkv(np_rng, B=2, Tq=16, H=2, hd=8)
    mask = np.ones((2, 16), np.int32)
    mask[1, -5:] = 0

    @jax.checkpoint
    def fused(q, k, v):
        return train_attention_flat(q, k, v, jnp.asarray(mask), num_heads=2,
                                    causal=True, interpret=True)

    def loss_fused(q, k, v):
        return jnp.sum(fused(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_composite(q, k, v, mask, 2, causal=True) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_partitions_on_mesh(np_rng):
    """custom_partitioning: the kernel must split over DP and Megatron-TP
    shardings with ZERO all-gathers, gradients identical to single-device.
    TP cuts the feature dim on head boundaries -> per-shard local head
    count (exact head parallelism)."""
    import re

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    B, T, H, hd = 16, 16, 4, 8
    q, k, v = _flat_qkv(np_rng, B=B, Tq=T, H=H, hd=hd)
    mask = np.ones((B, T), np.int32)
    mask[5, -4:] = 0

    def f(q, k, v, m):
        out = train_attention_flat(q, k, v, m, num_heads=H, causal=True,
                                   interpret=True)
        return jnp.sum(out ** 2)

    g_single = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask))

    def check(mesh, qkv_spec, expect_zero_ag):
        data_q = NamedSharding(mesh, qkv_spec)
        data_m = NamedSharding(mesh, P("data", None))
        jf = jax.jit(jax.grad(f, argnums=(0, 1, 2)),
                     in_shardings=(data_q, data_q, data_q, data_m))
        g = jf(q, k, v, mask)
        for a, b in zip(g, g_single):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)
        if expect_zero_ag:
            txt = jf.lower(q, k, v, mask).compile().as_text()
            assert not re.search(r"all-gather", txt)

    dp = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    check(dp, P("data", None, None), expect_zero_ag=True)
    tp = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    check(tp, P("data", None, "model"), expect_zero_ag=True)


def test_grouped_grid_matches_composite(np_rng, monkeypatch):
    """KMBART_FUSED_ATTN_GROUP splits the head loop across a second grid
    axis (the BART-large layout candidate) — forward and gradients must
    match the composite path exactly like the single-program layout."""
    q, k, v = _flat_qkv(np_rng, B=2, Tq=16, H=4, hd=8)
    mask = np.ones((2, 16), np.int32)
    mask[1, -5:] = 0
    monkeypatch.setenv("KMBART_FUSED_ATTN_GROUP", "2")
    # fresh trace under the env flag: bypass any jit caching via direct call
    ref = _composite(q, k, v, mask, H=4, causal=True)
    out = train_attention_flat(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               jnp.asarray(mask), num_heads=4, causal=True,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
    g1, g2 = _grad_pair(q, k, v, mask, H=4, causal=True)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_gate():
    # CPU backend -> never selected (the suite keeps testing the XLA path)
    assert not train_attention_supported(16, 16, 64, 12, 0.0, True)
    if jax.default_backend() == "tpu":  # pragma: no cover - chip only
        assert train_attention_supported(16, 16, 64, 12, 0.0, True)
        # active attention-prob dropout -> composite path
        assert not train_attention_supported(16, 16, 64, 12, 0.1, True)
        # eval mode ignores the dropout rate
        assert train_attention_supported(16, 16, 64, 12, 0.1, False)
        # long sequences -> flash kernel territory
        assert not train_attention_supported(512, 512, 64, 12, 0.0, True)
        # causal requires square
        assert not train_attention_supported(16, 24, 64, 12, 0.0, True,
                                             causal=True)
        # >12 heads measured slower than the composite einsum (BART-large)
        assert not train_attention_supported(16, 16, 64, 16, 0.0, True)
