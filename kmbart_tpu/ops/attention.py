"""Multi-head attention for the BART encoder/decoder.

Parity target: HF 3.0.2 ``SelfAttention`` (imported by the reference at
src/model/modules.py:8-14 / src/model/model.py:8-15): queries scaled by
1/sqrt(head_dim) before the QK product, additive -inf masking, softmax in
fp32, attention-prob dropout, then the output projection.

TPU design: projections and the QK/PV matmuls run in bf16 with fp32
accumulation so they tile onto the MXU; the softmax stays fp32. For the
short sequences of this model family (<=128 enc, <=48 dec) a single fused
XLA attention is already HBM-friendly; a Pallas flash-attention kernel for
long-sequence configs lives in ops/pallas_attention.py and is selected by
``kmbart_tpu.ops.flash`` when shapes warrant it.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from kmbart_tpu.ops.layers import dense, dropout

NEG_INF = -1e9


def split_heads(x, num_heads):
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads)


def merge_heads(x):
    b, t, h, hd = x.shape
    return x.reshape(b, t, h * hd)


def attention_core(q, k, v, bias=None, *, dropout_rate=0.0, rng=None,
                   train=False, dtype=jnp.bfloat16):
    """Scaled dot-product attention.

    q: [B, Tq, H, hd]; k, v: [B, Tk, H, hd]; bias: additive fp32
    broadcastable to [B, H, Tq, Tk] (0 for attend, NEG_INF for mask).
    Softmax statistics in fp32; returns [B, Tq, H, hd] in ``dtype``.
    """
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    q = (q * scale).astype(dtype)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k.astype(dtype),
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    probs = dropout(probs, dropout_rate, rng, train)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v.astype(dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def multi_head_attention(
    params: dict,
    hidden: jnp.ndarray,
    kv_hidden: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    *,
    num_heads: int,
    dropout_rate: float = 0.0,
    rng=None,
    train: bool = False,
    dtype=jnp.bfloat16,
    cache: Optional[dict] = None,
    cache_index=None,
    cache_reorder_idx=None,
    key_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
):
    """Full attention block: QKV projections, core, output projection.

    params: {"q_kernel","q_bias","k_kernel","k_bias","v_kernel","v_bias",
             "o_kernel","o_bias"} with kernels [D, D].
    kv_hidden: source of K/V (encoder states for cross-attention); defaults
               to ``hidden`` (self-attention).
    cache: decode-time KV cache dict {"k": [B, Tmax, D], "v": ...} — K/V are
           stored *flat* (pre-head-split): [T, D] tiles perfectly on TPU
           (D = H*hd is a multiple of 128) and the head split is a free
           reshape at read time. With ``cache_index`` the new K/V rows are
           written at that position and attention runs over the whole
           static buffer (the caller's bias must mask positions >
           cache_index). For cross-attention pass a cache with precomputed
           flat k/v and ``cache_index=None`` to reuse them without
           projection.
    Returns (output [B, Tq, D] fp32, updated cache or None).
    """
    src = hidden if kv_hidden is None else kv_hidden
    cross_cached = cache is not None and cache_index is None

    if kv_hidden is None and not cross_cached:
        # pure self-attention: one fused QKV matmul instead of three. The
        # kernel/bias concats are loop-invariant, so XLA hoists them out of
        # decode/scan loops; at decode's tiny per-step matmul sizes this
        # trades 3 dispatch-bound MXU ops for 1.
        qkv_kernel = jnp.concatenate(
            [params["q_kernel"], params["k_kernel"], params["v_kernel"]], axis=1)
        qkv_bias = jnp.concatenate(
            [params["q_bias"], params["k_bias"], params["v_bias"]])
        q_flat, k_flat, v_flat = jnp.split(
            dense(hidden, qkv_kernel, qkv_bias, dtype), 3, axis=-1)
    else:
        q_flat = dense(hidden, params["q_kernel"], params["q_bias"], dtype)
        k_flat = v_flat = None

    if (bias is None and cache is None and not cross_cached
            and (key_mask is not None or causal)):
        # training/no-cache fast path: fused Pallas attention straight on
        # the FLAT projections (skips the head-split retile entirely; the
        # round-4 profile measured the composite chain ~10.5 ms of a 62 ms
        # batch-128 train step with only ~0.5 ms of matmul in it)
        from kmbart_tpu.ops.pallas_train_attention import (
            train_attention_flat, train_attention_supported)
        if train_attention_supported(
                hidden.shape[1], src.shape[1],
                hidden.shape[-1] // num_heads, num_heads,
                dropout_rate, train, causal=causal):
            if k_flat is None:
                k_flat = dense(src, params["k_kernel"], params["k_bias"], dtype)
                v_flat = dense(src, params["v_kernel"], params["v_bias"], dtype)
            out = train_attention_flat(
                q_flat.astype(dtype), k_flat.astype(dtype),
                v_flat.astype(dtype), key_mask, num_heads=num_heads,
                causal=causal)
            out = dense(out, params["o_kernel"], params["o_bias"], dtype)
            return out, None

    q = split_heads(q_flat, num_heads)

    if cross_cached:
        # cross-attention decode path: K/V precomputed once from encoder
        # output. The cache batch may be a *divisor* of the query batch
        # (beam search: all K beams of a sample attend the same encoder
        # states) — fold the beam group into the query length instead of
        # streaming K duplicate copies of K/V from HBM every step.
        k, v = split_heads(cache["k"], num_heads), split_heads(cache["v"], num_heads)
        new_cache = cache
        group = q.shape[0] // k.shape[0]
        if group > 1:
            bq, tq, nh, hd = q.shape
            assert tq == 1, "grouped cross-attention requires Tq == 1"
            q = q.reshape(bq // group, group, nh, hd)
            out = attention_core(q, k, v, bias, dropout_rate=dropout_rate,
                                 rng=rng, train=train, dtype=dtype)
            out = out.reshape(bq, 1, nh, hd)
            out = dense(merge_heads(out), params["o_kernel"],
                        params["o_bias"], dtype)
            return out, new_cache
    else:
        if k_flat is None:
            k_flat = dense(src, params["k_kernel"], params["k_bias"], dtype)
            v_flat = dense(src, params["v_kernel"], params["v_bias"], dtype)
        if cache is not None:
            if cache_reorder_idx is not None:
                # beam decode: fuse the parent-permutation gather and the
                # new-row write into ONE elementwise select over the gather
                # (a separate dynamic-update-slice after the gather costs a
                # second full-cache pass per layer per step — profiled on
                # v5e as ~10% of the beam step)
                pos = jnp.arange(cache["k"].shape[1])[None, :, None]
                at_cur = pos == cache_index
                k_flat = jnp.where(
                    at_cur, k_flat.astype(cache["k"].dtype),
                    jnp.take(cache["k"], cache_reorder_idx, axis=0))
                v_flat = jnp.where(
                    at_cur, v_flat.astype(cache["v"].dtype),
                    jnp.take(cache["v"], cache_reorder_idx, axis=0))
            else:
                # incremental self-attention: write new rows at cache_index
                k_flat = jax.lax.dynamic_update_slice(
                    cache["k"], k_flat.astype(cache["k"].dtype),
                    (0, cache_index, 0))
                v_flat = jax.lax.dynamic_update_slice(
                    cache["v"], v_flat.astype(cache["v"].dtype),
                    (0, cache_index, 0))
            new_cache = {"k": k_flat, "v": v_flat}
        else:
            new_cache = None
        k = split_heads(k_flat, num_heads)
        v = split_heads(v_flat, num_heads)

    if bias is None and (key_mask is not None or causal):
        # key-padding (+ optional causal) masking: eligible for the fused
        # Pallas kernel
        from kmbart_tpu.ops.pallas_attention import (
            flash_self_attention, flash_supported)
        if flash_supported(q.shape[1], k.shape[1], q.shape[-1],
                           dropout_rate, train, True, causal=causal):
            out = flash_self_attention(q, k, v, key_mask, causal=causal,
                                       dtype=dtype)
            out = dense(merge_heads(out), params["o_kernel"],
                        params["o_bias"], dtype)
            return out, new_cache
        bias = 0.0 if key_mask is None else padding_bias(key_mask)
        if causal:
            bias = bias + causal_bias(q.shape[1], k.shape[1])

    out = attention_core(q, k, v, bias, dropout_rate=dropout_rate, rng=rng,
                         train=train, dtype=dtype)
    out = dense(merge_heads(out), params["o_kernel"], params["o_bias"], dtype)
    return out, new_cache


def padding_bias(attention_mask, dtype=jnp.float32):
    """[B, Tk] 1/0 mask -> additive [B, 1, 1, Tk] bias."""
    return jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF).astype(dtype)


def causal_bias(q_len, k_len, offset=0, dtype=jnp.float32):
    """Additive [1, 1, Tq, Tk] causal bias; query i attends keys <= i+offset."""
    q_pos = jnp.arange(q_len)[:, None] + offset
    k_pos = jnp.arange(k_len)[None, :]
    allowed = k_pos <= q_pos
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)[None, None]
