"""Pallas flash attention for TPU (the encoder/decoder training hot path).

Online-softmax blockwise attention: each grid program owns one
(batch*head, q-block) tile, streams K/V blocks through VMEM with a running
(max, denominator, accumulator) triple, and never materialises the
[Tq, Tk] score matrix in HBM. For this model family's sequence lengths the
win is fusion (one kernel instead of 4 HBM round trips); the same kernel
scales to long-context configs (SURVEY.md §5) because K streams in blocks.

Falls back to the XLA composite in ops/attention.py off-TPU or when
attention dropout is active (the reference's configs keep it 0.0:
config/pretrain_base.json attention_dropout).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, block_k,
                  block_q, causal):
    q = q_ref[0].astype(jnp.float32) * scale          # [bq, hd]
    Tk = k_ref.shape[1]
    bq, hd = q.shape
    nkb = Tk // block_k
    qb = pl.program_id(1)

    def body(kb, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        b = bias_ref[0, 0, pl.ds(kb * block_k, block_k)].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + b[None, :]
        if causal:
            q_pos = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 0)
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1)
            scores = jnp.where(k_pos <= q_pos, scores, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(scores, axis=1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m - m_new)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        return acc, m_new, l

    acc = jnp.zeros((bq, hd), jnp.float32)
    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nkb, body, (acc, m, l))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_attention(q, k, v, key_bias, *, block_q=128, block_k=128,
                    causal=False, interpret=False):
    """q [BH, Tq, hd]; k/v [BH, Tk, hd]; key_bias [BH, Tk] additive fp32
    (0 keep / NEG_INF mask). ``causal``: query i attends keys <= i
    (requires Tq == Tk). Returns [BH, Tq, hd] fp32."""
    BH, Tq, hd = q.shape
    Tk = k.shape[1]
    block_q = min(block_q, Tq)
    block_k = min(block_k, Tk)
    assert Tq % block_q == 0 and Tk % block_k == 0
    if causal:
        assert Tq == Tk

    kernel = functools.partial(_flash_kernel, scale=hd ** -0.5,
                               block_k=block_k, block_q=block_q,
                               causal=causal)
    key_bias = key_bias.reshape(BH, 1, Tk)  # TPU tiling: block == full dims
    return pl.pallas_call(
        kernel,
        grid=(BH, Tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, Tk, hd), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, Tk, hd), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, Tk), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Tq, hd), jnp.float32),
        interpret=interpret,
    )(q, k, v, key_bias)


def _reference_attention_bh(q, k, v, key_bias, causal):
    """Pure-XLA math identical to the kernel (fp32), used for the backward
    pass: differentiating through the Pallas fori-loop is unsupported, and
    this is exactly the standard attention VJP XLA would build anyway."""
    hd = q.shape[-1]
    q32 = q.astype(jnp.float32) * (hd ** -0.5)
    scores = jnp.einsum("bqd,bkd->bqk", q32, k.astype(jnp.float32)) \
        + key_bias[:, None, :].astype(jnp.float32)
    if causal:
        Tq, Tk = scores.shape[1], scores.shape[2]
        q_pos = jnp.arange(Tq)[:, None]
        k_pos = jnp.arange(Tk)[None, :]
        scores = jnp.where((k_pos <= q_pos)[None], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32))


@functools.lru_cache(maxsize=None)
def _flash_with_vjp(causal, interpret):
    @jax.custom_vjp
    def f(q, k, v, key_bias):
        return flash_attention(q, k, v, key_bias, causal=causal,
                               interpret=interpret)

    def fwd(q, k, v, key_bias):
        return flash_attention(q, k, v, key_bias, causal=causal,
                               interpret=interpret), (q, k, v, key_bias)

    def bwd(res, g):
        q, k, v, key_bias = res
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _reference_attention_bh(q_, k_, v_, key_bias,
                                                       causal), q, k, v)
        dq, dk, dv = vjp(g.astype(jnp.float32))
        return dq, dk, dv, jnp.zeros_like(key_bias)

    f.defvjp(fwd, bwd)
    return f


def flash_self_attention(q, k, v, attention_mask=None, *, causal=False,
                         interpret=False, dtype=jnp.bfloat16):
    """Drop-in for the core in ops/attention.py:
    q/k/v [B, T, H, hd], attention_mask [B, Tk] (1 keep / 0 pad),
    optional causal masking -> [B, Tq, H, hd] fp32. Differentiable (custom
    VJP: Pallas forward, XLA-math backward)."""
    B, Tq, H, hd = q.shape
    Tk = k.shape[1]

    def to_bh(x):
        return x.astype(dtype).transpose(0, 2, 1, 3).reshape(B * H, -1, hd)

    if attention_mask is None:
        key_bias = jnp.zeros((B, Tk), jnp.float32)
    else:
        key_bias = jnp.where(attention_mask.astype(bool), 0.0, NEG_INF
                             ).astype(jnp.float32)
    key_bias = jnp.repeat(key_bias, H, axis=0)

    fn = _flash_with_vjp(bool(causal), bool(interpret))
    out = fn(to_bh(q), to_bh(k), to_bh(v), key_bias)
    return out.reshape(B, H, Tq, hd).transpose(0, 2, 1, 3)


def flash_supported(q_len, k_len, head_dim, attention_dropout, train,
                    bias_is_key_only, causal=False):
    """Whether the fused kernel applies (TPU backend, no attn dropout,
    tile-able shapes, key-padding-only (+optional causal) masking)."""
    if jax.default_backend() != "tpu":
        return False
    if train and attention_dropout > 0.0:
        return False
    if not bias_is_key_only:
        return False
    if causal and q_len != k_len:
        return False
    # Size gate: at short sequence lengths the [*, Tq, Tk] score tensor is
    # small enough that XLA's batched-matmul attention beats the kernel's
    # grid/launch overhead — round-2 v5e A/B on the training workload
    # (enc 72 / dec 40, batch 128) measured the kernel 6 ms/step SLOWER.
    # Only engage where score materialisation dominates.
    if q_len * k_len < 128 * 128:
        return False
    return q_len % 8 == 0 and k_len % 8 == 0 and head_dim % 8 == 0
