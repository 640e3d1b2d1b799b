"""Single-pass row softmax statistics (max, sum-exp) as a Pallas kernel.

The CE loss over KM-BART's 50320-token vocabulary reads the [B, T, V]
logits (515 MB bf16 at batch 128) once per reduction: the round-4 xplane
profile shows XLA emitting the forward max/sum-exp as 12 two-level
``convert_reduce`` fusions costing ~4.7 ms of the 62 ms train step —
~7x the 0.63 ms single-read bandwidth floor of the tensor. This kernel
computes BOTH statistics in ONE streamed pass: grid over batch, each
program holds one [T, V] row-block in VMEM, online-logsumexp over vocab
chunks in fp32. The label gather and the closed-form backward
(softmax - onehot, fused by XLA into the two vocab matmuls it feeds) stay
in heads.py — only the forward reductions move here.

Parity: identical statistics to max/sum(exp(x - max)) in fp32 (heads.py
``_masked_nll_sum_fwd``); reference loss semantics src/model/model.py:276.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _stats_kernel(x_ref, m_ref, se_ref, *, chunk):
    t, v = x_ref.shape[1], x_ref.shape[2]
    n_chunks = -(-v // chunk)
    m = jnp.full((1, t), -jnp.inf, jnp.float32)
    se = jnp.zeros((1, t), jnp.float32)
    for c in range(n_chunks):
        lo = c * chunk
        hi = min(v, lo + chunk)
        lf = x_ref[0, :, lo:hi].astype(jnp.float32)          # [T, chunk]
        cm = jnp.max(lf, axis=-1)[None, :]                   # [1, T]
        cs = jnp.sum(jnp.exp(lf - cm.reshape(t, 1)), axis=-1)[None, :]
        m_new = jnp.maximum(m, cm)
        se = se * jnp.exp(m - m_new) + cs * jnp.exp(cm - m_new)
        m = m_new
    m_ref[0] = m
    se_ref[0] = se


def row_softmax_stats(x, *, vocab_chunks=8, interpret=False):
    """x [B, T, V] (any float dtype) -> (m [B, T] f32, se [B, T] f32) with
    m = rowmax and se = sum(exp(x - m)), reductions in fp32."""
    B, T, V = x.shape
    # chunk starts stay 128-lane aligned; the tail chunk absorbs V % 128
    chunk = max(128, (V // vocab_chunks) // 128 * 128)
    kernel = functools.partial(_stats_kernel, chunk=chunk)
    m, se = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, V), lambda i: (i, 0, 0))],
        out_specs=[pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0)),
                   pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, 1, T), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, T), jnp.float32)],
        interpret=interpret,
    )(x)
    return m.reshape(B, T), se.reshape(B, T)


def row_softmax_stats_supported(x_shape):
    """TPU backend, 3-D [B, T, V], rows tile-able, and a row block that
    fits VMEM comfortably (T*V bf16 <= ~8 MB)."""
    if jax.default_backend() != "tpu":
        return False
    if len(x_shape) != 3:
        return False
    B, T, V = x_shape
    return T % 8 == 0 and V >= 1024 and T * V * 2 <= 8 * 1024 * 1024
