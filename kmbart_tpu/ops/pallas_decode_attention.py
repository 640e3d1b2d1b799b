"""Pallas fused self-attention step for incremental (beam) decoding.

Per decode step the XLA path moves the per-layer self K/V cache several
times: parent-reorder gather (read+write), dynamic-update-slice of the new
row (write), then the QK/AV reads — plus bf16->f32 convert copies
(profiled on v5e, see BASELINE.md). This kernel does the whole step in one
pass per batch row:

  gather(reorder_idx) -> insert new K/V at cache_index -> QK -> mask ->
  softmax -> AV -> (attention output, updated cache row)

reading each bf16 cache row exactly once and writing it exactly once. The
parent-reorder gather is free: the kernel's input index_map selects the
parent row via scalar prefetch, so no separate permuted copy ever
materialises.

Head handling: head_dim 64 is half a TPU lane register, so per-head dots
are expressed as two masked [D, H]-shaped MXU matmuls instead of reshapes:

  scores[t, h] = K[t, :] @ (q * head_mask)[:, h]      (QM: [D, H])
  out[d]       = sum_t (probs @ E)[t, d] * V[t, d]    (E:  [H, D] one-hot)

Everything stays in sublane x lane layouts Mosaic likes ([T, D], [D, H],
[T, H]); softmax reduces along sublanes (T <= 64 here, cheap).

NOT wired into decode_step: measured on v5e at the beam bench shapes
(B=160, T=32, D=768) the fused call is ~17% SLOWER than the XLA op
sequence (1126 vs 964 us standalone) — one grid program per batch row is
the only way to express the per-row parent gather with BlockSpec index
maps, and 160 sequential tiny programs pay more per-program overhead than
the one avoided cache pass is worth (the same grid-serialisation lesson as
ops/pallas_topk.py). Kept as a correct, tested building block: at larger
T (long-context decode) the per-program work grows linearly while the
overhead stays fixed, which is when this kernel should win.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9


def _kernel(idx_ref, cidx_ref, k_ref, v_ref, nk_ref, nv_ref, q_ref,
            out_ref, ck_ref, cv_ref, *, num_heads, head_dim):
    del idx_ref  # consumed by the index_map (scalar prefetch)
    T = k_ref.shape[1]
    D = num_heads * head_dim
    cache_index = cidx_ref[0]

    t_iota = jax.lax.broadcasted_iota(jnp.int32, (T, D), 0)
    is_new = t_iota == cache_index
    k = jnp.where(is_new, jnp.broadcast_to(nk_ref[0, 0], (T, D)),
                  k_ref[0].astype(jnp.float32))
    v = jnp.where(is_new, jnp.broadcast_to(nv_ref[0, 0], (T, D)),
                  v_ref[0].astype(jnp.float32))
    ck_ref[0] = k.astype(ck_ref.dtype)
    cv_ref[0] = v.astype(cv_ref.dtype)

    # QM[d, h] = q[d] where d belongs to head h, else 0
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (D, num_heads), 0)
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (D, num_heads), 1)
    head_of = d_iota // head_dim
    qm = jnp.where(head_of == h_iota, q_ref[0], 0.0)  # q_ref block [1,D,1]->[D,1]

    scores = jax.lax.dot(k.astype(jnp.bfloat16), qm.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)  # [T, H]
    th_iota = jax.lax.broadcasted_iota(jnp.int32, (T, num_heads), 0)
    scores = jnp.where(th_iota <= cache_index, scores, NEG_INF)
    m = jnp.max(scores, axis=0, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=0, keepdims=True)                # [T, H]

    # expand per-head probs back onto lanes: E[h, d] = 1 iff d in head h
    eh_iota = jax.lax.broadcasted_iota(jnp.int32, (num_heads, D), 0)
    ed_iota = jax.lax.broadcasted_iota(jnp.int32, (num_heads, D), 1)
    expand = jnp.where(eh_iota == ed_iota // head_dim, 1.0, 0.0)
    p_lanes = jax.lax.dot(probs.astype(jnp.bfloat16),
                          expand.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)    # [T, D]
    out_ref[0] = jnp.sum(p_lanes * v, axis=0, keepdims=True)


def beam_decode_self_attention(q, k_cache, v_cache, new_k, new_v,
                               cache_index, reorder_idx, *, num_heads,
                               interpret=False):
    """One fused incremental self-attention step.

    q:        [B, D] queries, already scaled by head_dim**-0.5
    k_cache:  [B, T, D] (bf16) cache BEFORE this step's write
    v_cache:  [B, T, D]
    new_k/new_v: [B, D] this step's K/V rows
    cache_index: scalar int32 write position (attends to <= cache_index)
    reorder_idx: [B] int32 beam parent row per output row
    Returns (out [B, D] f32, new_k_cache, new_v_cache [B, T, D]).
    """
    from jax.experimental.pallas import tpu as pltpu

    B, T, D = k_cache.shape
    grid = (B,)
    kernel = functools.partial(_kernel, num_heads=num_heads,
                               head_dim=D // num_heads)

    def parent(b, idx_ref, cidx_ref):
        del cidx_ref
        return (idx_ref[b], 0, 0)

    def own(b, idx_ref, cidx_ref):
        del idx_ref, cidx_ref
        return (b, 0, 0)

    def own3(b, idx_ref, cidx_ref):
        del idx_ref, cidx_ref
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, D), parent),   # k_cache (parent row)
            pl.BlockSpec((1, T, D), parent),   # v_cache (parent row)
            pl.BlockSpec((1, 1, D), own3),     # new_k
            pl.BlockSpec((1, 1, D), own3),     # new_v
            pl.BlockSpec((1, D, 1), own3),     # q as a column
        ],
        out_specs=[
            pl.BlockSpec((1, 1, D), own3),     # attention output
            pl.BlockSpec((1, T, D), own),      # updated k cache
            pl.BlockSpec((1, T, D), own),      # updated v cache
        ],
    )
    out, ck, cv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((B, T, D), k_cache.dtype),
            jax.ShapeDtypeStruct((B, T, D), v_cache.dtype),
        ],
        interpret=interpret,
    )(jnp.asarray(reorder_idx, jnp.int32),
      jnp.asarray(cache_index, jnp.int32).reshape(1),
      k_cache, v_cache,
      new_k.astype(jnp.float32)[:, None], new_v.astype(jnp.float32)[:, None],
      q.astype(jnp.float32)[:, :, None])
    return out[:, 0], ck, cv
