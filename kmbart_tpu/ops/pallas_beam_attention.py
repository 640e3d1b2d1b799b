"""Beam-stationary decode self-attention (Pallas TPU kernel + XLA reference).

The classic jitted beam search physically permutes the per-layer self K/V
cache every step so row b always holds beam b's history (HF 3.0.2 does the
same via ``_reorder_cache``, src/model/mixins.py:419-434 in the reference).
On TPU that permutation is the single largest decode cost: a full
read+write of every cache layer per step, plus the while-loop layout
copies it induces (round-2 v5e xplane profile: ~22 ms of a 166 ms beam-5
generate at batch 64).

This module removes the permutation entirely:

  * the cache is **beam-stationary** — K/V rows are written once into the
    writer beam's own slot and never moved;
  * a tiny ``ancestry`` matrix (int32 [B*K, T]) tracks, for each live beam
    and past position, which beam slot of the same sample holds that
    position's K/V (maintained by permuting ancestry rows — ~40 KB —
    instead of the multi-MB cache);
  * attention gathers the right rows **inside the kernel**: all K_slot x T
    scores of a sample are computed against all K_query beams (25x32 dots
    per sample — trivial MXU work) and a precomputed one-hot ``sel`` mask
    keeps exactly the (slot == ancestry[q, t]) & (t <= cache_index)
    entries before the softmax. Per layer-step, HBM sees one pipelined
    read of each cache tile, one row write, and zero permute passes.

Measured-not-kept variants (v5e, beam-5 bench, batch 64 — both LOST to
this design and were removed):
  * input-output-aliased HBM cache with in-kernel DMA persistence
    (407 sent/s vs 446): manual DMA forfeits Mosaic's cross-program
    BlockSpec prefetch pipeline, and XLA still copies the while-carry to
    satisfy donation;
  * page-split carry ([B, K, 8, D] buffers, lax.switch row writes,
    415-427 sent/s): switch branches copy every page they pass through,
    re-paying the copy the split was meant to avoid.
The remaining cost of THIS design is one full-buffer copy per cache
dus (XLA's while-loop carry never aliases dynamic_update_slice on these
multi-MB buffers — measured 60-100 us/iteration of pure copy) — but
that is one pass, not the two of permute+write, and everything else
pipelines.

Head handling (head_dim 64 = half a lane register): per-(query-beam,
head) scores live on lanes as a [K*T, Kq*H] matrix produced by ONE
[K*T, D] @ [D, Kq*H] MXU matmul against a head-masked query matrix; the
AV product contracts the [K*T] axis back against the V tile, and a
one-hot group matrix folds the (q, h) rows back to flat [Kq, D] heads.

The XLA reference implementation (``beam_gather_attention_reference``)
computes the identical math with plain einsums — it is the CPU/test path
and the parity oracle for the kernel.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9


# ---------------------------------------------------------------------------
# selection mask
# ---------------------------------------------------------------------------

def build_selection_mask(ancestry, num_beams, cache_index, num_heads):
    """One-hot ancestor-selection mask for the kernel.

    ancestry: [B*K, T] int32 — slot j of the same sample holding position
    t's K/V for this query beam; entries at t > cache_index are ignored.
    Returns sel bf16 [B, K*T, K*H]: sel[b, j*T+t, q*H+h] = 1 iff
    ancestry[b*K+q, t] == j and t <= cache_index (independent of h).
    """
    BK, T = ancestry.shape
    K = num_beams
    B = BK // K
    anc = ancestry.reshape(B, K, T)                      # [B, q, t]
    j = jnp.arange(K, dtype=ancestry.dtype)
    # [B, j, t, q]
    sel = anc.transpose(0, 2, 1)[:, None, :, :] == j[None, :, None, None]
    t_ok = jnp.arange(T) <= cache_index
    sel = sel & t_ok[None, None, :, None]
    sel = sel.reshape(B, K * T, K, 1)
    sel = jnp.broadcast_to(sel, (B, K * T, K, num_heads))
    return sel.reshape(B, K * T, K * num_heads).astype(jnp.bfloat16)


def build_selection_mask_ring(ancestry, num_beams, ring_col, valid_counts,
                              num_heads):
    """Selection mask for a RING-buffer cache (continuous-batching pool).

    Every slot writes its step K/V at the same cache column
    ``ring_col = tick % T`` regardless of its own decode depth, so a
    sample's valid columns are the cyclic window of ``valid_counts[b]``
    columns ending at ring_col (self-attention doesn't care where keys
    physically sit — the one-hot mask selects them; column order never
    enters the math). ancestry entries outside the window are stale and
    masked off. ``valid_counts`` counts positions INCLUDING this step's
    write (== cur_len during the step).
    """
    BK, T = ancestry.shape
    K = num_beams
    B = BK // K
    anc = ancestry.reshape(B, K, T)
    j = jnp.arange(K, dtype=ancestry.dtype)
    sel = anc.transpose(0, 2, 1)[:, None, :, :] == j[None, :, None, None]
    age = jnp.mod(ring_col - jnp.arange(T), T)              # [T]
    t_ok = age[None, :] < valid_counts[:, None]             # [B, T]
    sel = sel & t_ok[:, None, :, None]
    sel = sel.reshape(B, K * T, K, 1)
    sel = jnp.broadcast_to(sel, (B, K * T, K, num_heads))
    return sel.reshape(B, K * T, K * num_heads).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# XLA reference (CPU path + oracle)
# ---------------------------------------------------------------------------

def beam_gather_attention_reference(q, k_cache, v_cache, sel, *, num_beams,
                                    num_heads):
    """Reference: same math as the kernel, plain XLA.

    q:        [B*K, D] queries, already scaled by head_dim**-0.5
    k_cache:  [B, K, T, D] beam-stationary cache (flat heads)
    v_cache:  [B, K, T, D]
    sel:      [B, K*T, K*H] bf16 one-hot from build_selection_mask
    Returns [B*K, D] f32 attention output (flat heads, pre-o-projection).
    """
    B, K, T, D = k_cache.shape
    H = num_heads
    hd = D // H

    qh = q.reshape(B, K, H, hd).astype(jnp.bfloat16)
    kh = k_cache.reshape(B, K, T, H, hd).astype(jnp.bfloat16)
    vh = v_cache.reshape(B, K, T, H, hd).astype(jnp.bfloat16)

    # all (query beam, slot) score pairs: [B, q, H, j, T]
    s_all = jnp.einsum("bqhd,bjthd->bqhjt", qh, kh,
                       preferred_element_type=jnp.float32)
    sel_q = sel.reshape(B, K, T, K, H)                 # [B, j, t, q, h]
    sel_q = sel_q.transpose(0, 3, 4, 1, 2)             # [B, q, h, j, t]
    scores = jnp.where(sel_q > 0, s_all, NEG_INF)
    flat = scores.reshape(B, K, H, K * T)
    probs = jax.nn.softmax(flat, axis=-1).reshape(B, K, H, K, T)
    out = jnp.einsum("bqhjt,bjthd->bqhd", probs.astype(jnp.bfloat16), vh,
                     preferred_element_type=jnp.float32)
    return out.reshape(B * K, D)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _attend(k, v, q, sel, *, num_beams, num_heads):
    """Shared attention math (see module docstring for the head trick).

    k, v: [K*T, D] bf16; q: [K, D]; sel: [K*T, K*H] bf16 one-hot;
    returns [K, D] f32.
    """
    K = num_beams
    H = num_heads
    D = k.shape[-1]
    hd = D // H
    q = q.astype(jnp.float32)

    # QM[d, q*H+h] = q[q, d] masked to head h's lanes, built transpose-free
    # with a one-hot replication matmul
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (D, K * H), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (D, K * H), 1)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (K, K * H), 0)
    oh = (r_iota == jax.lax.broadcasted_iota(jnp.int32, (K, K * H), 1) // H)
    qm = jax.lax.dot_general(
        q.astype(jnp.bfloat16), oh.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qm = jnp.where(d_iota // hd == c_iota % H, qm, 0.0)

    scores = jax.lax.dot(k, qm.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)  # [K*T, K*H]
    # arithmetic mask (Mosaic has no bf16 vector compare): sel is one-hot
    # {0, 1}, so sel==0 lanes get NEG_INF added
    sel_f = sel.astype(jnp.float32)
    scores = scores * sel_f + (sel_f - 1.0) * (-NEG_INF)

    m = jnp.max(scores, axis=0, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=0, keepdims=True)             # [K*T, K*H]

    # AV: contract the K*T axis -> [K*H, D], rows (q, h)
    av = jax.lax.dot_general(
        probs.astype(jnp.bfloat16), v,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [K*H, D]
    # keep head h's lane slice only, then fold the H rows of each q
    rh_iota = jax.lax.broadcasted_iota(jnp.int32, (K * H, D), 0)
    rd_iota = jax.lax.broadcasted_iota(jnp.int32, (K * H, D), 1)
    av = jnp.where(rh_iota % H == rd_iota // hd, av, 0.0)
    g_row = jax.lax.broadcasted_iota(jnp.int32, (K, K * H), 0)
    g_col = jax.lax.broadcasted_iota(jnp.int32, (K, K * H), 1)
    group = (g_col // H == g_row)
    return jax.lax.dot(group.astype(jnp.bfloat16),
                       av.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)  # [K, D]


def _kernel(k_ref, v_ref, q_ref, sel_ref, out_ref, *, num_beams, num_heads):
    K = num_beams
    S, _, T, D = k_ref.shape
    for s in range(S):  # static unroll over the samples of this block
        out_ref[s] = _attend(
            k_ref[s].reshape(K * T, D), v_ref[s].reshape(K * T, D),
            q_ref[s], sel_ref[s], num_beams=K, num_heads=num_heads)


def beam_gather_attention(q, k_cache, v_cache, sel, *, num_beams, num_heads,
                          samples_per_block=1, interpret=False):
    """Fused beam-stationary decode self-attention.

    q: [B*K, D] scaled queries; k_cache/v_cache: [B, K, T, D] bf16 (rows
    never permuted — position cache_index must already hold this step's
    K/V); sel: [B, K*T, K*H] from build_selection_mask.
    ``samples_per_block`` amortises per-program overhead over S samples
    (must divide B). Returns [B*K, D] f32.
    """
    B, K, T, D = k_cache.shape
    assert K == num_beams
    S = samples_per_block if B % samples_per_block == 0 else 1
    kernel = functools.partial(_kernel, num_beams=K, num_heads=num_heads)

    out = pl.pallas_call(
        kernel,
        grid=(B // S,),
        in_specs=[
            pl.BlockSpec((S, K, T, D), lambda b: (b, 0, 0, 0)),  # k tile
            pl.BlockSpec((S, K, T, D), lambda b: (b, 0, 0, 0)),  # v tile
            pl.BlockSpec((S, K, D), lambda b: (b, 0, 0)),        # q
            pl.BlockSpec((S, K * T, K * num_heads), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((S, K, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, K, D), jnp.float32),
        interpret=interpret,
    )(k_cache, v_cache, q.reshape(B, K, D), sel)
    return out.reshape(B * K, D)


def beam_attention_supported(num_beams, num_heads, head_dim, max_len):
    """Kernel engages on TPU for tile-able shapes (the XLA reference covers
    everything else, including CPU tests)."""
    if jax.default_backend() != "tpu":
        return False
    if head_dim % 8 != 0:
        return False
    return num_beams * max_len >= 8  # degenerate-tile guard
