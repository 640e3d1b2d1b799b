"""Exact top-k for tiny k over huge rows (the beam-search candidate step).

On this TPU backend ``jax.lax.top_k`` over the beam candidate matrix
[B, num_beams * vocab] lowers to a full variadic sort — profiled at ~10 ms
per decode step (the single largest cost in beam search, xplane %sort.25).
``jax.lax.approx_max_k(recall_target=1.0)`` falls back to the same sort.
For k << N two exact alternatives, both bandwidth-bound:

  - *iterative argmax* (default): k passes of (argmax + mask) read k*N
    floats.
  - *chunk-max*: one pass computes per-chunk maxima, then k tiny iterations
    each pick the best chunk, resolve the position inside that one chunk,
    and update its cached maximum — ~1/k the HBM traffic.

Measured on v5e: with round 1's selection over the [B, beams*vocab] flat
normalised matrix the two were end-to-end equal (the top-k overlapped
async hypothesis copies). After round 2's raw-logit selection ([B*beams,
vocab] rows), chunk-max wins end-to-end at batch 32 (+4%) and 128 (+6%)
and ties at 64 — so chunk-max is now the default for huge rows, with the
iterative variant kept as the tested alternative.

Tie-breaking matches lax.top_k / torch.topk: the lowest index wins, and
results come out sorted descending (greedy picks are value-descending with
ascending-index ties because argmax returns the first maximum).
"""

import functools

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def exact_top_k(x, k, *, iterative_threshold=4096):
    """Drop-in for jax.lax.top_k(x, k) on 2-D inputs.

    Uses the chunk-max exact top-k when the row is much larger than k
    (N > iterative_threshold * k), otherwise defers to lax.top_k.
    """
    B, N = x.shape
    if N <= iterative_threshold * k:
        return jax.lax.top_k(x, k)
    return _chunk_max_top_k(x, k)


def _chunk_max_top_k(x, k, chunk=1024, unroll=True):
    """Exact top-k via cached per-chunk maxima.

    One full read builds cm[b, c] = max of chunk c; each of the k greedy
    steps then works on [B, C] / [B, chunk] tensors only:
      1. c* = argmax(cm)                     (lowest chunk wins ties)
      2. gather chunk c*, mask already-taken positions, argmax inside it
      3. record the (value, global index); refresh cm[b, c*]
    """
    B, N = x.shape
    C = -(-N // chunk)
    if C * chunk != N:
        x = jnp.pad(x, ((0, 0), (0, C * chunk - N)), constant_values=NEG_INF)
    xr = x.reshape(B, C, chunk)
    cm = jnp.max(xr, axis=-1)                          # [B, C] one full pass
    rows = jnp.arange(B)
    col = jnp.arange(chunk)

    def body(t, state):
        vals, idxs, cm, taken_c, taken_p = state
        c_star = jnp.argmax(cm, axis=1)                # [B]
        ch = xr[rows, c_star]                          # [B, chunk]
        # mask positions of this chunk already taken in earlier steps
        same_chunk = taken_c == c_star[:, None]        # [B, k]
        taken_mask = jnp.any(
            same_chunk[:, None, :] & (taken_p[:, None, :] == col[None, :, None]),
            axis=-1)                                   # [B, chunk]
        ch = jnp.where(taken_mask, NEG_INF, ch)
        p = jnp.argmax(ch, axis=1)                     # [B]
        v = jnp.take_along_axis(ch, p[:, None], axis=1)[:, 0]
        vals = vals.at[:, t].set(v)
        idxs = idxs.at[:, t].set((c_star * chunk + p).astype(jnp.int32))
        taken_c = taken_c.at[:, t].set(c_star.astype(jnp.int32))
        taken_p = taken_p.at[:, t].set(p.astype(jnp.int32))
        # refresh this chunk's cached max with the picked position removed
        ch = jnp.where(col[None, :] == p[:, None], NEG_INF, ch)
        cm = cm.at[rows, c_star].set(jnp.max(ch, axis=1))
        return vals, idxs, cm, taken_c, taken_p

    vals = jnp.zeros((B, k), x.dtype)
    idxs = jnp.zeros((B, k), jnp.int32)
    taken_c = jnp.full((B, k), -1, jnp.int32)
    taken_p = jnp.full((B, k), -1, jnp.int32)
    state = (vals, idxs, cm, taken_c, taken_p)
    if unroll:  # k is tiny; unrolling removes the fori_loop dispatch overhead
        for t in range(k):
            state = body(t, state)
    else:
        state = jax.lax.fori_loop(0, k, body, state)
    return state[0], state[1]


def pad_to_chunks(x, chunk=1024):
    """[B, N] -> [B, C, chunk] padded reshape (NEG_INF fill)."""
    B, N = x.shape
    C = -(-N // chunk)
    if C * chunk != N:
        x = jnp.pad(x, ((0, 0), (0, C * chunk - N)), constant_values=NEG_INF)
    return x.reshape(B, C, chunk)


def topk_from_chunk_stats(xr, cm, k, unroll=True):
    """Greedy exact top-k over a [B, C, chunk] view with the one full-read
    cm pass supplied by the caller (fused with the logsumexp stats in
    ops/pallas_vocab_stats.py — one pipelined pass instead of three).
    Same algorithm and tie-breaking as _chunk_max_top_k.

    A padless variant that gathered clamped tail windows with
    take_along_axis measured ~8x SLOWER end-to-end on v5e: computed-index
    gathers lower to scalar loads, while the [B, C, chunk] row gather is
    a fast vector path — the padded copy is the cheaper evil.
    """
    B, C, chunk = xr.shape
    rows = jnp.arange(B)
    col = jnp.arange(chunk)

    def body(t, state):
        vals, idxs, cm, taken_c, taken_p = state
        c_star = jnp.argmax(cm, axis=1)                # [B]
        ch = xr[rows, c_star]                          # [B, chunk]
        same_chunk = taken_c == c_star[:, None]        # [B, k]
        taken_mask = jnp.any(
            same_chunk[:, None, :] & (taken_p[:, None, :] == col[None, :, None]),
            axis=-1)                                   # [B, chunk]
        ch = jnp.where(taken_mask, NEG_INF, ch)
        p = jnp.argmax(ch, axis=1)
        v = jnp.take_along_axis(ch, p[:, None], axis=1)[:, 0]
        vals = vals.at[:, t].set(v)
        idxs = idxs.at[:, t].set((c_star * chunk + p).astype(jnp.int32))
        taken_c = taken_c.at[:, t].set(c_star.astype(jnp.int32))
        taken_p = taken_p.at[:, t].set(p.astype(jnp.int32))
        ch = jnp.where(col[None, :] == p[:, None], NEG_INF, ch)
        cm = cm.at[rows, c_star].set(jnp.max(ch, axis=1))
        return vals, idxs, cm, taken_c, taken_p

    vals = jnp.zeros((B, k), xr.dtype)
    idxs = jnp.zeros((B, k), jnp.int32)
    taken_c = jnp.full((B, k), -1, jnp.int32)
    taken_p = jnp.full((B, k), -1, jnp.int32)
    state = (vals, idxs, cm, taken_c, taken_p)
    if unroll:
        for t in range(k):
            state = body(t, state)
    else:
        state = jax.lax.fori_loop(0, k, body, state)
    return state[0], state[1]


def _iterative_top_k(x, k):
    """k passes of (argmax + mask); the default for huge rows."""
    B, N = x.shape
    rows = jnp.arange(B)

    def body(i, state):
        vals, idxs, cur = state
        idx = jnp.argmax(cur, axis=1)
        val = jnp.take_along_axis(cur, idx[:, None], axis=1)[:, 0]
        vals = vals.at[:, i].set(val)
        idxs = idxs.at[:, i].set(idx.astype(jnp.int32))
        cur = cur.at[rows, idx].set(NEG_INF)
        return vals, idxs, cur

    vals = jnp.zeros((B, k), x.dtype)
    idxs = jnp.zeros((B, k), jnp.int32)
    vals, idxs, _ = jax.lax.fori_loop(0, k, body, (vals, idxs, x))
    return vals, idxs
