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
    Same tie-breaking as _chunk_max_top_k / lax.top_k.

    Taken-position masking rides an order invariant instead of a taken
    list: picks from any single chunk occur in (value desc, index asc)
    order, so the taken set of a chunk is exactly {val > untaken-max}
    union {val == last_v and pos <= last_p} for that chunk's LAST pick —
    the untaken max is the cm row max (free), and the last-pick record
    lives in two tiny [B, C] arrays read/written via one-hot selects so
    nothing lowers to a computed-index gather/scatter. This replaces the
    O(chunk * k) compare-vs-all-picks of the round-1..3 variant (at the
    sampling path's k=50 that was ~25M bool ops per iteration). Round-4
    A/B on v5e: beam-5 sampling at batch 96 went 337 -> 424-434 sent/s
    (+28%), greedy-beam at 112/160 +4-6% (BASELINE.md round-4). A variant
    keeping the record via [B, C] gather/scatter ops measured WORSE than
    the O(chunk * k) original (264 vs 337) — per-iteration DMA latency
    dominates this loop, not VPU compute.

    A padless variant that gathered clamped tail windows with
    take_along_axis measured ~8x SLOWER end-to-end on v5e: computed-index
    gathers lower to scalar loads, while the [B, C, chunk] row gather is
    a fast vector path — the padded copy is the cheaper evil.
    """
    B, C, chunk = xr.shape
    rows = jnp.arange(B)
    col = jnp.arange(chunk)

    def body(t, state):
        vals, idxs, cm, last_v, last_p = state
        c_star = jnp.argmax(cm, axis=1)                # [B]
        ch = xr[rows, c_star]                          # [B, chunk]
        # the selected chunk's untaken max IS the cm max (free, no gather);
        # its last-pick record is one-hot-selected from the tiny [B, C]
        # state so nothing here lowers to a computed-index gather/scatter
        # (measured: two [B, C] gathers + scatters per iteration cost more
        # DMA latency than the whole O(chunk * k) compare they replaced)
        hot = c_star[:, None] == jnp.arange(C)[None, :]  # [B, C]
        cmv = jnp.max(cm, axis=1)[:, None]             # [B, 1]
        lv = jnp.max(jnp.where(hot, last_v, NEG_INF), axis=1)[:, None]
        lp = jnp.max(jnp.where(hot, last_p, -1), axis=1)[:, None]
        taken = (ch > cmv) | ((ch == lv) & (col[None, :] <= lp))
        ch = jnp.where(taken, NEG_INF, ch)
        p = jnp.argmax(ch, axis=1)
        v = jnp.take_along_axis(ch, p[:, None], axis=1)[:, 0]
        vals = vals.at[:, t].set(v)
        idxs = idxs.at[:, t].set((c_star * chunk + p).astype(jnp.int32))
        last_v = jnp.where(hot, v[:, None], last_v)
        last_p = jnp.where(hot, p[:, None].astype(jnp.int32), last_p)
        ch = jnp.where(col[None, :] == p[:, None], NEG_INF, ch)
        cm = jnp.where(hot, jnp.max(ch, axis=1)[:, None], cm)
        return vals, idxs, cm, last_v, last_p

    vals = jnp.zeros((B, k), xr.dtype)
    idxs = jnp.zeros((B, k), jnp.int32)
    last_v = jnp.full((B, C), jnp.inf, xr.dtype)       # nothing taken yet
    last_p = jnp.full((B, C), -1, jnp.int32)
    state = (vals, idxs, cm, last_v, last_p)
    if unroll:
        for t in range(k):
            state = body(t, state)
    else:
        state = jax.lax.fori_loop(0, k, body, state)
    return state[0], state[1]


def _float_key(x):
    """Monotone f32 -> uint32 mapping (IEEE-754 total order trick):
    positive floats keep their bit pattern with the sign bit set; negative
    floats are bit-inverted. key(a) < key(b) <=> a < b (no NaNs)."""
    ku = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jnp.where(ku >> 31 == 1, ~ku, ku | jnp.uint32(0x80000000))


def _key_to_float(key):
    ku = jnp.where(key >> 31 == 1, key & jnp.uint32(0x7FFFFFFF), ~key)
    return jax.lax.bitcast_convert_type(ku, jnp.float32)


def radix_top_k(xr, k, sort=True, bits=2, unroll=True):
    """Exact top-k via MSB-down radix select + one-pass rank compaction.

    The greedy chunk-max extraction (topk_from_chunk_stats) runs k
    sequential tiny steps — fine for k<=10 beam candidates, but the
    sampling path needs k=50 per row per decode step, where 50 dependent
    dispatches dominate. This variant's cost is a fixed 32/bits fused
    counting passes over the row (``bits`` bits of the kth value's float
    key per round), one survivor-rank pass, and a [B, k, chunk] gather —
    independent of k.

    Each round refines theta_key greedily by absolute count: d* is the
    largest digit d with #(key >= (prefix|d) << shift) >= k, which is
    exactly the radix prefix of the kth largest key — no remaining-k
    bookkeeping needed. ``bits`` trades VPU compare work (2^bits - 1
    compares/element/round) against rounds (32/bits serial passes).

    Finds theta = the kth largest value, then compacts the exact top-k
    SET: all elements > theta plus the lowest-indexed ties at theta
    (torch.topk / lax.top_k tie order). With ``sort`` the result is
    value-descending with index-ascending ties — bit-identical to
    lax.top_k; unsorted skips the final [B, k] sort for callers that
    reorder downstream anyway.

    xr: [B, C, chunk] padded chunk view (pad_to_chunks; -inf padding).
    Returns (vals [B, k], idx [B, k]) with idx in the flat [B, C*chunk]
    coordinate (same convention as topk_from_chunk_stats).
    """
    B, C, chunk = xr.shape
    assert 32 % bits == 0
    n_digits = 1 << bits
    n_rounds = 32 // bits
    keys = _float_key(xr)                                  # [B, C, chunk]
    digits = jnp.arange(1, n_digits, dtype=jnp.uint32)     # skip d=0

    def round_fn(r, prefix):
        shift = jnp.uint32(32) - jnp.uint32(bits) * (
            jnp.asarray(r, jnp.uint32) + 1)
        v = keys >> shift                                  # [B, C, chunk]
        base = (prefix << bits)[:, None, None]
        # suffix[d-1] = #(key >= (base|d) << shift), d = 1..n_digits-1;
        # d = 0 needs no count (it keeps the invariant by construction)
        ge = v[..., None] >= base[..., None] + digits      # [..., n_digits-1]
        suffix = jnp.sum(ge, axis=(1, 2), dtype=jnp.int32)  # [B, n_digits-1]
        d_star = jnp.sum(suffix >= k, axis=1).astype(jnp.uint32)
        return (prefix << bits) | d_star

    prefix = jnp.zeros((B,), jnp.uint32)
    if unroll:  # few rounds; unrolling lets XLA pipeline the count passes
        for r in range(n_rounds):
            prefix = round_fn(jnp.uint32(r), prefix)
    else:
        prefix = jax.lax.fori_loop(0, n_rounds, round_fn, prefix)
    theta = _key_to_float(prefix)                          # kth largest value

    # ---- survivor ranks: all x > theta, plus the first need_eq ties ------
    m_gt = xr > theta[:, None, None]
    m_eq = xr == theta[:, None, None]
    gt_c = jnp.sum(m_gt, axis=2, dtype=jnp.int32)          # [B, C]
    eq_c = jnp.sum(m_eq, axis=2, dtype=jnp.int32)
    eq_prefix = jnp.cumsum(eq_c, axis=1) - eq_c            # excl. chunk prefix
    n_gt = jnp.sum(gt_c, axis=1)                           # [B] (= k - need_eq)

    # survivor count per chunk: gt plus the eq ties this chunk contributes
    need = (k - n_gt)[:, None]                             # [B, 1]
    eq_take = jnp.clip(need - eq_prefix, 0, eq_c)          # [B, C]
    s_c = gt_c + eq_take
    s_prefix = jnp.cumsum(s_c, axis=1) - s_c               # [B, C] excl.

    # ---- gather: output slot j lives in chunk c(j) at within-chunk rank --
    j = jnp.arange(k)[None, :]                             # [1, k]
    cj = (jnp.sum(s_prefix[:, None, :] <= j[:, :, None], axis=2) - 1)
    cj = jnp.clip(cj, 0, C - 1)                            # [B, k]
    rows = jnp.arange(B)[:, None]
    ch = xr[rows, cj]                                      # [B, k, chunk]
    r_in = j - s_prefix[rows, cj]                          # target rank in chunk
    m_gt_ch = ch > theta[:, None, None]
    m_eq_ch = ch == theta[:, None, None]
    # global eq rank within this chunk = chunk eq prefix + local cumsum
    eq_rank = eq_prefix[rows, cj][:, :, None] + (
        jnp.cumsum(m_eq_ch, axis=2) - 1)
    s_ch = m_gt_ch | (m_eq_ch & (eq_rank < need[:, :, None]))
    slot = jnp.cumsum(s_ch, axis=2) - 1                    # local survivor rank
    hit = s_ch & (slot == r_in[:, :, None])                # exactly one true
    p = jnp.argmax(hit, axis=2)                            # [B, k]
    vals = jnp.take_along_axis(ch, p[:, :, None], axis=2)[:, :, 0]
    idx = (cj * chunk + p).astype(jnp.int32)
    if sort:
        # compacted order is index-ascending, so top_k's stable tie rule
        # (lowest position wins) reproduces lax.top_k exactly
        vals, pos = jax.lax.top_k(vals, k)
        idx = jnp.take_along_axis(idx, pos, axis=1)
    return vals, idx


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
