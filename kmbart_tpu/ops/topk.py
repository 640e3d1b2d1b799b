"""Exact top-k for tiny k over huge rows (the beam-search candidate step).

On this TPU backend ``jax.lax.top_k`` over the beam candidate matrix
[B, num_beams * vocab] lowers to a full variadic sort — profiled at ~10 ms
per decode step (the single largest cost in beam search, xplane %sort.25).
For k << N an iterative argmax is exact and bandwidth-bound instead:
k passes of (argmax + mask) read ~k*N floats (~0.4 ms/step here).

Tie-breaking matches lax.top_k / torch.topk: the lowest index wins, and
results come out sorted descending.
"""

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def exact_top_k(x, k, *, iterative_threshold=4096):
    """Drop-in for jax.lax.top_k(x, k) on 2-D inputs.

    Uses k iterative argmax passes when the row is much larger than k
    (N > iterative_threshold * k), otherwise defers to lax.top_k.
    """
    B, N = x.shape
    if N <= iterative_threshold * k:
        return jax.lax.top_k(x, k)

    from kmbart_tpu.ops.pallas_topk import pallas_top_k, pallas_topk_supported
    if pallas_topk_supported(N, k):
        return pallas_top_k(x, k)

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
