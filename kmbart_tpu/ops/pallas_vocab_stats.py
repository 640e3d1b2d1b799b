"""Fused per-chunk vocab statistics for the beam candidate step.

The fast-select beam path (generation/beam.py) needs, per decode step,
over the raw logits [B*K, V]:

  1. the top-2K values/indices per row (chunk-max top-k, ops/topk.py), and
  2. each row's logsumexp (to normalise only the 2K survivors).

In XLA that costs three separate full passes over the padded ~64 MB
logits view — the chunk-max build, logsumexp's max, logsumexp's exp-sum.
This kernel produces the per-chunk maxima AND per-chunk exp-sums in ONE
pipelined read of the [B, C, chunk] view:

  cm[b, c] = max(xr[b, c]);  es[b, c] = sum(exp(xr[b, c] - cm[b, c]))

from which the row logsumexp is two tiny [B, C] ops
(``logsumexp_from_stats``), and the greedy top-k phase proceeds on cm
exactly as before (ops/topk.py::topk_from_chunk_stats).

Round-2 v5e decode profile motivating this: reduce_max 3.4 ms +
logsumexp reduces ~4 ms per beam-5 generate at batch 64.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Finite floor for the exp-shift: chunks that are ENTIRELY -inf (e.g. the
# ~49 non-forced-token chunks produced by generation/logits.force_token at
# the forced-BOS/EOS steps) have cm == -inf, and the naive
# exp(x - cm) = exp(-inf - -inf) = NaN would poison every row's logsumexp.
# Shifting by max(cm, FINITE_MIN) instead gives exp(-inf - finite) == 0,
# so all--inf chunks contribute es == 0 exactly.
FINITE_MIN = -3.0e38


def chunk_stats_reference(xr):
    """Pure-XLA fallback (CPU path): (cm, es) over a [B, C, chunk] view."""
    cm = jnp.max(xr, axis=-1)
    es = jnp.sum(jnp.exp(xr - jnp.maximum(cm, FINITE_MIN)[..., None]), axis=-1)
    return cm, es


def _stats_kernel(x_ref, cm_ref, es_ref):
    c = pl.program_id(0)
    x = x_ref[...]                                     # [B, chunk] f32
    B = x.shape[0]
    C = cm_ref.shape[1]
    m = jnp.max(x, axis=1, keepdims=True)              # [B, 1]
    e = jnp.sum(jnp.exp(x - jnp.maximum(m, FINITE_MIN)), axis=1, keepdims=True)

    # lane-dim dynamic single-column stores need 128-alignment, so write
    # the whole [B, C] stat tiles through a one-hot select (tiny VPU op)
    col_c = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    at_c = col_c == c
    cm_ref[...] = jnp.where(at_c, m, cm_ref[...])
    es_ref[...] = jnp.where(at_c, e, es_ref[...])


def chunk_stats(xr, *, interpret=False):
    """(cm [B, C], es [B, C]) in one pipelined pass over [B, C, chunk].

    TPU only — callers use chunk_stats_reference elsewhere (``interpret``
    exercises the kernel logic on CPU in tests). Padding positions
    (NEG_INF fill from ops/topk.pad_to_chunks, always fewer than one
    whole chunk) contribute exp(-inf) = 0 to es and never win the max;
    entirely--inf chunks (forced-token steps) yield (cm=-inf, es=0).
    """
    B, C, chunk = xr.shape
    cm, es = pl.pallas_call(
        _stats_kernel,
        grid=(C,),
        interpret=interpret,
        # flat [B, C*chunk] view: a (B, 1, chunk) block has an unlowerable
        # sublane dim; (B, chunk) over the flat array is tile-exact
        in_specs=[pl.BlockSpec((B, chunk), lambda c: (0, c))],
        out_specs=[
            pl.BlockSpec((B, C), lambda c: (0, 0)),
            pl.BlockSpec((B, C), lambda c: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C), jnp.float32),
            jax.ShapeDtypeStruct((B, C), jnp.float32),
        ],
    )(xr.reshape(B, C * chunk))
    return cm, es


def chunk_stats_supported(n_rows):
    return jax.default_backend() == "tpu" and n_rows % 8 == 0


def logsumexp_from_stats(cm, es):
    """Row logsumexp from per-chunk stats ([B, C] -> [B]).

    -inf-safe: all--inf chunks arrive as (cm=-inf, es=0) and contribute
    exactly 0; a fully--inf row returns -inf (not NaN). This is the path
    force_token rows (forced BOS/EOS) take every greedy-beam call.
    """
    m = jnp.maximum(jnp.max(cm, axis=1), FINITE_MIN)
    return m + jnp.log(jnp.sum(es * jnp.exp(cm - m[:, None]), axis=1))
