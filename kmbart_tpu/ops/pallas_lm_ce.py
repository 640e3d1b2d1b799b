"""Fused LM-head + cross-entropy backward for the training hot path.

Round-4 step itemization (BASELINE.md): at batch 128 the vocab slice of
the fine-tune step is ~6.0 ms of pure-dot time (head projection + dh + dW
matmuls over the 50320 vocab) plus ~3.4 ms of pure-elementwise CE passes
whose cost is reading/writing the 515 MB bf16 logits tensor — together
~15% of the 61.3 ms device step, the largest slice with a standard fix.

This module replaces the BACKWARD of ``lm_logits`` (models/bart.py:627) +
``cross_entropy_ignore_index`` (models/heads.py:101) with one Pallas
kernel. The forward stays pure XLA (the head matmul FUSES the CE's
max/sum-exp reductions into itself — a round-4 measurement the deleted
softmax-stats kernel refuted the other way), but the backward's chain

    p = exp(l - lse); dlogits = scale*(p - onehot)   (elementwise, 3 full
    dh = dlogits @ W                                   logits-size passes)

collapses into a single blockwise kernel: each (row-tile, vocab-tile)
program reads the bf16 logits tile ONCE, forms dlogits in VMEM, emits it
for the XLA dW matmul, and accumulates the dh contraction on the MXU in
the same pass. The dlogits intermediate is never round-tripped between
the elementwise pass and the dh matmul, and the softmax reconstruction
costs no extra HBM traffic at all.

A second mode (``recompute=True``) is the round-4 verdict's full
no-materialization variant: the forward computes the CE statistics via a
Pallas kernel that never writes [N, V] logits to HBM, and the backward
recomputes each logits tile from (hidden, W) on the MXU. It trades the
515 MB logits write + read for one extra projection pass (~2 ms at v5e
peak). Both modes are A/B-measured on-chip in BASELINE.md round-5; the
faster one is the default.

Numerics: identical op sequence to the composite path — bf16 projection
with fp32 accumulation, logits rounded to bf16 (the training
``logits_dtype``), CE statistics in fp32. The backward differs from the
XLA chain only in `exp(l-m)*inv_se` vs `exp(l-m)/se` rounding.

Parity target: the reference's LM loss at src/model/model.py:291-302
(F.cross_entropy(ignore_index=-100) over the tied LM head).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _bwd_kernel(logits_ref, w_ref, m_ref, inv_se_ref, scale_ref, labels_ref,
                dlogits_ref, dh_ref, acc_ref, *, vocab, tile_v):
    """One (row-tile, vocab-tile) program; vocab axis is the inner grid dim.

    dlogits = scale * (softmax(logits) - onehot(labels)) for this tile,
    written in the logits dtype (bf16) for the XLA dW matmul, and
    dh += dlogits @ W_tile accumulated in fp32 VMEM across the vocab
    sweep, flushed as bf16 on the last tile.
    """
    j = pl.program_id(1)
    col0 = j * tile_v
    lf = logits_ref[...].astype(jnp.float32)
    tn, tv = lf.shape
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (tn, tv), 1)
    in_range = cols < vocab
    # out-of-range lanes of the (padded) trailing tile read unspecified
    # memory; force them to a finite floor so exp() can't poison the dot
    lf = jnp.where(in_range, lf, NEG)
    p = jnp.exp(lf - m_ref[...]) * inv_se_ref[...]
    onehot = (cols == labels_ref[...]).astype(jnp.float32)
    dl = (scale_ref[...] * (p - onehot)).astype(dlogits_ref.dtype)
    dl = jnp.where(in_range, dl, jnp.zeros_like(dl))
    dlogits_ref[...] = dl
    contrib = jax.lax.dot_general(
        dl, _masked_w(w_ref, col0, vocab), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = contrib

    @pl.when(j > 0)
    def _():
        acc_ref[...] = acc_ref[...] + contrib

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        dh_ref[...] = acc_ref[...].astype(dh_ref.dtype)


def _masked_w(w_ref, row0, vocab):
    """Zero the out-of-range rows of the (padded) trailing W tile: they
    read unspecified memory, and a NaN there survives multiplication by
    the zeroed dlogits columns (0 * NaN = NaN)."""
    w = w_ref[...]
    tv = w.shape[0]
    if vocab % tv == 0:
        return w
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    return jnp.where(rows < vocab, w, jnp.zeros_like(w))


def _recompute_bwd_kernel(h_ref, w_ref, fbias_ref, m_ref, inv_se_ref,
                          scale_ref, labels_ref, dlogits_ref, dh_ref, acc_ref,
                          *, vocab, tile_v, logits_dtype):
    """No-materialization backward: recompute the logits tile from
    (hidden, W) on the MXU instead of reading it from HBM."""
    j = pl.program_id(1)
    col0 = j * tile_v
    # h [TN, D] bf16 contracted with w [TV, D] bf16 on the shared D axis
    logits = jax.lax.dot_general(
        h_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = logits + fbias_ref[...].astype(jnp.float32)
    # round to the training logits dtype so softmax statistics match the
    # composite path's bf16 logits bit-for-bit
    lf = logits.astype(logits_dtype).astype(jnp.float32)
    tn, tv = lf.shape
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (tn, tv), 1)
    in_range = cols < vocab
    lf = jnp.where(in_range, lf, NEG)
    p = jnp.exp(lf - m_ref[...]) * inv_se_ref[...]
    onehot = (cols == labels_ref[...]).astype(jnp.float32)
    dl = (scale_ref[...] * (p - onehot)).astype(dlogits_ref.dtype)
    dl = jnp.where(in_range, dl, jnp.zeros_like(dl))
    dlogits_ref[...] = dl
    contrib = jax.lax.dot_general(
        dl, _masked_w(w_ref, col0, vocab), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = contrib

    @pl.when(j > 0)
    def _():
        acc_ref[...] = acc_ref[...] + contrib

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        dh_ref[...] = acc_ref[...].astype(dh_ref.dtype)


def _fwd_stats_kernel(h_ref, w_ref, fbias_ref, labels_ref, m_ref, se_ref,
                      ll_ref, run_m_ref, run_se_ref, run_ll_ref,
                      *, vocab, tile_v, logits_dtype):
    """No-materialization forward: blockwise projection + online
    max/sum-exp + label-logit extraction; [N, V] logits never reach HBM.

    Online rescale: se_new = se*exp(m - m_new) + sum(exp(l - m_new)).
    """
    j = pl.program_id(1)
    col0 = j * tile_v
    logits = jax.lax.dot_general(
        h_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = logits + fbias_ref[...].astype(jnp.float32)
    lf = logits.astype(logits_dtype).astype(jnp.float32)
    tn, tv = lf.shape
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (tn, tv), 1)
    in_range = cols < vocab
    lf = jnp.where(in_range, lf, NEG)
    tile_m = jnp.max(lf, axis=1, keepdims=True)                  # [TN, 1]
    onehot = cols == labels_ref[...]
    tile_ll = jnp.sum(jnp.where(onehot, lf, 0.0), axis=1, keepdims=True)
    has_label = jnp.any(onehot, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        run_m_ref[...] = tile_m
        run_se_ref[...] = jnp.sum(jnp.exp(lf - tile_m), axis=1, keepdims=True)
        run_ll_ref[...] = jnp.where(has_label, tile_ll, 0.0)

    @pl.when(j > 0)
    def _():
        m_old = run_m_ref[...]
        m_new = jnp.maximum(m_old, tile_m)
        run_se_ref[...] = (run_se_ref[...] * jnp.exp(m_old - m_new)
                           + jnp.sum(jnp.exp(lf - m_new), axis=1,
                                     keepdims=True))
        run_m_ref[...] = m_new
        run_ll_ref[...] = run_ll_ref[...] + jnp.where(has_label, tile_ll, 0.0)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        m_ref[...] = run_m_ref[...]
        se_ref[...] = run_se_ref[...]
        ll_ref[...] = run_ll_ref[...]


def _fwd_project_stats_kernel(h_ref, w_ref, fbias_ref, labels_ref,
                              logits_ref, m_ref, se_ref, ll_ref,
                              run_m_ref, run_se_ref, run_ll_ref,
                              *, vocab, tile_v, logits_dtype):
    """Hybrid forward: ONE pass computes the projection tile on the MXU,
    writes the bf16 logits (the backward's residual), and folds the CE
    max/sum-exp/label-logit statistics in-VMEM.

    This is the slice the round-5 itemization exposed: the composite
    forward's CE statistics do NOT fuse into the head matmul (contrary to
    the round-4 reading) — they are the 1.71 + 1.01 + 0.68 ms trio of
    separate full-logits passes in BOTH the composite and the
    fused-backward step profiles. Here they cost zero extra HBM traffic.
    """
    j = pl.program_id(1)
    col0 = j * tile_v
    logits = jax.lax.dot_general(
        h_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = logits + fbias_ref[...].astype(jnp.float32)
    rounded = logits.astype(logits_dtype)
    logits_ref[...] = rounded
    lf = rounded.astype(jnp.float32)
    tn, tv = lf.shape
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (tn, tv), 1)
    in_range = cols < vocab
    lf = jnp.where(in_range, lf, NEG)
    tile_m = jnp.max(lf, axis=1, keepdims=True)
    onehot = cols == labels_ref[...]
    tile_ll = jnp.sum(jnp.where(onehot, lf, 0.0), axis=1, keepdims=True)
    has_label = jnp.any(onehot, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        run_m_ref[...] = tile_m
        run_se_ref[...] = jnp.sum(jnp.exp(lf - tile_m), axis=1,
                                  keepdims=True)
        run_ll_ref[...] = jnp.where(has_label, tile_ll, 0.0)

    @pl.when(j > 0)
    def _():
        m_old = run_m_ref[...]
        m_new = jnp.maximum(m_old, tile_m)
        run_se_ref[...] = (run_se_ref[...] * jnp.exp(m_old - m_new)
                           + jnp.sum(jnp.exp(lf - m_new), axis=1,
                                     keepdims=True))
        run_m_ref[...] = m_new
        run_ll_ref[...] = run_ll_ref[...] + jnp.where(has_label, tile_ll,
                                                      0.0)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        m_ref[...] = run_m_ref[...]
        se_ref[...] = run_se_ref[...]
        ll_ref[...] = run_ll_ref[...]


def _fwd_project_stats_call(h_b, w_b, fbias, labels, tile_v, logits_dtype,
                            interpret):
    n, d = h_b.shape
    vocab = w_b.shape[0]
    tn = _pick_tile_n(n)
    grid = (n // tn, pl.cdiv(vocab, tile_v))
    kernel = functools.partial(_fwd_project_stats_kernel, vocab=vocab,
                               tile_v=tile_v, logits_dtype=logits_dtype)
    col = pl.BlockSpec((tn, 1), lambda i, j: (i, 0))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_v, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tile_v), lambda i, j: (0, j)),
            col,
        ],
        out_specs=[pl.BlockSpec((tn, tile_v), lambda i, j: (i, j)),
                   col, col, col],
        out_shape=[jax.ShapeDtypeStruct((n, vocab), logits_dtype)]
        + [jax.ShapeDtypeStruct((n, 1), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((tn, 1), jnp.float32)] * 3,
        interpret=interpret,
    )(h_b, w_b, fbias, labels)


def _pick_tile_n(n):
    for tn in (512, 256, 128, 64, 32, 16, 8):
        if n % tn == 0:
            return tn
    return None


def _col_specs(tn, tile_v, n_cols=1):
    """Per-row [N, n_cols] operands: one (TN, n_cols) block per row tile."""
    return pl.BlockSpec((tn, n_cols), lambda i, j: (i, 0))


def _bwd_call(logits, w_b, m, inv_se, scale, labels, tile_v, interpret):
    n, vocab = logits.shape
    d = w_b.shape[1]
    tn = _pick_tile_n(n)
    grid = (n // tn, pl.cdiv(vocab, tile_v))
    kernel = functools.partial(_bwd_kernel, vocab=vocab, tile_v=tile_v)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, tile_v), lambda i, j: (i, j)),
            pl.BlockSpec((tile_v, d), lambda i, j: (j, 0)),
            _col_specs(tn, tile_v), _col_specs(tn, tile_v),
            _col_specs(tn, tile_v), _col_specs(tn, tile_v),
        ],
        out_specs=[
            pl.BlockSpec((tn, tile_v), lambda i, j: (i, j)),
            pl.BlockSpec((tn, d), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, vocab), logits.dtype),
            jax.ShapeDtypeStruct((n, d), w_b.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((tn, d), jnp.float32)],
        interpret=interpret,
    )(logits, w_b, m, inv_se, scale, labels)


def _recompute_bwd_call(h_b, w_b, fbias, m, inv_se, scale, labels, tile_v,
                        logits_dtype, interpret):
    n, d = h_b.shape
    vocab = w_b.shape[0]
    tn = _pick_tile_n(n)
    grid = (n // tn, pl.cdiv(vocab, tile_v))
    kernel = functools.partial(_recompute_bwd_kernel, vocab=vocab,
                               tile_v=tile_v, logits_dtype=logits_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_v, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tile_v), lambda i, j: (0, j)),
            _col_specs(tn, tile_v), _col_specs(tn, tile_v),
            _col_specs(tn, tile_v), _col_specs(tn, tile_v),
        ],
        out_specs=[
            pl.BlockSpec((tn, tile_v), lambda i, j: (i, j)),
            pl.BlockSpec((tn, d), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, vocab), logits_dtype),
            jax.ShapeDtypeStruct((n, d), w_b.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((tn, d), jnp.float32)],
        interpret=interpret,
    )(h_b, w_b, fbias, m, inv_se, scale, labels)


def _fwd_stats_call(h_b, w_b, fbias, labels, tile_v, logits_dtype, interpret):
    n, d = h_b.shape
    vocab = w_b.shape[0]
    tn = _pick_tile_n(n)
    grid = (n // tn, pl.cdiv(vocab, tile_v))
    kernel = functools.partial(_fwd_stats_kernel, vocab=vocab, tile_v=tile_v,
                               logits_dtype=logits_dtype)
    col = pl.BlockSpec((tn, 1), lambda i, j: (i, 0))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_v, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tile_v), lambda i, j: (0, j)),
            col,
        ],
        out_specs=[col, col, col],
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((tn, 1), jnp.float32)] * 3,
        interpret=interpret,
    )(h_b, w_b, fbias, labels)


# --------------------------------------------------------------------------
# custom-VJP wrapper (composite XLA forward, fused Pallas backward)
# --------------------------------------------------------------------------

def _project(h_b, w_b, fbias):
    """Same op sequence as models/bart.py lm_logits: bf16 dot with fp32
    accumulation, fp32 bias add, rounded to the compute dtype."""
    logits = jax.lax.dot_general(
        h_b, w_b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (logits + fbias.astype(jnp.float32)[None, :]).astype(h_b.dtype)


@functools.lru_cache(maxsize=None)
def _fused_nll_fn(tile_v, interpret, mode):
    """Cached custom-VJP builder keyed on the static knobs (same pattern
    as pallas_train_attention._train_attention_fn). ``mode``:

      "bwd"    — XLA forward (logits materialized + XLA stat reduces),
                 fused Pallas backward
      "nomat"  — Pallas forward stats + recompute backward; [N, V] logits
                 never reach HBM
      "fwdbwd" — hybrid: ONE Pallas forward pass does projection +
                 logits write + stats, fused Pallas backward reads them
    """

    def fwd_materialized(h_b, w_b, fbias, safe_labels, valid):
        logits = _project(h_b, w_b, fbias)
        lf = logits.astype(jnp.float32)
        m = jnp.max(lf, axis=-1)
        se = jnp.sum(jnp.exp(lf - m[:, None]), axis=-1)
        ll = jnp.take_along_axis(logits, safe_labels[:, None],
                                 axis=-1)[:, 0].astype(jnp.float32)
        nll = jnp.sum(jnp.where(valid, jnp.log(se) + m - ll, 0.0))
        return nll, (h_b, w_b, logits, m, se, safe_labels, valid)

    def fwd_fwdbwd(h_b, w_b, fbias, safe_labels, valid):
        n = h_b.shape[0]
        labels2 = safe_labels.reshape(n, 1).astype(jnp.int32)
        fbias2 = fbias.reshape(1, -1).astype(jnp.float32)
        logits, m, se, ll = _fwd_project_stats_call(
            h_b, w_b, fbias2, labels2, tile_v, h_b.dtype, interpret)
        m, se, ll = m[:, 0], se[:, 0], ll[:, 0]
        nll = jnp.sum(jnp.where(valid, jnp.log(se) + m - ll, 0.0))
        return nll, (h_b, w_b, logits, m, se, safe_labels, valid)

    def bwd_materialized(res, g):
        h_b, w_b, logits, m, se, safe_labels, valid = res
        n = logits.shape[0]
        scale = (g * valid.astype(jnp.float32)).reshape(n, 1)
        inv_se = (1.0 / se).reshape(n, 1)
        dlogits, dh_b = _bwd_call(
            logits, w_b, m.reshape(n, 1), inv_se, scale,
            safe_labels.reshape(n, 1).astype(jnp.int32), tile_v, interpret)
        dw_b = jax.lax.dot_general(
            dlogits, h_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # the cotangent of the bf16-cast W mirrors the composite path,
        # where XLA's dot transpose emits the grad in the primal dtype
        return dh_b, dw_b.astype(w_b.dtype), None, None, None

    def fwd_nomat(h_b, w_b, fbias, safe_labels, valid):
        n = h_b.shape[0]
        labels2 = safe_labels.reshape(n, 1).astype(jnp.int32)
        fbias2 = fbias.reshape(1, -1).astype(jnp.float32)
        m, se, ll = _fwd_stats_call(h_b, w_b, fbias2, labels2, tile_v,
                                    h_b.dtype, interpret)
        nll = jnp.sum(jnp.where(valid, (jnp.log(se) + m - ll)[:, 0], 0.0))
        return nll, (h_b, w_b, fbias2, m, se, labels2, valid)

    def bwd_nomat(res, g):
        h_b, w_b, fbias2, m, se, labels2, valid = res
        n = h_b.shape[0]
        scale = (g * valid.astype(jnp.float32)).reshape(n, 1)
        dlogits, dh_b = _recompute_bwd_call(
            h_b, w_b, fbias2, m, 1.0 / se, scale, labels2, tile_v,
            h_b.dtype, interpret)
        dw_b = jax.lax.dot_general(
            dlogits, h_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dh_b, dw_b.astype(w_b.dtype), None, None, None

    fwd = {"bwd": fwd_materialized, "nomat": fwd_nomat,
           "fwdbwd": fwd_fwdbwd}[mode]
    bwd = bwd_nomat if mode == "nomat" else bwd_materialized

    @jax.custom_vjp
    def f(h_b, w_b, fbias, safe_labels, valid):
        out, _ = fwd(h_b, w_b, fbias, safe_labels, valid)
        return out

    f.defvjp(fwd, bwd)
    return f


# --------------------------------------------------------------------------
# public entry points
# --------------------------------------------------------------------------

DEFAULT_TILE_V = 1024


def fused_lm_ce_supported(hidden, vocab_size, d_model):
    """Gate: TPU backend, single device (no custom_partitioning rule yet —
    multi-device meshes take the composite path, which GSPMD shards), row
    count tileable, head dims MXU-aligned.

    ``KMBART_NO_FUSED_CE=1`` disables the kernel (A/B / escape hatch)."""
    if os.environ.get("KMBART_NO_FUSED_CE") == "1":
        return False
    if jax.default_backend() != "tpu" or jax.device_count() != 1:
        return False
    n = 1
    for s in hidden.shape[:-1]:
        n *= int(s)
    return (_pick_tile_n(n) is not None and d_model % 128 == 0
            and vocab_size >= DEFAULT_TILE_V)


def fused_lm_ce(hidden, shared, final_logits_bias, labels, *,
                ignore_index=-100, dtype=jnp.bfloat16, recompute=None,
                mode=None, tile_v=DEFAULT_TILE_V, interpret=False):
    """Drop-in fusion of ``lm_logits`` + ``cross_entropy_ignore_index``.

    hidden [..., D]; shared [V, D] (tied embedding, fp32 master);
    final_logits_bias [V] (non-trainable buffer — gradient stopped, as in
    models/bart.py:637-640); labels [...] int. Returns (mean_loss, n) with
    the composite path's masked-mean semantics.

    ``mode`` (see _fused_nll_fn): "fwdbwd" (default — the round-5
    measured winner, BASELINE.md), "bwd", or "nomat". Overridable via
    ``KMBART_FUSED_CE_MODE``; ``recompute=True`` is kept as an alias for
    "nomat".
    """
    if mode is None:
        if recompute is not None:
            mode = "nomat" if recompute else "bwd"
        else:
            mode = os.environ.get("KMBART_FUSED_CE_MODE", "fwdbwd")
    d = hidden.shape[-1]
    n = 1
    for s in hidden.shape[:-1]:
        n *= int(s)
    h2 = hidden.reshape(n, d).astype(dtype)
    w_b = shared.astype(dtype)
    labels2 = labels.reshape(n)
    valid = labels2 != ignore_index
    safe = jnp.where(valid, labels2, 0)
    fbias = jax.lax.stop_gradient(final_logits_bias)
    fn = _fused_nll_fn(int(tile_v), bool(interpret), str(mode))
    nll = fn(h2, w_b, fbias, safe, valid)
    cnt = jnp.sum(valid)
    return nll / jnp.maximum(cnt, 1), cnt
