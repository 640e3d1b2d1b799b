"""Classification heads and loss functions for pretraining.

Parity targets:
  - ``BartClassificationHead`` (HF 3.0.2, used at src/model/model.py:133-158):
    dropout -> dense -> tanh -> dropout -> out_proj.
  - The loss semantics of ``MultiModalBartForPreTraining.forward``
    (src/model/model.py:244-306): KL "batchmean" over present masked regions,
    CE means over present attribute/relation labels, CE ignoring -100 for LM.

TPU-first: the reference gathers ragged masked rows (``outputs[0][mask]``);
here every head runs on fixed-shape tensors and the losses are masked means,
which is exactly what XLA needs (no dynamic shapes) and matches the
reference's "mean over rows that are present" numerics.
"""

import jax
import jax.numpy as jnp

from kmbart_tpu.ops.layers import dense, dropout


def init_classification_head(rng, input_dim, inner_dim, num_classes, std):
    k1, k2 = jax.random.split(rng)
    return {
        "dense_kernel": jax.random.normal(k1, (input_dim, inner_dim), jnp.float32) * std,
        "dense_bias": jnp.zeros((inner_dim,), jnp.float32),
        "out_kernel": jax.random.normal(k2, (inner_dim, num_classes), jnp.float32) * std,
        "out_bias": jnp.zeros((num_classes,), jnp.float32),
    }


def classification_head(params, x, *, dropout_rate=0.0, rng=None, train=False,
                        dtype=jnp.bfloat16):
    """dropout -> dense -> tanh -> dropout -> out_proj (fp32 out)."""
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    else:
        r1 = r2 = None
    x = dropout(x, dropout_rate, r1, train)
    x = jnp.tanh(dense(x, params["dense_kernel"], params["dense_bias"], dtype))
    x = dropout(x, dropout_rate, r2, train)
    return dense(x, params["out_kernel"], params["out_bias"], dtype)


# --------------------------------------------------------------------------
# Losses (masked-mean semantics matching the reference)
# --------------------------------------------------------------------------

@jax.custom_vjp
def _masked_nll_sum(logits, safe_labels, valid):
    """Sum over valid positions of -log softmax(logits)[label].

    Logsumexp form with a hand-written VJP: the naive
    ``log_softmax -> take_along_axis`` autodiff materialises a full fp32
    log-prob tensor in forward AND an extra full-size subtract in backward
    — at KM-BART's [B, T, 50320] vocab that was ~4.5 ms/step of pure HBM
    traffic on v5e. Here forward is two fused reductions over the logits
    and backward is the closed form softmax(logits) - onehot in a single
    full-size pass, emitted directly in the logits dtype.
    """
    out, _ = _masked_nll_sum_fwd(logits, safe_labels, valid)
    return out


def _masked_nll_sum_fwd(logits, safe_labels, valid):
    lf = logits.astype(jnp.float32)
    m = jnp.max(lf, axis=-1)
    se = jnp.sum(jnp.exp(lf - m[..., None]), axis=-1)
    lse = jnp.log(se) + m
    # (A round-4 experiment moved these two reductions into a single-pass
    # Pallas kernel: the step REGRESSED 64.3 -> 74.2 ms because the kernel
    # boundary forces the 515 MB logits out of their producer-chosen
    # {0,2,1} batch-minor layout. XLA's fused reduces read the tensor in
    # place; keep them. Kernel deleted per the measured-not-kept
    # convention — see BASELINE.md round-4 and git history.)
    # gather the label logit from the RAW logits and upcast the [B, T]
    # result: gathering from ``lf`` forced XLA to materialise a full fp32
    # copy of the [B, T, V] logits just to feed the gather (~1.2 ms/step
    # at the 50320 vocab on v5e; the reduces above fuse into the head
    # matmul and never need the full tensor)
    ll = jnp.take_along_axis(logits, safe_labels[..., None],
                             axis=-1)[..., 0].astype(jnp.float32)
    nll_sum = jnp.sum(jnp.where(valid, lse - ll, 0.0))
    return nll_sum, (logits, safe_labels, valid, m, se)


def _masked_nll_sum_bwd(res, g):
    logits, safe_labels, valid, m, se = res
    lf = logits.astype(jnp.float32)
    p = jnp.exp(lf - m[..., None]) / se[..., None]
    vocab = jnp.arange(logits.shape[-1])
    onehot = vocab == safe_labels[..., None]
    scale = (g * valid.astype(jnp.float32))[..., None]
    dlogits = (scale * (p - onehot)).astype(logits.dtype)
    return dlogits, None, None


_masked_nll_sum.defvjp(_masked_nll_sum_fwd, _masked_nll_sum_bwd)


def cross_entropy_ignore_index(logits, labels, ignore_index=-100):
    """Mean CE over positions where labels != ignore_index
    (torch.nn.CrossEntropyLoss default reduction). Statistics are fp32
    regardless of the logits dtype (the train path feeds bf16 logits).

    (A round-3 experiment flattened [B, T, V] to 2-D here hoping to fix
    the backward dlogits {0,2,1} layout; measured SLOWER on v5e — 65.4 ->
    69.1 ms/step — so the natural shape stays.)"""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    n = jnp.sum(valid)
    nll_sum = _masked_nll_sum(logits, safe, valid)
    return nll_sum / jnp.maximum(n, 1), n


def lm_cross_entropy(model_params, cfg, hidden, final_logits_bias, labels,
                     *, ignore_index=-100):
    """LM-head projection + ignore-index CE, fused when supported.

    The training loss paths (conditional_loss / pretraining_loss) call
    this instead of ``lm_logits`` + ``cross_entropy_ignore_index``: on a
    single TPU chip the backward runs as one blockwise Pallas kernel
    (ops/pallas_lm_ce.py — the round-4 itemization's ~9.4 ms vocab slice),
    elsewhere the composite XLA path. Any aux ``logits`` the caller also
    computes via ``lm_logits`` dedupes against the composite branch by
    CSE and dead-codes away in the fused branch when unused.
    """
    from kmbart_tpu.models.bart import lm_logits
    from kmbart_tpu.ops.pallas_lm_ce import fused_lm_ce, fused_lm_ce_supported
    dtype = jnp.dtype(cfg.dtype)
    if fused_lm_ce_supported(hidden, cfg.vocab_size, cfg.d_model):
        return fused_lm_ce(hidden, model_params["shared"], final_logits_bias,
                           labels, ignore_index=ignore_index, dtype=dtype)
    logits = lm_logits(model_params, cfg, hidden, final_logits_bias,
                       logits_dtype=dtype)
    return cross_entropy_ignore_index(logits, labels,
                                      ignore_index=ignore_index)


def masked_kl_div_batchmean(log_probs, soft_labels, mask):
    """F.kl_div(log_probs, targets, reduction='batchmean') over masked rows.

    Pointwise term t * (log t - log p) with 0*log(0) := 0; 'batchmean'
    divides by the number of masked rows (the reference gathers masked rows
    first, so its batch dim is the masked-row count: src/model/model.py:248-257).
    """
    t = soft_labels.astype(jnp.float32)
    log_t = jnp.log(jnp.where(t > 0, t, 1.0))
    pointwise = jnp.where(t > 0, t * (log_t - log_probs), 0.0)
    per_row = jnp.sum(pointwise, axis=-1)
    n = jnp.sum(mask)
    return jnp.sum(jnp.where(mask, per_row, 0.0)) / jnp.maximum(n, 1), n


def masked_cross_entropy(logits, labels, mask):
    """Mean CE over rows where mask is True (reference attribute/relation CE)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    n = jnp.sum(mask)
    return jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.maximum(n, 1), n
