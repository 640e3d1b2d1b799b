"""Pretraining model: trunk + LM/MRM/attribute/relation heads.

Parity target: ``MultiModalBartForPreTraining`` (src/model/model.py:125-309):
  - tied LM head + ``final_logits_bias`` with CE on labels (cls positions
    forced to -100), scaled by ``lm_loss_factor``;
  - MRM head (BartClassificationHead d->d->num_labels) with KL(batchmean)
    on 1601-way detector soft labels over masked-region decoder positions;
  - attribute head CE over attribute-masked positions;
  - relation head CE on concatenated (object, subject) hidden pairs.

Fixed-shape batch contract (produced by data/collation.py):
  input_ids [B, S]           attention_mask [B, S]
  image_features [B, N, F]   decoder_input_ids [B, T]
  decoder_attention_mask [B, T]
  labels [B, T]              (-100 at ignored positions)
  mrm_soft_labels [B, T, C]  mrm_mask [B, T] (bool)
  attribute_labels [B, T]    attribute_mask [B, T]
  relation_pairs [B, R, 2]   relation_labels [B, R]   relation_mask [B, R]
All heads always execute on fixed shapes (possibly fully masked) — this
removes the reference's DDP ``find_unused_parameters=True`` problem
(src/utils.py:13, pretrain.py:98) by construction.
"""

import jax
import jax.numpy as jnp

from kmbart_tpu.config import MultiModalBartConfig
from kmbart_tpu.models import bart
from kmbart_tpu.models.heads import (
    classification_head,
    init_classification_head,
    lm_cross_entropy,
    masked_cross_entropy,
    masked_kl_div_batchmean,
)


def init_pretraining_params(rng, cfg: MultiModalBartConfig) -> dict:
    k_model, k_mrm, k_attr, k_rel = jax.random.split(rng, 4)
    return {
        "model": bart.init_bart_params(k_model, cfg),
        "final_logits_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
        "mrm_head": init_classification_head(
            k_mrm, cfg.d_model, cfg.d_model, cfg.num_labels, cfg.init_std),
        "attribute_head": init_classification_head(
            k_attr, cfg.d_model, cfg.d_model, cfg.num_attributes, cfg.init_std),
        "relation_head": init_classification_head(
            k_rel, cfg.d_model * 2, cfg.d_model, cfg.num_relations, cfg.init_std),
    }


def pretraining_loss(params, cfg: MultiModalBartConfig, batch, *, train=False,
                     rng=None, trunk_fn=None):
    """Compute the multi-task loss. Returns (total_loss, metrics dict).

    Loss keys mirror the reference's dict (src/model/model.py:244-307):
    lm_loss, mrm_loss, attribute_loss, relation_loss, loss.

    ``trunk_fn(model_params, cfg, batch, train, rng) -> decoder hidden``
    swaps the encoder/decoder trunk for an alternative execution of the
    SAME math — the pipeline-parallel path (parallel/pp.py) passes its
    staged forward here; the heads always run replicated on the result.
    """
    if rng is not None:
        rng, r_trunk, r_mrm, r_attr, r_rel = jax.random.split(rng, 5)
    else:
        r_trunk = r_mrm = r_attr = r_rel = None

    if trunk_fn is not None:
        hidden = trunk_fn(params["model"], cfg, batch, train, r_trunk)
    else:
        hidden, _ = bart.forward(
            params["model"], cfg,
            batch["input_ids"], batch.get("image_features"),
            batch.get("attention_mask"),
            decoder_input_ids=batch["decoder_input_ids"],
            decoder_attention_mask=batch.get("decoder_attention_mask"),
            train=train, rng=r_trunk)

    dtype = jnp.dtype(cfg.dtype)
    losses = {}
    total = 0.0

    # --- MRM: KL(batchmean) on detector soft labels -----------------------
    if "mrm_soft_labels" in batch:
        logits = classification_head(
            params["mrm_head"], hidden, dropout_rate=cfg.classif_dropout,
            rng=r_mrm, train=train, dtype=dtype)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        mrm_loss, n = masked_kl_div_batchmean(
            logp, batch["mrm_soft_labels"], batch["mrm_mask"])
        mrm_loss = jnp.where(n > 0, mrm_loss * cfg.mrm_loss_factor, 0.0)
        losses["mrm_loss"] = mrm_loss
        total = total + mrm_loss

    # --- attribute prediction ---------------------------------------------
    if "attribute_labels" in batch:
        logits = classification_head(
            params["attribute_head"], hidden, dropout_rate=cfg.classif_dropout,
            rng=r_attr, train=train, dtype=dtype)
        attr_loss, n = masked_cross_entropy(
            logits, batch["attribute_labels"], batch["attribute_mask"].astype(bool))
        attr_loss = jnp.where(n > 0, attr_loss * cfg.attribute_loss_factor, 0.0)
        losses["attribute_loss"] = attr_loss
        total = total + attr_loss

    # --- relation prediction ------------------------------------------------
    if "relation_pairs" in batch:
        pairs = batch["relation_pairs"]  # [B, R, 2] (object_index, subject_index)
        # one-hot MATMUL gather, not take_along_axis: the gather's backward
        # lowers to a serialised scatter-add on TPU (measured: it alone
        # inflated the 4-head step from ~66 to 423 ms at batch 128 on
        # v5e); the einsum is exact (each row sums one product) and both
        # directions are dense MXU ops.
        T = hidden.shape[1]
        oh_obj = jax.nn.one_hot(pairs[..., 0], T, dtype=hidden.dtype)
        oh_sub = jax.nn.one_hot(pairs[..., 1], T, dtype=hidden.dtype)
        obj = jnp.einsum("brt,btd->brd", oh_obj, hidden)
        sub = jnp.einsum("brt,btd->brd", oh_sub, hidden)
        pair_repr = jnp.concatenate([obj, sub], axis=-1)  # [B, R, 2D]
        logits = classification_head(
            params["relation_head"], pair_repr, dropout_rate=cfg.classif_dropout,
            rng=r_rel, train=train, dtype=dtype)
        rel_loss, n = masked_cross_entropy(
            logits, batch["relation_labels"], batch["relation_mask"].astype(bool))
        rel_loss = jnp.where(n > 0, rel_loss * cfg.relation_loss_factor, 0.0)
        losses["relation_loss"] = rel_loss
        total = total + rel_loss

    # --- LM loss (cls positions ignored: src/model/model.py:296-302) --------
    logits = bart.lm_logits(params["model"], cfg, hidden,
                            params["final_logits_bias"],
                            logits_dtype=dtype)
    if "labels" in batch:
        labels = jnp.where(batch["labels"] == cfg.cls_token_id, -100,
                           batch["labels"])
        lm_loss, _ = lm_cross_entropy(params["model"], cfg, hidden,
                                      params["final_logits_bias"], labels)
        lm_loss = lm_loss * cfg.lm_loss_factor
        losses["lm_loss"] = lm_loss
        total = total + lm_loss

    losses["loss"] = total
    return total, {"logits": logits, "losses": losses}


class MultiModalBartForPreTraining:
    """Thin object wrapper: cfg + params + pure loss function."""

    def __init__(self, config: MultiModalBartConfig, params=None, rng=None):
        self.config = config
        if params is None:
            params = init_pretraining_params(
                rng if rng is not None else jax.random.PRNGKey(0), config)
        self.params = params

    def loss(self, batch, *, train=False, rng=None, params=None):
        return pretraining_loss(params if params is not None else self.params,
                                self.config, batch, train=train, rng=rng)

    def forward_logits(self, batch, params=None):
        """Teacher-forced logits (used by the sample-printing callback)."""
        p = params if params is not None else self.params
        hidden, _ = bart.forward(
            p["model"], self.config, batch["input_ids"],
            batch.get("image_features"), batch.get("attention_mask"),
            decoder_input_ids=batch["decoder_input_ids"],
            decoder_attention_mask=batch.get("decoder_attention_mask"))
        return bart.lm_logits(p["model"], self.config, hidden,
                              p["final_logits_bias"])

    # generation support (GenerationMixin parity) — wired in models/generation_api.py
    def generate(self, batch, **kwargs):
        from kmbart_tpu.models.generation_api import generate
        return generate(self.params, self.config, batch, **kwargs)
