"""Conditional-generation model: trunk + tied LM head + CE loss.

Parity target: ``MultiModalBartForConditionalGeneration``
(src/model/model.py:317-405) — the VCG fine-tuning / generation model.
"""

import jax
import jax.numpy as jnp

from kmbart_tpu.config import MultiModalBartConfig
from kmbart_tpu.models import bart
from kmbart_tpu.models.heads import lm_cross_entropy


def init_conditional_params(rng, cfg: MultiModalBartConfig) -> dict:
    return {
        "model": bart.init_bart_params(rng, cfg),
        "final_logits_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
    }


def conditional_loss(params, cfg: MultiModalBartConfig, batch, *, train=False,
                     rng=None):
    """CE loss on labels (-100 ignored). Returns (loss, {"logits": ...}).

    Logits are emitted in the compute dtype (half-width write at the
    50320-vocab head); the CE statistics are fp32 inside
    ``cross_entropy_ignore_index``."""
    hidden, _ = bart.forward(
        params["model"], cfg,
        batch["input_ids"], batch.get("image_features"),
        batch.get("attention_mask"),
        decoder_input_ids=batch["decoder_input_ids"],
        decoder_attention_mask=batch.get("decoder_attention_mask"),
        train=train, rng=rng)
    loss, _ = lm_cross_entropy(params["model"], cfg, hidden,
                               params["final_logits_bias"], batch["labels"])
    # aux logits: dead-coded under jit when the caller drops them (the
    # train step does); in the composite branch of lm_cross_entropy the
    # identical projection CSEs with this one
    logits = bart.lm_logits(params["model"], cfg, hidden,
                            params["final_logits_bias"],
                            logits_dtype=jnp.dtype(cfg.dtype))
    return loss, {"logits": logits}


class MultiModalBartForConditionalGeneration:
    def __init__(self, config: MultiModalBartConfig, params=None, rng=None):
        self.config = config
        if params is None:
            params = init_conditional_params(
                rng if rng is not None else jax.random.PRNGKey(0), config)
        self.params = params

    def loss(self, batch, *, train=False, rng=None, params=None):
        return conditional_loss(params if params is not None else self.params,
                                self.config, batch, train=train, rng=rng)

    def forward_logits(self, batch, params=None):
        p = params if params is not None else self.params
        _, aux = conditional_loss(p, self.config, dict(batch, labels=batch.get(
            "labels", batch["decoder_input_ids"])), train=False)
        return aux["logits"]

    def generate(self, batch, **kwargs):
        from kmbart_tpu.models.generation_api import generate
        return generate(self.params, self.config, batch, **kwargs)
