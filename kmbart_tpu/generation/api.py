"""Public ``generate`` front-end.

Parity target: ``GenerationMixin.generate`` (src/model/mixins.py:31-384):
argument defaulting from the model config, validation asserts, attention-mask
construction, the single encoder pre-run, beam/return-sequence expansion of
the encoder outputs (batch-major ``index_select``), and dispatch to the beam
or no-beam inner loop.

TPU design: the inner loops are jitted once per (shape, options) signature
and cached; everything dynamic stays on device. Options are a frozen
dataclass so they hash as static jit arguments.
"""

import dataclasses
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kmbart_tpu.config import MultiModalBartConfig
from kmbart_tpu.models import bart
from kmbart_tpu.generation.beam import beam_search_loop
from kmbart_tpu.generation.decode import greedy_or_sample_loop


@dataclasses.dataclass(frozen=True)
class GenerationOptions:
    max_length: int = 20
    min_length: int = 0
    do_sample: bool = False
    early_stopping: bool = False
    num_beams: int = 1
    temperature: float = 1.0
    top_k: int = 50
    top_p: float = 1.0
    repetition_penalty: float = 1.0
    bad_words_ids: Optional[Tuple[Tuple[int, ...], ...]] = None
    length_penalty: float = 1.0
    no_repeat_ngram_size: int = 0
    num_return_sequences: int = 1
    use_cache: bool = True

    def validate(self):
        # reference asserts (mixins.py:180-235)
        assert isinstance(self.max_length, int) and self.max_length > 0
        assert isinstance(self.min_length, int) and self.min_length >= 0
        assert isinstance(self.num_beams, int) and self.num_beams > 0
        assert self.temperature > 0
        assert isinstance(self.top_k, int) and self.top_k >= 0
        assert 0 <= self.top_p <= 1
        assert self.repetition_penalty >= 1.0
        assert self.length_penalty > 0
        assert self.no_repeat_ngram_size >= 0
        assert self.num_return_sequences > 0
        if not self.do_sample:
            if self.num_beams == 1:
                assert self.num_return_sequences == 1, (
                    "Greedy decoding will always produce the same output for "
                    "num_beams == 1 and num_return_sequences > 1")
            else:
                assert self.num_beams >= self.num_return_sequences, (
                    "Greedy beam search decoding cannot return more sequences "
                    "than it has beams")


def options_from_config(cfg: MultiModalBartConfig, **overrides) -> GenerationOptions:
    fields = {f.name for f in dataclasses.fields(GenerationOptions)}
    base = {k: getattr(cfg, k) for k in fields if hasattr(cfg, k)}
    base.update({k: v for k, v in overrides.items() if v is not None})
    if base.get("bad_words_ids"):
        base["bad_words_ids"] = tuple(tuple(w) for w in base["bad_words_ids"])
    return GenerationOptions(**base)


@lru_cache(maxsize=32)
def _compiled_generate(cfg: MultiModalBartConfig, opts: GenerationOptions):
    """Build the jitted end-to-end generate fn for a (config, options) pair."""
    opts.validate()
    K = opts.num_beams
    mult = opts.num_return_sequences if opts.do_sample else 1
    # batch-major expansion (mixins.py:316-324). The beam dimension is NOT
    # materialised: beam_search_loop shares each sample's encoder states
    # across its K beams (deduplicated cross K/V), so only the
    # return-sequence multiplier expands the encoder outputs.
    expand = mult if K > 1 else K * mult

    def fn(params, input_ids, image_features, attention_mask, rng):
        B = input_ids.shape[0]
        enc = bart.encode(params["model"], cfg, input_ids, image_features,
                          attention_mask)
        fbias = params.get("final_logits_bias")
        if expand > 1:
            enc = jnp.repeat(enc, expand, axis=0)
            attention_mask = jnp.repeat(attention_mask, expand, axis=0)

        common = dict(
            max_length=opts.max_length, min_length=opts.min_length,
            do_sample=opts.do_sample, temperature=opts.temperature,
            top_k=opts.top_k, top_p=opts.top_p,
            repetition_penalty=opts.repetition_penalty,
            no_repeat_ngram_size=opts.no_repeat_ngram_size,
            bad_words_ids=opts.bad_words_ids,
            pad_token_id=cfg.pad_token_id if cfg.pad_token_id is not None
            else cfg.eos_token_id,
            eos_token_id=cfg.eos_token_id,
            decoder_start_token_id=cfg.decoder_start_token_id
            if cfg.decoder_start_token_id is not None else cfg.bos_token_id,
        )
        if K > 1:
            return beam_search_loop(
                params["model"], cfg, fbias, enc, attention_mask, rng,
                batch_size=B * mult, num_beams=K,
                length_penalty=opts.length_penalty,
                early_stopping=opts.early_stopping,
                num_return_sequences=1 if opts.do_sample
                else opts.num_return_sequences,
                **common)
        return greedy_or_sample_loop(
            params["model"], cfg, fbias, enc, attention_mask, rng, **common)

    return jax.jit(fn)


def generate(params, cfg: MultiModalBartConfig, batch, *, rng=None, **kwargs):
    """Generate sequences for a collated batch.

    batch: {"input_ids", "attention_mask", optional "image_features"}.
    Returns np.ndarray [B * num_return_sequences, max_length], grouped
    batch-major exactly like the reference (src/generation.py:34-43).
    """
    trim = kwargs.pop("trim", True)
    opts = options_from_config(cfg, **kwargs)
    input_ids = jnp.asarray(batch["input_ids"])
    attention_mask = batch.get("attention_mask")
    if attention_mask is None:
        # mixins.py:239-242
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32) \
            if cfg.pad_token_id is not None else jnp.ones_like(input_ids)
    else:
        attention_mask = jnp.asarray(attention_mask)
    image_features = batch.get("image_features")
    if image_features is not None:
        image_features = jnp.asarray(image_features)

    fn = _compiled_generate(cfg, opts)
    if rng is None:
        rng = jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))
    out, eff_len = fn(params, input_ids, image_features, attention_mask, rng)
    if not trim:
        return np.asarray(out)
    # HF-exact output width: the beam path's sent_max_len / the no-beam
    # path's step count at loop exit (both < max_length only when every
    # sentence finished early) — byte-identical shapes to the reference's
    # returned tensor. ONE device_get for both values: a separate scalar
    # fetch added a full host<->device round-trip per call (measured -13%
    # decode throughput through the axon relay).
    out, eff_len = jax.device_get((out, eff_len))
    return out[:, :int(eff_len)]
