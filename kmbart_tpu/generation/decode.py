"""Fully jit'd greedy / sampling decode loop.

Parity target: HF 3.0.2 ``_generate_no_beam_search`` (inherited by the
reference through src/model/mixins.py:363-382): per-step postprocessing of
scores (repetition penalty, no-repeat-ngram, bad words, min-length),
greedy argmax over the (in-place postprocessed) logits or
temperature/top-k/top-p ancestral sampling, pad-after-finish bookkeeping
via ``unfinished_sents`` and early exit when every row has finished.

TPU design: one ``lax.while_loop`` over a preallocated [B, max_length]
token buffer and a static KV cache — a single XLA computation, no host
round-trips per token.
"""


import jax
import jax.numpy as jnp

from kmbart_tpu.models import bart
from kmbart_tpu.generation import logits as lp


def greedy_or_sample_loop(params, cfg, fbias, enc_hidden, enc_mask, rng, *,
                          max_length, min_length, do_sample, temperature,
                          top_k, top_p, repetition_penalty,
                          no_repeat_ngram_size, bad_words_ids,
                          pad_token_id, eos_token_id, decoder_start_token_id):
    """Decode [B] rows. Returns (tokens [B, max_length] (pad after EOS),
    eff_len) where eff_len is the step count at loop exit — HF 3.0.2's
    no-beam path returns exactly that width (its input_ids grow per step
    and the loop breaks when every row has finished)."""
    B = enc_hidden.shape[0]
    tokens = jnp.full((B, max_length), pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(decoder_start_token_id)
    cache = bart.init_decode_cache(params, cfg, enc_hidden, max_length)
    unfinished = jnp.ones((B,), jnp.int32)

    def cond(state):
        cur_len, tokens, cache, unfinished, rng = state
        return (cur_len < max_length) & (jnp.max(unfinished) > 0)

    def body(state):
        cur_len, tokens, cache, unfinished, rng = state
        prev = jax.lax.dynamic_slice_in_dim(tokens, cur_len - 1, 1, axis=1)
        hidden, cache = bart.decode_step(params, cfg, prev, cache,
                                         cur_len - 1, enc_mask)
        scores = bart.lm_logits(params, cfg, hidden, fbias)[:, 0, :]
        # NOTE: 3.0.2 _generate_no_beam_search postprocesses the raw logits
        # in place (no log_softmax, no forced BOS/EOS) — match that.
        scores = lp.postprocess_scores(
            scores, tokens, cur_len,
            repetition_penalty=repetition_penalty,
            no_repeat_ngram_size=no_repeat_ngram_size,
            bad_words_ids=bad_words_ids, min_length=min_length,
            eos_token_id=eos_token_id)

        if do_sample:
            if temperature != 1.0:
                scores = scores / temperature
            rng, sub = jax.random.split(rng)
            if top_k and top_k > 0:
                # sample among the k candidates directly — no full-vocab
                # gumbel noise / filter materialisation (lp.sample_from_top_k)
                next_token = lp.sample_from_top_k(scores, top_k, top_p, sub)
            else:
                scores = lp.top_k_top_p_filtering(scores, top_k, top_p)
                next_token = jax.random.categorical(sub, scores, axis=-1)
        else:
            next_token = jnp.argmax(scores, axis=-1)
        next_token = next_token.astype(jnp.int32)

        if eos_token_id is not None:
            to_add = next_token * unfinished + pad_token_id * (1 - unfinished)
            unfinished = unfinished * (to_add != eos_token_id).astype(jnp.int32)
        else:
            to_add = next_token

        tokens = jax.lax.dynamic_update_slice(tokens, to_add[:, None],
                                              (0, cur_len))
        return (cur_len + 1, tokens, cache, unfinished, rng)

    state = (jnp.int32(1), tokens, cache, unfinished,
             rng if rng is not None else jax.random.PRNGKey(0))
    cur_len, tokens, _, _, _ = jax.lax.while_loop(cond, body, state)
    return tokens, cur_len
