"""Sampling utility.

Parity target: ``sample_sentence`` (src/model/utils.py:6-58): ancestral
top-k/top-p sampling that also returns per-sentence summed log-probs
(used for reranking experiments; not wired to the CLIs in the reference
either). TPU-native: one jitted ``lax.while_loop`` with the KV cache
instead of the reference's cache-less full re-decode per token.
"""

import jax
import jax.numpy as jnp
import numpy as np

from kmbart_tpu.models import bart
from kmbart_tpu.generation import logits as lp


def sample_sentence(params, cfg, input_ids, image_features, attention_mask,
                    tokenizer, top_k=50, top_p=1.0, max_length=20, rng=None):
    """Returns (decoder_input_ids [B, <=max_length], sum_logprobs [B, 1])."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    fn = _build(cfg, top_k, top_p, max_length, tokenizer.bos_token_id,
                tokenizer.eos_token_id, tokenizer.pad_token_id)
    tokens, sum_logprobs = fn(params, jnp.asarray(input_ids),
                              None if image_features is None else jnp.asarray(image_features),
                              jnp.asarray(attention_mask), rng)
    return np.asarray(tokens), np.asarray(sum_logprobs)


def _build(cfg, top_k, top_p, max_length, bos, eos, pad):
    @jax.jit
    def fn(params, input_ids, image_features, attention_mask, rng):
        model = params["model"]
        fbias = params.get("final_logits_bias")
        enc = bart.encode(model, cfg, input_ids, image_features, attention_mask)
        B = input_ids.shape[0]
        tokens = jnp.full((B, max_length), pad, jnp.int32).at[:, 0].set(bos)
        cache = bart.init_decode_cache(model, cfg, enc, max_length)
        unfinished = jnp.ones((B,), jnp.int32)
        logprobs = jnp.zeros((B, max_length), jnp.float32)
        sent_len = jnp.full((B,), max_length, jnp.int32)

        def cond(s):
            return (s[0] < max_length) & (jnp.max(s[3]) > 0)

        def body(s):
            cur_len, tokens, cache, unfinished, logprobs, sent_len, rng = s
            prev = jax.lax.dynamic_slice_in_dim(tokens, cur_len - 1, 1, axis=1)
            hidden, cache = bart.decode_step(model, cfg, prev, cache,
                                             cur_len - 1, attention_mask)
            raw = bart.lm_logits(model, cfg, hidden, fbias)[:, 0, :]
            rng, sub = jax.random.split(rng)
            if top_k and top_k > 0:
                # draw over the k candidates only; the per-token log-prob
                # over the filtered distribution (src/model/utils.py:34-36)
                # comes from the same small [B, k] values
                from kmbart_tpu.ops.topk import exact_top_k
                vals, idx = exact_top_k(raw, top_k)
                if top_p < 1.0:
                    cum = jnp.cumsum(jax.nn.softmax(vals, axis=-1), axis=-1)
                    remove = jnp.concatenate(
                        [jnp.zeros_like(cum[:, :1], bool),
                         (cum > top_p)[:, :-1]], axis=-1)
                    vals = jnp.where(remove, lp.NEG_INF, vals)
                slot = jax.random.categorical(sub, vals)
                next_token = jnp.take_along_axis(
                    idx, slot[:, None], axis=1)[:, 0].astype(jnp.int32)
                tok_lp = jnp.take_along_axis(
                    jax.nn.log_softmax(vals, axis=-1),
                    slot[:, None], axis=1)[:, 0]
            else:
                filtered = lp.top_k_top_p_filtering(raw, top_k, top_p)
                next_token = jax.random.categorical(
                    sub, filtered).astype(jnp.int32)
                logp = jax.nn.log_softmax(filtered, axis=-1)
                tok_lp = jnp.take_along_axis(
                    logp, next_token[:, None], axis=1)[:, 0]
            logprobs = logprobs.at[:, cur_len].set(
                jnp.where(unfinished > 0, tok_lp, 0.0))

            to_add = next_token * unfinished + pad * (1 - unfinished)
            eos_now = (to_add == eos) & (unfinished > 0)
            sent_len = jnp.where(eos_now, cur_len + 1, sent_len)
            unfinished = unfinished * (to_add != eos).astype(jnp.int32)
            tokens = jax.lax.dynamic_update_slice(tokens, to_add[:, None],
                                                  (0, cur_len))
            return (cur_len + 1, tokens, cache, unfinished, logprobs,
                    sent_len, rng)

        state = (jnp.int32(1), tokens, cache, unfinished, logprobs, sent_len, rng)
        _, tokens, _, _, logprobs, sent_len, _ = jax.lax.while_loop(cond, body, state)
        # zero out anything at/after the sentence end (utils.py:53-54)
        pos = jnp.arange(max_length)[None, :]
        logprobs = jnp.where(pos >= sent_len[:, None] - 1 + 1, 0.0, logprobs)
        return tokens, jnp.sum(logprobs, axis=1, keepdims=True)

    return fn
