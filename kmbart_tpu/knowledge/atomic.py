"""COMET-ATOMIC knowledge generator.

Parity target: ``AtomicGenerator`` (scripts/atomic_generator.py:16-99):
load a COMET GPT checkpoint, encode the event, append one of the ATOMIC
category tokens (xIntent/xWant/xNeed/xReact/xEffect), sample the effect
continuation (greedy / beam-k / top-k per ``--sampling_algorithm``), map
categories onto KM-BART task types (xIntent,xWant -> intent; xNeed ->
before; xReact,xEffect -> after) and drop "none" generations.

TPU design: the sampler is a single jitted while-loop over a preallocated
KV cache; all five categories decode in one batched call.
"""


import jax
import jax.numpy as jnp
import numpy as np

from kmbart_tpu.knowledge import gpt

CATEGORIES = ("xIntent", "xWant", "xNeed", "xReact", "xEffect")
RESULT_MAP = {"xIntent": "intent", "xWant": "intent", "xNeed": "before",
              "xReact": "after", "xEffect": "after"}


class AtomicGenerator:
    def __init__(self, params, text_encoder, *, max_event=17, max_effect=34,
                 sampling_algorithm="greedy", end_token="<END>",
                 category_tokens=None, n_heads=12, rng=None):
        """``params``: GPT pytree (knowledge/gpt.py); ``text_encoder``:
        GPT1BPE (or anything with encode/decode); ``category_tokens``:
        {category: token_id} for the ATOMIC delimiter tokens (appended after
        the base vocab in COMET checkpoints)."""
        self.params = params
        self.enc = text_encoder
        self.max_event = max_event
        self.max_effect = max_effect
        self.n_heads = n_heads
        self.sampling = sampling_algorithm
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        vocab = getattr(text_encoder, "encoder", {})
        self.end_id = vocab.get(end_token + "</w>", vocab.get(end_token, 0))
        if category_tokens is None:
            # COMET appends <xNeed>.. style tokens after the text vocab
            category_tokens = {}
            base = len(vocab)
            for i, cat in enumerate(CATEGORIES):
                category_tokens[cat] = vocab.get(
                    "<%s>" % cat, base - len(CATEGORIES) + i)
        self.category_tokens = category_tokens
        self._fn = None

    # ------------------------------------------------------------------

    def _build_sampler(self):
        if self.sampling.startswith("beam"):
            return self._build_beam_sampler()
        max_prompt = self.max_event + 1
        max_len = max_prompt + self.max_effect
        params, n_heads = self.params, self.n_heads
        end_id = self.end_id
        topk = 10 if self.sampling.startswith("topk") else 0
        if self.sampling.startswith("topk") and "-" in self.sampling:
            topk = int(self.sampling.split("-")[1])
        do_sample = self.sampling.startswith("topk")

        @jax.jit
        def fn(prompt, prompt_len, rng):
            B = prompt.shape[0]
            tokens = jnp.zeros((B, max_len), jnp.int32)
            tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))
            cache = gpt.init_gpt_cache(params, B, max_len, n_heads)

            # prime the cache on the prompt (full forward then copy K/V)
            def prime(i, state):
                cache, _ = state
                tok = jax.lax.dynamic_slice_in_dim(tokens, i, 1, axis=1)
                hidden, cache = gpt.gpt_step(params, tok, cache, i, n_heads)
                return cache, hidden

            cache, hidden = jax.lax.fori_loop(
                0, max_prompt, prime, (cache, jnp.zeros((B, 1, params["embed"].shape[1]))))

            unfinished = jnp.ones((B,), jnp.int32)

            def cond(s):
                return (s[0] < max_len) & (jnp.max(s[3]) > 0)

            def body(s):
                cur, tokens, cache, unfinished, rng = s
                prev = jax.lax.dynamic_slice_in_dim(tokens, cur - 1, 1, axis=1)
                hidden, cache = gpt.gpt_step(params, prev, cache, cur - 1,
                                             n_heads)
                logits = gpt.gpt_logits(params, hidden)[:, 0, :]
                if do_sample:
                    rng, sub = jax.random.split(rng)
                    if topk and topk > 0:
                        from kmbart_tpu.generation.logits import (
                            sample_from_top_k)
                        nxt = sample_from_top_k(logits, topk, 1.0, sub)
                    else:
                        from kmbart_tpu.generation.logits import (
                            top_k_top_p_filtering)
                        logits = top_k_top_p_filtering(logits, topk, 1.0)
                        nxt = jax.random.categorical(
                            sub, logits).astype(jnp.int32)
                else:
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                nxt = nxt * unfinished
                unfinished = unfinished * (nxt != end_id).astype(jnp.int32)
                tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None],
                                                      (0, cur))
                return (cur + 1, tokens, cache, unfinished, rng)

            state = (jnp.int32(max_prompt), tokens, cache, unfinished, rng)
            _, tokens, _, _, _ = jax.lax.while_loop(cond, body, state)
            return tokens

        return fn

    def _build_beam_sampler(self):
        """'beam-K' sampling (scripts/atomic_generator.py via comet's
        BeamSampler): K beams per category, sum-logprob scoring, beams
        freeze on <END>; the best beam per category is returned."""
        K = int(self.sampling.split("-")[1]) if "-" in self.sampling else 5
        max_prompt = self.max_event + 1
        max_len = max_prompt + self.max_effect
        params, n_heads = self.params, self.n_heads
        end_id = self.end_id
        n_vocab = params["n_vocab"]

        @jax.jit
        def fn(prompt, prompt_len, rng):
            B = prompt.shape[0]
            BK = B * K
            tokens = jnp.zeros((BK, max_len), jnp.int32)
            tokens = jax.lax.dynamic_update_slice(
                tokens, jnp.repeat(prompt, K, axis=0), (0, 0))
            cache = gpt.init_gpt_cache(params, BK, max_len, n_heads)

            def prime(i, cache):
                tok = jax.lax.dynamic_slice_in_dim(tokens, i, 1, axis=1)
                _, cache = gpt.gpt_step(params, tok, cache, i, n_heads)
                return cache

            cache = jax.lax.fori_loop(0, max_prompt, prime, cache)
            beam_scores = jnp.full((B, K), -1e9).at[:, 0].set(0.0)
            finished = jnp.zeros((BK,), bool)
            b_idx = jnp.arange(B)

            def body(i, state):
                tokens, cache, beam_scores, finished = state
                prev = jax.lax.dynamic_slice_in_dim(tokens, i - 1, 1, axis=1)
                hidden, cache = gpt.gpt_step(params, prev, cache, i - 1,
                                             n_heads)
                logp = jax.nn.log_softmax(
                    gpt.gpt_logits(params, hidden)[:, 0, :], axis=-1)
                # frozen beams only continue with <END> at zero cost
                end_row = jnp.full((n_vocab,), -jnp.inf).at[end_id].set(0.0)
                logp = jnp.where(finished[:, None], end_row[None, :], logp)
                flat = (logp + beam_scores.reshape(BK, 1)).reshape(B, K * n_vocab)
                vals, idx = jax.lax.top_k(flat, K)
                parent = (b_idx[:, None] * K + idx // n_vocab).reshape(BK)
                tok = (idx % n_vocab).reshape(BK).astype(jnp.int32)
                tokens = jnp.take(tokens, parent, axis=0)
                tokens = jax.lax.dynamic_update_slice(
                    tokens, tok[:, None], (0, i))
                cache = {"k": jnp.take(cache["k"], parent, axis=1),
                         "v": jnp.take(cache["v"], parent, axis=1)}
                finished = jnp.take(finished, parent) | (tok == end_id)
                return (tokens, cache, vals, finished)

            tokens, cache, beam_scores, finished = jax.lax.fori_loop(
                max_prompt, max_len, body,
                (tokens, cache, beam_scores, finished))
            # best beam per category (pool is K-sorted each step: beam 0 best)
            best = jnp.argmax(beam_scores, axis=1)
            return tokens.reshape(B, K, max_len)[b_idx, best]

        return fn

    def get_reason(self, input_event):
        """{'after': [...], 'before': [...], 'intent': [...]} — best
        generation per category, 'none' dropped
        (scripts/atomic_generator.py:81-99)."""
        if self._fn is None:
            self._fn = self._build_sampler()
        event_ids = self.enc.encode(input_event)[: self.max_event]
        max_prompt = self.max_event + 1
        B = len(CATEGORIES)
        prompt = np.zeros((B, max_prompt), np.int32)
        for i, cat in enumerate(CATEGORIES):
            row = list(event_ids)
            # right-align the category token like COMET's fixed layout:
            # event padded to max_event, then the category delimiter
            prompt[i, : len(row)] = row
            prompt[i, self.max_event] = self.category_tokens[cat]
        self.rng, sub = jax.random.split(self.rng)
        tokens = np.asarray(self._fn(jnp.asarray(prompt), None, sub))

        result = {"after": [], "before": [], "intent": []}
        for i, cat in enumerate(CATEGORIES):
            gen = tokens[i, max_prompt:]
            text = self.enc.decode(gen.tolist(), stop_ids=(self.end_id, 0))
            if text and text != "none":
                result[RESULT_MAP[cat]].append(text)
        return result
