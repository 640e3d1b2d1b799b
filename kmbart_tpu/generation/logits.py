"""Jit-compatible logits processors for decoding.

Parity target: the HF 3.0.2 generation post-processing the reference inherits
(src/model/mixins.py:10-14): ``postprocess_next_token_scores`` (repetition
penalty, no-repeat-ngram banning, bad-words banning, min-length EOS masking),
``top_k_top_p_filtering``, and ``adjust_logits_during_generation`` /
``_force_token_ids_generation`` (forced BOS at step 1 / EOS at max_length-1,
src/model/mixins.py:400-417).

All functions are shape-static: ``tokens`` is the preallocated [B, max_len]
buffer and ``cur_len`` a traced scalar, so everything lives happily inside a
``lax.while_loop``.
"""

import jax
import jax.numpy as jnp

NEG_INF = -float("inf")


def force_token(scores, token_id):
    """Set all columns except ``token_id`` to -inf (mixins.py:407-417)."""
    vocab = scores.shape[-1]
    keep = jnp.arange(vocab) == token_id
    return jnp.where(keep[None, :], scores, NEG_INF)


def maybe_force_bos_eos(scores, cur_len, max_length, bos_token_id, eos_token_id):
    """adjust_logits_during_generation (mixins.py:400-405), traced cur_len."""
    scores = jnp.where(cur_len == 1, force_token(scores, bos_token_id), scores)
    if eos_token_id is not None:
        scores = jnp.where(cur_len == max_length - 1,
                           force_token(scores, eos_token_id), scores)
    return scores


def _presence(tokens, cur_len, vocab_size):
    """presence[b, v] = 1 iff v appears in tokens[b, :cur_len]."""
    B, T = tokens.shape
    valid = (jnp.arange(T)[None, :] < cur_len).astype(jnp.float32)
    presence = jnp.zeros((B, vocab_size), jnp.float32)
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
    return presence.at[rows, tokens].max(valid)


def apply_repetition_penalty(scores, tokens, cur_len, penalty):
    """HF enforce_repetition_penalty_: seen tokens get score/p (if >0) or
    score*p (if <0). ``penalty`` is a static python float."""
    if penalty == 1.0:
        return scores
    present = _presence(tokens, cur_len, scores.shape[-1]) > 0
    penalised = jnp.where(scores < 0, scores * penalty, scores / penalty)
    return jnp.where(present, penalised, scores)


def ban_repeated_ngrams(scores, tokens, cur_len, ngram_size):
    """calc_banned_ngram_tokens: ban any token that would complete an n-gram
    already present in tokens[:, :cur_len]. ``ngram_size`` static (>0)."""
    if ngram_size <= 0:
        return scores
    B, T = tokens.shape
    n = ngram_size
    if T < n:
        return scores
    # windows[b, s] = tokens[b, s:s+n]
    windows = jnp.stack([tokens[:, s:T - n + 1 + s] for s in range(n)], axis=-1)
    # current (n-1)-token suffix of the generated prefix
    suffix_idx = cur_len - (n - 1) + jnp.arange(n - 1)  # valid when cur_len >= n-1
    suffix_idx = jnp.clip(suffix_idx, 0, T - 1)
    suffix = jnp.take_along_axis(tokens, suffix_idx[None, :].repeat(B, 0), axis=1)
    match = jnp.all(windows[:, :, : n - 1] == suffix[:, None, :], axis=-1)
    # window must be fully inside the generated prefix: s + n - 1 <= cur_len - 1
    s_idx = jnp.arange(windows.shape[1])[None, :]
    match = match & (s_idx + n - 1 <= cur_len - 1) & (cur_len >= n)
    banned_tok = windows[:, :, n - 1]
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], banned_tok.shape)
    ban = jnp.zeros(scores.shape, jnp.float32).at[rows, banned_tok].max(
        match.astype(jnp.float32))
    return jnp.where(ban > 0, NEG_INF, scores)


def apply_bad_words(scores, tokens, cur_len, bad_words_ids):
    """Ban the final token of each bad-words sequence whose prefix matches
    the tail of the generated prefix (HF calc_banned_bad_words_ids)."""
    if not bad_words_ids:
        return scores
    B, T = tokens.shape
    for word in bad_words_ids:
        k = len(word) - 1
        if k == 0:
            hit = jnp.ones((B,), bool)
        else:
            idx = jnp.clip(cur_len - k + jnp.arange(k), 0, T - 1)
            tail = jnp.take_along_axis(tokens, idx[None, :].repeat(B, 0), axis=1)
            hit = jnp.all(tail == jnp.asarray(word[:-1]), axis=-1) & (cur_len >= k)
        scores = scores.at[:, word[-1]].set(
            jnp.where(hit, NEG_INF, scores[:, word[-1]]))
    return scores


def min_length_eos_mask(scores, cur_len, min_length, eos_token_id):
    if eos_token_id is None or min_length <= 0:
        return scores
    return scores.at[:, eos_token_id].set(
        jnp.where(cur_len < min_length, NEG_INF, scores[:, eos_token_id]))


def postprocess_scores(scores, tokens, cur_len, *, repetition_penalty=1.0,
                       no_repeat_ngram_size=0, bad_words_ids=None,
                       min_length=0, eos_token_id=None):
    """HF 3.0.2 postprocess_next_token_scores order."""
    scores = apply_repetition_penalty(scores, tokens, cur_len, repetition_penalty)
    scores = ban_repeated_ngrams(scores, tokens, cur_len, no_repeat_ngram_size)
    scores = apply_bad_words(scores, tokens, cur_len, bad_words_ids)
    scores = min_length_eos_mask(scores, cur_len, min_length, eos_token_id)
    return scores


def sample_from_top_k(logits, top_k, top_p, rng, min_tokens_to_keep=1):
    """Categorical sample restricted to the per-row top-k candidates.

    Distribution-identical to ``top_k_top_p_filtering`` + full-vocab
    ``jax.random.categorical`` (masked tokens carry zero probability
    either way) but draws the categorical over [B, k] instead of
    [B, vocab] — the full-vocab gumbel noise was the dominant per-step
    cost of the sampling decode loop on v5e (~13 ms of a 21 ms step at
    batch 256). One deviation from the HF filter: exact value ties AT the
    k-th rank keep only the lowest-index k tokens rather than the whole
    tied group — probability-mass-identical for the sampled distribution
    up to which of the bit-equal candidates can be drawn.
    Returns int32 [B] sampled token ids.
    """
    from kmbart_tpu.ops.topk import exact_top_k

    k = max(top_k, min_tokens_to_keep)
    vals, idx = exact_top_k(logits, k)                 # sorted descending
    if top_p < 1.0:
        cum = jnp.cumsum(jax.nn.softmax(vals, axis=-1), axis=-1)
        remove = cum > top_p
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[:, :1]), remove[:, :-1]], axis=-1)
        if min_tokens_to_keep > 1:
            remove = remove.at[:, :min_tokens_to_keep].set(False)
        vals = jnp.where(remove, NEG_INF, vals)
    slot = jax.random.categorical(rng, vals, axis=-1)
    return jnp.take_along_axis(
        idx, slot[:, None], axis=-1)[:, 0].astype(jnp.int32)


def top_k_top_p_filtering(logits, top_k=0, top_p=1.0, min_tokens_to_keep=1):
    """HF 3.0.2 top_k_top_p_filtering. top_k/top_p static python values."""
    vocab = logits.shape[-1]
    if top_k > 0:
        k = min(max(top_k, min_tokens_to_keep), vocab)
        kth = jnp.sort(logits, axis=-1)[:, -k][:, None]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        order = jnp.argsort(-logits, axis=-1)
        cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove = cum_probs > top_p
        # shift right: always keep the first token above the threshold
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[:, :1]), remove[:, :-1]], axis=-1)
        if min_tokens_to_keep > 1:
            remove = remove.at[:, :min_tokens_to_keep].set(False)
        # scatter back to vocab order
        B = logits.shape[0]
        rows = jnp.broadcast_to(jnp.arange(B)[:, None], order.shape)
        remove_vocab = jnp.zeros_like(remove).at[rows, order].set(remove)
        logits = jnp.where(remove_vocab, NEG_INF, logits)
    return logits
