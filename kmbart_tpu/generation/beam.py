"""Fully jit'd beam search.

Parity target: HF 3.0.2 ``_generate_beam_search`` + ``BeamHypotheses``
(inherited by the reference through src/model/mixins.py:336-361):
  - forced BOS at step 1 and forced EOS at max_length-1 applied to the raw
    logits before log_softmax (mixins.py:400-405), greedy-beam only;
  - score postprocessing (repetition penalty, no-repeat-ngram, bad words,
    min-length EOS mask) on the log-probs;
  - top-2K candidate expansion per batch, EOS candidates with rank < K are
    committed as finished hypotheses (kept as a best-K pool with
    worst-replacement), non-EOS candidates fill the next beam front;
  - ``done`` batches emit (0, pad, 0) and stop updating;
  - early stopping: with ``early_stopping`` a batch is done once K
    hypotheses exist, otherwise once the worst kept hypothesis can no longer
    be beaten (worst >= best_sum_logprobs / cur_len**length_penalty);
  - finalisation adds the live beams of unfinished batches, then the best
    ``num_return_sequences`` hypotheses per batch are emitted, EOS-appended
    when shorter than max_length.

TPU design: the whole search is one ``lax.while_loop``; the hypothesis pool
is a fixed [B, K] tensor store; the per-step candidate commit is a static
unroll over the 2K candidates of fully vectorised batch ops; KV-cache beam
reordering is a single gather along the flattened batch*beam axis.
Output is always [B * num_return_sequences, max_length] (pad-filled) —
the reference trims to the longest sentence, which only changes padding.
"""

import jax
import jax.numpy as jnp

from kmbart_tpu.models import bart
from kmbart_tpu.generation import logits as lp

NEG_1E9 = -1e9


def _insert_hyp(hyp, b_idx, can_insert, cand_tokens, cand_score, cand_len, K):
    """Vectorised BeamHypotheses.add with worst-replacement."""
    hyp_tokens, hyp_lens, hyp_scores, hyp_count, worst = hyp
    slot = jnp.where(hyp_count < K, hyp_count, jnp.argmin(hyp_scores, axis=1))
    slot = jnp.clip(slot, 0, K - 1)

    cur_tok = hyp_tokens[b_idx, slot]
    cur_len_ = hyp_lens[b_idx, slot]
    cur_sc = hyp_scores[b_idx, slot]
    hyp_tokens = hyp_tokens.at[b_idx, slot].set(
        jnp.where(can_insert[:, None], cand_tokens, cur_tok))
    hyp_lens = hyp_lens.at[b_idx, slot].set(
        jnp.where(can_insert, cand_len, cur_len_))
    hyp_scores = hyp_scores.at[b_idx, slot].set(
        jnp.where(can_insert, cand_score, cur_sc))
    new_count = jnp.where(can_insert, jnp.minimum(hyp_count + 1, K), hyp_count)
    # worst_score bookkeeping (BeamHypotheses.add): when the pool is full the
    # worst is the min over kept scores; while filling, min(score, worst).
    full_min = jnp.min(hyp_scores, axis=1)
    worst = jnp.where(
        can_insert,
        jnp.where(new_count == K, full_min, jnp.minimum(worst, cand_score)),
        worst)
    return (hyp_tokens, hyp_lens, hyp_scores, new_count, worst)


def beam_search_loop(params, cfg, fbias, enc_hidden, enc_mask, rng, *,
                     batch_size, num_beams, max_length, min_length,
                     do_sample, temperature, top_k, top_p, length_penalty,
                     early_stopping, repetition_penalty,
                     no_repeat_ngram_size, bad_words_ids, pad_token_id,
                     eos_token_id, decoder_start_token_id,
                     num_return_sequences):
    """enc_hidden/enc_mask are already beam-expanded to [B*K, ...].

    Returns tokens [B * num_return_sequences, max_length].
    """
    B, K = batch_size, num_beams
    BK = B * K
    V = cfg.vocab_size
    b_idx = jnp.arange(B)

    tokens = jnp.full((BK, max_length), pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(decoder_start_token_id)
    cache = bart.init_decode_cache(params, cfg, enc_hidden, max_length)

    beam_scores = jnp.full((B, K), NEG_1E9, jnp.float32).at[:, 0].set(0.0)
    if do_sample:
        beam_scores = jnp.zeros((B, K), jnp.float32)  # HF: zeros when sampling

    done = jnp.zeros((B,), bool)
    hyp = (jnp.full((B, K, max_length), pad_token_id, jnp.int32),  # tokens
           jnp.zeros((B, K), jnp.int32),                            # lengths
           jnp.full((B, K), NEG_1E9, jnp.float32),                  # lp scores
           jnp.zeros((B,), jnp.int32),                              # count
           jnp.full((B,), 1e9, jnp.float32))                        # worst

    def body(state):
        cur_len, tokens, beam_scores, cache, hyp, rng, done = state
        hyp_tokens, hyp_lens, hyp_scores, hyp_count, worst = hyp

        prev = jax.lax.dynamic_slice_in_dim(tokens, cur_len - 1, 1, axis=1)
        hidden, cache = bart.decode_step(params, cfg, prev, cache,
                                         cur_len - 1, enc_mask)
        logits = bart.lm_logits(params, cfg, hidden, fbias)[:, 0, :]

        if not do_sample:
            # adjust_logits_during_generation — greedy beam only (mixins.py:400)
            logits = lp.maybe_force_bos_eos(logits, cur_len, max_length,
                                            cfg.bos_token_id, eos_token_id)
        if do_sample and temperature != 1.0:
            logits = logits / temperature
        scores = jax.nn.log_softmax(logits, axis=-1)
        scores = lp.postprocess_scores(
            scores, tokens, cur_len,
            repetition_penalty=repetition_penalty,
            no_repeat_ngram_size=no_repeat_ngram_size,
            bad_words_ids=bad_words_ids, min_length=min_length,
            eos_token_id=eos_token_id)

        if do_sample:
            _scores = scores + beam_scores.reshape(BK, 1)
            _scores = lp.top_k_top_p_filtering(_scores, top_k, top_p,
                                               min_tokens_to_keep=2)
            flat = _scores.reshape(B, K * V)
            rng, sub = jax.random.split(rng)
            # Gumbel top-k == multinomial sampling without replacement
            gumbel = jax.random.gumbel(sub, flat.shape, jnp.float32)
            _, cand_idx = jax.lax.top_k(
                jnp.where(flat > NEG_1E9 / 2, flat + gumbel, -jnp.inf), 2 * K)
            cand_scores = jnp.take_along_axis(flat, cand_idx, axis=1)
            order = jnp.argsort(-cand_scores, axis=1)
            cand_scores = jnp.take_along_axis(cand_scores, order, axis=1)
            cand_idx = jnp.take_along_axis(cand_idx, order, axis=1)
        else:
            flat = (scores + beam_scores.reshape(BK, 1)).reshape(B, K * V)
            cand_scores, cand_idx = jax.lax.top_k(flat, 2 * K)

        cand_beam = cand_idx // V   # [B, 2K] parent beam within batch
        cand_tok = cand_idx % V

        tokens_bk = tokens.reshape(B, K, max_length)
        lp_denorm = jnp.asarray(cur_len, jnp.float32) ** length_penalty

        slots = jnp.zeros((B,), jnp.int32)
        nb_scores = jnp.zeros((B, K), jnp.float32)
        nb_tokens = jnp.zeros((B, K), jnp.int32)
        nb_parents = jnp.zeros((B, K), jnp.int32)

        new_hyp = (hyp_tokens, hyp_lens, hyp_scores, hyp_count, worst)
        for j in range(2 * K):
            tok = cand_tok[:, j]
            sc = cand_scores[:, j]
            par = cand_beam[:, j]
            is_eos = tok == eos_token_id if eos_token_id is not None \
                else jnp.zeros((B,), bool)

            if eos_token_id is not None and j < K:
                # commit finished hypothesis (rank < num_beams only)
                score_lp = sc / lp_denorm
                _, _, _, cnt, wst = new_hyp
                can = is_eos & ~done & ((cnt < K) | (score_lp > wst))
                parent_tokens = tokens_bk[b_idx, par]
                new_hyp = _insert_hyp(new_hyp, b_idx, can, parent_tokens,
                                      score_lp, cur_len, K)

            take = ~is_eos & (slots < K)
            wslot = jnp.clip(slots, 0, K - 1)
            nb_scores = nb_scores.at[b_idx, wslot].set(
                jnp.where(take, sc, nb_scores[b_idx, wslot]))
            nb_tokens = nb_tokens.at[b_idx, wslot].set(
                jnp.where(take, tok, nb_tokens[b_idx, wslot]))
            nb_parents = nb_parents.at[b_idx, wslot].set(
                jnp.where(take, par, nb_parents[b_idx, wslot]))
            slots = slots + take.astype(jnp.int32)

        hyp_tokens, hyp_lens, hyp_scores, hyp_count, worst = new_hyp

        # done batches emit (0, pad, 0) — HF _generate_beam_search
        nb_scores = jnp.where(done[:, None], 0.0, nb_scores)
        nb_tokens = jnp.where(done[:, None], pad_token_id, nb_tokens)
        nb_parents = jnp.where(done[:, None], 0, nb_parents)

        # is_done: best candidate can no longer beat the kept worst
        best_sum = cand_scores[:, 0]
        if early_stopping:
            newly_done = hyp_count >= K
        else:
            newly_done = (hyp_count >= K) & (worst >= best_sum / lp_denorm)
        done = done | newly_done

        # reorder beams + append token
        parent_global = (b_idx[:, None] * K + nb_parents).reshape(BK)
        tokens = jnp.take(tokens, parent_global, axis=0)
        tokens = jax.lax.dynamic_update_slice(
            tokens, nb_tokens.reshape(BK, 1), (0, cur_len))
        cache = dict(cache,
                     self_k=jnp.take(cache["self_k"], parent_global, axis=1),
                     self_v=jnp.take(cache["self_v"], parent_global, axis=1))

        new_hyp = (hyp_tokens, hyp_lens, hyp_scores, hyp_count, worst)
        return (cur_len + 1, tokens, nb_scores, cache, new_hyp, rng, done)

    state = (jnp.int32(1), tokens, beam_scores, cache, hyp,
             rng if rng is not None else jax.random.PRNGKey(0), done)

    def cond_fn(state):
        return (state[0] < max_length) & ~jnp.all(state[6])

    cur_len, tokens, beam_scores, cache, hyp, rng, done = \
        jax.lax.while_loop(cond_fn, body, state)
    hyp_tokens, hyp_lens, hyp_scores, hyp_count, worst = hyp

    # ---- finalise: unfinished batches contribute their live beams ----------
    lp_denorm = jnp.asarray(cur_len, jnp.float32) ** length_penalty
    tokens_bk = tokens.reshape(B, K, max_length)
    new_hyp = (hyp_tokens, hyp_lens, hyp_scores, hyp_count, worst)
    for k in range(K):
        score_lp = beam_scores[:, k] / lp_denorm
        _, _, _, cnt, wst = new_hyp
        can = ~done & ((cnt < K) | (score_lp > wst))
        new_hyp = _insert_hyp(new_hyp, b_idx, can, tokens_bk[:, k],
                              score_lp, cur_len, K)
    hyp_tokens, hyp_lens, hyp_scores, _, _ = new_hyp

    # ---- select num_return_sequences best per batch -------------------------
    order = jnp.argsort(-hyp_scores, axis=1)[:, :num_return_sequences]
    sel_tokens = jnp.take_along_axis(
        hyp_tokens, order[..., None].repeat(max_length, -1), axis=1)
    sel_lens = jnp.take_along_axis(hyp_lens, order, axis=1)

    out = sel_tokens.reshape(B * num_return_sequences, max_length)
    lens = sel_lens.reshape(B * num_return_sequences)
    if eos_token_id is not None:
        pos = jnp.arange(max_length)[None, :]
        append_eos = (pos == lens[:, None]) & (lens[:, None] < max_length)
        out = jnp.where(append_eos, eos_token_id, out)
        # anything past the stored length is padding
        out = jnp.where(pos > lens[:, None], pad_token_id, out)
    return out
