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

TPU design: one ``lax.while_loop``; the hypothesis pool is a fixed [B, K]
tensor store. The per-step updates are fully vectorised:
  - beam-front fill: the first K non-EOS candidates are selected with a
    cumsum-slot single scatter (no per-candidate unroll);
  - hypothesis commit: BeamHypotheses' insert-with-worst-replacement over
    sorted candidates is equivalent to "keep the top-K of (pool U new)",
    so each step merges the pool with the (rank < K) EOS candidates via one
    top_k over [B, 2K] — ~10 vector ops instead of hundreds of scalar ones
    (this was a 4x wall-clock win on v5e);
  - KV-cache beam reordering is one gather per tensor along the flattened
    batch*beam axis.
Output is [B * num_return_sequences, max_length] (pad-filled) plus the
HF finalisation width ``min(max(lens) + 1, max_length)`` — the caller
trims to it, so the returned shape matches the reference exactly
(3.0.2 ``_generate_beam_search`` sent_max_len).
"""

import jax
import jax.numpy as jnp

from kmbart_tpu.models import bart
from kmbart_tpu.generation import logits as lp
from kmbart_tpu.ops.pallas_beam_attention import build_selection_mask
from kmbart_tpu.ops.pallas_vocab_stats import (chunk_stats,
                                               chunk_stats_reference,
                                               chunk_stats_supported,
                                               logsumexp_from_stats)
from kmbart_tpu.ops.topk import (exact_top_k, pad_to_chunks, radix_top_k,
                                 topk_from_chunk_stats)

NEG_1E9 = -1e9


def _merge_pool(hyp, cand_scores, cand_tokens, cand_lens, K):
    """Keep the best K of (pool U candidates).

    hyp: (tokens [B,K,L], lens [B,K], scores [B,K], count [B], worst [B]);
    cand_*: [B, C] scored candidates (-inf score = absent).
    Equivalent to BeamHypotheses.add applied per candidate (any order):
    the pool always ends up holding the top-K scores ever added."""
    hyp_tokens, hyp_lens, hyp_scores, hyp_count, _ = hyp
    B, Kp, L = hyp_tokens.shape
    all_scores = jnp.concatenate([hyp_scores, cand_scores], axis=1)
    all_tokens = jnp.concatenate([hyp_tokens, cand_tokens], axis=1)
    all_lens = jnp.concatenate([hyp_lens, cand_lens], axis=1)

    top_scores, top_idx = jax.lax.top_k(all_scores, K)
    new_tokens = jnp.take_along_axis(
        all_tokens, top_idx[..., None], axis=1)
    new_lens = jnp.take_along_axis(all_lens, top_idx, axis=1)

    n_new = jnp.sum(cand_scores > NEG_1E9 / 2, axis=1)
    new_count = jnp.minimum(hyp_count + n_new, K)
    # worst over the *filled* slots: pool is sorted desc after the merge
    worst_idx = jnp.clip(new_count - 1, 0, K - 1)
    new_worst = jnp.take_along_axis(top_scores, worst_idx[:, None], axis=1)[:, 0]
    new_worst = jnp.where(new_count > 0, new_worst, 1e9)
    return (new_tokens, new_lens, top_scores, new_count, new_worst)


def beam_search_loop(params, cfg, fbias, enc_hidden, enc_mask, rng, *,
                     batch_size, num_beams, max_length, min_length,
                     do_sample, temperature, top_k, top_p, length_penalty,
                     early_stopping, repetition_penalty,
                     no_repeat_ngram_size, bad_words_ids, pad_token_id,
                     eos_token_id, decoder_start_token_id,
                     num_return_sequences):
    """enc_hidden/enc_mask are per-sample ([batch_size, ...], NOT
    beam-expanded): the K beams of a sample share its encoder states, so the
    cross K/V are kept deduplicated and the attention layer folds the beam
    group into the query length (the reference instead ``index_select``s K
    copies, mixins.py:316-324 — K x the decode-loop HBM traffic).

    Returns tokens [B * num_return_sequences, max_length].
    """
    B, K = batch_size, num_beams
    BK = B * K
    V = cfg.vocab_size
    b_idx = jnp.arange(B)

    # With every score postprocessor inert (the VCG decode default),
    # candidate selection can run on the RAW logits: log_softmax is
    # monotonic per row, so each beam's top-2K survivors are identical, and
    # only those 2K get normalised (exactly as log_softmax would) before the
    # cross-beam merge. This removes two full-vocab materialisations per
    # step (the [BK, V] log_softmax output and the [B, K*V] flat candidate
    # copy) from the hot loop — selection + tie-breaking stay bit-identical
    # to HF 3.0.2's topk over the flat normalised matrix (beam-major flat
    # index order == (beam asc, within-beam rank asc) merge order).
    _inert = (repetition_penalty == 1.0 and no_repeat_ngram_size == 0
              and bad_words_ids is None and min_length == 0)
    fast_select = _inert and not do_sample
    # Sampling rides the same chunk-stats machinery when the postprocessors
    # are inert and the draw is top-k-restricted: the per-row top-k of the
    # raw logits IS the top-k of the normalised scores (log_softmax is
    # monotonic per row; beam_scores is constant per row), and only those
    # kk survivors get normalised with the fused lse — the old branch paid
    # a full [BK, V] log_softmax + full-vocab exact_top_k per step.
    fast_sample = _inert and do_sample and bool(top_k) and top_k > 0

    tokens = jnp.full((BK, max_length), pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(decoder_start_token_id)
    # Beam-stationary cache: K/V rows are written once into the writer
    # beam's slot and NEVER permuted; a [BK, T] ancestry matrix tracks
    # which slot holds each past position per live beam, and the
    # self-attention gathers ancestors in-kernel
    # (ops/pallas_beam_attention.py). Replaces the reference's physical
    # _reorder_cache (mixins.py:419-434) whose full cache read+write per
    # step was the largest decode cost on v5e.
    stationary = getattr(cfg, "beam_stationary_cache", True)
    if stationary:
        caches = bart.init_decode_cache_layers(params, cfg, enc_hidden,
                                               max_length, num_beams=K)
        ancestry = jnp.zeros((BK, max_length), jnp.int32)
    else:
        cache = bart.init_decode_cache(params, cfg, enc_hidden, max_length,
                                       self_batch=BK)

    beam_scores = jnp.full((B, K), NEG_1E9, jnp.float32).at[:, 0].set(0.0)
    if do_sample:
        beam_scores = jnp.zeros((B, K), jnp.float32)  # HF: zeros when sampling

    done = jnp.zeros((B,), bool)
    hyp = (jnp.full((B, K, max_length), pad_token_id, jnp.int32),  # tokens
           jnp.zeros((B, K), jnp.int32),                            # lengths
           jnp.full((B, K), NEG_1E9, jnp.float32),                  # lp scores
           jnp.zeros((B,), jnp.int32),                              # count
           jnp.full((B,), 1e9, jnp.float32))                        # worst

    def length_norm(cur_len):
        c = jnp.asarray(cur_len, jnp.float32)
        return c if length_penalty == 1.0 else c ** length_penalty

    def body(state):
        (cur_len, tokens, beam_scores, cache, ancestry, hyp, rng, done,
         parent_prev) = state

        prev = jax.lax.dynamic_slice_in_dim(tokens, cur_len - 1, 1, axis=1)
        if stationary:
            # resolve this beam's history through its parent's ancestry
            # (a [BK, T] int32 permute — the cache itself never moves),
            # then claim the own slot for this step's K/V row
            ancestry = jnp.take(ancestry, parent_prev, axis=0)
            pos = jnp.arange(ancestry.shape[1])[None, :]
            own_slot = (jnp.arange(BK, dtype=jnp.int32) % K)[:, None]
            ancestry = jnp.where(pos == cur_len - 1, own_slot, ancestry)
            sel = build_selection_mask(ancestry, K, cur_len - 1,
                                       cfg.decoder_attention_heads)
            hidden, cache = bart.decode_step_stationary(
                params, cfg, prev, cache, cur_len - 1, sel, enc_mask,
                num_beams=K)
        else:
            # parent reordering applied lazily inside the per-layer scan
            # (avoids whole-cache copies; see bart.decode_step)
            hidden, cache = bart.decode_step(params, cfg, prev, cache,
                                             cur_len - 1, enc_mask,
                                             reorder_idx=parent_prev)
        logits = bart.lm_logits(params, cfg, hidden, fbias)[:, 0, :]

        if not do_sample:
            # adjust_logits_during_generation — greedy beam only (mixins.py:400)
            logits = lp.maybe_force_bos_eos(logits, cur_len, max_length,
                                            cfg.bos_token_id, eos_token_id)
        if do_sample and temperature != 1.0:
            logits = logits / temperature

        if fast_select or fast_sample:
            # one pipelined pass produces per-chunk maxima AND exp-sums:
            # the logsumexp and the top-k's chunk-max build share it (the
            # XLA version cost three separate full reads per step)
            xr = pad_to_chunks(logits)                          # [BK, C, ch]
            if chunk_stats_supported(BK):
                cm, es = chunk_stats(xr)
            else:
                cm, es = chunk_stats_reference(xr)
            lse = logsumexp_from_stats(cm, es)                  # [BK]
        if fast_select:
            row_vals, row_idx = topk_from_chunk_stats(xr, cm, 2 * K)
            norm = (row_vals - lse[:, None]) + beam_scores.reshape(BK, 1)
            merged = norm.reshape(B, K * 2 * K)
            beam_base = (jnp.arange(K, dtype=jnp.int32) * V)[None, :, None]
            flat_idx = (row_idx.reshape(B, K, 2 * K)
                        + beam_base).reshape(B, K * 2 * K)
            cand_scores, pos = jax.lax.top_k(merged, 2 * K)
            cand_idx = jnp.take_along_axis(flat_idx, pos, axis=1)
        elif not fast_sample:
            scores = jax.nn.log_softmax(logits, axis=-1)
            scores = lp.postprocess_scores(
                scores, tokens, cur_len,
                repetition_penalty=repetition_penalty,
                no_repeat_ngram_size=no_repeat_ngram_size,
                bad_words_ids=bad_words_ids, min_length=min_length,
                eos_token_id=eos_token_id)

        if do_sample:
            rng, sub = jax.random.split(rng)
            if top_k and top_k > 0:
                # restrict to each row's top-k candidates before the
                # Gumbel draw: tokens masked by the filter carry zero
                # probability either way, so sampling over [B, K*kk]
                # candidates is distribution-identical to the full
                # [B, K*V] draw — and the full-vocab gumbel noise was the
                # dominant per-step cost (see lp.sample_from_top_k)
                kk = max(top_k, 2)
                if fast_sample:
                    # top-k of the raw logits == top-k of the normalised
                    # scores (per-row monotonic); normalise the survivors
                    # with the fused lse instead of a [BK, V] log_softmax.
                    # Extraction: radix select (fixed pass count) beats the
                    # k-step greedy walk at k=50 (round-4 A/B, BASELINE.md);
                    # sample_radix_bits=0 keeps the greedy path. The

                    # survivors come out sorted (a [BK, kk] top_k — cheap)
                    # so candidate POSITIONS match the greedy walk exactly:
                    # the gumbel draw is then bit-identical for a fixed key
                    # across both impls, and top-p's cumsum sees descending
                    # order as it requires.
                    radix_bits = getattr(cfg, "sample_radix_bits", 2)
                    if radix_bits:
                        raw_vals, vidx = radix_top_k(
                            xr, kk, bits=radix_bits, sort=True)
                    else:
                        raw_vals, vidx = topk_from_chunk_stats(xr, cm, kk)
                    vals = ((raw_vals - lse[:, None])
                            + beam_scores.reshape(BK, 1))
                else:
                    _scores = scores + beam_scores.reshape(BK, 1)
                    vals, vidx = exact_top_k(_scores, kk)   # [BK, kk] desc
                if top_p < 1.0:
                    cum = jnp.cumsum(jax.nn.softmax(vals, axis=-1), axis=-1)
                    remove = cum > top_p
                    remove = jnp.concatenate(
                        [jnp.zeros_like(remove[:, :1]), remove[:, :-1]],
                        axis=-1).at[:, :2].set(False)  # min_tokens_to_keep=2
                    vals = jnp.where(remove, NEG_1E9, vals)
                beam_of_row = (jnp.arange(BK, dtype=jnp.int32) % K)[:, None]
                flat = vals.reshape(B, K * kk)
                flat_gidx = (beam_of_row * V + vidx).reshape(B, K * kk)
                gumbel = jax.random.gumbel(sub, flat.shape, jnp.float32)
                _, pos = jax.lax.top_k(
                    jnp.where(flat > NEG_1E9 / 2, flat + gumbel, -jnp.inf),
                    2 * K)
                cand_scores = jnp.take_along_axis(flat, pos, axis=1)
                cand_idx = jnp.take_along_axis(flat_gidx, pos, axis=1)
            else:
                _scores = scores + beam_scores.reshape(BK, 1)
                _scores = lp.top_k_top_p_filtering(_scores, top_k, top_p,
                                                   min_tokens_to_keep=2)
                flat = _scores.reshape(B, K * V)
                # Gumbel top-k == multinomial sampling without replacement
                gumbel = jax.random.gumbel(sub, flat.shape, jnp.float32)
                _, cand_idx = exact_top_k(
                    jnp.where(flat > NEG_1E9 / 2, flat + gumbel, -jnp.inf),
                    2 * K)
                cand_scores = jnp.take_along_axis(flat, cand_idx, axis=1)
            order = jnp.argsort(-cand_scores, axis=1)
            cand_scores = jnp.take_along_axis(cand_scores, order, axis=1)
            cand_idx = jnp.take_along_axis(cand_idx, order, axis=1)
        elif not fast_select:
            flat = (scores + beam_scores.reshape(BK, 1)).reshape(B, K * V)
            # lax.top_k lowers to a full 8M-element sort here; the iterative
            # exact top-k is ~10x cheaper (see ops/topk.py)
            cand_scores, cand_idx = exact_top_k(flat, 2 * K)

        cand_beam = cand_idx // V   # [B, 2K] parent beam within batch
        cand_tok = (cand_idx % V).astype(jnp.int32)
        is_eos = (cand_tok == eos_token_id) if eos_token_id is not None \
            else jnp.zeros((B, 2 * K), bool)
        lp_denorm = length_norm(cur_len)
        tokens_bk = tokens.reshape(B, K, max_length)

        # ---- commit finished hypotheses (rank < K EOS candidates) --------
        if eos_token_id is not None:
            eligible = is_eos[:, :K] & ~done[:, None]
            hyp_cand_scores = jnp.where(
                eligible, cand_scores[:, :K] / lp_denorm, -jnp.inf)
            parent_tokens = jnp.take_along_axis(
                tokens_bk, cand_beam[:, :K, None], axis=1)  # [B, K, L]
            hyp_cand_lens = jnp.where(eligible, cur_len, 0)
            hyp = _merge_pool(hyp, hyp_cand_scores, parent_tokens,
                              hyp_cand_lens, K)
        hyp_tokens, hyp_lens, hyp_scores, hyp_count, worst = hyp

        # ---- fill the next beam front with the first K non-EOS candidates
        non_eos = ~is_eos
        slot = jnp.cumsum(non_eos.astype(jnp.int32), axis=1) - 1  # [B, 2K]
        take = non_eos & (slot < K)
        wslot = jnp.clip(slot, 0, K - 1)
        rows = jnp.broadcast_to(b_idx[:, None], (B, 2 * K))
        # each (b, wslot) pair receives exactly one take=True candidate
        nb_scores = jnp.zeros((B, K), jnp.float32).at[rows, wslot].add(
            jnp.where(take, cand_scores, 0.0))
        nb_tokens = jnp.zeros((B, K), jnp.int32).at[rows, wslot].add(
            jnp.where(take, cand_tok, 0))
        nb_parents = jnp.zeros((B, K), jnp.int32).at[rows, wslot].add(
            jnp.where(take, cand_beam, 0))

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

        # ---- reorder beams + append token ---------------------------------
        # tokens are reordered eagerly (small); the KV cache is reordered
        # lazily inside the next decode_step via parent_global
        parent_global = (b_idx[:, None] * K + nb_parents).reshape(BK)
        tokens = jnp.take(tokens, parent_global, axis=0)
        tokens = jax.lax.dynamic_update_slice(
            tokens, nb_tokens.reshape(BK, 1), (0, cur_len))

        return (cur_len + 1, tokens, nb_scores, cache, ancestry, hyp, rng,
                done, parent_global)

    state = (jnp.int32(1), tokens, beam_scores,
             caches if stationary else cache,
             ancestry if stationary else jnp.zeros((1,), jnp.int32),
             hyp, rng if rng is not None else jax.random.PRNGKey(0), done,
             jnp.arange(BK, dtype=jnp.int32))

    def cond_fn(state):
        return (state[0] < max_length) & ~jnp.all(state[7])

    cur_len, tokens, beam_scores, _, _, hyp, rng, done, _ = \
        jax.lax.while_loop(cond_fn, body, state)

    # ---- finalise: unfinished batches contribute their live beams ----------
    lp_denorm = length_norm(cur_len)
    final_scores = jnp.where(~done[:, None], beam_scores / lp_denorm, -jnp.inf)
    final_lens = jnp.where(~done[:, None], cur_len, 0)
    hyp = _merge_pool(hyp, final_scores, tokens.reshape(B, K, max_length),
                      final_lens, K)
    hyp_tokens, hyp_lens, hyp_scores, _, _ = hyp

    # ---- select num_return_sequences best per batch -------------------------
    # (pool is already sorted descending after the merges)
    sel_tokens = hyp_tokens[:, :num_return_sequences]
    sel_lens = hyp_lens[:, :num_return_sequences]

    out = sel_tokens.reshape(B * num_return_sequences, max_length)
    lens = sel_lens.reshape(B * num_return_sequences)
    if eos_token_id is not None:
        pos = jnp.arange(max_length)[None, :]
        append_eos = (pos == lens[:, None]) & (lens[:, None] < max_length)
        out = jnp.where(append_eos, eos_token_id, out)
        # anything past the stored length is padding
        out = jnp.where(pos > lens[:, None], pad_token_id, out)
    # HF 3.0.2 finalisation width: sent_max_len = min(max(lens)+1, max_len)
    eff_len = jnp.minimum(jnp.max(lens) + 1, max_length)
    return out, eff_len
