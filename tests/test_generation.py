"""Decode-loop tests: 3.0.2 semantics invariants + greedy parity vs HF."""

import jax
import numpy as np
import pytest

from kmbart_tpu.models import bart
from kmbart_tpu.models.conditional import init_conditional_params
from kmbart_tpu.generation.api import generate
from kmbart_tpu.generation import logits as lp


@pytest.fixture(scope="module")
def setup(tiny_cfg):
    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(3)
    B, S = 3, 11
    ids = rng.integers(4, 80, (B, S)).astype(np.int32)
    batch = {"input_ids": ids,
             "attention_mask": np.ones((B, S), np.int32)}
    return cfg, params, batch


def _seq_logprob(params, cfg, batch, out, length_penalty=1.0):
    """Teacher-forced cumulative log-prob of generated rows (for ranking
    invariants). Skips the forced-BOS step contribution the way 3.0.2 does
    (forced steps contribute exactly 0)."""
    enc = bart.encode(params["model"], cfg,
                      batch["input_ids"], None, batch["attention_mask"])
    n_rep = out.shape[0] // enc.shape[0]
    enc = np.repeat(np.asarray(enc), n_rep, axis=0)
    am = np.repeat(batch["attention_mask"], n_rep, axis=0)
    hid = bart.decode(params["model"], cfg, out[:, :-1],
                      enc, enc_attention_mask=am)
    logp = jax.nn.log_softmax(
        bart.lm_logits(params["model"], cfg, hid,
                       params["final_logits_bias"]), axis=-1)
    logp = np.asarray(logp)
    scores = []
    for i in range(out.shape[0]):
        total, n = 0.0, 0
        for t in range(1, out.shape[1]):
            tok = out[i, t]
            if t == 1:  # forced BOS contributes 0 in 3.0.2
                n += 1
                continue
            if tok == cfg.pad_token_id and out[i, t - 1] in (cfg.eos_token_id,
                                                             cfg.pad_token_id):
                break
            total += logp[i, t - 1, tok]
            n += 1
            if tok == cfg.eos_token_id:
                break
        scores.append(total / (n ** length_penalty))
    return np.asarray(scores)


def test_beam_output_structure(setup):
    cfg, params, batch = setup
    out = generate(params, cfg, batch, max_length=10, num_beams=3,
                   early_stopping=True)
    assert out.shape == (3, 10)
    assert (out[:, 0] == cfg.decoder_start_token_id).all()
    assert (out[:, 1] == cfg.bos_token_id).all()          # forced BOS
    for row in out:
        eos_pos = np.nonzero(row == cfg.eos_token_id)[0]
        assert len(eos_pos) >= 1                          # forced EOS
        after = row[eos_pos[0] + 1:]
        assert (after == cfg.pad_token_id).all()          # pad after EOS


@pytest.mark.slow
def test_beam_return_sequences_sorted(setup):
    cfg, params, batch = setup
    out = generate(params, cfg, batch, max_length=9, num_beams=4,
                   num_return_sequences=3, early_stopping=True)
    assert out.shape == (9, 9)
    scores = _seq_logprob(params, cfg, batch, out)
    for b in range(3):
        s = scores[b * 3:(b + 1) * 3]
        assert s[0] >= s[1] - 1e-4 and s[1] >= s[2] - 1e-4, s


@pytest.mark.slow
def test_beam_beats_greedy(setup):
    cfg, params, batch = setup
    g = generate(params, cfg, batch, max_length=10)
    b = generate(params, cfg, batch, max_length=10, num_beams=4,
                 early_stopping=False)
    # greedy doesn't force BOS/EOS in 3.0.2, so compare plain seq logprob
    sg = _seq_logprob(params, cfg, batch, g)
    sb = _seq_logprob(params, cfg, batch, b)
    assert (sb >= sg - 1e-4).all(), (sb, sg)


def test_no_repeat_ngram(setup):
    cfg, params, batch = setup
    out = generate(params, cfg, batch, max_length=16, num_beams=2,
                   no_repeat_ngram_size=2)
    for row in out:
        toks = [t for t in row.tolist() if t != cfg.pad_token_id]
        bigrams = list(zip(toks, toks[1:]))
        assert len(bigrams) == len(set(bigrams)), row


def test_min_length_blocks_eos(setup):
    cfg, params, batch = setup
    out = generate(params, cfg, batch, max_length=14, num_beams=2,
                   min_length=10)
    for row in out:
        eos_pos = np.nonzero(row == cfg.eos_token_id)[0]
        assert eos_pos[0] >= 9, row


@pytest.mark.slow
def test_bad_words_banned(setup):
    cfg, params, batch = setup
    free = generate(params, cfg, batch, max_length=10, num_beams=2)
    # ban the most frequent non-special generated token
    vals, counts = np.unique(free[free > 3], return_counts=True)
    banned = int(vals[np.argmax(counts)])
    out = generate(params, cfg, batch, max_length=10, num_beams=2,
                   bad_words_ids=[[banned]])
    assert not (out == banned).any()


def test_sampling_respects_top_k():
    logits = np.log(np.array([[0.4, 0.3, 0.2, 0.05, 0.05]]))
    filtered = np.asarray(lp.top_k_top_p_filtering(
        jax.numpy.asarray(logits), top_k=2, top_p=1.0))
    assert np.isfinite(filtered[0, :2]).all()
    assert np.isinf(filtered[0, 2:]).all()


def test_top_p_keeps_first_above_threshold():
    logits = np.log(np.array([[0.5, 0.3, 0.15, 0.05]]))
    filtered = np.asarray(lp.top_k_top_p_filtering(
        jax.numpy.asarray(logits), top_k=0, top_p=0.6))
    # cumulative 0.5, 0.8 -> keep first two (shift-right rule)
    assert np.isfinite(filtered[0, :2]).all()
    assert np.isinf(filtered[0, 2:]).all()


def _hf_twin(cfg, params, *, forced_bos=None, forced_eos=None):
    """Build a transformers BartForConditionalGeneration carrying exactly
    our parameters (text path only — no image embedding)."""
    import torch
    import transformers
    from kmbart_tpu.checkpoint.torch_import import pytree_to_state_dict

    sd = pytree_to_state_dict(params, cfg)
    hf_cfg = transformers.BartConfig(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers, decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        decoder_attention_heads=cfg.decoder_attention_heads,
        encoder_ffn_dim=cfg.encoder_ffn_dim, decoder_ffn_dim=cfg.decoder_ffn_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        activation_function="gelu", dropout=0.0, attention_dropout=0.0,
        pad_token_id=cfg.pad_token_id, bos_token_id=cfg.bos_token_id,
        eos_token_id=cfg.eos_token_id,
        decoder_start_token_id=cfg.decoder_start_token_id,
        forced_bos_token_id=forced_bos, forced_eos_token_id=forced_eos)
    hf = transformers.BartForConditionalGeneration(hf_cfg).eval()
    hf_sd = {k: torch.tensor(np.asarray(v, np.float32)) for k, v in sd.items()
             if "embed_images" not in k}
    hf_sd["lm_head.weight"] = hf_sd["model.shared.weight"]
    hf.load_state_dict(hf_sd, strict=True)
    return hf


def test_greedy_parity_with_hf(setup):
    """Greedy continuation matches transformers with forcing disabled
    (3.0.2's no-beam path applies no forced BOS/EOS)."""
    torch = pytest.importorskip("torch")

    cfg, params, batch = setup
    hf = _hf_twin(cfg, params)
    max_length = 12
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(batch["input_ids"].astype(np.int64)),
            attention_mask=torch.tensor(batch["attention_mask"].astype(np.int64)),
            max_length=max_length, num_beams=1, do_sample=False,
            min_length=0).numpy()
    ours = np.asarray(generate(params, cfg, batch, max_length=max_length))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("kwargs", [
    dict(num_beams=5, early_stopping=True),
    dict(num_beams=5, early_stopping=False),
    pytest.param(dict(num_beams=5, early_stopping=True, length_penalty=0.7),
                 marks=pytest.mark.slow),
    pytest.param(dict(num_beams=5, early_stopping=False, length_penalty=0.7),
                 marks=pytest.mark.slow),
    pytest.param(dict(num_beams=5, early_stopping=True, length_penalty=2.0),
                 marks=pytest.mark.slow),
    pytest.param(dict(num_beams=5, early_stopping=False, length_penalty=2.0),
                 marks=pytest.mark.slow),
    dict(num_beams=4, early_stopping=True, no_repeat_ngram_size=2),
    dict(num_beams=5, early_stopping=True, num_return_sequences=3),
    pytest.param(dict(num_beams=5, early_stopping=False,
                      num_return_sequences=3), marks=pytest.mark.slow),
],
    ids=["es", "no-es", "lp0.7-es", "lp0.7", "lp2-es", "lp2",
         "ngram2", "nrs3-es", "nrs3"])
def test_beam_parity_with_hf(setup, kwargs):
    """Token-for-token beam-search parity vs transformers, with the 3.0.2
    BART forcing (forced BOS at step 1, forced EOS at max_length-1)
    expressed via forced_bos/forced_eos ids (ref: src/model/mixins.py beam
    path inherited from transformers 3.0.2 _generate_beam_search)."""
    torch = pytest.importorskip("torch")

    cfg, params, batch = setup
    hf = _hf_twin(cfg, params, forced_bos=cfg.bos_token_id,
                  forced_eos=cfg.eos_token_id)
    max_length = 14
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(batch["input_ids"].astype(np.int64)),
            attention_mask=torch.tensor(batch["attention_mask"].astype(np.int64)),
            max_length=max_length, do_sample=False, min_length=0,
            **kwargs).numpy()
    ours = np.asarray(generate(params, cfg, batch, max_length=max_length,
                               **kwargs))
    # byte-identical INCLUDING the finalisation width (HF sent_max_len)
    np.testing.assert_array_equal(ours, ref)


def test_exact_top_k_matches_lax(np_rng):
    from kmbart_tpu.ops.topk import exact_top_k
    import jax.numpy as jnp
    x = np_rng.normal(size=(4, 50000)).astype(np.float32)
    x[0, 123] = x[0, 456] = 9.0  # ties -> lowest index first
    v1, i1 = jax.lax.top_k(jnp.asarray(x), 10)
    v2, i2 = exact_top_k(jnp.asarray(x), 10)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # small rows defer to lax.top_k
    y = np_rng.normal(size=(4, 64)).astype(np.float32)
    v3, i3 = exact_top_k(jnp.asarray(y), 10)
    v4, i4 = jax.lax.top_k(jnp.asarray(y), 10)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i4))


def test_radix_top_k_matches_lax(np_rng):
    """The radix-select exact top-k (sampling fast path) must reproduce
    lax.top_k bit-for-bit: values, indices, and tie order — across ties,
    negatives, -inf padding, and heavy-duplication rows."""
    import jax.numpy as jnp
    from kmbart_tpu.ops.topk import pad_to_chunks, radix_top_k

    for bits in (1, 2, 4):
        x = np_rng.normal(size=(6, 50320)).astype(np.float32) * 5
        x[0, 123] = x[0, 456] = x[0, 40000] = 99.0   # cross-chunk ties
        x[1, :] = -np.abs(x[1, :])                   # all negative
        x[2, :] = 1.25                               # fully degenerate row
        x[3, ::7] = -np.inf
        x[4, :60] = np.arange(60)                    # top-k inside one chunk
        v, i = radix_top_k(pad_to_chunks(jnp.asarray(x)), 50, bits=bits)
        rv, ri = jax.lax.top_k(jnp.asarray(x), 50)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    # quantised fuzz: many exact ties at the kth boundary
    for t in range(5):
        x = np.round(np_rng.normal(size=(4, 20000)) * 3).astype(np.float32)
        v, i = radix_top_k(pad_to_chunks(jnp.asarray(x)), 13)
        rv, ri = jax.lax.top_k(jnp.asarray(x), 13)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


@pytest.mark.parametrize("sizes", [
    ((4, 5000), (3, 4096)),
    pytest.param(((8, 50320),), marks=pytest.mark.slow),  # real-vocab width
], ids=["small", "vocab"])
def test_chunk_stats_select_path(np_rng, sizes):
    """The fused stats path (pad -> chunk stats -> lse + topk-from-stats)
    must reproduce lax.top_k (incl. tie order) and logsumexp exactly."""
    import jax.numpy as jnp
    from kmbart_tpu.ops.pallas_vocab_stats import (chunk_stats_reference,
                                                   logsumexp_from_stats)
    from kmbart_tpu.ops.topk import pad_to_chunks, topk_from_chunk_stats

    for B, N in sizes:
        x = jnp.asarray(np_rng.normal(size=(B, N)).astype(np.float32) * 5)
        xr = pad_to_chunks(x)
        cm, es = chunk_stats_reference(xr)
        lse = np.asarray(logsumexp_from_stats(cm, es))
        np.testing.assert_allclose(
            lse, np.asarray(jax.scipy.special.logsumexp(x, axis=-1)),
            rtol=1e-5)
        v, i = topk_from_chunk_stats(xr, cm, 10)
        rv, ri = jax.lax.top_k(x, 10)
        np.testing.assert_allclose(np.asarray(v), np.asarray(rv), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    # duplicated values across chunks keep the lowest-index order
    x = jnp.zeros((2, 3000)).at[0, 2500].set(5.).at[0, 100].set(5.) \
        .at[1, 2999].set(3.).at[1, 0].set(3.)
    xr = pad_to_chunks(x)
    cm, es = chunk_stats_reference(xr)
    _, i = topk_from_chunk_stats(xr, cm, 4)
    _, ri = jax.lax.top_k(x, 4)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_chunk_stats_forced_token_rows():
    """force_token (forced BOS/EOS) rows are all -inf except one column, so
    ~49 of the 50 vocab chunks are ENTIRELY -inf. The exp-shift must not
    produce NaN for those chunks (exp(-inf - -inf)): the row logsumexp must
    equal the surviving token's logit exactly, through both the XLA
    reference and the Pallas kernel (interpret mode)."""
    import jax.numpy as jnp
    from kmbart_tpu.generation.logits import force_token
    from kmbart_tpu.ops.pallas_vocab_stats import (chunk_stats,
                                                   chunk_stats_reference,
                                                   logsumexp_from_stats)
    from kmbart_tpu.ops.topk import pad_to_chunks, topk_from_chunk_stats

    B, V = 8, 50320
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(B, V)).astype(np.float32) * 4)
    forced = force_token(logits, 2)            # all -inf except column 2
    xr = pad_to_chunks(forced)
    for stats_fn in (chunk_stats_reference,
                     lambda a: chunk_stats(a, interpret=True)):
        cm, es = stats_fn(xr)
        assert not np.any(np.isnan(np.asarray(cm)))
        assert not np.any(np.isnan(np.asarray(es)))
        lse = np.asarray(logsumexp_from_stats(cm, es))
        np.testing.assert_allclose(lse, np.asarray(forced[:, 2]), rtol=1e-6)
        v, i = topk_from_chunk_stats(xr, cm, 10)
        assert np.all(np.asarray(i)[:, 0] == 2)
        np.testing.assert_allclose(np.asarray(v)[:, 0],
                                   np.asarray(forced[:, 2]), rtol=1e-6)
        assert np.all(np.asarray(v)[:, 1:] == -np.inf)
    # a fully--inf row must come back -inf, not NaN
    dead = jnp.full((8, 5000), -jnp.inf, jnp.float32)
    cm, es = chunk_stats_reference(pad_to_chunks(dead))
    assert np.all(np.asarray(logsumexp_from_stats(cm, es)) == -np.inf)


def test_exact_top_k_tie_torture(np_rng):
    """Chunk-max selection: duplicates inside one chunk, across chunks, and
    straddling chunk boundaries must keep lax.top_k's lowest-index order."""
    from kmbart_tpu.ops.topk import _chunk_max_top_k
    import jax.numpy as jnp
    x = np_rng.normal(size=(3, 50000)).astype(np.float32)
    x[0, 100] = x[0, 101] = x[0, 102] = 8.0       # triple inside chunk 0
    x[0, 511] = x[0, 512] = 8.0                    # straddles chunks 0/1
    x[1, 1000] = x[1, 20000] = x[1, 40000] = 7.5   # across distant chunks
    x[2, :] = -np.inf                              # exhausted row
    x[2, 7] = 1.0
    v1, i1 = jax.lax.top_k(jnp.asarray(x[:2]), 10)
    v2, i2 = _chunk_max_top_k(jnp.asarray(x[:2]), 10)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    v, i = _chunk_max_top_k(jnp.asarray(x[2:]), 10)
    assert np.asarray(i)[0, 0] == 7 and np.asarray(v)[0, 0] == 1.0
    assert np.all(np.asarray(v)[0, 1:] == -np.inf)


def test_sample_from_top_k_kept_set(np_rng):
    """sample_from_top_k must only ever emit tokens the reference
    top_k_top_p_filtering would keep, and its internal top-p mask must
    match the filter's kept set exactly (no boundary off-by-one)."""
    import jax.numpy as jnp
    from kmbart_tpu.generation import logits as lp

    x = np_rng.normal(size=(6, 2000)).astype(np.float32) * 3
    for top_k, top_p in ((50, 1.0), (50, 0.9), (8, 0.5)):
        ref = np.asarray(lp.top_k_top_p_filtering(
            jnp.asarray(x), top_k, top_p))
        kept = set(map(tuple, np.argwhere(np.isfinite(ref))))
        draws = set()
        for seed in range(40):
            tok = np.asarray(lp.sample_from_top_k(
                jnp.asarray(x), top_k, top_p, jax.random.PRNGKey(seed)))
            for b, t in enumerate(tok):
                draws.add((b, int(t)))
        assert draws <= kept, (top_k, top_p, sorted(draws - kept)[:5])


@pytest.mark.slow
def test_beam_parity_with_hf_multichunk_vocab(np_rng):
    """Beam parity at a vocab WIDER than the chunk-stats chunk (1024):
    the round-2 forced-token NaN bug was invisible to every tiny-vocab
    test because a < 1024 vocab always keeps the forced token's chunk
    finite — this config (vocab 5120 = 5 chunks, d=128, 4 layers) drives
    the all--inf chunks through the fast-select path on every run."""
    torch = pytest.importorskip("torch")
    from kmbart_tpu.config import tiny_config
    from kmbart_tpu.models.conditional import init_conditional_params

    cfg = tiny_config(dtype="float32", vocab_size=5120, d_model=128,
                      encoder_layers=4, decoder_layers=4,
                      encoder_attention_heads=4, decoder_attention_heads=4,
                      encoder_ffn_dim=256, decoder_ffn_dim=256,
                      img_feat_id=5000, cls_token_id=5003,
                      max_position_embeddings=64)
    params = init_conditional_params(jax.random.PRNGKey(7), cfg)
    hf = _hf_twin(cfg, params, forced_bos=cfg.bos_token_id,
                  forced_eos=cfg.eos_token_id)
    B, S = 4, 12
    ids = np_rng.integers(4, 4990, (B, S)).astype(np.int32)
    batch = {"input_ids": ids, "attention_mask": np.ones((B, S), np.int32)}
    max_length = 14
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(
                batch["attention_mask"].astype(np.int64)),
            max_length=max_length, num_beams=5, do_sample=False,
            min_length=0, early_stopping=True).numpy()
    ours = np.asarray(generate(params, cfg, batch, max_length=max_length,
                               num_beams=5, early_stopping=True))
    np.testing.assert_array_equal(ours, ref)


def test_output_trim_matches_hf_early_finish(setup):
    """When every sentence finishes early, the returned WIDTH must equal
    HF's (beam: sent_max_len = max(lens)+1; greedy: the step count at
    loop exit) — exercised by biasing the LM head hard toward EOS."""
    torch = pytest.importorskip("torch")

    cfg, params, batch = setup
    biased = dict(params)
    biased["final_logits_bias"] = np.asarray(
        params["final_logits_bias"]).copy()
    biased["final_logits_bias"][cfg.eos_token_id] += 25.0
    hf = _hf_twin(cfg, biased, forced_bos=cfg.bos_token_id,
                  forced_eos=cfg.eos_token_id)
    max_length = 12
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(batch["input_ids"].astype(np.int64)),
            attention_mask=torch.tensor(
                batch["attention_mask"].astype(np.int64)),
            max_length=max_length, num_beams=3, do_sample=False,
            min_length=0, early_stopping=True).numpy()
    ours = np.asarray(generate(biased, cfg, batch, max_length=max_length,
                               num_beams=3, early_stopping=True))
    assert ours.shape == ref.shape  # trimmed width, not max_length
    assert ours.shape[1] < max_length
    np.testing.assert_array_equal(ours, ref)

    hf_g = _hf_twin(cfg, biased)
    with torch.no_grad():
        ref_g = hf_g.generate(
            input_ids=torch.tensor(batch["input_ids"].astype(np.int64)),
            attention_mask=torch.tensor(
                batch["attention_mask"].astype(np.int64)),
            max_length=max_length, num_beams=1, do_sample=False,
            min_length=0).numpy()
    ours_g = np.asarray(generate(biased, cfg, batch, max_length=max_length))
    assert ours_g.shape == ref_g.shape
    np.testing.assert_array_equal(ours_g, ref_g)

    # trim=False keeps the fixed compiled width for shape-static callers
    full = np.asarray(generate(biased, cfg, batch, max_length=max_length,
                               num_beams=3, early_stopping=True, trim=False))
    assert full.shape == (3, max_length)
    np.testing.assert_array_equal(full[:, :ours.shape[1]], ours)
