"""Model trunk tests: shapes, splice semantics, incremental-decode parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmbart_tpu.models import bart
from kmbart_tpu.models.conditional import init_conditional_params, conditional_loss
from kmbart_tpu.models.pretraining import init_pretraining_params, pretraining_loss


def _inputs(cfg, rng, B=2, S=12, T=6, n_img=3):
    ids = rng.integers(4, 80, (B, S)).astype(np.int32)
    ids[:, 1:1 + n_img] = cfg.img_feat_id
    feats = rng.normal(size=(B, cfg.max_img_num, cfg.image_feature_size)
                       ).astype(np.float32)
    am = np.ones((B, S), np.int32)
    dec = rng.integers(4, 80, (B, T)).astype(np.int32)
    return ids, feats, am, dec


def test_forward_shapes(tiny_cfg, np_rng):
    cfg = tiny_cfg
    params = bart.init_bart_params(jax.random.PRNGKey(0), cfg)
    ids, feats, am, dec = _inputs(cfg, np_rng)
    hid, enc = bart.forward(params, cfg, ids, feats, am, decoder_input_ids=dec)
    assert hid.shape == (2, 6, cfg.d_model)
    assert enc.shape == (2, 12, cfg.d_model)


def test_multimodal_splice_exact(tiny_cfg, np_rng):
    """The i-th image token row must equal the projected i-th ROI vector
    (reference _embed_multi_modal, src/model/modules.py:89-102)."""
    cfg = tiny_cfg.replace(dtype="float32")
    params = bart.init_bart_params(jax.random.PRNGKey(0), cfg)
    ids, feats, _, _ = _inputs(cfg, np_rng, n_img=3)
    # make position 5 a <cls> token (MRM-masked region slot)
    ids[0, 5] = cfg.cls_token_id
    emb = bart.embed_multimodal(params, cfg, ids, feats, jnp.float32)
    proj = (feats @ np.asarray(params["encoder"]["embed_images"]["kernel"])
            + np.asarray(params["encoder"]["embed_images"]["bias"]))
    # row 0: img tokens at 1,2,3 take slots 0,1,2; cls at 5 takes slot 3
    for pos, slot in ((1, 0), (2, 1), (3, 2), (5, 3)):
        np.testing.assert_allclose(np.asarray(emb[0, pos]), proj[0, slot],
                                   rtol=1e-5)
    # non-image rows keep the token embedding
    tok = np.asarray(params["shared"])[ids[0, 0]]
    np.testing.assert_allclose(np.asarray(emb[0, 0]), tok, rtol=1e-6)


def test_incremental_decode_matches_full(tiny_cfg, np_rng):
    cfg = tiny_cfg.replace(dtype="float32")
    params = bart.init_bart_params(jax.random.PRNGKey(0), cfg)
    ids, feats, am, dec = _inputs(cfg, np_rng, T=7)
    enc = bart.encode(params, cfg, ids, feats, am)
    full = bart.decode(params, cfg, dec, enc, enc_attention_mask=am)
    cache = bart.init_decode_cache(params, cfg, enc, max_len=7,
                                   cache_dtype=jnp.float32)
    outs = []
    for t in range(7):
        h, cache = bart.decode_step(params, cfg, dec[:, t:t + 1], cache,
                                    jnp.int32(t), enc_attention_mask=am)
        outs.append(h[:, 0])
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc),
                               rtol=2e-4, atol=2e-5)


def test_padding_invariance(tiny_cfg, np_rng):
    """Padding the encoder input must not change unmasked outputs."""
    cfg = tiny_cfg.replace(dtype="float32")
    params = bart.init_bart_params(jax.random.PRNGKey(0), cfg)
    ids, feats, am, dec = _inputs(cfg, np_rng, S=10)
    enc_a = bart.encode(params, cfg, ids, feats, am)
    padded = np.full((2, 16), cfg.pad_token_id, np.int32)
    padded[:, :10] = ids
    am2 = np.zeros((2, 16), np.int32)
    am2[:, :10] = 1
    enc_b = bart.encode(params, cfg, padded, feats, am2)
    np.testing.assert_allclose(np.asarray(enc_a), np.asarray(enc_b[:, :10]),
                               rtol=1e-4, atol=1e-5)


def test_remat_equivalence(tiny_cfg, np_rng):
    # remat always runs the scanned layer path, so pin the baseline to the
    # scan too (the unrolled default differs by backend op-scheduling noise)
    cfg = tiny_cfg.replace(dtype="float32", train_unroll_layers=False)
    params = bart.init_bart_params(jax.random.PRNGKey(0), cfg)
    ids, feats, am, dec = _inputs(cfg, np_rng)
    a = bart.encode(params, cfg, ids, feats, am)
    b = bart.encode(params, cfg.replace(remat=True), ids, feats, am)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_unrolled_layers_match_scan(tiny_cfg, np_rng):
    """train_unroll_layers must be numerics-equivalent to the scan path
    (same ops per layer, including the per-layer rng fold-in)."""
    cfg = tiny_cfg.replace(dtype="float32", train_unroll_layers=True)
    cfg_s = cfg.replace(train_unroll_layers=False)
    params = bart.init_bart_params(jax.random.PRNGKey(0), cfg)
    ids, feats, am, dec = _inputs(cfg, np_rng)
    rng = jax.random.PRNGKey(4)
    a = bart.encode(params, cfg, ids, feats, am, train=True, rng=rng)
    b = bart.encode(params, cfg_s, ids, feats, am, train=True, rng=rng)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)
    da = bart.decode(params, cfg, dec, a, am, train=True, rng=rng)
    db = bart.decode(params, cfg_s, dec, b, am, train=True, rng=rng)
    np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                               rtol=2e-5, atol=2e-5)


def test_pretraining_loss_zero_masks(tiny_cfg, np_rng):
    """Heads with nothing present contribute exactly zero (reference skips
    them entirely: src/model/model.py:248-289)."""
    cfg = tiny_cfg
    params = init_pretraining_params(jax.random.PRNGKey(0), cfg)
    ids, feats, am, dec = _inputs(cfg, np_rng, T=6)
    B, T = dec.shape
    batch = dict(
        input_ids=ids, attention_mask=am, image_features=feats,
        decoder_input_ids=dec, decoder_attention_mask=np.ones((B, T), np.int32),
        labels=dec.copy(),
        mrm_soft_labels=np.zeros((B, T, cfg.num_labels), np.float32),
        mrm_mask=np.zeros((B, T), bool),
        attribute_labels=np.zeros((B, T), np.int32),
        attribute_mask=np.zeros((B, T), np.float32),
        relation_pairs=np.zeros((B, 2, 2), np.int32),
        relation_labels=np.zeros((B, 2), np.int32),
        relation_mask=np.zeros((B, 2), bool),
    )
    total, aux = pretraining_loss(params, cfg, batch)
    assert float(aux["losses"]["mrm_loss"]) == 0.0
    assert float(aux["losses"]["attribute_loss"]) == 0.0
    assert float(aux["losses"]["relation_loss"]) == 0.0
    assert np.isfinite(float(total))


def test_lm_loss_ignores_minus_100(tiny_cfg, np_rng):
    cfg = tiny_cfg
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    ids, feats, am, dec = _inputs(cfg, np_rng)
    labels = dec.copy().astype(np.int32)
    batch = dict(input_ids=ids, attention_mask=am, image_features=feats,
                 decoder_input_ids=dec, labels=labels)
    loss_all, _ = conditional_loss(params, cfg, batch)
    labels2 = labels.copy()
    labels2[:, -2:] = -100
    loss_masked, _ = conditional_loss(params, cfg, dict(batch, labels=labels2))
    assert not np.isclose(float(loss_all), float(loss_masked))
    # fully ignored -> mean over zero rows guards to 0/1, stays finite
    labels3 = np.full_like(labels, -100)
    loss_none, _ = conditional_loss(params, cfg, dict(batch, labels=labels3))
    assert np.isfinite(float(loss_none))


def test_mrm_kl_exact_value(tiny_cfg):
    """KL(batchmean) numerics: one-hot target vs uniform prediction = log C."""
    import math
    from kmbart_tpu.models.heads import masked_kl_div_batchmean
    C = 8
    logp = jnp.log(jnp.full((1, 3, C), 1.0 / C))
    soft = np.zeros((1, 3, C), np.float32)
    soft[0, 1, 0] = 1.0  # one masked row, one-hot
    mask = np.zeros((1, 3), bool)
    mask[0, 1] = True
    loss, n = masked_kl_div_batchmean(logp, jnp.asarray(soft), jnp.asarray(mask))
    assert int(n) == 1
    assert float(loss) == pytest.approx(math.log(C), rel=1e-6)
    # two masked rows -> mean over rows
    soft[0, 2, 1] = 1.0
    mask[0, 2] = True
    loss2, n2 = masked_kl_div_batchmean(logp, jnp.asarray(soft), jnp.asarray(mask))
    assert int(n2) == 2
    assert float(loss2) == pytest.approx(math.log(C), rel=1e-6)


def test_mrm_kl_matches_torch(tiny_cfg):
    """Exact parity with F.kl_div(..., reduction='batchmean') on random data."""
    torch = pytest.importorskip("torch")
    from kmbart_tpu.models.heads import masked_kl_div_batchmean
    rng = np.random.default_rng(0)
    C, R = 11, 5
    logits = rng.normal(size=(R, C)).astype(np.float32)
    targets = rng.dirichlet(np.ones(C), R).astype(np.float32)
    ref = torch.nn.functional.kl_div(
        torch.log_softmax(torch.tensor(logits), dim=1),
        torch.tensor(targets), reduction="batchmean").item()
    logp = jax.nn.log_softmax(jnp.asarray(logits)[None], axis=-1)
    loss, _ = masked_kl_div_batchmean(
        logp, jnp.asarray(targets)[None], jnp.ones((1, R), bool))
    assert float(loss) == pytest.approx(ref, rel=1e-5)


def test_grouped_cross_attention_matches_repeat(np_rng):
    """Beam-grouped cross-attention (deduplicated K/V, ops/attention.py)
    must equal attention against per-beam repeated K/V."""
    from kmbart_tpu.ops.attention import multi_head_attention, padding_bias
    B, K, T, D, H = 3, 4, 7, 32, 4
    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, 9)
    params = {n: jax.random.normal(k, (D, D), jnp.float32) * 0.1
              for n, k in zip(("q_kernel", "k_kernel", "v_kernel", "o_kernel"),
                              keys[:4])}
    params.update({n: jax.random.normal(k, (D,), jnp.float32) * 0.1
                   for n, k in zip(("q_bias", "k_bias", "v_bias", "o_bias"),
                                   keys[4:8])})
    hidden = jax.random.normal(keys[8], (B * K, 1, D), jnp.float32)
    enc_k = np_rng.normal(size=(B, T, D)).astype(np.float32)
    enc_v = np_rng.normal(size=(B, T, D)).astype(np.float32)
    mask = np.ones((B, T), np.int32)
    mask[:, -2:] = 0

    grouped, _ = multi_head_attention(
        params, hidden, bias=padding_bias(jnp.asarray(mask)), num_heads=H,
        dtype=jnp.float32,
        cache={"k": jnp.asarray(enc_k), "v": jnp.asarray(enc_v)})
    repeated, _ = multi_head_attention(
        params, hidden, bias=padding_bias(jnp.repeat(jnp.asarray(mask), K, 0)),
        num_heads=H, dtype=jnp.float32,
        cache={"k": jnp.repeat(jnp.asarray(enc_k), K, 0),
               "v": jnp.repeat(jnp.asarray(enc_v), K, 0)})
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(repeated),
                               rtol=2e-5, atol=2e-5)


def test_dropout_regen_backward_mask_identical():
    """The regen dropout (ops/layers.py) must apply the SAME mask in
    forward and backward (custom VJP regenerates it from the key instead
    of storing it), scale kept values by the QUANTISED keep probability
    (the 8-bit mask keeps (threshold+1)/256 of elements, so that — not
    1/(1-rate) — is what makes E[out] == x exactly), and be an identity
    when not training."""
    import jax
    import jax.numpy as jnp
    from kmbart_tpu.ops.layers import dropout, _dropout_threshold

    k = jax.random.PRNGKey(11)
    x = jnp.ones((64, 256), jnp.float32)
    scale = 256.0 / (_dropout_threshold(0.3) + 1)
    assert abs(scale - 1.0 / 0.7) < 4e-3  # quantisation stays within 1/256
    y = dropout(x, 0.3, k, True)
    kept = np.asarray(y > 0)
    assert 0.6 < kept.mean() < 0.8
    np.testing.assert_allclose(np.asarray(y)[kept], scale, rtol=1e-6)

    g = jax.grad(lambda x: jnp.sum(dropout(x, 0.3, k, True) * 3.0))(x)
    np.testing.assert_array_equal(np.asarray(g > 0), kept)
    np.testing.assert_allclose(np.asarray(g)[kept], 3.0 * scale, rtol=1e-6)

    np.testing.assert_array_equal(np.asarray(dropout(x, 0.3, k, False)),
                                  np.asarray(x))
    # under jit too (the hot path)
    y2 = jax.jit(lambda x: dropout(x, 0.3, k, True))(x)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y))
