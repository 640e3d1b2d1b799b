"""Beam-stationary decode attention: oracle, kernel, and path equivalence.

The beam-search loop keeps its token-level HF 3.0.2 parity tests in
test_generation.py (they exercise the stationary path's XLA reference on
CPU); here the attention math itself is pinned against a brute-force
oracle, the Pallas kernel against the reference (interpret mode), and the
stationary path against the legacy permuting path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmbart_tpu.ops.pallas_beam_attention import (
    beam_gather_attention,
    beam_gather_attention_reference,
    build_selection_mask,
)


def _setup(B=3, K=5, T=16, H=4, hd=16, cidx=7, seed=0):
    D = H * hd
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B * K, D)).astype(np.float32) * (hd ** -0.5)
    kc = rng.normal(size=(B, K, T, D)).astype(np.float32)
    vc = rng.normal(size=(B, K, T, D)).astype(np.float32)
    anc = rng.integers(0, K, (B * K, T)).astype(np.int32)
    sel = build_selection_mask(jnp.asarray(anc), K, cidx, H)
    return q, kc, vc, anc, sel, D


def _brute_force(q, kc, vc, anc, cidx, K, H, hd):
    """Scalar-loop oracle: per (beam, head), gather each position's K/V
    from the ancestor slot, then plain softmax attention over t <= cidx."""
    B = kc.shape[0]
    T = kc.shape[2]
    D = H * hd
    out = np.zeros((B * K, D), np.float32)

    def bf(x):
        return np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)

    qh = q.reshape(B, K, H, hd)
    kh = kc.reshape(B, K, T, H, hd)
    vh = vc.reshape(B, K, T, H, hd)
    for b in range(B):
        for qq in range(K):
            for h in range(H):
                scores = np.zeros((cidx + 1,), np.float64)
                for t in range(cidx + 1):
                    j = anc[b * K + qq, t]
                    scores[t] = bf(qh[b, qq, h]) @ bf(kh[b, j, t, h])
                p = np.exp(scores - scores.max())
                p /= p.sum()
                acc = np.zeros(hd, np.float64)
                for t in range(cidx + 1):
                    j = anc[b * K + qq, t]
                    acc += p[t] * bf(vh[b, j, t, h]).astype(np.float64)
                out[b * K + qq, h * hd:(h + 1) * hd] = acc
    return out


def test_reference_matches_brute_force():
    K, H, hd, cidx = 5, 4, 16, 7
    q, kc, vc, anc, sel, D = _setup(K=K, H=H, hd=hd, cidx=cidx)
    ref = np.asarray(beam_gather_attention_reference(
        jnp.asarray(q), jnp.asarray(kc, jnp.bfloat16),
        jnp.asarray(vc, jnp.bfloat16), sel, num_beams=K, num_heads=H))
    oracle = _brute_force(q, kc, vc, anc, cidx, K, H, hd)
    np.testing.assert_allclose(ref, oracle, atol=0.05)


def test_reference_first_step_single_position():
    # cidx=0: every beam attends only its own new row
    K, H, hd = 5, 4, 16
    q, kc, vc, anc, sel, D = _setup(K=K, H=H, hd=hd, cidx=0)
    # ancestry at t=0 is the own slot
    anc[:, 0] = np.arange(anc.shape[0]) % K
    sel = build_selection_mask(jnp.asarray(anc), K, 0, H)
    ref = np.asarray(beam_gather_attention_reference(
        jnp.asarray(q), jnp.asarray(kc, jnp.bfloat16),
        jnp.asarray(vc, jnp.bfloat16), sel, num_beams=K, num_heads=H))
    # softmax over a single position == that position's V row
    expect = np.asarray(jnp.asarray(vc, jnp.bfloat16), np.float32)[:, :, 0, :]
    np.testing.assert_allclose(ref, expect.reshape(ref.shape), atol=0.02)


@pytest.mark.slow
def test_kernel_interpret_matches_reference():
    K, H, hd, cidx = 5, 4, 16, 7
    q, kc, vc, anc, sel, D = _setup(K=K, H=H, hd=hd, cidx=cidx)
    ref = np.asarray(beam_gather_attention_reference(
        jnp.asarray(q), jnp.asarray(kc, jnp.bfloat16),
        jnp.asarray(vc, jnp.bfloat16), sel, num_beams=K, num_heads=H))
    ker = np.asarray(beam_gather_attention(
        jnp.asarray(q), jnp.asarray(kc, jnp.bfloat16),
        jnp.asarray(vc, jnp.bfloat16), sel, num_beams=K, num_heads=H,
        interpret=True))
    np.testing.assert_allclose(ker, ref, atol=0.05)


def test_selection_mask_semantics():
    # B=1 sample, K=2 beams, T=4: ancestry rows are the two query beams
    K, H, cidx = 2, 3, 2
    anc = jnp.asarray([[0, 1, 1, 0], [1, 0, 1, 1]], jnp.int32)
    sel = np.asarray(build_selection_mask(anc, K, cidx, H))
    B, KT, KH = sel.shape
    T = 4
    assert (B, KT, KH) == (1, K * T, K * H)
    for qq in range(K):
        for t in range(T):
            for j in range(K):
                for h in range(H):
                    want = 1.0 if (anc[qq, t] == j and t <= cidx) else 0.0
                    assert sel[0, j * T + t, qq * H + h] == want


@pytest.mark.slow
def test_stationary_matches_legacy_path(tiny_cfg):
    """Same tokens from the beam-stationary and permuting cache paths."""
    from kmbart_tpu.models.conditional import (
        MultiModalBartForConditionalGeneration)

    cfg_s = tiny_cfg.replace(dtype="float32", beam_stationary_cache=True)
    cfg_l = tiny_cfg.replace(dtype="float32", beam_stationary_cache=False)
    rng = np.random.default_rng(5)
    B, T = 4, 12
    ids = rng.integers(4, cfg_s.vocab_size - 30, (B, T)).astype(np.int32)
    ids[:, 1:4] = cfg_s.img_feat_id
    batch = dict(
        input_ids=ids,
        attention_mask=np.ones((B, T), np.int32),
        image_features=rng.normal(size=(B, cfg_s.max_img_num,
                                        cfg_s.image_feature_size)
                                  ).astype(np.float32))
    m = MultiModalBartForConditionalGeneration(cfg_s,
                                               rng=jax.random.PRNGKey(1))
    for kw in (dict(max_length=12, num_beams=4, early_stopping=True),
               dict(max_length=12, num_beams=3, length_penalty=2.0),
               dict(max_length=12, num_beams=4, do_sample=True, top_k=8,
                    rng=jax.random.PRNGKey(3))):
        out_s = np.asarray(m.generate(batch, **kw))
        m.config = cfg_l
        out_l = np.asarray(m.generate(batch, **kw))
        m.config = cfg_s
        np.testing.assert_array_equal(out_s, out_l)
