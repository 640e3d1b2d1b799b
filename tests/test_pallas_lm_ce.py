"""Fused LM-head+CE kernel correctness (interpret mode on CPU).

Covers ops/pallas_lm_ce.py: loss + dh + dW parity vs the composite
``lm_logits`` + ``cross_entropy_ignore_index`` path, both kernel modes
(fused backward over materialized logits, and the full
no-materialization recompute form), vocab sizes that don't divide the
tile, all-ignored rows, remat, and the support gate. Parity target:
reference LM loss at src/model/model.py:291-302.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmbart_tpu.models.heads import cross_entropy_ignore_index
from kmbart_tpu.ops.pallas_lm_ce import (fused_lm_ce, fused_lm_ce_supported,
                                         _pick_tile_n)


def _composite_loss(hidden, shared, fbias, labels):
    dtype = jnp.bfloat16
    logits = jnp.dot(hidden.astype(dtype), shared.T.astype(dtype),
                     preferred_element_type=jnp.float32)
    logits = (logits + jax.lax.stop_gradient(fbias.astype(jnp.float32))
              ).astype(dtype)
    loss, _ = cross_entropy_ignore_index(logits, labels)
    return loss


def _inputs(np_rng, B=4, T=16, D=128, V=2500):
    hidden = jnp.asarray(np_rng.normal(size=(B, T, D)), jnp.float32)
    shared = jnp.asarray(np_rng.normal(size=(V, D)) * 0.05, jnp.float32)
    fbias = jnp.asarray(np_rng.normal(size=(V,)) * 0.01, jnp.float32)
    labels = np_rng.integers(0, V, (B, T)).astype(np.int32)
    labels[0, :5] = -100
    return hidden, shared, fbias, jnp.asarray(labels)


@pytest.mark.parametrize("mode", ["bwd", "nomat", "fwdbwd"])
def test_fused_matches_composite(np_rng, mode):
    hidden, shared, fbias, labels = _inputs(np_rng)

    def fused(h, w, fb, lab):
        loss, _ = fused_lm_ce(h, w, fb, lab, mode=mode,
                              tile_v=512, interpret=True)
        return loss

    l0, (gh0, gw0) = jax.value_and_grad(_composite_loss, argnums=(0, 1))(
        hidden, shared, fbias, labels)
    l1, (gh1, gw1) = jax.value_and_grad(fused, argnums=(0, 1))(
        hidden, shared, fbias, labels)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    # gradients are the SAME op sequence (bf16 dlogits into bf16 dots) —
    # interpret mode reproduces them bit-for-bit
    np.testing.assert_allclose(np.asarray(gh0), np.asarray(gh1),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gw0), np.asarray(gw1),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("recompute", [False, True])
def test_recompute_alias(np_rng, recompute):
    hidden, shared, fbias, labels = _inputs(np_rng, V=1024)
    loss, n = fused_lm_ce(hidden, shared, fbias, labels,
                          recompute=recompute, tile_v=512, interpret=True)
    ref = _composite_loss(hidden, shared, fbias, labels)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)


@pytest.mark.parametrize("mode", ["bwd", "nomat", "fwdbwd"])
def test_vocab_divides_tile_exactly(np_rng, mode):
    hidden, shared, fbias, labels = _inputs(np_rng, V=1024)
    loss, n = fused_lm_ce(hidden, shared, fbias, labels,
                          mode=mode, tile_v=512, interpret=True)
    ref = _composite_loss(hidden, shared, fbias, labels)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)
    assert int(n) == int(jnp.sum(labels != -100))


def test_all_rows_ignored(np_rng):
    hidden, shared, fbias, _ = _inputs(np_rng)
    labels = jnp.full((4, 16), -100, jnp.int32)
    loss, n = fused_lm_ce(hidden, shared, fbias, labels, recompute=False,
                          tile_v=512, interpret=True)
    assert int(n) == 0
    assert float(loss) == 0.0
    g = jax.grad(lambda h: fused_lm_ce(h, shared, fbias, labels,
                                       recompute=False, tile_v=512,
                                       interpret=True)[0])(hidden)
    assert np.all(np.asarray(g, np.float32) == 0.0)


def test_fused_under_remat(np_rng):
    hidden, shared, fbias, labels = _inputs(np_rng)

    def f(h, w):
        loss, _ = fused_lm_ce(h, w, fbias, labels, recompute=False,
                              tile_v=512, interpret=True)
        return loss

    g0 = jax.grad(f)(hidden, shared)
    g1 = jax.grad(jax.checkpoint(f))(hidden, shared)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-6, atol=1e-7)


def test_pick_tile_n():
    assert _pick_tile_n(5120) == 512
    assert _pick_tile_n(40) == 8
    assert _pick_tile_n(7) is None


def test_support_gate(monkeypatch):
    h = jnp.zeros((4, 16, 128), jnp.float32)
    # CPU backend -> composite path
    assert not fused_lm_ce_supported(h, 50320, 128)
    monkeypatch.setenv("KMBART_NO_FUSED_CE", "1")
    assert not fused_lm_ce_supported(h, 50320, 128)
