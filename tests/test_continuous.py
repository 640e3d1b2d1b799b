"""Continuous-batching pool correctness (serving/continuous.py).

The load-bearing property: a sample's beam decode is independent of the
other pool slots, so every slot's harvested output must equal the
offline ``generate()`` result for that sample alone — including when
slots are admitted at DIFFERENT ticks (per-slot depths, ring cache) and
when a finished slot is reused by a later request.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmbart_tpu.generation.api import generate
from kmbart_tpu.models.conditional import (MultiModalBartForConditionalGeneration,
                                           init_conditional_params)
from kmbart_tpu.serving.continuous import build_pool_fns, init_pool_state

K, L, E = 2, 8, 12


@pytest.fixture(scope="module")
def setup(tiny_cfg_module):
    cfg = tiny_cfg_module
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def tiny_cfg_module():
    from kmbart_tpu.config import MultiModalBartConfig
    return MultiModalBartConfig(
        vocab_size=300, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_position_embeddings=64, image_feature_size=20, max_img_num=4)


def _requests(cfg, np_rng, n):
    reqs = []
    for _ in range(n):
        ids = np_rng.integers(4, cfg.vocab_size - 10, (1, E)).astype(np.int32)
        mask = np.ones((1, E), np.int32)
        feats = np_rng.normal(size=(1, cfg.max_img_num,
                                    cfg.image_feature_size)
                              ).astype(np.float32)
        reqs.append((ids, mask, feats))
    return reqs


def _reference(cfg, params, req):
    ids, mask, feats = req
    out = generate(params, cfg,
                   {"input_ids": ids, "attention_mask": mask,
                    "image_features": feats},
                   max_length=L, num_beams=K, early_stopping=True,
                   trim=False)
    return np.asarray(out)


def _admit_one(admit, state, slot, req):
    ids, mask, feats = req
    return admit(state,
                 jnp.asarray([slot], jnp.int32), jnp.asarray([True]),
                 jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(feats))


def _bound_pool_fns(params, cfg, **kw):
    """build_pool_fns with params bound (the fns take them per call so
    the weights are jit arguments, not baked HLO constants)."""
    import functools
    step_chunk, admit, harvest = build_pool_fns(params, cfg, **kw)
    return (functools.partial(step_chunk, params),
            functools.partial(admit, params), harvest)


def test_pool_matches_generate_same_tick(setup, np_rng):
    cfg, params = setup
    B = 3
    pool = {"pool_size": B, "num_beams": K, "max_length": L,
            "encoder_seq_len": E}
    step_chunk, admit, harvest = _bound_pool_fns(
        params, cfg, chunk_steps=3, **pool)
    state = init_pool_state(params["model"], cfg, **pool)
    reqs = _requests(cfg, np_rng, B)
    for i, r in enumerate(reqs):
        state = _admit_one(admit, state, i, r)
    for _ in range(4):  # 12 ticks >= L-1
        state = step_chunk(state)
    ready, out, lens = jax.device_get(harvest(state))
    assert ready.all()
    for i, r in enumerate(reqs):
        ref = _reference(cfg, params, r)
        np.testing.assert_array_equal(out[i], ref,
                                      err_msg=f"slot {i} mismatch")


def test_pool_matches_generate_staggered(setup, np_rng):
    """Admit at different ticks; later also REUSE a freed slot — every
    harvested output must still equal the solo generate() result."""
    cfg, params = setup
    B = 2
    pool = {"pool_size": B, "num_beams": K, "max_length": L,
            "encoder_seq_len": E}
    step_chunk, admit, harvest = _bound_pool_fns(
        params, cfg, chunk_steps=2, **pool)
    state = init_pool_state(params["model"], cfg, **pool)
    reqs = _requests(cfg, np_rng, 3)

    state = _admit_one(admit, state, 0, reqs[0])
    state = step_chunk(state)                       # slot 0 at depth 3
    state = _admit_one(admit, state, 1, reqs[1])    # slot 1 joins late
    done = {}
    for _ in range(12):
        state = step_chunk(state)
        ready, out, lens = jax.device_get(harvest(state))
        for i in range(B):
            if ready[i] and i not in done:
                done[i] = out[i]
        if len(done) == B:
            break
    assert len(done) == B
    np.testing.assert_array_equal(done[0], _reference(cfg, params, reqs[0]))
    np.testing.assert_array_equal(done[1], _reference(cfg, params, reqs[1]))

    # reuse slot 0 for a third request while slot 1 sits finished
    state = _admit_one(admit, state, 0, reqs[2])
    for _ in range(6):
        state = step_chunk(state)
    ready, out, lens = jax.device_get(harvest(state))
    assert ready[0]
    np.testing.assert_array_equal(out[0], _reference(cfg, params, reqs[2]))


def test_pool_inactive_slots_are_inert(setup, np_rng):
    """Stepping a pool with empty slots neither crashes nor marks them
    ready."""
    cfg, params = setup
    B = 2
    pool = {"pool_size": B, "num_beams": K, "max_length": L,
            "encoder_seq_len": E}
    step_chunk, admit, harvest = _bound_pool_fns(
        params, cfg, chunk_steps=2, **pool)
    state = init_pool_state(params["model"], cfg, **pool)
    reqs = _requests(cfg, np_rng, 1)
    state = _admit_one(admit, state, 1, reqs[0])
    for _ in range(6):
        state = step_chunk(state)
    ready, out, lens = jax.device_get(harvest(state))
    assert not ready[0] and ready[1]
    np.testing.assert_array_equal(out[1], _reference(cfg, params, reqs[0]))
