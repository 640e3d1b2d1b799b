"""Sequence parallelism (parallel/sp.py): Megatron-SP over the 2-D mesh.

The reference has no tensor/sequence parallelism at all (single-host NCCL
DDP, src/utils.py:9-17); this is a TPU-native extension. The contract:
activating ``sequence_parallel(mesh)`` at trace time (a) leaves the math
bit-for-bit identical to the single-device step at fp32, (b) actually
injects sequence-dim sharding constraints (``sdy.sharding_constraint``)
into the lowered module, and (c) is a strict no-op for traces without an
active context or a model axis of size 1.
"""

import jax
import numpy as np

from kmbart_tpu.models.conditional import conditional_loss, init_conditional_params
from kmbart_tpu.parallel import sp
from kmbart_tpu.parallel.mesh import make_mesh
from kmbart_tpu.parallel.train_step import build_train_step
from kmbart_tpu.parallel.tp import shard_train_state, train_state_shardings
from kmbart_tpu.training.adamw import adamw
from kmbart_tpu.training.state import TrainState


def _batch(cfg, rng, B=16, S=12, T=6):
    ids = rng.integers(4, 80, (B, S)).astype(np.int32)
    ids[:, 1:3] = cfg.img_feat_id
    return dict(
        input_ids=ids,
        attention_mask=np.ones((B, S), np.int32),
        image_features=rng.normal(
            size=(B, cfg.max_img_num, cfg.image_feature_size)).astype(np.float32),
        decoder_input_ids=rng.integers(4, 80, (B, T)).astype(np.int32),
        decoder_attention_mask=np.ones((B, T), np.int32),
        labels=rng.integers(4, 80, (B, T)).astype(np.int32),
    )


def _steps(cfg):
    def loss_fn(p, b, rng):
        loss, _ = conditional_loss(p, cfg, b, train=False, rng=None)
        return loss, {}
    return loss_fn, adamw(lr=1e-3)


def test_sequence_parallel_matches_single(tiny_cfg, np_rng):
    """DP4 x TP2 + SP training step == single-device at fp32, and the SP
    trace really carries sequence-sharding constraints."""
    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np_rng)
    loss_fn, opt = _steps(cfg)
    key = jax.random.PRNGKey(1)

    single = build_train_step(loss_fn, opt, donate=False)
    state_a = TrainState.create(params)
    state_a, m_a = single(state_a, batch, key)

    mesh = make_mesh(model_parallel=2)
    specs = train_state_shardings(mesh, params)
    step = build_train_step(loss_fn, opt, mesh=mesh, param_specs=specs,
                            donate=False)
    state_b = shard_train_state(mesh, TrainState.create(params))
    with sp.sequence_parallel(mesh):
        lowered = step.lower(state_b, batch, key).as_text()
        state_b, m_b = step(state_b, batch, key)

    # (b) the constraint is really in the traced module
    assert lowered.count("sharding_constraint") > 0
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sequence_parallel_noop_outside_context(tiny_cfg, np_rng):
    """Without the context (or with TP=1) no constraint is traced in."""
    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np_rng)
    loss_fn, opt = _steps(cfg)
    key = jax.random.PRNGKey(1)

    mesh = make_mesh(model_parallel=2)
    specs = train_state_shardings(mesh, params)
    state = shard_train_state(mesh, TrainState.create(params))

    step = build_train_step(loss_fn, opt, mesh=mesh, param_specs=specs,
                            donate=False)
    assert step.lower(state, batch, key).as_text().count(
        "sharding_constraint") == 0

    # TP=1 mesh: context active but nothing to shard
    dp_mesh = make_mesh(model_parallel=1)
    dp_step = build_train_step(loss_fn, opt, mesh=dp_mesh, donate=False)
    dp_state = TrainState.create(
        jax.tree.map(lambda a: jax.numpy.array(a), params))
    with sp.sequence_parallel(dp_mesh):
        assert dp_step.lower(dp_state, batch, key).as_text().count(
            "sharding_constraint") == 0


def test_sequence_parallel_skips_indivisible_lengths(tiny_cfg, np_rng):
    """Sequence lengths the TP degree cannot split evenly (incl. the
    T == 1 incremental-decode case) are left unconstrained, not padded."""
    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    # S=13 odd, T=7 odd: indivisible by TP=2 everywhere
    batch = _batch(cfg, np_rng, B=16, S=13, T=7)
    loss_fn, opt = _steps(cfg)
    key = jax.random.PRNGKey(1)

    single = build_train_step(loss_fn, opt, donate=False)
    state_a = TrainState.create(params)
    state_a, m_a = single(state_a, batch, key)

    mesh = make_mesh(model_parallel=2)
    specs = train_state_shardings(mesh, params)
    step = build_train_step(loss_fn, opt, mesh=mesh, param_specs=specs,
                            donate=False)
    state_b = shard_train_state(mesh, TrainState.create(params))
    with sp.sequence_parallel(mesh):
        lowered = step.lower(state_b, batch, key).as_text()
        state_b, m_b = step(state_b, batch, key)
    assert lowered.count("sharding_constraint") == 0  # all lengths skipped
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)


def test_sequence_parallel_generation_unchanged(tiny_cfg, np_rng):
    """Beam decode traced under an active SP context returns the same
    tokens (decode steps are T==1 and correctly skip the constraint)."""
    from kmbart_tpu.generation.api import generate

    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(2), cfg)
    B, S = 16, 10
    ids = np_rng.integers(4, 80, (B, S)).astype(np.int32)
    batch = {"input_ids": ids, "attention_mask": np.ones((B, S), np.int32)}
    ref = generate(params, cfg, batch, max_length=8, num_beams=2,
                   early_stopping=True)
    mesh = make_mesh(model_parallel=2)
    with sp.sequence_parallel(mesh):
        out = generate(params, cfg, batch, max_length=8, num_beams=2,
                       early_stopping=True)
    np.testing.assert_array_equal(ref, out)
