"""Training tests: AdamW parity vs torch, loss descent, 8-device data-parallel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmbart_tpu.models.conditional import conditional_loss, init_conditional_params
from kmbart_tpu.models.pretraining import init_pretraining_params, pretraining_loss
from kmbart_tpu.parallel.mesh import device_arrays, make_mesh
from kmbart_tpu.parallel.train_step import build_eval_step, build_train_step
from kmbart_tpu.training.adamw import adamw
from kmbart_tpu.training.state import TrainState


def _batch(cfg, rng, B=8, S=12, T=6):
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


def test_adamw_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(4)]

    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.AdamW([p], lr=1e-2, betas=(0.9, 0.999), eps=1e-6,
                            weight_decay=0.01)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
    # torch couples decay differently (p *= 1-lr*wd before the step);
    # HF 3.0.2 AdamW decays after. Compare with wd=0 for exactness, then
    # sanity-check decay direction separately.
    p2 = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt2 = torch.optim.AdamW([p2], lr=1e-2, betas=(0.9, 0.999), eps=1e-6,
                             weight_decay=0.0)
    for g in grads:
        opt2.zero_grad()
        p2.grad = torch.tensor(g)
        opt2.step()

    opt_j = adamw(lr=1e-2, eps=1e-6, weight_decay=0.0)
    state = opt_j.init({"w": jnp.asarray(w0)})
    params = {"w": jnp.asarray(w0)}
    for g in grads:
        params, state = opt_j.update({"w": jnp.asarray(g)}, state, params)
    np.testing.assert_allclose(np.asarray(params["w"]), p2.detach().numpy(),
                               rtol=1e-5, atol=1e-6)

    opt_wd = adamw(lr=1e-2, eps=1e-6, weight_decay=0.01)
    state = opt_wd.init({"w": jnp.asarray(w0)})
    params_wd = {"w": jnp.asarray(w0)}
    for g in grads:
        params_wd, state = opt_wd.update({"w": jnp.asarray(g)}, state, params_wd)
    assert np.abs(np.asarray(params_wd["w"])).sum() < \
        np.abs(np.asarray(params["w"])).sum()


@pytest.mark.slow
def test_loss_descends(tiny_cfg, np_rng):
    cfg = tiny_cfg
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np_rng)

    def loss_fn(p, b, rng):
        loss, aux = conditional_loss(p, cfg, b, train=True, rng=rng)
        return loss, {}

    step = build_train_step(loss_fn, adamw(lr=5e-3))
    state = TrainState.create(params)
    rng = jax.random.PRNGKey(0)
    batch = device_arrays(batch)
    first = None
    for i in range(12):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first * 0.7, (first, float(metrics["loss"]))


@pytest.mark.slow
def test_data_parallel_8dev_matches_single(tiny_cfg, np_rng):
    """pjit over an 8-device data mesh must equal single-device training
    (the gradient psum replaces DDP allreduce)."""
    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = device_arrays(_batch(cfg, np_rng, B=16))

    def loss_fn(p, b, rng):
        loss, _ = conditional_loss(p, cfg, b, train=False, rng=None)
        return loss, {}

    opt = adamw(lr=1e-3)
    single = build_train_step(loss_fn, opt, donate=False)
    state_a = TrainState.create(params)
    rng = jax.random.PRNGKey(1)
    state_a, m_a = single(state_a, batch, rng)

    mesh = make_mesh(model_parallel=1)
    assert mesh.devices.size == 8
    sharded = build_train_step(loss_fn, opt, mesh=mesh, donate=False)
    state_b = TrainState.create(params)
    state_b, m_b = sharded(state_b, batch, rng)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_pretraining_multitask_step(tiny_cfg, np_rng):
    """All four losses flow gradients in one jitted step (no unused-params
    problem by construction)."""
    cfg = tiny_cfg
    params = init_pretraining_params(jax.random.PRNGKey(0), cfg)
    B, T = 4, 8
    batch = _batch(cfg, np_rng, B=B, T=T)
    batch.update(
        mrm_soft_labels=np_rng.dirichlet(
            np.ones(cfg.num_labels), (B, T)).astype(np.float32),
        mrm_mask=np_rng.random((B, T)) < 0.3,
        attribute_labels=np_rng.integers(0, cfg.num_attributes, (B, T)).astype(np.int32),
        attribute_mask=(np_rng.random((B, T)) < 0.3).astype(np.float32),
        relation_pairs=np_rng.integers(0, T, (B, 3, 2)).astype(np.int32),
        relation_labels=np_rng.integers(0, cfg.num_relations, (B, 3)).astype(np.int32),
        relation_mask=np.ones((B, 3), bool),
    )

    def loss_fn(p, b, rng):
        loss, aux = pretraining_loss(p, cfg, b, train=True, rng=rng)
        return loss, aux["losses"]

    step = build_train_step(loss_fn, adamw(lr=1e-3), donate=False)
    state = TrainState.create(params)
    new_state, metrics = step(state, device_arrays(batch), jax.random.PRNGKey(0))
    for key in ("lm_loss", "mrm_loss", "attribute_loss", "relation_loss"):
        assert np.isfinite(float(metrics[key])), key
    # every head's params moved
    for head in ("mrm_head", "attribute_head", "relation_head"):
        before = np.asarray(state.params[head]["dense_kernel"])
        after = np.asarray(new_state.params[head]["dense_kernel"])
        assert not np.allclose(before, after), head


def test_eval_step(tiny_cfg, np_rng):
    cfg = tiny_cfg
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)

    def loss_fn(p, b, rng):
        loss, _ = conditional_loss(p, cfg, b)
        return loss, {}

    ev = build_eval_step(loss_fn)
    m = ev(params, device_arrays(_batch(cfg, np_rng)))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_nonfinite_guard(tiny_cfg, np_rng):
    """A batch that produces NaN gradients must not poison the params."""
    cfg = tiny_cfg
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np_rng, B=4)
    bad = dict(batch)
    bad["image_features"] = np.full_like(batch["image_features"], np.nan)

    def loss_fn(p, b, rng):
        loss, _ = conditional_loss(p, cfg, b)
        return loss, {}

    step = build_train_step(loss_fn, adamw(lr=1e-3), donate=False)
    state = TrainState.create(params)
    new_state, metrics = step(state, device_arrays(bad), jax.random.PRNGKey(0))
    assert float(metrics["skipped"]) == 1.0
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the guard is fused inside adamw (ok=...): moments and the adam step
    # counter must also keep their previous values on a skipped update
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(new_state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a good batch still updates
    new_state2, metrics2 = step(new_state, device_arrays(batch),
                                jax.random.PRNGKey(0))
    assert float(metrics2["skipped"]) == 0.0
    assert not np.allclose(
        np.asarray(new_state.params["model"]["shared"]),
        np.asarray(new_state2.params["model"]["shared"]))


@pytest.mark.slow
def test_tensor_parallel_matches_single(tiny_cfg, np_rng):
    """2-D data x model mesh (DP=4, TP=2) training == single-device at fp32."""
    from kmbart_tpu.parallel.tp import shard_train_state, train_state_shardings

    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = device_arrays(_batch(cfg, np_rng, B=16))

    def loss_fn(p, b, rng):
        loss, _ = conditional_loss(p, cfg, b, train=False, rng=None)
        return loss, {}

    opt = adamw(lr=1e-3)
    single = build_train_step(loss_fn, opt, donate=False)
    state_a = TrainState.create(params)
    rng = jax.random.PRNGKey(1)
    state_a, m_a = single(state_a, batch, rng)

    mesh = make_mesh(model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    specs = train_state_shardings(mesh, params)
    sharded = build_train_step(loss_fn, opt, mesh=mesh, param_specs=specs,
                               donate=False)
    state_b = shard_train_state(mesh, TrainState.create(params))
    state_b, m_b = sharded(state_b, batch, rng)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_generation_8dev(tiny_cfg, np_rng):
    """generate() with data-sharded inputs over the 8-device mesh produces
    the same tokens as single-device (multi-chip inference path)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from kmbart_tpu.generation.api import generate

    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(2), cfg)
    B, S = 16, 10
    ids = np_rng.integers(4, 80, (B, S)).astype(np.int32)
    batch = {"input_ids": ids, "attention_mask": np.ones((B, S), np.int32)}
    ref = generate(params, cfg, batch, max_length=8, num_beams=2,
                   early_stopping=True)

    mesh = make_mesh(model_parallel=1)
    sh = NamedSharding(mesh, P("data"))
    sharded_batch = {k: jax.device_put(v, sh) for k, v in batch.items()}
    out = generate(params, cfg, sharded_batch, max_length=8, num_beams=2,
                   early_stopping=True)
    np.testing.assert_array_equal(ref, out)


@pytest.mark.slow
def test_grad_accumulation_matches_mean_of_micro_grads(tiny_cfg, np_rng):
    """grad_accum_steps=2 must apply AdamW to the mean of the two
    micro-batch gradients, with per-micro dropout rngs disabled."""
    import jax
    import jax.numpy as jnp
    from kmbart_tpu.models.conditional import (
        conditional_loss, init_conditional_params)
    from kmbart_tpu.parallel.train_step import build_train_step
    from kmbart_tpu.training.adamw import adamw
    from kmbart_tpu.training.state import TrainState

    # fp32: this is a SEMANTICS test (accumulation == mean of micro
    # grads); under bf16 the scan-wrapped and direct programs fuse
    # differently and the losses drift by ~3e-5, which is rounding, not
    # accumulation semantics
    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    B, S, T = 8, 10, 6
    ids = np_rng.integers(4, 80, (B, S)).astype(np.int32)
    dec = np_rng.integers(4, 80, (B, T)).astype(np.int32)
    batch = {"input_ids": ids, "attention_mask": np.ones((B, S), np.int32),
             "decoder_input_ids": dec,
             "decoder_attention_mask": np.ones((B, T), np.int32),
             "labels": dec.copy()}

    def loss_fn(p, b, rng):
        loss, _ = conditional_loss(p, cfg, b, train=False)  # no dropout
        return loss, {}

    opt = adamw(lr=1e-3)
    step_acc = build_train_step(loss_fn, opt, donate=False,
                                grad_accum_steps=2)
    state = TrainState.create(params)
    new_acc, m_acc = step_acc(state, batch, jax.random.PRNGKey(1))

    # manual: mean of the two half-batch grads, one AdamW update
    rng0 = jax.random.fold_in(jax.random.PRNGKey(1), state.step)
    halves = [
        {k: v[:4] for k, v in batch.items()},
        {k: v[4:] for k, v in batch.items()},
    ]
    g_sum = None
    l_sum = 0.0
    for h in halves:
        (l, _), g = jax.value_and_grad(
            lambda p: loss_fn(p, h, None), has_aux=True)(state.params)
        l_sum += l
        g_sum = g if g_sum is None else jax.tree.map(jnp.add, g_sum, g)
    grads = jax.tree.map(lambda x: x / 2, g_sum)
    ref_params, _ = opt.update(grads, state.opt_state, state.params)

    np.testing.assert_allclose(float(m_acc["loss"]), float(l_sum / 2),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(new_acc.params),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_grad_accumulation_under_mesh(tiny_cfg, np_rng):
    """Accumulated step compiles and matches the single-device accumulated
    step on the 8-device mesh (micro-batches stay data-sharded)."""
    import jax
    from kmbart_tpu.models.conditional import (
        conditional_loss, init_conditional_params)
    from kmbart_tpu.parallel.mesh import make_mesh
    from kmbart_tpu.parallel.train_step import build_train_step
    from kmbart_tpu.training.adamw import adamw
    from kmbart_tpu.training.state import TrainState

    cfg = tiny_cfg
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    B, S, T = 32, 10, 6
    ids = np_rng.integers(4, 80, (B, S)).astype(np.int32)
    dec = np_rng.integers(4, 80, (B, T)).astype(np.int32)
    batch = {"input_ids": ids, "attention_mask": np.ones((B, S), np.int32),
             "decoder_input_ids": dec,
             "decoder_attention_mask": np.ones((B, T), np.int32),
             "labels": dec.copy()}

    def loss_fn(p, b, rng):
        loss, _ = conditional_loss(p, cfg, b, train=False)
        return loss, {}

    opt = adamw(lr=1e-3)
    rng = jax.random.PRNGKey(1)
    single = build_train_step(loss_fn, opt, donate=False, grad_accum_steps=2)
    sa, ma = single(TrainState.create(params), batch, rng)
    mesh = make_mesh(model_parallel=1)
    sharded = build_train_step(loss_fn, opt, mesh=mesh, donate=False,
                               grad_accum_steps=2)
    sb, mb = sharded(TrainState.create(params), batch, rng)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_adamw_skips_unused_leaves():
    """HF AdamW parity: a leaf whose gradient is exactly zero (an unused
    head) gets NO update — moments keep their values, the per-leaf step
    does not advance, and decayed moments don't drift the params."""
    opt = adamw(lr=1e-2, eps=1e-6)
    params = {"used": jnp.ones((4,)), "unused": jnp.ones((4,))}
    state = opt.init(params)
    g1 = {"used": jnp.full((4,), 0.5), "unused": jnp.full((4,), 0.5)}
    g0 = {"used": jnp.full((4,), 0.5), "unused": jnp.zeros((4,))}
    params, state = opt.update(g1, state, params)   # both used
    p_unused = np.asarray(params["unused"]).copy()
    m_unused = np.asarray(state.mu["unused"]).copy()
    for _ in range(3):
        params, state = opt.update(g0, state, params)  # unused head idle
    np.testing.assert_array_equal(np.asarray(params["unused"]), p_unused)
    np.testing.assert_array_equal(np.asarray(state.mu["unused"]), m_unused)
    assert int(state.leaf_steps["unused"]) == 1
    assert int(state.leaf_steps["used"]) == 4
    assert int(state.step) == 4
    # the used leaf kept moving
    assert not np.allclose(np.asarray(params["used"]), 1.0)
