"""ZeRO-1 optimizer-state sharding (parallel/tp.py ``zero1_moment_specs``).

The AdamW moments shard their first free divisible axis over ``data``
while params/grads stay plain DP. The optimizer update is elementwise, so
sharding the moments changes WHERE each element is computed, never its
value — parity with the replicated run is exact up to the all-gather's
no-op. No reference counterpart (its optimizer state is replicated per
GPU, src/training.py:29-60)."""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from kmbart_tpu.models.conditional import (conditional_loss,
                                           init_conditional_params)
from kmbart_tpu.parallel.mesh import make_mesh
from kmbart_tpu.parallel.train_step import build_train_step
from kmbart_tpu.parallel.tp import (train_state_shardings,
                                    zero1_moment_specs)
from kmbart_tpu.training.adamw import adamw
from kmbart_tpu.training.state import TrainState


def _batch(cfg, rng, B=8, S=12, T=6):
    ids = rng.integers(4, 80, (B, S)).astype(np.int32)
    ids[:, 1:3] = cfg.img_feat_id
    return dict(
        input_ids=ids,
        attention_mask=np.ones((B, S), np.int32),
        image_features=rng.normal(
            size=(B, cfg.max_img_num,
                  cfg.image_feature_size)).astype(np.float32),
        decoder_input_ids=rng.integers(4, 80, (B, T)).astype(np.int32),
        decoder_attention_mask=np.ones((B, T), np.int32),
        labels=rng.integers(4, 80, (B, T)).astype(np.int32),
    )


def test_zero1_moment_specs(tiny_cfg):
    """Moments gain ``data`` on the first free divisible axis; composes
    with TP specs (taken axes are skipped); too-small leaves stay put."""
    from kmbart_tpu.parallel.tp import param_partition_specs

    params = init_conditional_params(jax.random.PRNGKey(0), tiny_cfg)
    specs = param_partition_specs(params)
    z = zero1_moment_specs(specs, params, n_data=4)
    # stacked q_kernel [L=2, 32, 32], TP spec (None, None, 'model'):
    # L=2 not divisible by 4 -> axis 1 takes 'data'
    assert z["model"]["encoder"]["layers"]["self_attn"]["q_kernel"] \
        == P(None, "data", "model")
    # replicated fc2_bias [L=2, 32]: axis 1
    assert z["model"]["encoder"]["layers"]["fc2_bias"] == P(None, "data")
    # embedding [vocab=285, 32] with TP spec (None, 'model'): vocab not
    # divisible, d_model axis already taken -> unchanged (replication is
    # the safe fallback, never a reshard of a non-divisible axis)
    assert z["model"]["shared"] == P(None, "model")
    # final_logits_bias [1, 285]: no divisible axis -> unchanged
    assert z["final_logits_bias"] == P()


def test_zero1_train_state_shardings(tiny_cfg):
    """train_state_shardings(zero1=True): mu/nu sharded, params and
    per-leaf step counters untouched."""
    params = init_conditional_params(jax.random.PRNGKey(0), tiny_cfg)
    mesh = make_mesh(model_parallel=2)  # data 4 x model 2
    sh = train_state_shardings(mesh, params, zero1=True)
    mu = sh.opt_state.mu["model"]["encoder"]["layers"]["self_attn"]
    assert mu["q_kernel"].spec == P(None, "data", "model")
    assert sh.params["model"]["encoder"]["layers"]["self_attn"][
        "q_kernel"].spec == P(None, None, "model")
    assert sh.opt_state.step.spec == P()


@pytest.mark.slow
def test_zero1_matches_replicated(tiny_cfg, np_rng):
    """3 train steps on a DP-8 mesh: ZeRO-1 parameter trajectory equals
    the replicated-optimizer run (the update is elementwise — sharding
    moments moves computation, not values)."""
    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh()  # 8-way data

    def loss_fn(p, b, rng):
        loss, _ = conditional_loss(p, cfg, b, train=False)
        return loss, {}

    def run(zero1):
        state = TrainState.create(
            jax.tree.map(lambda a: jax.numpy.array(a), params))
        specs = None
        if zero1:
            specs = train_state_shardings(mesh, state.params, zero1=True)
            state = jax.tree.map(jax.device_put, state, specs)
        step = build_train_step(loss_fn, adamw(lr=1e-3), mesh=mesh,
                                param_specs=specs, donate=False)
        rng = np.random.default_rng(7)
        for i in range(3):
            batch = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
                     for k, v in _batch(cfg, rng).items()}
            state, m = step(state, batch, jax.random.PRNGKey(i))
        return state, float(m["loss"])

    s_rep, l_rep = run(zero1=False)
    s_z1, l_z1 = run(zero1=True)
    np.testing.assert_allclose(l_z1, l_rep, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_rep.params),
                    jax.tree.leaves(s_z1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
    # the moments really live sharded: each device holds 1/8 of this mu
    # leaf (fc2_bias [L=2, 32] -> 'data' on axis 1)
    mu_leaf = s_z1.opt_state.mu["model"]["encoder"]["layers"]["fc2_bias"]
    shard = mu_leaf.addressable_shards[0].data
    assert shard.shape[1] == mu_leaf.shape[1] // 8
