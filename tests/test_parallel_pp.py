"""Pipeline parallelism (parallel/pp.py): GPipe scan+ppermute schedule.

The forward applies each layer whole on exactly one stage device — only
the transport changes versus the sequential path — so at fp32 with
dropout off the pipelined loss/logits/grads must match bart.forward
EXACTLY, not approximately. That is the invariant these tests pin, plus
the schedule bookkeeping edge cases (microbatch count vs stage count).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmbart_tpu.models.conditional import conditional_loss, init_conditional_params
from kmbart_tpu.parallel import pp


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


@pytest.mark.parametrize("n_micro", [1, 2, 4, 8])
def test_pipelined_loss_matches_sequential(tiny_cfg, np_rng, n_micro):
    """2-stage pipeline, every microbatch count from trivial (M=1: pure
    bubble) to M=B: loss identical to the sequential trunk at fp32."""
    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np_rng)
    mesh = pp.make_stage_mesh(2)

    ref, _ = jax.jit(lambda p, b: conditional_loss(p, cfg, b))(params, batch)
    got, aux = jax.jit(lambda p, b: pp.pipelined_conditional_loss(
        p, cfg, b, mesh, n_micro=n_micro))(params, batch)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    assert np.isfinite(np.asarray(aux["logits"])).all()


def test_pipelined_grads_match_sequential(tiny_cfg, np_rng):
    """The backward pipeline (autodiff through scan+ppermute) produces the
    sequential gradients; 4 stages x 1 layer per stage over the 2+2-layer
    tiny model is the maximal-fragmentation case."""
    cfg = tiny_cfg.replace(dtype="float32", encoder_layers=4,
                           decoder_layers=4)
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np_rng)
    mesh = pp.make_stage_mesh(4)

    g_ref = jax.jit(jax.grad(
        lambda p, b: conditional_loss(p, cfg, b)[0]))(params, batch)
    g_pp = jax.jit(jax.grad(
        lambda p, b: pp.pipelined_conditional_loss(
            p, cfg, b, mesh, n_micro=4)[0]))(params, batch)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_pp = jax.tree.leaves(g_pp)
    assert len(flat_ref) == len(flat_pp)
    for (path, a), b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(path))


def test_pipelined_sharded_params_train_step(tiny_cfg, np_rng):
    """End-to-end: stage-sharded stacked layers (stage_param_specs) drive
    a jitted value_and_grad step with the optimizer applied on the
    sharded tree — the real PP training layout."""
    from jax.sharding import NamedSharding
    from kmbart_tpu.training.adamw import adamw_init, adamw_update

    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np_rng)
    mesh = pp.make_stage_mesh(2)
    specs = pp.stage_param_specs(params)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)

    def loss_fn(p, b):
        return pp.pipelined_conditional_loss(p, cfg, b, mesh, n_micro=2)[0]

    @jax.jit
    def step(p, opt, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        new_p, new_opt = adamw_update(grads, opt, p, lr=1e-3)
        return loss, new_p, new_opt

    loss0, p1, opt1 = step(sharded, adamw_init(sharded), batch)
    loss1, p2, _ = step(p1, opt1, batch)
    assert np.isfinite(float(loss0)) and float(loss1) < float(loss0)
    # layer leaves stay stage-sharded through the update
    lay = p2["model"]["encoder"]["layers"]["fc1_kernel"]
    assert "stage" in str(lay.sharding.spec)


def test_pipeline_validates_shapes(tiny_cfg, np_rng):
    cfg = tiny_cfg.replace(dtype="float32", encoder_layers=3)
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np_rng)
    mesh = pp.make_stage_mesh(2)
    with pytest.raises(ValueError, match="divide the stage count"):
        pp.pipelined_conditional_loss(params, cfg, batch, mesh, n_micro=2)
    cfg2 = tiny_cfg.replace(dtype="float32", encoder_layerdrop=0.1)
    params2 = init_conditional_params(jax.random.PRNGKey(0), cfg2)
    with pytest.raises(ValueError, match="LayerDrop"):
        pp.pipelined_conditional_loss(params2, cfg2, batch, mesh,
                                      n_micro=2, train=True,
                                      rng=jax.random.PRNGKey(0))
    cfg3 = tiny_cfg.replace(dtype="float32")
    params3 = init_conditional_params(jax.random.PRNGKey(0), cfg3)
    with pytest.raises(ValueError, match="n_micro"):
        pp.pipelined_conditional_loss(params3, cfg3, batch, mesh, n_micro=0)


def test_pipelined_remat_matches(tiny_cfg, np_rng):
    """cfg.remat on the pipelined path: same values (remat only changes
    WHEN activations are computed), grads equal the non-remat pipeline."""
    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np_rng)
    mesh = pp.make_stage_mesh(2)

    cfg_r = cfg.replace(remat=True)
    g_plain = jax.jit(jax.value_and_grad(
        lambda p, b: pp.pipelined_conditional_loss(
            p, cfg, b, mesh, n_micro=2)[0]))(params, batch)
    g_remat = jax.jit(jax.value_and_grad(
        lambda p, b: pp.pipelined_conditional_loss(
            p, cfg_r, b, mesh, n_micro=2)[0]))(params, batch)
    np.testing.assert_array_equal(np.asarray(g_plain[0]),
                                  np.asarray(g_remat[0]))
    for a, b in zip(jax.tree.leaves(g_plain[1]), jax.tree.leaves(g_remat[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_pipelined_tiny_batch_rng_replicated(tiny_cfg, np_rng):
    """B == 2 with a legacy (2,)-uint32 PRNG key: the key must stay
    replicated (a leading-dim heuristic would shard it over data and
    crash fold_in with a malformed key)."""
    cfg = tiny_cfg.replace(dtype="float32", dropout=0.1,
                           encoder_layers=4, decoder_layers=4)
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np_rng, B=2)
    mesh = pp.make_pp_mesh(4)  # data=2 x stage=4
    loss, _ = jax.jit(lambda p, b, r: pp.pipelined_conditional_loss(
        p, cfg, b, mesh, n_micro=1, train=True, rng=r))(
            params, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))


def test_make_mesh_from_args_3d():
    """--pipeline_stages 2 --model_parallel 2 builds the 3-D mesh through
    the CLI path (2 data x 2 stage x 2 model on 8 devices); SP + PP stays
    rejected."""
    import argparse

    from kmbart_tpu.cli_common import make_mesh_from_args
    ns = argparse.Namespace(model_parallel=2, pipeline_stages=2,
                            sequence_parallel=False)
    mesh = make_mesh_from_args(ns)
    assert dict(mesh.shape) == {"data": 2, "stage": 2, "model": 2}
    ns_sp = argparse.Namespace(model_parallel=1, pipeline_stages=2,
                               sequence_parallel=True)
    with pytest.raises(ValueError, match="sequence_parallel"):
        make_mesh_from_args(ns_sp)


def test_validate_batch_layout():
    """grad_accum splits the batch BEFORE the per-step divisor applies, so
    batch_size=24 with G=2 over an 8-way divisor must be rejected at CLI
    setup (24 % 8 == 0 would pass the loader, then fail the first step)."""
    import argparse

    from kmbart_tpu.cli_common import validate_batch_layout
    ns = argparse.Namespace(batch_size=24, grad_accum_steps=2)
    with pytest.raises(ValueError, match="grad_accum_steps"):
        validate_batch_layout(ns, 8)
    validate_batch_layout(argparse.Namespace(batch_size=32,
                                             grad_accum_steps=2), 8)


def test_dp_x_pp_mesh_matches_sequential(tiny_cfg, np_rng):
    """DP4 x PP2: batch shards the data axis, layers shard the stage axis.
    The cross-data-shard loss mean changes the reduction ORDER only, so
    parity is 1-ulp allclose (loss) / tight allclose (grads) rather than
    the bitwise equality of the stage-only mesh."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from kmbart_tpu.models.conditional import conditional_loss

    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np_rng)
    mesh = pp.make_pp_mesh(2)
    assert dict(mesh.shape) == {"data": 4, "stage": 2}
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, pp.stage_param_specs(params))
    dev_batch = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
                 for k, v in batch.items()}

    ref = jax.jit(lambda p, b: conditional_loss(p, cfg, b)[0])(params, batch)
    got = jax.jit(lambda p, b: pp.pipelined_conditional_loss(
        p, cfg, b, mesh, n_micro=2)[0])(sharded, dev_batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)

    g_ref = jax.jit(jax.grad(
        lambda p, b: conditional_loss(p, cfg, b)[0]))(params, batch)
    g_pp = jax.jit(jax.grad(lambda p, b: pp.pipelined_conditional_loss(
        p, cfg, b, mesh, n_micro=2)[0]))(sharded, dev_batch)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_pp_x_tp_mesh_matches_sequential(tiny_cfg, np_rng):
    """DP2 x PP2 x TP2 — the full 3-D composition. The stage axis is
    manual (shard_map ring) while the model axis stays AUTOMATIC, so GSPMD
    partitions each stage's layer compute over it exactly as on a plain TP
    mesh (Megatron column/row specs from tp.py, composed by
    stage_param_specs(model_parallel=True)). TP all-reduce order differs
    from the sequential reduction, so parity is tight-allclose (the TP
    test tolerance), not bitwise."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from kmbart_tpu.models.conditional import conditional_loss

    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np_rng)
    mesh = pp.make_pp_mesh(2, model_parallel=2)
    assert dict(mesh.shape) == {"data": 2, "stage": 2, "model": 2}
    specs = pp.stage_param_specs(params, model_parallel=True)
    # the composed specs must carry BOTH axes on the stacked layer weights
    assert specs["model"]["encoder"]["layers"]["self_attn"]["q_kernel"] \
        == P("stage", None, "model")
    assert specs["model"]["shared"] == P(None, "model")
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)
    dev_batch = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
                 for k, v in batch.items()}

    ref = jax.jit(lambda p, b: conditional_loss(p, cfg, b)[0])(params, batch)
    got = jax.jit(lambda p, b: pp.pipelined_conditional_loss(
        p, cfg, b, mesh, n_micro=2)[0])(sharded, dev_batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)

    g_ref = jax.jit(jax.grad(
        lambda p, b: conditional_loss(p, cfg, b)[0]))(params, batch)
    g_pp = jax.jit(jax.grad(lambda p, b: pp.pipelined_conditional_loss(
        p, cfg, b, mesh, n_micro=2)[0]))(sharded, dev_batch)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_pp_x_tp_bf16_compiles_and_runs(tiny_cfg, np_rng):
    """bf16 on the 3-D mesh: XLA's partial-auto partitioner miscompiles
    psum-over-a-manual-axis on sub-fp32 floats (fatal 'Invalid binary
    instruction opcode copy'), so _pipeline_stack lifts its float boundary
    I/O to fp32 there. This pins the workaround: the bf16 pipelined loss
    must compile, run, and land within bf16 tolerance of the sequential
    bf16 loss."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from kmbart_tpu.models.conditional import conditional_loss

    cfg = tiny_cfg.replace(dtype="bfloat16")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np_rng)
    mesh = pp.make_pp_mesh(2, model_parallel=2)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, pp.stage_param_specs(params, model_parallel=True))
    dev_batch = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
                 for k, v in batch.items()}

    ref = jax.jit(lambda p, b: conditional_loss(p, cfg, b)[0])(params, batch)
    loss, grads = jax.jit(jax.value_and_grad(
        lambda p, b: pp.pipelined_conditional_loss(
            p, cfg, b, mesh, n_micro=2)[0]))(sharded, dev_batch)
    np.testing.assert_allclose(np.asarray(loss), np.asarray(ref),
                               rtol=2e-2)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


def test_pp_x_tp_train_state_shardings(tiny_cfg):
    """stage_train_state_shardings on the 3-D mesh: optimizer moments
    inherit the composed stage x model layout, scalars stay replicated."""
    from jax.sharding import PartitionSpec as P

    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    mesh = pp.make_pp_mesh(2, model_parallel=2)
    sh = pp.stage_train_state_shardings(mesh, params)
    q = sh.params["model"]["encoder"]["layers"]["self_attn"]["q_kernel"]
    assert q.spec == P("stage", None, "model")
    mu = sh.opt_state.mu["model"]["encoder"]["layers"]["self_attn"]
    assert mu["q_kernel"].spec == q.spec
    assert sh.opt_state.step.spec == P()


def test_pipelined_pretraining_loss_exact(tiny_cfg, np_rng):
    """The 4-head pretraining loss with the trunk pipelined (heads run
    replicated on the gathered decoder output): bitwise-equal at fp32 on a
    stage-only mesh."""
    from kmbart_tpu.models.pretraining import (
        init_pretraining_params, pretraining_loss)

    cfg = tiny_cfg.replace(dtype="float32")
    params = init_pretraining_params(jax.random.PRNGKey(1), cfg)
    rng = np_rng
    batch = _batch(cfg, rng)
    B, T = batch["decoder_input_ids"].shape
    batch.update(
        mrm_soft_labels=rng.dirichlet(np.ones(cfg.num_labels),
                                      (B, T)).astype(np.float32),
        mrm_mask=rng.random((B, T)) < 0.3,
        attribute_labels=rng.integers(0, cfg.num_attributes,
                                      (B, T)).astype(np.int32),
        attribute_mask=(rng.random((B, T)) < 0.3).astype(np.float32),
        relation_pairs=rng.integers(0, T, (B, 4, 2)).astype(np.int32),
        relation_labels=rng.integers(0, cfg.num_relations,
                                     (B, 4)).astype(np.int32),
        relation_mask=np.ones((B, 4), bool))
    mesh = pp.make_stage_mesh(2)

    ref = jax.jit(lambda p, b: pretraining_loss(p, cfg, b)[0])(params, batch)
    got = jax.jit(lambda p, b: pp.pipelined_pretraining_loss(
        p, cfg, b, mesh, n_micro=4)[0])(params, batch)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pipelined_dropout_trains(tiny_cfg, np_rng):
    """train=True with dropout on: per-(layer, microbatch) keys give a
    valid (finite, descending-loss) training signal even though the masks
    differ from the sequential path's per-layer keys."""
    cfg = tiny_cfg.replace(dtype="float32", dropout=0.1)
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np_rng)
    mesh = pp.make_stage_mesh(2)
    loss, aux = jax.jit(lambda p, b, r: pp.pipelined_conditional_loss(
        p, cfg, b, mesh, n_micro=2, train=True, rng=r))(
            params, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(aux["logits"])).all()


def test_span_process_mesh_layout():
    """span_processes mesh shape/axes + single-process degenerate layout
    (stages split the local devices), and data_feed_layout's feed groups."""
    from kmbart_tpu.parallel.mesh import data_feed_layout

    mesh = pp.make_pp_mesh(2, span_processes=True)
    assert mesh.axis_names == ("data", "stage")
    assert dict(mesh.shape) == {"data": 4, "stage": 2}
    # single process: every data coordinate belongs to the one feed group
    n_groups, rank = data_feed_layout(mesh)
    assert (n_groups, rank) == (1, 0)

    mesh3 = pp.make_pp_mesh(2, model_parallel=2, span_processes=True)
    assert dict(mesh3.shape) == {"data": 2, "stage": 2, "model": 2}
    # all 8 devices used exactly once
    ids = sorted(d.id for d in np.asarray(mesh3.devices).flat)
    assert ids == sorted(d.id for d in jax.devices())


def test_span_process_pipeline_loss_exact(tiny_cfg, np_rng):
    """The pipelined loss on a span_processes mesh matches the sequential
    loss to cross-device reduction order (the reordered grid changes which
    device holds which data shard, so the final psum's contribution order
    differs from the in-order mesh — observed 1.4e-6 on the 8-CPU mesh;
    the in-order-mesh test above stays exact)."""
    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, np_rng)
    mesh = pp.make_pp_mesh(2, span_processes=True)
    ref, _ = jax.jit(lambda p, b: conditional_loss(p, cfg, b))(params, batch)
    got, _ = jax.jit(lambda p, b: pp.pipelined_conditional_loss(
        p, cfg, b, mesh, n_micro=2))(params, batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
