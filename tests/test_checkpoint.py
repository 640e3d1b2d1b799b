"""Checkpoint save/resume round trips (SURVEY.md §5 checkpoint/resume)."""

import jax
import numpy as np
import pytest

from kmbart_tpu.checkpoint.io import (
    load_pretrained, load_training_data, save_pretrained, save_training_data)
from kmbart_tpu.models.conditional import init_conditional_params
from kmbart_tpu.models.pretraining import init_pretraining_params
from kmbart_tpu.training.adamw import adamw_init


def test_save_load_roundtrip(tiny_cfg, tmp_path):
    cfg = tiny_cfg
    params = init_conditional_params(jax.random.PRNGKey(1), cfg)
    save_pretrained(str(tmp_path / "model0"), cfg, params)
    cfg2, params2, report = load_pretrained(
        str(tmp_path / "model0"), init_conditional_params)
    assert cfg2.d_model == cfg.d_model
    assert cfg2.img_feat_id == cfg.img_feat_id
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pretraining_heads_roundtrip(tiny_cfg, tmp_path):
    cfg = tiny_cfg
    params = init_pretraining_params(jax.random.PRNGKey(2), cfg)
    save_pretrained(str(tmp_path / "m"), cfg, params)
    _, params2, _ = load_pretrained(str(tmp_path / "m"), init_pretraining_params)
    np.testing.assert_array_equal(
        np.asarray(params["relation_head"]["out_kernel"]),
        np.asarray(params2["relation_head"]["out_kernel"]))


def test_training_data_roundtrip(tiny_cfg, tmp_path):
    cfg = tiny_cfg
    params = init_conditional_params(jax.random.PRNGKey(3), cfg)
    opt_state = adamw_init(params)
    save_training_data(str(tmp_path), opt_state=opt_state, epoch=4, step=123)
    out = load_training_data(str(tmp_path), opt_state_template=adamw_init(params))
    assert out["epoch"] == 4 and out["step"] == 123
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(out["opt_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_training_data_legacy_no_leaf_steps(tiny_cfg, tmp_path):
    """A pre-round-3 optimizer checkpoint (no leaf_steps/* entries) must
    load with every leaf step seeded from the saved global step instead of
    raising KeyError (advisor round-3 finding)."""
    import os
    cfg = tiny_cfg
    params = init_conditional_params(jax.random.PRNGKey(5), cfg)
    opt_state = adamw_init(params)._replace(step=np.int32(7))
    save_training_data(str(tmp_path), opt_state=opt_state, epoch=2, step=7)
    # rewrite the npz dropping every leaf_steps entry, as the legacy
    # format (global-step-only AdamW state) would have produced
    file = os.path.join(tmp_path, "training_data.npz")
    with np.load(file) as data:
        flat = {k: v for k, v in data.items()
                if not k.startswith("leaf_steps/")}
    np.savez(file, **flat)
    out = load_training_data(str(tmp_path),
                             opt_state_template=adamw_init(params))
    assert out["epoch"] == 2 and out["step"] == 7
    loaded = out["opt_state"]
    assert int(loaded.step) == 7
    for leaf in jax.tree.leaves(loaded.leaf_steps):
        assert int(leaf) == 7


def test_load_shape_mismatch_raises(tiny_cfg, tmp_path):
    cfg = tiny_cfg
    params = init_conditional_params(jax.random.PRNGKey(4), cfg)
    save_pretrained(str(tmp_path / "m"), cfg, params)
    bigger = cfg.replace(vocab_size=cfg.vocab_size + 16)
    try:
        load_pretrained(str(tmp_path / "m"), init_conditional_params,
                        config=bigger)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_torch_export_roundtrip(tiny_cfg, tmp_path):
    """Export to pytorch_model.bin, reload through the pure-python importer."""
    pytest = __import__("pytest")
    pytest.importorskip("torch")
    from kmbart_tpu.checkpoint.torch_export import save_torch_pretrained

    cfg = tiny_cfg
    params = init_conditional_params(jax.random.PRNGKey(6), cfg)
    save_torch_pretrained(str(tmp_path / "export"), cfg, params)
    cfg2, params2, report = load_pretrained(
        str(tmp_path / "export"), init_conditional_params)
    assert cfg2.d_model == cfg.d_model
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.slow
def test_sharded_checkpoint_roundtrip(tmp_path, tiny_cfg):
    """Orbax sharded save/restore over a DP4 x TP2 mesh: values and
    shardings must round-trip without host gathering."""
    import jax
    from kmbart_tpu.checkpoint.sharded import load_sharded, save_sharded
    from kmbart_tpu.models.pretraining import init_pretraining_params
    from kmbart_tpu.parallel.mesh import make_mesh
    from kmbart_tpu.parallel.tp import shard_train_state
    from kmbart_tpu.training.state import TrainState

    params = init_pretraining_params(jax.random.PRNGKey(0), tiny_cfg)
    state = TrainState.create(params)
    mesh = make_mesh(model_parallel=2)
    sharded = shard_train_state(mesh, state)

    path = str(tmp_path / "ckpt")
    save_sharded(path, sharded)
    restored = load_sharded(path, sharded)

    flat_a = jax.tree_util.tree_leaves(sharded)
    flat_b = jax.tree_util.tree_leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        if isinstance(a, jax.Array):
            assert b.sharding.is_equivalent_to(a.sharding, a.ndim), (
                a.sharding, b.sharding)

    # restore into a *different* layout: fully replicated
    repl = jax.tree_util.tree_map(lambda x: np.asarray(x), sharded)
    restored_host = load_sharded(path, repl)
    for a, b in zip(flat_a, jax.tree_util.tree_leaves(restored_host)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_checkpoint_async(tmp_path, tiny_cfg):
    """block=False save: returns immediately, drains on wait, loads equal —
    and mutating params after the call must not corrupt the snapshot."""
    import jax
    import jax.numpy as jnp
    from kmbart_tpu.checkpoint.sharded import (
        load_sharded, save_sharded, wait_for_async_saves)
    from kmbart_tpu.models.pretraining import init_pretraining_params

    params = init_pretraining_params(jax.random.PRNGKey(0), tiny_cfg)
    params = jax.device_put(params)
    snapshot = jax.tree_util.tree_map(np.asarray, params)

    path = str(tmp_path / "async_ckpt")
    save_sharded(path, params, block=False)
    # overwrite the live arrays after save() returned (donation pattern)
    params = jax.tree_util.tree_map(lambda x: x + 1.0, params)
    wait_for_async_saves()

    restored = load_sharded(path, snapshot)
    for a, b in zip(jax.tree_util.tree_leaves(snapshot),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
