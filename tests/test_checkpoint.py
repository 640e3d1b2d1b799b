"""Checkpoint save/resume round trips (SURVEY.md §5 checkpoint/resume)."""

import jax
import numpy as np

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
