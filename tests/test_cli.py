"""CLI smoke tests: the four entry points run end-to-end on the fixture
dataset (in-process; the tests conftest already forces the CPU platform)."""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _args(mod, argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        return mod.parse_args()
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    from tests.fixtures.make_dataset import make_dataset
    d = tmp_path_factory.mktemp("clidata")
    make_dataset(str(d))
    return str(d)


def test_vcg_train_and_generate_and_eval(fixture_dir, tmp_path):
    import vcg_train
    import vcg_generate
    import vcg_eval

    ckpt_dir = str(tmp_path / "ckpt")
    args = _args(vcg_train, [
        "--data_dir", os.path.join(fixture_dir, "vcg"),
        "--checkpoint_dir", ckpt_dir,
        "--model_config", os.path.join(fixture_dir, "config.json"),
        "--tokenizer_dir", os.path.join(fixture_dir, "tokenizer"),
        "--epochs", "1", "--batch_size", "8", "--lr", "1e-3",
        "--validate_loss", "--max_length", "10", "--cpu"])
    vcg_train.main(args)

    run_dir = os.listdir(ckpt_dir)[0]
    model_dir = os.path.join(ckpt_dir, run_dir, "model0")
    assert os.path.exists(os.path.join(model_dir, "params.npz"))
    assert os.path.exists(os.path.join(model_dir, "training_data.npz"))

    out_file = str(tmp_path / "gen.json")
    args = _args(vcg_generate, [
        "--data_dir", os.path.join(fixture_dir, "vcg"),
        "--output_file", out_file,
        "--checkpoint", model_dir,
        "--tokenizer_dir", os.path.join(fixture_dir, "tokenizer"),
        "--num_beams", "2", "--num_gen", "2", "--batch_size", "6",
        "--max_length", "10", "--cpu"])
    vcg_generate.main(args)
    gen = json.load(open(out_file))
    assert len(gen) == 18  # 6 images x 3 tasks
    assert all(len(g["generations"]) == 2 for g in gen)

    args = _args(vcg_eval, [
        "--generation", out_file,
        "--reference", os.path.join(fixture_dir, "vcg", "val_ref.json")])
    vcg_eval.main(args)  # must not raise


def test_pretrain_cli(fixture_dir, tmp_path):
    import pretrain

    args = _args(pretrain, [
        "--dataset", "coco_train", os.path.join(fixture_dir, "coco"),
        "--dataset", "vg_train", os.path.join(fixture_dir, "vg"),
        "--dataset", "vcg_train", os.path.join(fixture_dir, "vcg"),
        "--dataset", "coco_reason_train", os.path.join(fixture_dir, "reason"),
        "--checkpoint_dir", str(tmp_path / "pck"),
        "--model_config", os.path.join(fixture_dir, "config.json"),
        "--tokenizer_dir", os.path.join(fixture_dir, "tokenizer"),
        "--epochs", "1", "--batch_size", "8", "--max_img_num", "4",
        "--lr", "1e-3", "--cpu"])
    pretrain.main(args)
    run_dir = os.listdir(str(tmp_path / "pck"))[0]
    assert os.path.exists(os.path.join(
        str(tmp_path / "pck"), run_dir, "model0", "params.npz"))


def test_pretrain_arg_validation(fixture_dir):
    import pretrain
    with pytest.raises(ValueError):
        _args(pretrain, ["--dataset", "bogus_name", "x",
                         "--checkpoint_dir", "/tmp/x",
                         "--model_config", os.path.join(fixture_dir, "config.json")])
    with pytest.raises(ValueError):
        _args(pretrain, ["--dataset", "coco_train", "x",
                         "--dataset", "coco_train", "y",
                         "--checkpoint_dir", "/tmp/x",
                         "--model_config", os.path.join(fixture_dir, "config.json")])
