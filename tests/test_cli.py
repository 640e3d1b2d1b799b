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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_vcg_train_pipeline_parallel_cli(fixture_dir, tmp_path):
    """--pipeline_stages 2 on the 8-CPU virtual mesh (DP4 x PP2): the full
    fine-tune CLI trains with stage-sharded layers and saves a portable
    checkpoint identical in format to the sequential run's."""
    import vcg_train

    ckpt_dir = str(tmp_path / "ckpt_pp")
    args = _args(vcg_train, [
        "--data_dir", os.path.join(fixture_dir, "vcg"),
        "--checkpoint_dir", ckpt_dir,
        "--model_config", os.path.join(fixture_dir, "config.json"),
        "--tokenizer_dir", os.path.join(fixture_dir, "tokenizer"),
        "--epochs", "1", "--batch_size", "8", "--lr", "1e-3",
        "--validate_loss", "--max_length", "10", "--cpu",
        "--pipeline_stages", "2", "--pipeline_microbatches", "2"])
    vcg_train.main(args)
    run_dir = os.listdir(ckpt_dir)[0]
    model_dir = os.path.join(ckpt_dir, run_dir, "model0")
    assert os.path.exists(os.path.join(model_dir, "params.npz"))
    assert os.path.exists(os.path.join(model_dir, "training_data.npz"))


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


@pytest.mark.slow
def test_vcg_train_sharded_checkpoint_resume(fixture_dir, tmp_path):
    """--sharded_checkpoints over the DP4 x TP2 mesh: epoch checkpoint is an
    orbax sharded dir; --continue_training restores state and epoch."""
    import glob

    import vcg_train

    ckpt_dir = str(tmp_path / "ckpt_sharded")
    base = [
        "--data_dir", os.path.join(fixture_dir, "vcg"),
        "--checkpoint_dir", ckpt_dir,
        "--model_config", os.path.join(fixture_dir, "config.json"),
        "--tokenizer_dir", os.path.join(fixture_dir, "tokenizer"),
        "--batch_size", "8", "--lr", "1e-3", "--max_length", "10",
        "--model_parallel", "2", "--sharded_checkpoints"]
    vcg_train.main(_args(vcg_train, base + ["--epochs", "1"]))

    saved = glob.glob(os.path.join(ckpt_dir, "*", "model0"))
    assert saved, "no epoch checkpoint written"
    assert os.path.isdir(os.path.join(saved[0], "sharded_state"))
    assert os.path.exists(os.path.join(saved[0], "config.json"))
    assert not os.path.exists(os.path.join(saved[0], "params.npz"))

    vcg_train.main(_args(vcg_train, base + [
        "--epochs", "2", "--continue_training", "--checkpoint", saved[0]]))
    resumed = glob.glob(os.path.join(ckpt_dir, "*", "model1"))
    assert resumed, "resume did not advance to epoch 1"


@pytest.mark.slow
def test_hf_checkpoint_user_journey(fixture_dir, tmp_path):
    """The reference's main interop promise: point the generate CLI at a
    checkpoint saved by transformers' own save_pretrained (config.json +
    pytorch_model.bin, partial-load path) and get transformers' greedy
    output back (ref src/model/mixins.py:458-530)."""
    torch = pytest.importorskip("torch")
    import numpy as np
    import transformers
    import vcg_generate
    from kmbart_tpu.data.tokenization import ConditionTokenizer
    from kmbart_tpu.data.collation import Collator
    from kmbart_tpu.data.datasets import VCGDataset
    from kmbart_tpu.data.loader import DataLoader

    tok = ConditionTokenizer(
        assets_dir=os.path.join(fixture_dir, "tokenizer"))
    hf_cfg = transformers.BartConfig(
        vocab_size=len(tok) + 8, d_model=32,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_position_embeddings=64, activation_function="gelu",
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        pad_token_id=tok.pad_token_id, bos_token_id=tok.bos_token_id,
        eos_token_id=tok.eos_token_id,
        decoder_start_token_id=tok.bos_token_id,
        forced_bos_token_id=None, forced_eos_token_id=None)
    hf = transformers.BartForConditionalGeneration(hf_cfg).eval()
    ckpt = str(tmp_path / "hfckpt")
    hf.save_pretrained(ckpt, safe_serialization=False)

    out_file = str(tmp_path / "gen.json")
    args = _args(vcg_generate, [
        "--data_dir", os.path.join(fixture_dir, "vcg"),
        "--output_file", out_file,
        "--checkpoint", ckpt,
        "--tokenizer_dir", os.path.join(fixture_dir, "tokenizer"),
        "--num_beams", "1", "--num_gen", "1", "--batch_size", "6",
        "--max_length", "12", "--cpu"])
    args.use_image = False  # text-only: exact parity with the HF twin
    vcg_generate.main(args)
    gen = json.load(open(out_file))
    assert len(gen) == 18

    # reproduce the CLI's exact inputs and run transformers greedy on them
    from kmbart_tpu.config import MultiModalBartConfig
    cfg = MultiModalBartConfig.from_json(os.path.join(ckpt, "config.json"))
    collate = Collator(tok, has_label=False, max_img_num=cfg.max_img_num,
                       image_feature_size=cfg.image_feature_size)
    dataset = VCGDataset(os.path.join(fixture_dir, "vcg"), split="val",
                         use_image=False, use_event=True, eval_mode=True)
    loader = DataLoader(dataset, batch_size=6, collate_fn=collate)
    pos = 0
    with torch.no_grad():
        for batch in loader:
            ref = hf.generate(
                input_ids=torch.tensor(
                    np.asarray(batch["input_ids"], np.int64)),
                attention_mask=torch.tensor(
                    np.asarray(batch["attention_mask"], np.int64)),
                max_length=12, num_beams=1, do_sample=False,
                min_length=0).numpy()
            for j in range(len(batch["index"])):
                want = tok.decode(ref[j], skip_special_tokens=True)
                got = gen[pos]
                assert got["index"] == batch["index"][j]
                assert got["task_type"] == batch["task_type"][j]
                assert got["generations"] == [want], (pos, got, want)
                pos += 1
    assert pos == 18
