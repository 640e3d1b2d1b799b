"""Offline-pipeline CLI tests on synthetic annotations (no feature step)."""

import json
import os
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _run(mod_main, argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        mod_main()
    finally:
        sys.argv = old


def test_prepare_vcg_index(tmp_path):
    from scripts.prepare_vcg import main
    annots = {
        "train": [
            {"img_fn": "img/a.jpg", "metadata_fn": "md/a.json", "split": "train",
             "event": "1 stands", "intent": ["greet 2"], "before": ["walk in"],
             "after": ["sit down"]},
        ],
        "val": [
            {"img_fn": "img/b.jpg", "metadata_fn": "md/b.json", "split": "val",
             "event": "2 waves", "intent": ["say hi"], "before": [],
             "after": ["leave"]},
        ],
        "test": [
            {"img_fn": "img/c.jpg", "metadata_fn": "md/c.json", "split": "test",
             "event": "3 runs"},
        ],
    }
    annot_dir = tmp_path / "annots"
    annot_dir.mkdir()
    for split, data in annots.items():
        (annot_dir / f"{split}_annots.json").write_text(json.dumps(data))
    out = tmp_path / "out"
    out.mkdir()
    _run(main, ["--annot_dir", str(annot_dir), "--output_dir", str(out)])

    train = json.loads((out / "train.json").read_text())
    assert len(train) == 3  # 1 intent + 1 before + 1 after
    assert {t["task_type"] for t in train} == {"intent", "before", "after"}
    assert train[0]["img_id"] == "a"
    ev = json.loads((out / "train_eval.json").read_text())
    assert len(ev) == 3
    ref = json.loads((out / "val_ref.json").read_text())
    assert ref[0]["before"] == []
    test_rows = json.loads((out / "test.json").read_text())
    assert "task_type" not in test_rows[0]  # test split has no labels


def test_prepare_vg_index(tmp_path):
    from scripts.prepare_vg import main
    annot = tmp_path / "annot"
    annot.mkdir()
    image_data = [{"image_id": i} for i in range(4)]
    region_data = [{"id": i, "regions": [
        {"region_id": 10 * i + j, "phrase": f"region {i} {j}", "x": 1, "y": 9,
         "height": 4, "width": 5} for j in range(2)]} for i in range(4)]
    object_data = [{"image_id": i, "objects": [
        {"object_id": 100 * i + j, "x": 0, "y": 8, "h": 3, "w": 3}
        for j in range(2)]} for i in range(4)]
    attribute_data = [{"image_id": i, "attributes": [
        {"object_id": 100 * i, "attributes": ["Red ", "big"]}]}
        for i in range(4)]
    relation_data = [{"image_id": i, "relationships": [
        {"object": {"object_id": 100 * i}, "subject": {"object_id": 100 * i + 1},
         "predicate": " ON "}]} for i in range(4)]
    for name, data in (("image_data", image_data),
                       ("region_descriptions", region_data),
                       ("objects", object_data),
                       ("attributes", attribute_data),
                       ("relationships", relation_data)):
        (annot / f"{name}.json").write_text(json.dumps(data))
    out = tmp_path / "out"
    out.mkdir()
    _run(main, ["--annot_dir", str(annot), "--output_dir", str(out),
                "--train_ratio", "0.75"])

    train = json.loads((out / "train.json").read_text())
    assert len(train) == 3 and len(json.loads((out / "val.json").read_text())) == 1
    a2i = json.loads((out / "attribute2id.json").read_text())
    r2i = json.loads((out / "relation2id.json").read_text())
    assert "red" in a2i and "big" in a2i      # lowercased + stripped
    assert "on" in r2i
    entry = train["0"]
    assert entry["objects"][0]["attribute_ids"] == [a2i["red"], a2i["big"]]
    assert entry["relations"][0]["predicate_id"] == r2i["on"]
    regions = json.loads((out / "train_region.json").read_text())
    assert len(regions) == 6


def test_prepare_coco_index(tmp_path):
    from scripts.prepare_coco import main
    annot = tmp_path / "annot"
    annot.mkdir()
    caps = {"images": [{"id": 7, "file_name": "7.jpg", "width": 10, "height": 8}],
            "annotations": [{"image_id": 7, "caption": "a cat"},
                            {"image_id": 7, "caption": "one cat"}]}
    inst = {"annotations": [{"image_id": 7, "bbox": [1, 2, 3, 4]}]}
    for split in ("train", "val"):
        (annot / f"captions_{split}2014.json").write_text(json.dumps(caps))
        (annot / f"instances_{split}2014.json").write_text(json.dumps(inst))
    out = tmp_path / "out"
    out.mkdir()
    _run(main, ["--annot_dir", str(annot), "--output_dir", str(out)])
    rows = json.loads((out / "train.json").read_text())
    assert len(rows) == 2 and rows[0]["task_type"] == "caption"


def test_filter_reason_cli(fixture_dataset, toy_assets, tmp_path):
    from scripts.filter_reason import main, parse_args
    from kmbart_tpu.checkpoint.io import save_pretrained
    from kmbart_tpu.models.conditional import init_conditional_params
    from kmbart_tpu.config import MultiModalBartConfig

    cfg = MultiModalBartConfig.from_json(
        os.path.join(fixture_dataset, "config.json"))
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "model"
    save_pretrained(str(ckpt), cfg, params)

    out = tmp_path / "filtered"
    out.mkdir()
    old = sys.argv
    sys.argv = ["prog", "--data_dir", os.path.join(fixture_dataset, "reason"),
                "--output_dir", str(out), "--checkpoint", str(ckpt),
                "--tokenizer_dir", toy_assets,
                "--batch_size", "4", "--pp_threshold", "100.0", "--cpu"]
    try:
        args = parse_args()
    finally:
        sys.argv = old
    main(args)
    kept = json.loads((out / "reason_train.json").read_text())
    # threshold 100 keeps every row whose pickle existed (3 of 4)
    assert len(kept) == 3


def test_clean_caption():
    from scripts.prep_common import clean_caption
    assert clean_caption("A dog&amp;cat (cute) runs...  fast") == "A dog cat runs. fast"
    assert clean_caption("hello @photographer world", strip_at=True) == "hello"


@pytest.mark.slow
def test_prepare_reason_cli_and_resume(tmp_path):
    """prepare_vcg_reason end to end on a toy GPT: emits per-shard
    {split}{shard}{,_eval,_ref}.json + merged reason_{split}.json with
    task-typed rows, and a re-run resumes from the saved index without
    duplicating rows (the reference's crude resumability,
    prepare_sbu_reason.py:126-160)."""
    import json as _json
    import sys

    vocab_dir = tmp_path / "gptvocab"
    vocab_dir.mkdir()
    vocab = {}
    for ch in "abcdefghijklmnopqrstuvwxyz0123456789 '":
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    for sp in ("none</w>", "<END>", "<xIntent>", "<xWant>", "<xNeed>",
               "<xReact>", "<xEffect>"):
        vocab[sp] = len(vocab)
    (vocab_dir / "vocab.json").write_text(_json.dumps(vocab))
    (vocab_dir / "merges.txt").write_text("#version: toy\n")

    annot = tmp_path / "annot"
    annot.mkdir()
    entries = [{"img_id": str(i), "img_fn": f"im{i}.jpg",
                "event": "person waits at the door"} for i in range(3)]
    (annot / "train.json").write_text(_json.dumps(entries))
    out = tmp_path / "out"

    from scripts.reason_common import run
    argv = ["prog", "--annot_dir", str(annot), "--output_dir", str(out),
            "--comet_vocab_dir", str(vocab_dir), "--splits", "train",
            "--save_every", "1", "--gpt_dim", "32", "--gpt_layers", "2",
            "--gpt_heads", "4"]
    old = sys.argv
    try:
        sys.argv = argv
        run(caption_key="event", annot_help="x")
        merged = _json.loads((out / "reason_train.json").read_text())
        assert merged, "no reasoning rows generated"
        assert {r["task_type"] for r in merged} <= {"before", "after",
                                                    "intent"}
        assert all(r["event"] == "person waits at the door" for r in merged)
        n_first = len(merged)
        refs = _json.loads((out / "reason_train_ref.json").read_text())
        assert len(refs) == 3

        # resume: outputs exist and cover every index -> re-run is a no-op
        sys.argv = argv
        run(caption_key="event", annot_help="x")
        again = _json.loads((out / "reason_train.json").read_text())
        assert len(again) == n_first
    finally:
        sys.argv = old
