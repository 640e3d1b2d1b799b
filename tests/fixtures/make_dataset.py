"""Synthetic KM-BART-format dataset fixture.

Generates the on-disk layout the reference's prepare_* scripts produce
(SURVEY.md §2 #19, #25): per-split JSON indexes, ``*_eval.json`` /
``*_ref.json`` for VCG, VG region/object/relation JSONs, and per-image
pickles with detector features/boxes/soft labels — at toy dimensions
(feature 16+4=20, 7 MRM classes) so CPU tests and CLI smoke runs are fast.

Usage: ``python -m tests.fixtures.make_dataset <out_dir>``.
"""

import json
import os
import pickle
import sys

import numpy as np

FEAT_DIM = 16          # detector feature (real: 2048)
BOX_DIM = 4
NUM_MRM_LABELS = 7     # detector classes (real: 1601)
EVENTS = [
    "1 sits at a wooden table",
    "2 holds a cup of coffee",
    "3 walks across the street",
    "1 talks to 2 near the door",
]
SENTENCES = [
    "order some food",
    "drink the coffee slowly",
    "get to the other side",
    "say hello to a friend",
    "finish the meal",
    "wave at the crowd",
]
TASKS = ["intent", "before", "after"]


def _write_pickle(path, rng, n_boxes):
    data = {
        "image_features": rng.normal(size=(n_boxes, FEAT_DIM)).astype(np.float32),
        "boxes": rng.uniform(0, 1, size=(n_boxes, BOX_DIM)).astype(np.float32),
        "mrm_labels": rng.dirichlet(np.ones(NUM_MRM_LABELS),
                                    n_boxes).astype(np.float32),
    }
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return data


def make_vcg(out_dir, rng, n_images=6, splits=("train", "val")):
    for split in splits:
        img_dir = os.path.join(out_dir, split)
        os.makedirs(img_dir, exist_ok=True)
        entries, eval_entries, refs = [], [], []
        for i in range(n_images):
            img_id = f"{split}_img{i}"
            _write_pickle(os.path.join(img_dir, img_id + ".pkl"), rng,
                          n_boxes=int(rng.integers(2, 5)))
            event = EVENTS[i % len(EVENTS)]
            index = len(refs)
            ref_entry = {}
            for task in TASKS:
                sents = [SENTENCES[(i + j) % len(SENTENCES)] for j in range(2)]
                ref_entry[task] = sents
                for s in sents:
                    entries.append({"img_id": img_id, "event": event,
                                    "labels": s, "task_type": task,
                                    "index": index})
                eval_entries.append({"img_id": img_id, "event": event,
                                     "task_type": task, "index": index})
            refs.append(ref_entry)
        with open(os.path.join(out_dir, f"{split}.json"), "w") as f:
            json.dump(entries, f)
        with open(os.path.join(out_dir, f"{split}_eval.json"), "w") as f:
            json.dump(eval_entries, f)
        with open(os.path.join(out_dir, f"{split}_ref.json"), "w") as f:
            json.dump(refs, f)


def make_coco(out_dir, rng, n_images=4, splits=("train", "val")):
    for split in splits:
        img_dir = os.path.join(out_dir, split)
        os.makedirs(img_dir, exist_ok=True)
        entries = []
        for i in range(n_images):
            img_id = f"coco_{split}{i}"
            _write_pickle(os.path.join(img_dir, img_id + ".pkl"), rng,
                          n_boxes=int(rng.integers(2, 4)))
            entries.append({"img_id": img_id,
                            "labels": SENTENCES[i % len(SENTENCES)],
                            "task_type": "caption"})
        with open(os.path.join(out_dir, f"{split}.json"), "w") as f:
            json.dump(entries, f)


def make_vg(out_dir, rng, n_images=3, splits=("train",)):
    for split in splits:
        img_dir = os.path.join(out_dir, split)
        os.makedirs(img_dir, exist_ok=True)
        index, regions = {}, []
        for i in range(n_images):
            img_id = f"vg_{split}{i}"
            n_obj = int(rng.integers(2, 4))
            object_ids = [100 * i + j for j in range(n_obj)]
            region_ids = [1000 * i + j for j in range(2)]
            data = {
                "image_feature": rng.normal(size=(FEAT_DIM,)).astype(np.float32),
                "image_box": rng.uniform(size=(BOX_DIM,)).astype(np.float32),
                "image_score": rng.dirichlet(np.ones(NUM_MRM_LABELS)).astype(np.float32),
                "object_features": rng.normal(size=(n_obj, FEAT_DIM)).astype(np.float32),
                "object_boxes": rng.uniform(size=(n_obj, BOX_DIM)).astype(np.float32),
                "object_scores": rng.dirichlet(np.ones(NUM_MRM_LABELS), n_obj).astype(np.float32),
                "object_ids": object_ids,
                "region_features": rng.normal(size=(2, FEAT_DIM)).astype(np.float32),
                "region_boxes": rng.uniform(size=(2, BOX_DIM)).astype(np.float32),
                "region_scores": rng.dirichlet(np.ones(NUM_MRM_LABELS), 2).astype(np.float32),
                "region_ids": region_ids,
            }
            with open(os.path.join(img_dir, img_id + ".pkl"), "wb") as f:
                pickle.dump(data, f)
            index[str(img_id)] = {
                "img_id": img_id,
                "objects": [{"object_id": oid,
                             "attribute_ids": [int(rng.integers(0, 5))]}
                            for oid in object_ids],
                "object_ids": object_ids,
                "relations": [{"object_id": object_ids[0],
                               "subject_id": object_ids[1],
                               "predicate_id": int(rng.integers(0, 5))}],
            }
            for rid in region_ids:
                regions.append({"img_id": img_id, "region_id": rid,
                                "description": SENTENCES[rid % len(SENTENCES)]})
        with open(os.path.join(out_dir, f"{split}.json"), "w") as f:
            json.dump(index, f)
        with open(os.path.join(out_dir, f"{split}_region.json"), "w") as f:
            json.dump(regions, f)


def make_reason(out_dir, vcg_dir, rng, splits=("train",)):
    """COMET-style reason entries pointing at the VCG images (some missing
    pickles to exercise the drop-None path)."""
    for split in splits:
        entries = []
        for i in range(4):
            img_id = f"{split}_img{i}" if i < 3 else "missing_img"
            entries.append({"img_id": img_id, "event": EVENTS[i % len(EVENTS)],
                            "labels": SENTENCES[i % len(SENTENCES)],
                            "task_type": TASKS[i % len(TASKS)]})
        with open(os.path.join(out_dir, f"reason_{split}.json"), "w") as f:
            json.dump(entries, f)
        os.makedirs(os.path.join(out_dir, split), exist_ok=True)
        for i in range(3):
            src = os.path.join(vcg_dir, split, f"{split}_img{i}.pkl")
            dst = os.path.join(out_dir, split, f"{split}_img{i}.pkl")
            if os.path.exists(src) and not os.path.exists(dst):
                with open(src, "rb") as fs, open(dst, "wb") as fd:
                    fd.write(fs.read())


def make_dataset(out_dir, tokenizer_assets=None, seed=0):
    rng = np.random.default_rng(seed)
    vcg = os.path.join(out_dir, "vcg")
    os.makedirs(vcg, exist_ok=True)
    make_vcg(vcg, rng)
    coco = os.path.join(out_dir, "coco")
    os.makedirs(coco, exist_ok=True)
    make_coco(coco, rng)
    vg = os.path.join(out_dir, "vg")
    os.makedirs(vg, exist_ok=True)
    make_vg(vg, rng)
    reason = os.path.join(out_dir, "reason")
    os.makedirs(reason, exist_ok=True)
    make_reason(reason, vcg, rng)

    if tokenizer_assets is None:
        from kmbart_tpu.data.bpe import build_toy_assets
        tokenizer_assets = os.path.join(out_dir, "tokenizer")
        build_toy_assets(tokenizer_assets)

    # a tiny model config consistent with the toy tokenizer
    from kmbart_tpu.config import tiny_config
    from kmbart_tpu.data.tokenization import ConditionTokenizer
    tok = ConditionTokenizer(assets_dir=tokenizer_assets)
    cfg = tiny_config(
        vocab_size=len(tok) + 8,
        img_feat_id=tok.img_feat_id, cls_token_id=tok.cls_token_id,
        pad_token_id=tok.pad_token_id, bos_token_id=tok.bos_token_id,
        eos_token_id=tok.eos_token_id,
        decoder_start_token_id=tok.bos_token_id,
        image_feature_size=FEAT_DIM + BOX_DIM,
        num_labels=NUM_MRM_LABELS, num_attributes=8, num_relations=8)
    cfg.save_json(os.path.join(out_dir, "config.json"))
    return {"vcg": vcg, "coco": coco, "vg": vg, "reason": reason,
            "tokenizer": tokenizer_assets,
            "config": os.path.join(out_dir, "config.json")}


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "fixture_data"
    paths = make_dataset(out)
    print(json.dumps(paths, indent=2))
