"""COCO captions dataset preparation.

Parity target: scripts/prepare_coco.py:17-198 — merge captions/instances
annotations into per-image entries (boxes converted xywh->xyxy), emit
``{split}.json`` / ``{split}_eval.json`` / ``{split}_ref.json``, and run the
detector given-box path over (instance boxes + whole image).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json
import os
import warnings

import numpy as np

from scripts.prep_common import (
    add_shard_args, dump_json, extract_features_loop, print_segment_line)


def extract_data(captions, instances):
    data = {}
    for img in captions["images"]:
        data[img["id"]] = {"img_id": img["id"], "img_fn": img["file_name"],
                           "width": img["width"], "height": img["height"]}
    for cap in captions["annotations"]:
        entry = data[cap["image_id"]]
        entry.setdefault("caption", []).append(cap["caption"])
    for ins in instances["annotations"]:
        entry = data[ins["image_id"]]
        boxes = list(ins["bbox"])
        boxes[2] += boxes[0]
        boxes[3] += boxes[1]
        entry.setdefault("boxes", []).append(boxes)
    for key in list(data.keys()):
        if "caption" not in data[key]:
            data[key]["caption"] = ""
    return data


def get_text_data(entry, index):
    base = {"img_id": str(entry["img_id"]), "img_fn": entry["img_fn"],
            "index": index, "task_type": "caption"}
    return [{**base, "labels": c} for c in entry["caption"]]


def get_eval_data(entry, index):
    return [{"img_id": str(entry["img_id"]), "img_fn": entry["img_fn"],
             "index": index, "task_type": "caption"}]


def get_reference_data(entry):
    return [{"caption": entry["caption"], "img_id": str(entry["img_id"])}]


def get_image_data(entry, args, extractor):
    import cv2
    im = cv2.imread(os.path.join(args._cur_image_dir, entry["img_fn"]))
    h, w = entry["height"], entry["width"]
    whole = np.array([0, 0, w, h])
    if "boxes" in entry:
        boxes = np.row_stack((np.array(entry["boxes"]), whole))
    else:
        boxes = np.row_stack((whole,))
    features = extractor.extract_feature(im, boxes)
    return {
        "__img_id__": str(entry["img_id"]),
        "image_features": features["features"],
        "mrm_labels": features["scores"],
        "boxes": features["boxes"],
    }


def main():
    warnings.filterwarnings("ignore")
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_dir", type=str, default=None,
                        help="path for training images (train2014)")
    parser.add_argument("--val_dir", type=str, default=None,
                        help="path for validation images (val2014)")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--annot_dir", type=str, required=True)
    add_shard_args(parser)
    args = parser.parse_args()

    print_segment_line("extracting training annotations")
    train_data = extract_data(
        captions=json.load(open(os.path.join(args.annot_dir, "captions_train2014.json"))),
        instances=json.load(open(os.path.join(args.annot_dir, "instances_train2014.json"))))
    print_segment_line("extracting validation annotations")
    val_data = extract_data(
        captions=json.load(open(os.path.join(args.annot_dir, "captions_val2014.json"))),
        instances=json.load(open(os.path.join(args.annot_dir, "instances_val2014.json"))))

    split_dict = {"train": (train_data, args.train_dir),
                  "val": (val_data, args.val_dir)}
    for split in split_dict:
        os.makedirs(os.path.join(args.output_dir, split), exist_ok=True)

    print_segment_line("generating textual and reference data")
    for split, (data, _) in split_dict.items():
        text_data, eval_data, ref_data = [], [], []
        for index, entry in enumerate(data.values()):
            text_data += get_text_data(entry, index)
            eval_data += get_eval_data(entry, index)
            ref_data += get_reference_data(entry)
        dump_json(text_data, args.output_dir, split + ".json")
        dump_json(eval_data, args.output_dir, split + "_eval.json")
        dump_json(ref_data, args.output_dir, split + "_ref.json")

    for split, (data, image_dir) in split_dict.items():
        if image_dir is not None:
            print_segment_line(f"extracting image features for {split} set")
            args._cur_image_dir = image_dir
            extract_features_loop(list(data.values()), split, args,
                                  get_image_data)


if __name__ == "__main__":
    main()
