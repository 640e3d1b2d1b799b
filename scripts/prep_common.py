"""Shared helpers for the offline data-preparation CLIs.

Parity targets: the per-GPU ``data[rank::gpu_num]`` sharding +
per-image pickle writing loops of scripts/prepare_*.py and the SBU/CC
caption cleaning / validity checking utilities (scripts/prepare_sbu.py:26-76).
TPU-native: one process drives the TPU extractor; sharding across hosts is
``--num_shards/--shard`` (same stride semantics as the reference's ranks).
"""

import json
import os
import pickle
import re
import sys
from datetime import datetime


def print_segment_line(info=""):
    sys.stderr.flush()
    print((" " + info.strip() + " ").center(50, "="), flush=True)


def clean_caption(cap, strip_at=False):
    """SBU/CC caption cleaning (scripts/prepare_sbu.py:26-34)."""
    new_cap = cap
    new_cap = new_cap.replace(r"&amp;", " ").replace(r"quot;", " ").replace("amp;", " ")
    new_cap = re.sub(r"\([^>]+?\)", "", new_cap)     # remove (...) blocks
    new_cap = re.sub(r"\.+", ".", new_cap)           # redundant dots
    if strip_at:
        new_cap = new_cap.split("@")[0]
    new_cap = re.sub(r"[^\S\n\t]+", " ", new_cap)    # redundant spacing
    return new_cap.strip()


def delete_invalid(index, path):
    """Remove corrupt downloads (scripts/prepare_sbu.py:37-47)."""
    from PIL import Image
    image_dir = os.path.join(path, str(index) + ".jpg")
    if not os.path.isfile(image_dir):
        return
    try:
        img = Image.open(image_dir)
        img.verify()
        assert img.size[0] > 10 and img.size[1] > 10
    except (IOError, ValueError, AssertionError, SyntaxError):
        os.remove(image_dir)
        print("Deleted corrupt image:", image_dir, flush=True)


def download_image(index, url, path, timeout=5):
    """Best-effort image download (gated: this container has no egress)."""
    import requests
    headers = {"User-Agent": "Googlebot-Image/1.0",
               "X-Forwarded-For": "64.18.15.200"}
    image_dir = os.path.join(path, str(index) + ".jpg")
    if os.path.isfile(image_dir):
        return
    try:
        response = requests.get(url, stream=False, timeout=timeout,
                                allow_redirects=True, headers=headers)
        with open(image_dir, "wb") as f:
            f.write(response.content)
    except Exception:
        print("failed to download {}".format(url), flush=True)


def build_extractor(args):
    """Construct the TPU FeatureExtractor, loading detector weights when
    given (replaces DetectionCheckpointer + CUDA model build). ``--config``
    takes the reference's detectron2-schema YAML
    (ref scripts/prepare_vcg.py:89,116-123)."""
    import jax
    from kmbart_tpu.vision.extractor import FeatureExtractor
    config = getattr(args, "config", None)
    if config:
        ex = FeatureExtractor.from_config(config, rng=jax.random.PRNGKey(0),
                                          load_weights=False)
    else:
        ex = FeatureExtractor(rng=jax.random.PRNGKey(0))
    weights = getattr(args, "detector_weights", None)
    if not weights and config:
        from kmbart_tpu.vision.config import load_extract_config
        w = load_extract_config(config).get("weights")
        if w and os.path.exists(w):
            weights = w
    if weights:
        from kmbart_tpu.vision.import_weights import load_detector_weights
        ex.params, report = load_detector_weights(weights, ex.params)
        for line in report:
            print(line, flush=True)
    return ex


def extract_features_loop(data, split, args, get_image_data):
    """Shard-strided per-image feature extraction with ETA logging
    (reference main() loops, e.g. scripts/prepare_vcg.py:88-102)."""
    extractor = build_extractor(args)
    shard, num_shards = args.shard, args.num_shards
    local_data = data[shard::num_shards]
    start_time = datetime.now()
    for i, entry in enumerate(local_data):
        out = get_image_data(entry, args, extractor)
        img_id = out.pop("__img_id__")
        with open(os.path.join(args.output_dir, split, str(img_id) + ".pkl"),
                  "wb") as f:
            pickle.dump(out, f)
        print("shard{}, {}/{}, ETA: {}".format(
            shard, i, len(local_data),
            str((len(local_data) - (i + 1)) / (i + 1)
                * (datetime.now() - start_time))), flush=True)


def add_shard_args(parser):
    parser.add_argument("--num_shards", default=1, type=int,
                        help="total feature-extraction shards (hosts)")
    parser.add_argument("--shard", default=0, type=int,
                        help="this host's shard index")
    parser.add_argument("--detector_weights", default=None, type=str,
                        help="detector checkpoint (.pth) for the TPU extractor")
    parser.add_argument("--config", default=None, type=str,
                        help="detectron2-schema extractor config YAML "
                             "(config/extract_config.yaml)")


def dump_json(obj, *path):
    with open(os.path.join(*path), "w") as f:
        json.dump(obj, f)
