"""Perplexity filtering of COMET-generated reasoning data.

Parity target: scripts/filter_reason.py:17-141 — score each (event,
inference) pair with a VCG-trained conditional-generation model and keep
samples whose log-perplexity is below ``--pp_threshold`` (3.5 default).
TPU-native: perplexities for the whole batch come out of one jitted
teacher-forced forward instead of per-row python loops.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json
import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from kmbart_tpu.cli_common import setup_platform
from kmbart_tpu.checkpoint.io import load_pretrained
from kmbart_tpu.data.collation import Collator
from kmbart_tpu.data.datasets import ReasonDataset
from kmbart_tpu.data.loader import DataLoader
from kmbart_tpu.data.tokenization import ConditionTokenizer
from kmbart_tpu.models import bart
from kmbart_tpu.models.conditional import init_conditional_params
from kmbart_tpu.utils.logger import Logger


def batch_log_perplexity(params, cfg, batch):
    """log(perplexity) per row: -mean over valid label positions of the
    label log-prob (filter_reason.py:17-21 computes exp(-mean); we compare
    in log space like the caller: log(pp) < threshold)."""
    hidden, _ = bart.forward(
        params["model"], cfg, batch["input_ids"],
        batch.get("image_features"), batch.get("attention_mask"),
        decoder_input_ids=batch["decoder_input_ids"],
        decoder_attention_mask=batch.get("decoder_attention_mask"))
    logits = bart.lm_logits(params["model"], cfg, hidden,
                            params["final_logits_bias"])
    labels = batch["labels"]
    valid = labels >= 0
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    mean_lp = jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=1) / \
        jnp.maximum(jnp.sum(valid, axis=1), 1)
    return -mean_lp  # == log(exp(-mean)) == log perplexity


def filter_dataset(params, cfg, loader, args, logger):
    filtered_indices = []
    total_step = len(loader)
    start_time = datetime.now()
    fn = jax.jit(lambda p, b: batch_log_perplexity(p, cfg, b))
    for i, batch in enumerate(loader):
        arrays = {k: v for k, v in batch.items()
                  if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1}
        log_pp = np.asarray(fn(params, arrays))
        for j in range(len(log_pp)):
            if log_pp[j] < args.pp_threshold:
                filtered_indices.append(batch["dataset_index"][j])
        logger.info("Filtering, Step [{}/{}], ETA: {}".format(
            i + 1, total_step,
            str((total_step - (i + 1)) / (i + 1) * (datetime.now() - start_time))))
    return filtered_indices


def main(args):
    setup_platform(args)
    logger = Logger(log_file=args.log_dir)
    logger.info("Loading model...")
    tokenizer = ConditionTokenizer(assets_dir=args.tokenizer_dir)
    cfg, params, _ = load_pretrained(args.checkpoint, init_conditional_params,
                                     strict=False)
    logger.info('Loaded model from "{}"'.format(args.checkpoint))

    logger.info("Loading data...")
    collate_fn = Collator(tokenizer, has_label=True,
                          max_img_num=cfg.max_img_num,
                          image_feature_size=cfg.image_feature_size)
    dataset = ReasonDataset(args.data_dir, split=args.split)
    loader = DataLoader(dataset, batch_size=args.batch_size,
                        collate_fn=collate_fn, num_workers=args.num_workers)

    start = datetime.now()
    logger.info("Start computing score", pad=True)
    indices = filter_dataset(params, cfg, loader, args, logger)
    logger.info("Filtering complete in: " + str(datetime.now() - start), pad=True)

    logger.info("Saving results...")
    data = [dataset.get_raw_data(i) for i in indices]
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, f"reason_{args.split}.json"), "w") as f:
        json.dump(data, f)
    logger.info(f"Remaining {len(data)}/{len(dataset)}")
    logger.info('Saved results in "{}"'.format(args.output_dir))


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_dir', required=True, type=str)
    parser.add_argument('--output_dir', required=True, type=str)
    parser.add_argument('--checkpoint', required=True, type=str)
    parser.add_argument('--tokenizer_dir',
                        default=os.environ.get('KMBART_TOKENIZER_DIR'), type=str)
    parser.add_argument('--log_dir', default=None, type=str)
    parser.add_argument('--split', default='train', type=str)
    parser.add_argument('--pp_threshold', default=3.5, type=float,
                        help='perplexity threshold for filtering')
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--amp', action='store_true',
                        help='compat no-op (bf16 always on)')
    parser.add_argument('--batch_size', type=int, default=64)
    parser.add_argument('--num_workers', type=int, default=0)
    return parser.parse_args()


if __name__ == '__main__':
    main(parse_args())
