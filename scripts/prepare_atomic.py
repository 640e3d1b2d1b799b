"""Train the text-image matching classifier on VCG events.

Parity target: scripts/prepare_atomic.py:27-286 — fine-tune
ReasoningClassification with AtomicCollator's shuffled-pair negatives
(shuffle_ratio 0.5) over VCGDataset, per-epoch checkpoints. TPU-native:
jitted train step; the text backbone is this framework's BART encoder
(mean-pooled final hidden states) instead of a downloaded BERT.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from kmbart_tpu.cli_common import setup_platform
from kmbart_tpu.checkpoint.io import load_pretrained, save_pretrained
from kmbart_tpu.data.datasets import VCGDataset
from kmbart_tpu.data.loader import DataLoader
from kmbart_tpu.data.tokenization import ConditionTokenizer
from kmbart_tpu.models import bart
from kmbart_tpu.models.conditional import init_conditional_params
from kmbart_tpu.models.reasoning import (
    AtomicCollator, init_reasoning_params, reasoning_loss)
from kmbart_tpu.training.adamw import adamw
from kmbart_tpu.utils.logger import Logger


def build_text_encoder(args, tokenizer):
    """Frozen text backbone: mean-pooled BART encoder states."""
    if args.text_backbone:
        cfg, params, _ = load_pretrained(args.text_backbone,
                                         init_conditional_params, strict=False)
    else:
        from kmbart_tpu.config import tiny_config
        cfg = tiny_config(vocab_size=len(tokenizer) + 8,
                          pad_token_id=tokenizer.pad_token_id)
        params = init_conditional_params(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def enc_fn(ids, mask):
        h = bart.encode(params["model"], cfg, ids, None, mask)
        denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1)
        return (h * mask[..., None]).sum(axis=1) / denom

    def encode(texts):
        rows = [tokenizer.encode(t)[:32] or [tokenizer.pad_token_id]
                for t in texts]
        width = max(len(r) for r in rows)
        ids = np.full((len(rows), width), tokenizer.pad_token_id, np.int32)
        mask = np.zeros((len(rows), width), np.int32)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return np.asarray(enc_fn(ids, mask))

    return encode, cfg.d_model


def main(args):
    setup_platform(args)
    timestamp = datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    checkpoint_path = os.path.join(args.checkpoint_dir, timestamp)
    os.makedirs(checkpoint_path, exist_ok=True)
    logger = Logger()

    tokenizer = ConditionTokenizer(assets_dir=args.tokenizer_dir)
    encode, txt_dim = build_text_encoder(args, tokenizer)
    image_dim = args.image_seq_length * args.image_feature_size

    collate = AtomicCollator(encode, args.image_seq_length,
                             args.image_feature_size, args.shuffle_ratio,
                             rng=np.random.default_rng(args.seed))
    dataset = VCGDataset(args.data_dir, split="train")
    loader = DataLoader(dataset, batch_size=args.batch_size,
                        collate_fn=collate, shuffle=True,
                        num_workers=args.num_workers, drop_last=True)

    params = init_reasoning_params(jax.random.PRNGKey(args.seed), txt_dim,
                                   image_dim, args.inner_dim)
    opt = adamw(lr=args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, text, image, label):
        def lf(p):
            loss, _ = reasoning_loss(p, text, image, label)
            return loss
        loss, grads = jax.value_and_grad(lf)(params)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss

    logger.info("Start training", pad=True)
    for epoch in range(args.epochs):
        total_step = len(loader)
        start_time = datetime.now()
        for i, batch in enumerate(loader):
            params, opt_state, loss = step(
                params, opt_state, batch["text"], batch["image"],
                batch["label"])
            logger.info("Epoch [{}/{}], Step [{}/{}], Loss: {:.4f}, ETA: {}".format(
                epoch + 1, args.epochs, i + 1, total_step, float(loss),
                str((total_step - (i + 1)) / (i + 1)
                    * (datetime.now() - start_time))))
        save_pretrained(os.path.join(checkpoint_path, f"model{epoch}"),
                        None, params)
        logger.info('Saved checkpoint at "{}"'.format(checkpoint_path))


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True, type=str)
    parser.add_argument("--checkpoint_dir", required=True, type=str)
    parser.add_argument("--tokenizer_dir",
                        default=os.environ.get("KMBART_TOKENIZER_DIR"), type=str)
    parser.add_argument("--text_backbone", default=None, type=str,
                        help="BART checkpoint dir for the frozen text encoder")
    parser.add_argument("--image_seq_length", type=int, default=10)
    parser.add_argument("--image_feature_size", type=int, default=2052)
    parser.add_argument("--inner_dim", type=int, default=512)
    parser.add_argument("--shuffle_ratio", type=float, default=0.5)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_workers", type=int, default=0)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--amp", action="store_true")
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
