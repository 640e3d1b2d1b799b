"""End-to-end learning-signal test: train -> beam decode -> metric scoring.

Overfits the tiny model on the fixture VCG set and asserts the generation
metrics actually move — the whole pipeline (collation, loss, optimizer,
beam search, PTB/BLEU/CIDEr) must cooperate for this to pass.
"""

import json
import os

import jax
import numpy as np
import pytest

from kmbart_tpu.config import MultiModalBartConfig
from kmbart_tpu.data import Collator, ConditionTokenizer
from kmbart_tpu.data.datasets import VCGDataset
from kmbart_tpu.data.loader import DataLoader
from kmbart_tpu.eval.metrics import compute_metric_inference
from kmbart_tpu.generation.driver import generate_text
from kmbart_tpu.models.conditional import conditional_loss, init_conditional_params
from kmbart_tpu.parallel.mesh import device_arrays
from kmbart_tpu.parallel.train_step import build_train_step
from kmbart_tpu.training.adamw import adamw
from kmbart_tpu.training.state import TrainState


class _GenArgs:
    num_beams = 2
    num_gen = 1
    do_sample = False
    top_p = 1.0
    top_k = 0
    max_length = 48


@pytest.mark.slow
def test_overfit_improves_generation_metrics(fixture_dataset, toy_assets):
    cfg = MultiModalBartConfig.from_json(
        os.path.join(fixture_dataset, "config.json")).replace(dropout=0.0)
    tok = ConditionTokenizer(assets_dir=toy_assets)
    col = Collator(tok, has_label=True, max_img_num=cfg.max_img_num,
                   image_feature_size=cfg.image_feature_size)
    gen_col = Collator(tok, has_label=False, max_img_num=cfg.max_img_num,
                       image_feature_size=cfg.image_feature_size)
    vcg = os.path.join(fixture_dataset, "vcg")
    ds = VCGDataset(vcg, split="train")
    loader = DataLoader(ds, batch_size=18, collate_fn=col, shuffle=True)

    params = init_conditional_params(jax.random.PRNGKey(0), cfg)

    def loss_fn(p, b, rng):
        loss, _ = conditional_loss(p, cfg, b, train=True, rng=rng)
        return loss, {}

    step = build_train_step(loss_fn, adamw(lr=3e-3))
    state = TrainState.create(params)
    rng = jax.random.PRNGKey(0)

    gen_ds = VCGDataset(vcg, split="train", eval_mode=True)
    gen_loader = DataLoader(gen_ds, batch_size=18, collate_fn=gen_col)
    refs = json.load(open(os.path.join(vcg, "train_ref.json")))

    def score(p):
        gen = generate_text(p, cfg, gen_loader, tok, _GenArgs())
        return compute_metric_inference(gen, refs, verbose=False)

    before = score(state.params)
    metrics = None
    for epoch in range(120):
        loader.set_epoch(epoch)
        for batch in loader:
            state, metrics = step(state, device_arrays(batch), rng)
    assert float(metrics["loss"]) < 0.5          # memorised the corpus
    after = score(state.params)
    assert after["CIDEr"] > before["CIDEr"] + 0.3, (before, after)
    assert after["BLEU1"] > before["BLEU1"] + 0.1
    assert after["METEOR"] > before["METEOR"]
