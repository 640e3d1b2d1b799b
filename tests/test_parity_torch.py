"""Numerical parity against torch/transformers BART (test-only dependency).

SURVEY.md §7.2 calls for parity checks of the BART blocks against reference
activations. transformers' BartModel implements the same architecture the
reference inherits from transformers 3.0.2 (post-norm BART), so with shared
weights the fp32 outputs must agree to float tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402

from kmbart_tpu.config import tiny_config  # noqa: E402
from kmbart_tpu.models import bart  # noqa: E402
from kmbart_tpu.checkpoint.torch_import import (  # noqa: E402
    pytree_to_state_dict, state_dict_to_pytree)


@pytest.fixture(scope="module")
def pair():
    cfg = tiny_config(dtype="float32", vocab_size=99, img_feat_id=90,
                      cls_token_id=93, max_position_embeddings=64)
    params = bart.init_bart_params(jax.random.PRNGKey(3), cfg)
    full = {"model": params, "final_logits_bias": np.zeros((cfg.vocab_size,))}
    sd = pytree_to_state_dict(full, cfg)

    hf_cfg = transformers.BartConfig(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers, decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        decoder_attention_heads=cfg.decoder_attention_heads,
        encoder_ffn_dim=cfg.encoder_ffn_dim, decoder_ffn_dim=cfg.decoder_ffn_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        activation_function="gelu", dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, pad_token_id=cfg.pad_token_id,
        bos_token_id=cfg.bos_token_id, eos_token_id=cfg.eos_token_id,
        decoder_start_token_id=cfg.decoder_start_token_id,
        scale_embedding=False, forced_eos_token_id=None)
    hf = transformers.BartModel(hf_cfg).eval()
    hf_sd = {k: torch.tensor(np.asarray(v, np.float32))
             for k, v in sd.items() if k.startswith("model.")}
    hf_sd = {k[len("model."):]: v for k, v in hf_sd.items()
             if "embed_images" not in k}
    missing, unexpected = hf.load_state_dict(hf_sd, strict=False)
    assert not unexpected, unexpected
    return cfg, params, hf


def test_encoder_parity(pair):
    cfg, params, hf = pair
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 80, (2, 11)).astype(np.int64)
    am = np.ones((2, 11), np.int64)
    am[1, -3:] = 0
    ids[1, -3:] = cfg.pad_token_id
    with torch.no_grad():
        ref = hf.encoder(input_ids=torch.tensor(ids),
                         attention_mask=torch.tensor(am)
                         ).last_hidden_state.numpy()
    ours = np.asarray(bart.encode(params, cfg, ids.astype(np.int32), None,
                                  am.astype(np.int32)))
    # compare only unmasked positions (HF computes garbage on masked rows too)
    mask = am.astype(bool)
    np.testing.assert_allclose(ours[mask], ref[mask], rtol=2e-4, atol=2e-5)


def test_full_model_parity(pair):
    cfg, params, hf = pair
    rng = np.random.default_rng(1)
    ids = rng.integers(4, 80, (2, 9)).astype(np.int64)
    am = np.ones((2, 9), np.int64)
    dec = rng.integers(4, 80, (2, 5)).astype(np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(am),
                 decoder_input_ids=torch.tensor(dec)
                 ).last_hidden_state.numpy()
    hid, _ = bart.forward(params, cfg, ids.astype(np.int32), None,
                          am.astype(np.int32),
                          decoder_input_ids=dec.astype(np.int32))
    np.testing.assert_allclose(np.asarray(hid), ref, rtol=2e-4, atol=2e-5)


def test_state_dict_roundtrip(pair):
    cfg, params, _ = pair
    full = {"model": params,
            "final_logits_bias": np.zeros((cfg.vocab_size,), np.float32)}
    sd = pytree_to_state_dict(full, cfg)
    fresh = {"model": bart.init_bart_params(jax.random.PRNGKey(9), cfg),
             "final_logits_bias": np.ones((cfg.vocab_size,), np.float32)}
    restored, report = state_dict_to_pytree(sd, cfg, fresh)
    flat_a = jax.tree.leaves(full)
    flat_b = jax.tree.leaves(restored)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_partial_load_row_padding():
    """bart-base (small vocab) -> padded multimodal vocab: overlapping rows
    copied, new rows keep their init (mixins.py:511-530)."""
    cfg_small = tiny_config(dtype="float32", vocab_size=80)
    small = {"model": bart.init_bart_params(jax.random.PRNGKey(0), cfg_small),
             "final_logits_bias": np.zeros((80,), np.float32)}
    sd = pytree_to_state_dict(small, cfg_small)

    cfg_big = tiny_config(
        dtype="float32", vocab_size=96,
        partial_load=("model.shared.weight", "final_logits_bias"))
    big = {"model": bart.init_bart_params(jax.random.PRNGKey(7), cfg_big),
           "final_logits_bias": np.ones((96,), np.float32)}
    init_shared = np.asarray(big["model"]["shared"]).copy()
    restored, report = state_dict_to_pytree(sd, cfg_big, big)
    out = np.asarray(restored["model"]["shared"])
    np.testing.assert_allclose(out[:80], np.asarray(small["model"]["shared"]))
    np.testing.assert_allclose(out[80:], init_shared[80:])
    assert any("partially loaded" in r for r in report)


def test_torch_bin_reader(tmp_path):
    """Pure-python pytorch_model.bin reader vs torch.save ground truth."""
    from kmbart_tpu.checkpoint.torch_import import load_torch_checkpoint
    sd = {"a.weight": torch.randn(4, 3), "b.bias": torch.arange(5).float(),
          "c": torch.tensor(2.5)}
    path = tmp_path / "pytorch_model.bin"
    torch.save(sd, str(path))
    loaded = load_torch_checkpoint(str(path))
    assert set(loaded) == set(sd)
    for k in sd:
        np.testing.assert_allclose(loaded[k], sd[k].numpy(), rtol=1e-6)


# --------------------------------------------------------------------------
# N-step training-dynamics parity (round-3 verdict item 1)
# --------------------------------------------------------------------------

class _HFAdamW:
    """transformers==3.0.2 AdamW semantics — the reference's optimizer
    (pretrain.py:13,100): denom = sqrt(v) + eps INSIDE the bias-corrected
    step (torch.optim.AdamW instead uses sqrt(v_hat) + eps, which diverges
    measurably for small gradients); decoupled wd with the uncorrected lr;
    ``p.grad is None`` parameters are skipped entirely (per-param step)."""

    def __init__(self, ps, lr, b1=0.9, b2=0.999, eps=1e-6, wd=0.0):
        self.ps = list(ps)
        self.lr, self.b1, self.b2, self.eps, self.wd = lr, b1, b2, eps, wd
        self.state = [[torch.zeros_like(p), torch.zeros_like(p), 0]
                      for p in self.ps]

    @torch.no_grad()
    def step(self):
        for i, p in enumerate(self.ps):
            if p.grad is None:
                continue
            st = self.state[i]
            m, v, t = st
            t += 1
            g = p.grad
            m.mul_(self.b1).add_(g, alpha=1 - self.b1)
            v.mul_(self.b2).addcmul_(g, g, value=1 - self.b2)
            step_size = (self.lr * (1 - self.b2 ** t) ** 0.5
                         / (1 - self.b1 ** t))
            p.add_(-step_size * m / (v.sqrt() + self.eps))
            if self.wd > 0:
                p.add_(p, alpha=-self.lr * self.wd)
            st[2] = t

    def zero_grad(self):
        for p in self.ps:
            p.grad = None


def _train_twin_cfg():
    from kmbart_tpu.config import tiny_config
    return tiny_config(dtype="float32", vocab_size=99, img_feat_id=90,
                       cls_token_id=93, max_position_embeddings=64,
                       num_labels=7, num_attributes=5, num_relations=5,
                       lm_loss_factor=5.0, image_feature_size=20,
                       max_img_num=4)


def _make_hf_trunk(cfg, sd):
    hf_cfg = transformers.BartConfig(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers, decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        decoder_attention_heads=cfg.decoder_attention_heads,
        encoder_ffn_dim=cfg.encoder_ffn_dim,
        decoder_ffn_dim=cfg.decoder_ffn_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        activation_function="gelu", dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, pad_token_id=cfg.pad_token_id,
        bos_token_id=cfg.bos_token_id, eos_token_id=cfg.eos_token_id,
        decoder_start_token_id=cfg.decoder_start_token_id,
        scale_embedding=False, forced_eos_token_id=None)
    return hf_cfg, {k: torch.tensor(np.asarray(v, np.float32))
                    for k, v in sd.items() if "embed_images" not in k}


@pytest.mark.slow
def test_train_step_parity_finetune():
    """20 training steps on fixed batches: our jitted train step (real
    production driver: grad guard, adamw) must track an HF
    BartForConditionalGeneration + HF-AdamW twin loss-for-loss.
    Ref: src/training.py:29-60 (fine_tune step), pretrain.py:100 (AdamW).
    Chaos floor measured at ~1e-6 (torch-vs-torch with 1e-7 weight jitter);
    the tolerance below is well above it but far below the ~1.5e-3 drift a
    systematic divergence (e.g. torch.optim eps placement, trainable
    final_logits_bias) produces."""
    import jax.numpy as jnp
    from kmbart_tpu.models.conditional import (conditional_loss,
                                               init_conditional_params)
    from kmbart_tpu.parallel.train_step import build_train_step
    from kmbart_tpu.training.adamw import adamw
    from kmbart_tpu.training.state import TrainState

    cfg = _train_twin_cfg()
    params = init_conditional_params(jax.random.PRNGKey(3), cfg)
    sd = pytree_to_state_dict(params, cfg)
    hf_cfg, hf_sd = _make_hf_trunk(cfg, sd)
    hf = transformers.BartForConditionalGeneration(hf_cfg)
    hf_sd["lm_head.weight"] = hf_sd["model.shared.weight"]
    hf.load_state_dict(hf_sd, strict=False)
    hf.train()

    rng = np.random.default_rng(0)
    N_BATCH, B, S, T = 5, 4, 9, 6
    batches = []
    for _ in range(N_BATCH):
        b = dict(input_ids=rng.integers(4, 80, (B, S)).astype(np.int32),
                 attention_mask=np.ones((B, S), np.int32),
                 decoder_input_ids=rng.integers(4, 80, (B, T)).astype(np.int32),
                 labels=rng.integers(4, 80, (B, T)).astype(np.int32))
        b["labels"][:, -2:] = -100  # exercise ignore-index masking
        batches.append(b)

    LR, N_STEPS = 1e-3, 20
    opt_t = _HFAdamW(hf.parameters(), lr=LR)
    torch_losses = []
    for step in range(N_STEPS):
        b = batches[step % N_BATCH]
        opt_t.zero_grad()
        out = hf(input_ids=torch.tensor(b["input_ids"].astype(np.int64)),
                 attention_mask=torch.tensor(
                     b["attention_mask"].astype(np.int64)),
                 decoder_input_ids=torch.tensor(
                     b["decoder_input_ids"].astype(np.int64)),
                 labels=torch.tensor(b["labels"].astype(np.int64)))
        out.loss.backward()
        opt_t.step()
        torch_losses.append(float(out.loss.detach()))

    def loss_fn(p, b, r):
        loss, _ = conditional_loss(p, cfg, b, train=True, rng=r)
        return loss, {}

    opt_j = adamw(lr=LR, eps=1e-6, weight_decay=0.0)
    step_fn = build_train_step(loss_fn, opt_j, donate=False)
    state = TrainState(params=params, opt_state=opt_j.init(params),
                       step=jnp.int32(0))
    our_losses = []
    key = jax.random.PRNGKey(0)
    for step in range(N_STEPS):
        state, metrics = step_fn(state, batches[step % N_BATCH], key)
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, torch_losses, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_train_step_parity_pretrain():
    """20 multitask pretraining steps (LM + MRM + attribute + relation, all
    loss factors, image splice) track a torch twin loss-for-loss, including
    a batch with an EMPTY relation mask — whose head must receive NO
    optimizer update at all (the reference skips unused params:
    find_unused_parameters=True at pretrain.py:98 + HF AdamW's
    ``p.grad is None: continue``). Ref: src/model/model.py:244-302."""
    import jax.numpy as jnp
    import torch.nn.functional as F
    from kmbart_tpu.models.pretraining import (init_pretraining_params,
                                               pretraining_loss)
    from kmbart_tpu.parallel.train_step import build_train_step
    from kmbart_tpu.training.adamw import adamw
    from kmbart_tpu.training.state import TrainState

    cfg = _train_twin_cfg()
    params = init_pretraining_params(jax.random.PRNGKey(11), cfg)
    sd = pytree_to_state_dict({"model": params["model"],
                               "final_logits_bias":
                                   params["final_logits_bias"]}, cfg)
    hf_cfg, hf_sd = _make_hf_trunk(cfg, sd)
    trunk = transformers.BartModel(hf_cfg)
    trunk_sd = {k[len("model."):]: v for k, v in hf_sd.items()
                if k.startswith("model.")}
    _, unexpected = trunk.load_state_dict(trunk_sd, strict=False)
    assert not unexpected, unexpected
    trunk.train()

    D = cfg.d_model

    def port_linear(lin, kernel, bias):
        with torch.no_grad():
            lin.weight.copy_(torch.tensor(np.asarray(kernel, np.float32).T))
            lin.bias.copy_(torch.tensor(np.asarray(bias, np.float32)))

    img_lin = torch.nn.Linear(cfg.image_feature_size, D)
    port_linear(img_lin, params["model"]["encoder"]["embed_images"]["kernel"],
                params["model"]["encoder"]["embed_images"]["bias"])

    def make_head(src, in_dim, inner, out_dim):
        d1, d2 = torch.nn.Linear(in_dim, inner), torch.nn.Linear(inner, out_dim)
        port_linear(d1, src["dense_kernel"], src["dense_bias"])
        port_linear(d2, src["out_kernel"], src["out_bias"])
        return d1, d2

    mrm_d, mrm_o = make_head(params["mrm_head"], D, D, cfg.num_labels)
    attr_d, attr_o = make_head(params["attribute_head"], D, D,
                               cfg.num_attributes)
    rel_d, rel_o = make_head(params["relation_head"], 2 * D, D,
                             cfg.num_relations)
    fbias = torch.zeros(cfg.vocab_size)  # 3.0.2 buffer: never trained

    all_params = (list(trunk.parameters()) + list(img_lin.parameters())
                  + list(mrm_d.parameters()) + list(mrm_o.parameters())
                  + list(attr_d.parameters()) + list(attr_o.parameters())
                  + list(rel_d.parameters()) + list(rel_o.parameters()))

    def torch_loss(b):
        ids = torch.tensor(b["input_ids"].astype(np.int64))
        feats = torch.tensor(b["image_features"])
        tok = trunk.shared(ids)
        img = img_lin(feats)
        mask = (ids == cfg.img_feat_id) | (ids == cfg.cls_token_id)
        slot = torch.clamp(torch.cumsum(mask.long(), 1) - 1, 0,
                           feats.shape[1] - 1)
        gathered = torch.gather(img, 1, slot[..., None].expand(-1, -1, D))
        embeds = torch.where(mask[..., None], gathered, tok)
        hidden = trunk(
            inputs_embeds=embeds,
            attention_mask=torch.tensor(b["attention_mask"].astype(np.int64)),
            decoder_input_ids=torch.tensor(
                b["decoder_input_ids"].astype(np.int64)),
            decoder_attention_mask=torch.tensor(
                b["decoder_attention_mask"].astype(np.int64))
        ).last_hidden_state
        total = 0.0
        mrm_mask = torch.tensor(b["mrm_mask"])
        if mrm_mask.any():
            h = mrm_o(torch.tanh(mrm_d(hidden)))
            total = total + cfg.mrm_loss_factor * F.kl_div(
                F.log_softmax(h[mrm_mask], -1),
                torch.tensor(b["mrm_soft_labels"])[mrm_mask],
                reduction="batchmean")
        attr_mask = torch.tensor(b["attribute_mask"]).bool()
        if attr_mask.any():
            h = attr_o(torch.tanh(attr_d(hidden)))
            total = total + cfg.attribute_loss_factor * F.cross_entropy(
                h[attr_mask],
                torch.tensor(b["attribute_labels"].astype(np.int64))[attr_mask])
        rel_mask = torch.tensor(b["relation_mask"]).bool()
        if rel_mask.any():
            pairs = torch.tensor(b["relation_pairs"].astype(np.int64))
            obj = torch.gather(hidden, 1, pairs[..., 0:1].expand(-1, -1, D))
            sub = torch.gather(hidden, 1, pairs[..., 1:2].expand(-1, -1, D))
            h = rel_o(torch.tanh(rel_d(torch.cat([obj, sub], -1))))
            total = total + cfg.relation_loss_factor * F.cross_entropy(
                h[rel_mask],
                torch.tensor(b["relation_labels"].astype(np.int64))[rel_mask])
        lm = F.linear(hidden, trunk.shared.weight) + fbias
        labels = torch.tensor(b["labels"].astype(np.int64))
        labels = torch.where(labels == cfg.cls_token_id,
                             torch.tensor(-100), labels)
        total = total + cfg.lm_loss_factor * F.cross_entropy(
            lm.view(-1, cfg.vocab_size), labels.view(-1), ignore_index=-100)
        return total

    rng = np.random.default_rng(7)
    N_BATCH, B, S, T, R = 4, 4, 12, 8, 3
    batches = []
    for i in range(N_BATCH):
        ids = rng.integers(4, 80, (B, S)).astype(np.int32)
        ids[:, 1:4] = cfg.img_feat_id
        ids[:, 4] = cfg.cls_token_id
        dam = np.ones((B, T), np.int32)
        dam[:, -1] = 0
        lab = rng.integers(4, 80, (B, T)).astype(np.int32)
        lab[:, -1] = -100
        lab[:, 3] = cfg.cls_token_id  # exercises the cls->-100 forcing
        soft = rng.random((B, T, cfg.num_labels)).astype(np.float32)
        soft /= soft.sum(-1, keepdims=True)
        rel_mask = rng.random((B, R)) < 0.7
        if i == 2:
            rel_mask[:] = False  # unused head: zero update on both sides
        batches.append(dict(
            input_ids=ids, attention_mask=np.ones((B, S), np.int32),
            image_features=rng.normal(
                size=(B, cfg.max_img_num,
                      cfg.image_feature_size)).astype(np.float32),
            decoder_input_ids=rng.integers(4, 80, (B, T)).astype(np.int32),
            decoder_attention_mask=dam, labels=lab,
            mrm_soft_labels=soft, mrm_mask=rng.random((B, T)) < 0.4,
            attribute_labels=rng.integers(
                0, cfg.num_attributes, (B, T)).astype(np.int32),
            attribute_mask=(rng.random((B, T)) < 0.3).astype(np.int32),
            relation_pairs=rng.integers(0, T, (B, R, 2)).astype(np.int32),
            relation_labels=rng.integers(
                0, cfg.num_relations, (B, R)).astype(np.int32),
            relation_mask=rel_mask))

    LR, N_STEPS = 1e-3, 20
    opt_t = _HFAdamW(all_params, lr=LR)
    torch_losses = []
    for step in range(N_STEPS):
        opt_t.zero_grad()
        loss = torch_loss(batches[step % N_BATCH])
        loss.backward()
        opt_t.step()
        torch_losses.append(float(loss.detach()))

    def loss_fn(p, b, r):
        loss, _ = pretraining_loss(p, cfg, b, train=True, rng=r)
        return loss, {}

    opt_j = adamw(lr=LR, eps=1e-6, weight_decay=0.0)
    step_fn = build_train_step(loss_fn, opt_j, donate=False)
    state = TrainState(params=params, opt_state=opt_j.init(params),
                       step=jnp.int32(0))
    our_losses = []
    key = jax.random.PRNGKey(0)
    for step in range(N_STEPS):
        state, metrics = step_fn(state, batches[step % N_BATCH], key)
        our_losses.append(float(metrics["loss"]))

    # losses are ~25 in magnitude (5x lm factor); 1e-4 abs is ~4e-6 relative
    np.testing.assert_allclose(our_losses, torch_losses, rtol=2e-5, atol=1e-4)
    # the empty-mask batch must have left the relation head's per-leaf
    # optimizer step behind the always-used leaves
    ls = state.opt_state.leaf_steps
    assert int(jax.tree.leaves(ls["model"])[0]) == N_STEPS
    assert int(ls["relation_head"]["dense_kernel"]) == N_STEPS - 5
