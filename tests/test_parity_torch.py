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
