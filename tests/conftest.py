"""Test env: force CPU with 8 virtual devices BEFORE jax initialises.

The machine profile exports JAX_PLATFORMS=axon (remote TPU tunnel) from
sitecustomize; tests must run on the host CPU with a virtual 8-device mesh
(SURVEY.md §4: multi-device tests via xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize (axon) imports jax at interpreter startup, so the env var
# alone is too late — force the platform through the live config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def toy_assets(tmp_path_factory):
    from kmbart_tpu.data.bpe import build_toy_assets
    d = tmp_path_factory.mktemp("tok")
    build_toy_assets(str(d))
    return str(d)


@pytest.fixture(scope="session")
def tokenizer(toy_assets):
    from kmbart_tpu.data.tokenization import ConditionTokenizer
    return ConditionTokenizer(assets_dir=toy_assets)


@pytest.fixture(scope="session")
def tiny_cfg(tokenizer):
    """Tiny config consistent with the toy tokenizer's special-token ids."""
    from kmbart_tpu.config import tiny_config
    return tiny_config(
        vocab_size=len(tokenizer) + 8,
        img_feat_id=tokenizer.img_feat_id,
        cls_token_id=tokenizer.cls_token_id,
        pad_token_id=tokenizer.pad_token_id,
        bos_token_id=tokenizer.bos_token_id,
        eos_token_id=tokenizer.eos_token_id,
        decoder_start_token_id=tokenizer.bos_token_id,
    )


@pytest.fixture(scope="session")
def fixture_dataset(tmp_path_factory, toy_assets):
    from tests.fixtures.make_dataset import make_dataset
    d = tmp_path_factory.mktemp("data")
    make_dataset(str(d), tokenizer_assets=toy_assets)
    return str(d)


@pytest.fixture()
def np_rng():
    return np.random.default_rng(0)
