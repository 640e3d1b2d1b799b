"""Native checkpoint format: config.json + flat .npz of the parameter pytree.

Parity targets:
  - ``save_pretrained`` per-epoch model dirs (pretrain.py:314-327,
    vcg_train.py:249-262): a directory with config + weights;
  - ``save_training_data`` / ``load_training_data`` (src/utils.py:20-39):
    optimizer state + epoch alongside the weights (``training_data.npz``
    here instead of ``training_data.pt``);
  - ``from_pretrained`` with partial load: load_pretrained also accepts a
    ``pytorch_model.bin`` directory and routes through
    checkpoint/torch_import.py with config.partial_load shape adaptation.

The npz key is the "/"-joined pytree path, so files are introspectable with
plain numpy and robust to refactors that keep the tree layout.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from kmbart_tpu.config import MultiModalBartConfig

WEIGHTS_NAME = "params.npz"
TORCH_WEIGHTS_NAME = "pytorch_model.bin"
CONFIG_NAME = "config.json"
TRAINING_DATA_NAME = "training_data.npz"


def _flatten(tree):
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p):
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def _unflatten_into(template, flat, strict=True):
    """Rebuild arrays into the template pytree structure."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = "/".join(_path_str(p) for p in path)
        if key in flat:
            arr = flat[key]
            if strict and tuple(arr.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch for {key}: {arr.shape} vs {leaf.shape}")
            leaves.append(jnp.asarray(arr))
        else:
            if strict:
                raise KeyError(f"missing checkpoint entry: {key}")
            leaves.append(leaf)
    return treedef.unflatten(leaves)


def save_pretrained(path, config, params):
    """config may be None for non-BART auxiliary heads (no config.json)."""
    os.makedirs(path, exist_ok=True)
    if config is not None:
        config.save_json(os.path.join(path, CONFIG_NAME))
    np.savez(os.path.join(path, WEIGHTS_NAME), **_flatten(params))


def load_pretrained(path, init_params_fn, config=None, strict=True):
    """Load a checkpoint directory into a freshly initialised pytree.

    Accepts either this framework's format (params.npz) or a reference
    ``pytorch_model.bin`` (imported with partial-load semantics).
    Returns (config, params, report_lines).
    """
    if config is None:
        config = MultiModalBartConfig.from_json(os.path.join(path, CONFIG_NAME))
    params = init_params_fn(jax.random.PRNGKey(0), config)
    npz = os.path.join(path, WEIGHTS_NAME)
    report = []
    if os.path.exists(npz):
        with np.load(npz) as data:
            params = _unflatten_into(params, dict(data), strict=strict)
    else:
        binpath = os.path.join(path, TORCH_WEIGHTS_NAME)
        if not os.path.exists(binpath):
            raise FileNotFoundError(
                f"no {WEIGHTS_NAME} or {TORCH_WEIGHTS_NAME} in {path}")
        from kmbart_tpu.checkpoint.torch_import import (
            load_torch_checkpoint, state_dict_to_pytree)
        sd = load_torch_checkpoint(binpath)
        params, report = state_dict_to_pytree(sd, config, params)
    return config, params, report


def save_training_data(path, opt_state=None, epoch=None, step=None):
    """Optimizer state + progress counters (src/utils.py:20-27 parity)."""
    os.makedirs(path, exist_ok=True)
    flat = {} if opt_state is None else _flatten(opt_state)
    meta = {"epoch": epoch, "step": step}
    flat["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(os.path.join(path, TRAINING_DATA_NAME), **flat)


def load_training_data(path, opt_state_template=None):
    """Returns {"opt_state": ... or None, "epoch": ..., "step": ...}."""
    file = os.path.join(path, TRAINING_DATA_NAME)
    with np.load(file) as data:
        flat = dict(data)
    meta = json.loads(bytes(flat.pop("__meta__")).decode())
    out = {"epoch": meta.get("epoch"), "step": meta.get("step"),
           "opt_state": None}
    if opt_state_template is not None and flat:
        # Legacy (pre per-leaf bias-correction) optimizer checkpoints carry
        # no leaf_steps/* entries. Seed every leaf step from the saved
        # global step: the legacy optimizer bias-corrected every leaf with
        # the global t, so this resumes with identical dynamics instead of
        # raising KeyError (advisor round-3 finding).
        if not any(k.startswith("leaf_steps/") for k in flat):
            step_val = np.asarray(flat.get("step", 0)).astype(np.int32)
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                    opt_state_template)[0]:
                key = "/".join(_path_str(p) for p in path)
                if key.startswith("leaf_steps/") and key not in flat:
                    flat[key] = np.broadcast_to(
                        step_val, np.shape(leaf)).astype(np.int32)
        out["opt_state"] = _unflatten_into(opt_state_template, flat)
    return out
