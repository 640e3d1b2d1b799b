"""Tensor-parallel partition specs (Megatron-style column/row sharding).

The reference has no TP (SURVEY.md §2 parallelism inventory) — this is a
TPU-native extension: on a 2-D ``data x model`` mesh the attention QKV and
FFN up-projections are column-sharded and the output/down projections
row-sharded over the ``model`` axis, so the only TP collectives are the
all-reduces XLA inserts after o_proj/fc2 — riding the innermost (fastest)
ICI dimension by mesh construction (parallel/mesh.py).

These are GSPMD sharding *hints*: correctness is XLA's job, these pin the
layout so the compiler doesn't have to guess.
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from kmbart_tpu.training.adamw import AdamWState
from kmbart_tpu.training.state import TrainState

# leaf-name -> spec for stacked per-layer tensors [L, ...]
_LAYER_RULES = {
    "q_kernel": P(None, None, "model"),
    "k_kernel": P(None, None, "model"),
    "v_kernel": P(None, None, "model"),
    "q_bias": P(None, "model"),
    "k_bias": P(None, "model"),
    "v_bias": P(None, "model"),
    "o_kernel": P(None, "model", None),
    "o_bias": P(None),
    "fc1_kernel": P(None, None, "model"),
    "fc1_bias": P(None, "model"),
    "fc2_kernel": P(None, "model", None),
    "fc2_bias": P(None),
}

_TOP_RULES = {
    "shared": P(None, "model"),            # embedding: shard d_model
    "embed_positions": P(None, "model"),
    "final_logits_bias": P(),
    # classification heads
    "dense_kernel": P(None, "model"),
    "dense_bias": P("model"),
    "out_kernel": P("model", None),
    "out_bias": P(),
}


def param_partition_specs(params):
    """PartitionSpec pytree matching ``params`` (replicated by default)."""

    def spec_for(path, leaf):
        name = None
        for p in reversed(path):
            key = getattr(p, "key", None)
            if key is not None:
                name = str(key)
                break
        in_layers = any(getattr(p, "key", None) == "layers" for p in path)
        if in_layers and name in _LAYER_RULES:
            return _LAYER_RULES[name]
        if name in _TOP_RULES:
            return _TOP_RULES[name]
        if name in ("kernel",):  # embed_images [F, D]
            return P(None, "model")
        return P()

    paths, treedef = jax.tree_util.tree_flatten_with_path(params)
    return treedef.unflatten([spec_for(path, leaf) for path, leaf in paths])


def train_state_shardings(mesh, params, specs=None):
    """NamedSharding pytree for a TrainState over ``mesh`` with TP params
    (optimizer moments inherit the parameter layout = ZeRO-free TP).

    ``specs`` overrides the per-leaf PartitionSpecs (pp.py passes its
    stage-sharded layout through here so the TrainState/AdamWState
    assembly lives in exactly one place)."""
    if specs is None:
        specs = param_partition_specs(params)
    to_sh = lambda tree: jax.tree.map(lambda s: NamedSharding(mesh, s), tree,
                                      is_leaf=lambda x: isinstance(x, P))
    p_sh = to_sh(specs)
    repl = NamedSharding(mesh, P())
    # per-leaf step counters are replicated scalars
    ls_sh = jax.tree.map(lambda _: repl, specs,
                         is_leaf=lambda x: isinstance(x, P))
    return TrainState(
        params=p_sh,
        opt_state=AdamWState(step=repl, mu=p_sh, nu=p_sh, leaf_steps=ls_sh),
        step=repl,
    )


def shard_train_state(mesh, state):
    """Place an existing (host/replicated) TrainState onto the TP layout."""
    sh = train_state_shardings(mesh, state.params)
    return jax.tree.map(jax.device_put, state, sh)
