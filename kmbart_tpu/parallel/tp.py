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


def _zero1_spec(spec, shape, n_data):
    """Add ``data`` to the first unsharded axis whose size n_data divides
    (leaves too small or with no free divisible axis stay as-is)."""
    names = list(spec) + [None] * (len(shape) - len(spec))
    for i, (ax, dim) in enumerate(zip(names, shape)):
        if ax is None and dim >= n_data and dim % n_data == 0:
            names[i] = "data"
            return P(*names)
    return spec


def zero1_moment_specs(specs, params, n_data):
    """ZeRO-1 PartitionSpecs for the AdamW moments: each leaf's spec gains
    ``data`` on its first free divisible axis (composes with TP/stage
    sharding — those axes are already taken in ``specs``)."""
    return jax.tree.map(
        lambda s, p: _zero1_spec(s, p.shape, n_data), specs, params,
        is_leaf=lambda x: isinstance(x, P))


def train_state_shardings(mesh, params, specs=None, zero1=False):
    """NamedSharding pytree for a TrainState over ``mesh`` with TP params.

    ``specs`` overrides the per-leaf PartitionSpecs (pp.py passes its
    stage-sharded layout through here so the TrainState/AdamWState
    assembly lives in exactly one place).

    ``zero1``: ZeRO stage 1 — the AdamW moments (2/3 of optimizer memory)
    additionally shard over the ``data`` axis instead of inheriting the
    replicated-param layout. Params/grads stay replicated across data
    (plain DP), so the only layout change the compiler must bridge is the
    elementwise optimizer update reading grad slices and writing param
    updates shard-local, then all-gathering the fresh params — the
    standard ZeRO-1 exchange, chosen by GSPMD from these specs. No
    reference counterpart (its optimizer state is replicated per GPU,
    src/training.py:29-60)."""
    if specs is None:
        specs = param_partition_specs(params)
    to_sh = lambda tree: jax.tree.map(lambda s: NamedSharding(mesh, s), tree,
                                      is_leaf=lambda x: isinstance(x, P))
    p_sh = to_sh(specs)
    m_sh = p_sh
    n_data = dict(mesh.shape).get("data", 1)
    if zero1 and n_data > 1:
        m_sh = to_sh(zero1_moment_specs(specs, params, n_data))
    repl = NamedSharding(mesh, P())
    # per-leaf step counters are replicated scalars
    ls_sh = jax.tree.map(lambda _: repl, specs,
                         is_leaf=lambda x: isinstance(x, P))
    return TrainState(
        params=p_sh,
        opt_state=AdamWState(step=repl, mu=m_sh, nu=m_sh, leaf_steps=ls_sh),
        step=repl,
    )


def shard_train_state(mesh, state, zero1=False):
    """Place an existing (host/replicated) TrainState onto the TP layout."""
    sh = train_state_shardings(mesh, state.params, zero1=zero1)
    return jax.tree.map(jax.device_put, state, sh)
