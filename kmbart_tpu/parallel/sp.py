"""Megatron-style sequence parallelism, GSPMD-constraint form.

Under tensor parallelism (parallel/tp.py) the activations BETWEEN the
column/row-sharded matmul blocks are replicated over the ``model`` mesh
axis: every TP shard redundantly computes the LayerNorm/dropout/residual
chains, and the all-reduce XLA inserts after o_proj/fc2 moves full
[B, T, D] tiles. Sequence parallelism (Korthikanti et al., "Reducing
Activation Recomputation in Large Transformer Models", 2022) shards
those regions along the SEQUENCE dim instead: each all-reduce decomposes
into reduce-scatter + all-gather (same total bytes on the wire), the
LN/dropout/residual work drops to 1/tp per shard, and the replicated
activation memory between blocks drops by tp.

TPU-native form: no manual collectives and no model rewrite — one
``with_sharding_constraint`` on the residual stream at the layer
boundaries (models/bart.py ``_res_ln`` and the post-embedding points)
declares the layout, and GSPMD inserts the reduce-scatter/all-gather
pairs. The reference has no TP at all (SURVEY.md §2 row 31 — single-host
NCCL DDP only), so this whole axis is a TPU-native extension.

Usage — the constraint is a TRACE-TIME property of the jitted step:

    mesh = make_mesh(model_parallel=2)           # data x model
    with sequence_parallel(mesh):
        state, m = step(state, batch, rng)       # first call traces SP in

Entering/leaving the context never changes already-compiled executables;
keep it around the first call of every step you want sequence-parallel
(the CLIs hold it open for the whole train loop — vcg_train.py).
"""

import contextlib
import threading

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

# thread-local: pjit tracing happens on the calling thread; keeping the
# state per-thread lets tests trace SP and non-SP steps concurrently.
_state = threading.local()


def _current():
    return getattr(_state, "active", None)


@contextlib.contextmanager
def sequence_parallel(mesh, data_axis="data", model_axis="model"):
    """Activate sequence-parallel sharding constraints for traces started
    inside the context. No-op when the mesh has no ``model_axis`` or the
    axis has size 1."""
    size = dict(mesh.shape).get(model_axis, 1)
    prev = _current()
    if size <= 1:
        _state.active = prev  # nothing to shard; keep whatever was active
        yield
        return
    _state.active = (NamedSharding(mesh, P(data_axis, model_axis, None)),
                     size)
    try:
        yield
    finally:
        _state.active = prev


def activate(mesh, data_axis="data", model_axis="model"):
    """Process-wide (current-thread) activation for the CLIs: every trace
    after this call is sequence-parallel. Returns True when SP is live
    (model axis > 1). Tests should prefer the scoped context above."""
    size = dict(mesh.shape).get(model_axis, 1)
    if size <= 1:
        return False
    _state.active = (NamedSharding(mesh, P(data_axis, model_axis, None)),
                     size)
    return True


def constrain(x):
    """Pin a [B, T, D] activation to (data, model, -) layout when a
    sequence_parallel context is active and T divides the TP degree.

    Shapes are static under jit, so the divisibility check is free and
    correctly skips the incremental-decode path (T == 1) and any bucket
    whose length the mesh cannot split evenly."""
    active = _current()
    if active is None:
        return x
    sharding, size = active
    if x.ndim != 3 or x.shape[1] % size != 0 or x.shape[1] < size:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)
