"""Device mesh and sharding helpers.

Parity target: the reference's distributed runtime is single-host NCCL DDP
(src/utils.py:9-17, pretrain.py:96-98, DistributedSampler pretrain.py:250-254).
TPU-native replacement: a ``jax.sharding.Mesh`` over ICI with a ``data`` axis
(and an optional ``model`` axis for tensor parallelism); gradient reduction
is the psum XLA inserts for sharded-batch/replicated-param jit — no
process-group rendezvous, no DDP wrapper, and no
``find_unused_parameters`` problem because every head always runs
(models/pretraining.py fixed-shape heads).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, model_parallel=1, axis_names=("data", "model")):
    """1-D data mesh by default; pass model_parallel>1 for a 2-D data x model
    mesh (model axis innermost so TP collectives ride the fastest ICI links)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def replicated(mesh):
    return NamedSharding(mesh, P())


def data_feed_layout(mesh):
    """(num_feed_groups, group_rank) for per-process data loading.

    Processes whose local devices cover the SAME set of ``data``-axis
    coordinates form one feed group: they must load identical batches
    (their devices hold the same data shards, replicated over the other
    mesh axes — e.g. a pipeline whose stage axis spans processes). With
    the standard layouts (data axis blocked over processes) this reduces
    to (process_count, process_index). Groups must cover disjoint,
    equal-size coordinate sets — anything else is an invalid feed layout.
    """
    devs = np.asarray(mesh.devices)
    n_data = devs.shape[0]
    per_coord = devs.reshape(n_data, -1)
    pids = sorted({d.process_index for d in devs.flat})
    coord_sets = {}
    for p in pids:
        coords = frozenset(
            i for i in range(n_data)
            if any(d.process_index == p for d in per_coord[i]))
        coord_sets[p] = coords
    groups = sorted({c for c in coord_sets.values()}, key=min)
    sizes = {len(g) for g in groups}
    covered = set().union(*groups)
    if len(sizes) != 1 or len(covered) != n_data or \
            sum(len(g) for g in groups) != n_data:
        raise ValueError(
            f"process device sets do not tile the data axis: {groups}")
    me = coord_sets[jax.process_index()]
    return len(groups), groups.index(me)


def batch_sharding(mesh):
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh, batch):
    """Place array entries of a collated batch with batch-axis sharding;
    non-array metadata (task_type, index, raw text) stays on host."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.device_put(np.asarray(v), sh)
        else:
            out[k] = v
    return out


def device_arrays(batch):
    """Drop non-array metadata so the batch is a clean jit input pytree."""
    return {k: v for k, v in batch.items()
            if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1}


def place_batch(batch, sharding=None):
    """Model-input arrays of a collated batch -> device, multi-process aware.

    With a NamedSharding and >1 JAX processes, each process contributes its
    local slice of the global batch (jax.make_array_from_process_local_data);
    single-process placement is a plain device_put. ``sharding=None`` leaves
    host arrays for jit to commit (single-process only)."""
    arrays = device_arrays(batch)
    if sharding is None:
        return arrays
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(
                    sharding, np.asarray(v)) for k, v in arrays.items()}
    return {k: jax.device_put(v, sharding) for k, v in arrays.items()}
