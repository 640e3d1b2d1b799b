"""Sharded checkpointing for multi-chip training (orbax-backed).

The reference saves checkpoints with a single-process ``torch.save`` after
gathering everything to rank 0 (src/utils.py:20-27, pretrain.py:314-327) —
fine for one DGX, a non-starter for sharded TPU pods: gathering a
TP/DP-sharded train state to one host serialises the save through a single
HBM->host pipe and needs the whole model in host RAM.

TPU design: each process writes exactly the shards it owns via orbax's
OCDBT/zarr TensorStore layout, and restore places shards directly onto the
target mesh (no host-side gather/scatter in either direction). Works
identically on a single chip, a virtual 8-device CPU mesh (tests), or a
multi-host pod slice (orbax coordinates via jax.process_index()).

Use the npz format (checkpoint/io.py) for portable single-host exports;
use this for anything sharded or large.
"""

import os

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.Checkpointer(ocp.StandardCheckpointHandler())


_ASYNC = None


def _async_checkpointer():
    global _ASYNC
    if _ASYNC is None:
        import atexit

        import orbax.checkpoint as ocp
        _ASYNC = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        atexit.register(_ASYNC.wait_until_finished)
    return _ASYNC


def save_sharded(path, tree, block=True):
    """Save a (possibly sharded-jax.Array) pytree to ``path`` (a directory).

    Every leaf keeps its sharding metadata; each process writes only its
    own shards. Overwrites an existing checkpoint at ``path``.

    ``block=False`` returns as soon as the device->host snapshot is taken
    and writes in the background (orbax AsyncCheckpointer) — training
    resumes while the filesystem I/O drains. A still-running previous
    async save is finished first, and an atexit hook drains the last one.
    """
    path = os.path.abspath(path)
    if block:
        ckpt = _checkpointer()
        ckpt.save(path, tree, force=True)
        ckpt.close()
        return
    ckpt = _async_checkpointer()
    ckpt.wait_until_finished()
    ckpt.save(path, tree, force=True)


def wait_for_async_saves():
    """Block until any in-flight ``save_sharded(block=False)`` finishes."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def load_sharded(path, template):
    """Restore a pytree saved by :func:`save_sharded`.

    template: a pytree matching the saved structure. Leaves that are
    jax.Arrays (or jax.ShapeDtypeStruct with a ``sharding``) dictate the
    target sharding — shards are loaded straight to their devices. Plain
    numpy leaves restore as fully-replicated arrays on the CURRENT global
    topology: an explicit target sharding is required because the saved
    sharding file may describe a different process/device layout (e.g. a
    2-process-written checkpoint restored into one process after a pod
    resize — orbax reshards when given explicit shardings, and errors when
    asked to reuse the stale saved ones).
    """
    import orbax.checkpoint as ocp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    path = os.path.abspath(path)
    repl = NamedSharding(Mesh(np.asarray(jax.devices()), ("_restore",)),
                         PartitionSpec())

    def to_abstract(leaf):
        if isinstance(leaf, jax.Array):
            return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                        sharding=leaf.sharding)
        if isinstance(leaf, jax.ShapeDtypeStruct):
            return leaf
        arr = np.asarray(leaf)
        return jax.ShapeDtypeStruct(
            arr.shape, jax.dtypes.canonicalize_dtype(arr.dtype),
            sharding=repl)

    abstract = jax.tree_util.tree_map(to_abstract, template)
    ckpt = _checkpointer()
    out = ckpt.restore(path, args=ocp.args.StandardRestore(abstract))
    ckpt.close()
    return out
