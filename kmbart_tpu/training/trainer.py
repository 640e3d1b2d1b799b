"""Epoch-level train drivers.

Parity target: ``pretrain()`` / ``fine_tune()`` (src/training.py:9-171):
per-step forward/backward/optimize, ETA log lines, per-step TensorBoard
scalars (total + per-loss breakdown), a periodic sample callback, and the
per-epoch train-loss scalar.

TPU design: the step itself is the jitted function from
parallel/train_step.py; this loop only feeds fixed-shape host batches and
logs. Device work is async — ``loss`` is only synced at the logging
cadence so logging never serialises the pipeline.
"""

import queue
import threading
from datetime import datetime

import jax

from kmbart_tpu.parallel.mesh import device_arrays


def prefetch_to_device(loader, sharding=None, depth=4, inputs_only=True):
    """Collate + host->device staging in a background thread, ``depth``
    batches ahead. JAX dispatch is async, so the transfer of batch t+1
    overlaps the device compute of batch t (double buffering) — without
    this, every step pays the full host->device latency serially (the
    reference's DataLoader(pin_memory) + .cuda() has the same overlap
    job on GPU). ``sharding`` places batches directly onto a mesh
    (NamedSharding) so pjit needs no resharding copy.

    ``inputs_only``: keep only the model-input arrays (device_arrays
    filtering — the jitted train step cannot take string metadata). With
    False, array leaves are staged and non-array metadata (index lists,
    raw label strings) rides along on host — the generation drivers need
    both."""
    q = queue.Queue(maxsize=depth)
    stop = object()
    errs = []

    if sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        replicated = NamedSharding(sharding.mesh, PartitionSpec())
    else:
        replicated = None

    import numpy as np

    multiproc = jax.process_count() > 1

    def place_leaf(x):
        if not isinstance(x, (np.ndarray, jax.Array)):
            return x
        if sharding is None:
            return jax.device_put(x)
        # batch-major arrays shard on 'data'; rank-0 leaves replicate
        sh = sharding if getattr(x, "ndim", 0) else replicated
        if multiproc:
            # each process holds only its slice of the global batch
            # (ShardedSampler); assemble the global array from the
            # per-process local data — the multihost equivalent of the
            # single-process device_put below
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    def place(b):
        return jax.tree.map(place_leaf,
                            device_arrays(b) if inputs_only else b)

    def worker():
        try:
            for b in loader:
                q.put(place(b))
        except BaseException as e:  # surfaced on the consumer side
            errs.append(e)
        finally:
            q.put(stop)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is stop:
            if errs:
                raise errs[0]
            return
        yield item


def run_epoch(
    epoch,
    state,
    train_step,
    train_loader,
    rng,
    *,
    epochs=None,
    logger=None,
    callback=None,
    log_interval=1,
    tb_writer=None,
    tb_interval=1,
    metric_name="loss",
    prefetch=4,
    batch_sharding=None,
):
    """Run one epoch. Returns (state, mean_loss).

    ``prefetch``: stage this many batches onto the device ahead of compute
    (0 disables). Measured on v5e with fresh host batches: 104 -> 144
    samples/s at depth 4 (depth 2 is too shallow to cover the serialised
    host link). Device loss scalars are only synced to host at the
    logging/TB cadence; the epoch mean is reduced from the retained device
    scalars at epoch end, so sparse logging never serialises the pipeline.
    """
    total_step = len(train_loader)
    step_losses = []
    start_time = datetime.now()

    if prefetch:
        batches = prefetch_to_device(train_loader, batch_sharding, prefetch)
    else:
        batches = (device_arrays(b) for b in train_loader)

    metrics = None
    for i, batch in enumerate(batches):
        state, metrics = train_step(state, batch, rng)

        step_losses.append(metrics[metric_name])
        loss = None

        if logger is not None and i % log_interval == 0:
            loss = float(step_losses[-1])
            eta = (total_step - (i + 1)) / (i + 1) * (datetime.now() - start_time)
            logger.info("Epoch [{}/{}], Step [{}/{}], Loss: {:.4f}, ETA: {}".format(
                epoch + 1, epochs if epochs is not None else "?",
                i + 1, total_step, loss, str(eta)))

        if tb_writer is not None and i % tb_interval == 0:
            if loss is None:
                loss = float(step_losses[-1])
            step = epoch * total_step + i + 1
            tb_writer.add_scalars("loss/step", {"total loss": loss}, step)
            for name, value in metrics.items():
                if name != metric_name:
                    tb_writer.add_scalars(
                        "loss/step", {name.replace("_", " "): float(value)}, step)

        if callback is not None:
            callback(step=i, epoch=epoch, state=state, logger=logger)

    total_loss = sum(float(x) for x in step_losses)
    if tb_writer is not None and total_step:
        tb_writer.add_scalars("loss/epoch",
                              {"train": total_loss / total_step}, epoch + 1)
    return state, (total_loss / total_step if total_step else 0.0)
