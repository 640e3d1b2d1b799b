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

from datetime import datetime


from kmbart_tpu.parallel.mesh import device_arrays


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
):
    """Run one epoch. Returns (state, mean_loss)."""
    total_step = len(train_loader)
    total_loss = 0.0
    start_time = datetime.now()

    metrics = None
    for i, batch in enumerate(train_loader):
        state, metrics = train_step(state, device_arrays(batch), rng)

        loss = float(metrics[metric_name])
        total_loss += loss

        if logger is not None and i % log_interval == 0:
            eta = (total_step - (i + 1)) / (i + 1) * (datetime.now() - start_time)
            logger.info("Epoch [{}/{}], Step [{}/{}], Loss: {:.4f}, ETA: {}".format(
                epoch + 1, epochs if epochs is not None else "?",
                i + 1, total_step, loss, str(eta)))

        if tb_writer is not None and i % tb_interval == 0:
            step = epoch * total_step + i + 1
            tb_writer.add_scalars("loss/step", {"total loss": loss}, step)
            for name, value in metrics.items():
                if name != metric_name:
                    tb_writer.add_scalars(
                        "loss/step", {name.replace("_", " "): float(value)}, step)

        if callback is not None:
            callback(step=i, epoch=epoch, state=state, logger=logger)

    if tb_writer is not None and total_step:
        tb_writer.add_scalars("loss/epoch",
                              {"train": total_loss / total_step}, epoch + 1)
    return state, (total_loss / total_step if total_step else 0.0)
