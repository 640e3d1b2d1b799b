"""Jit/pjit train- and eval-step builders.

Parity target: the per-step fwd/bwd/opt of ``pretrain()`` / ``fine_tune()``
(src/training.py:29-60, 116-143). The reference's AMP GradScaler
(src/training.py:31,55-57) is unnecessary on TPU: bf16 has fp32-range
exponents, so the loss is computed in bf16/fp32 mixed precision with fp32
master params and no loss scaling.

Layout: params/optimizer replicated (or TP-sharded via ``param_specs``),
batch sharded on the ``data`` mesh axis. XLA inserts the gradient
all-reduce over ICI automatically — the DDP allreduce hook
(pretrain.py:98) becomes a compiler decision.
"""


import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from kmbart_tpu.training.state import TrainState


def build_train_step(loss_fn, optimizer, mesh=None, param_specs=None,
                     donate=True, skip_nonfinite=True, grad_accum_steps=1):
    """loss_fn(params, batch, rng) -> (loss, metrics_dict_of_scalars).

    Returns jitted step(state, batch, rng) -> (state, metrics).

    ``skip_nonfinite``: failure-detection guard (SURVEY.md §5 — absent in
    the reference): when the loss or any gradient is non-finite the update
    is dropped (params/opt state keep their previous values) and
    ``metrics["skipped"]`` is 1 — one bad batch cannot poison the run.

    ``grad_accum_steps``: split the batch into G micro-batches along dim 0
    and lax.scan the forward/backward, averaging gradients before the one
    optimizer update — peak activation memory drops to the micro-batch
    size, so effective batches far beyond HBM fit (no reference
    counterpart: the reference is activation-bound by its per-GPU batch).
    Each micro-batch gets a distinct dropout rng. Gradients equal the mean
    of per-micro-batch gradients (standard accumulation semantics; exact
    full-batch equality only when the loss is a plain mean).
    """

    def grads_and_metrics(params, batch, rng):
        if grad_accum_steps == 1:
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: loss_fn(p, batch, rng), has_aux=True)(params)
            return loss, metrics, grads

        G = grad_accum_steps
        micro = jax.tree.map(
            lambda x: x.reshape((G, x.shape[0] // G) + x.shape[1:]), batch)

        def body(acc, inp):
            i, mb = inp
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: loss_fn(p, mb, jax.random.fold_in(rng, i)),
                has_aux=True)(params)
            g_sum, l_sum = acc
            g_sum = jax.tree.map(jnp.add, g_sum, grads)
            return (g_sum, l_sum + loss), metrics

        zeros = jax.tree.map(jnp.zeros_like, params)
        (g_sum, l_sum), metrics = jax.lax.scan(
            body, (zeros, 0.0), (jnp.arange(G), micro))
        grads = jax.tree.map(lambda g: g / G, g_sum)
        metrics = jax.tree.map(jnp.mean, metrics)
        return l_sum / G, metrics, grads

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, metrics, grads = grads_and_metrics(state.params, batch, rng)
        metrics = dict(metrics)
        grads_ok = None
        if skip_nonfinite:
            grads_ok = jax.tree.reduce(
                lambda a, g: a & jnp.all(jnp.isfinite(g)),
                grads, jnp.isfinite(loss))
            metrics["skipped"] = 1.0 - grads_ok.astype(jnp.float32)
        if grads_ok is not None and getattr(optimizer, "supports_ok", False):
            # guard fused into the optimizer's elementwise pass (adamw.py)
            new_params, new_opt = optimizer.update(grads, state.opt_state,
                                                   state.params, ok=grads_ok)
        else:
            new_params, new_opt = optimizer.update(grads, state.opt_state,
                                                   state.params)
            if grads_ok is not None:
                pick = lambda new, old: jax.tree.map(
                    lambda n, o: jnp.where(grads_ok, n, o), new, old)
                new_params = pick(new_params, state.params)
                new_opt = pick(new_opt, state.opt_state)
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               step=state.step + 1)
        metrics["loss"] = loss
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    if param_specs is None:
        state_sh = repl
    else:
        state_sh = param_specs  # full TrainState sharding pytree
    return jax.jit(
        step,
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


def build_eval_step(loss_fn, mesh=None, param_specs=None):
    """``param_specs``: sharding pytree for the PARAMS argument (pass the
    ``.params`` field of a train_state_shardings() result when the model
    is tensor-parallel — replicated-by-default would reject TP-sharded
    weights at the jit boundary)."""
    def step(params, batch):
        loss, metrics = loss_fn(params, batch, None)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step,
                   in_shardings=(param_specs if param_specs is not None
                                 else repl, data),
                   out_shardings=repl)
