"""AdamW optimizer, owned in-repo (no optax dependency on the train path).

Parity target: the ``transformers.AdamW`` the reference trains with
(pretrain.py:13,100; vcg_train.py:13,100): betas (0.9, 0.999), eps 1e-6
(HF's default, unlike torch's 1e-8), decoupled weight decay applied with the
*uncorrected* lr, bias correction on the adaptive step, and — because the
state/step live PER PARAMETER and ``p.grad is None`` parameters are skipped
entirely — no update of any kind for parameters a batch did not touch.
That last point is live behavior in the reference: the pretraining heads
fire conditionally per batch (src/model/model.py:244-289, the reason for
DDP ``find_unused_parameters=True``), so e.g. a COCO batch must leave the
attribute/relation head moments AND their bias-correction step counts
untouched. Here "untouched" is detected as an exactly-zero gradient leaf,
which is what the masked losses produce for a head whose mask is empty.

Known, deliberate divergence of that detection: in the reference a head
that DID run but produced an exactly-zero gradient (e.g. its loss term
fired inside a mixed batch with an all-masked slice, yielding a zero
*tensor*, not ``None``) still gets its moments decayed, its per-param
``t`` advanced, and weight decay applied — HF AdamW only skips on
``p.grad is None``. With ``skip_unused=True`` (the default) this
implementation skips that leaf entirely instead. The cases differ only
when a zero gradient arises from a *ran-but-all-masked* head rather than
a not-ran head; for the reference's workloads these coincide (a head's
gradient is zero iff its mask selected nothing), and the zero-leaf test
is the only signal available under jit's fixed-shape execution, where
every head always runs. Pass ``skip_unused=False`` for strict
always-update semantics.

Note torch.optim.AdamW is NOT the parity target: it couples eps differently
(``sqrt(v_hat) + eps`` vs HF's ``sqrt(v) + eps`` inside the corrected step),
which diverges measurably for small gradients (found by the N-step
training-dynamics parity test).

TPU-first: a pure pytree transform — fp32 moments, works under jit/pjit,
and moment pytrees inherit the parameters' sharding (ZeRO-style optimizer
sharding is then just a sharding-rule change in parallel/train_step.py).
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamWState(NamedTuple):
    step: jnp.ndarray   # int32 scalar (global, for logging/schedules)
    mu: dict            # first moment pytree
    nu: dict            # second moment pytree
    leaf_steps: Any = None  # per-leaf int32 scalars (HF per-param ``t``);
    # None = legacy global-step state (pre-round-3 checkpoints)


def adamw_init(params) -> AdamWState:
    zeros = lambda p: jnp.zeros_like(p, dtype=jnp.float32)
    return AdamWState(
        step=jnp.zeros((), jnp.int32),
        mu=jax.tree.map(zeros, params),
        nu=jax.tree.map(zeros, params),
        leaf_steps=jax.tree.map(lambda _: jnp.zeros((), jnp.int32), params),
    )


def adamw_update(grads, state: AdamWState, params, *, lr, b1=0.9, b2=0.999,
                 eps=1e-6, weight_decay=0.0, correct_bias=True, ok=None,
                 skip_unused=True):
    """Returns (new_params, new_state). ``lr`` may be a traced scalar
    (schedules) or a python float.

    ``ok``: optional scalar bool — when False the whole update is a no-op
    (params/moments/steps keep their previous values). Blending here keeps
    the non-finite-update guard inside the optimizer's single elementwise
    pass; a select applied *after* the update costs an extra full-parameter
    read/write (profiled ~2.5 ms/step on v5e at BART-base size).

    ``skip_unused``: when True (and the state carries per-leaf steps), a
    leaf whose gradient is exactly zero everywhere is left untouched —
    moments do not decay and its bias-correction step does not advance,
    matching HF AdamW's ``if p.grad is None: continue`` for the reference's
    conditionally-firing pretraining heads."""
    step = state.step + (1 if ok is None else ok.astype(jnp.int32))
    per_leaf = skip_unused and state.leaf_steps is not None
    t_global = step.astype(jnp.float32)

    def upd(p, g, m, v, t_leaf):
        g = g.astype(jnp.float32)
        if per_leaf:
            used = jnp.any(g != 0)
            if ok is not None:
                used = used & ok
            new_t = t_leaf + used.astype(jnp.int32)
            t = new_t.astype(jnp.float32)
        else:
            used = ok
            new_t = t_leaf if t_leaf is not None else None
            t = t_global
        new_m = b1 * m + (1.0 - b1) * g
        new_v = b2 * v + (1.0 - b2) * jnp.square(g)
        if correct_bias:
            # t == 0 only when `used` is False (update discarded below);
            # clamp so the untaken branch stays finite under --debug_nans
            t_safe = jnp.maximum(t, 1.0)
            step_size = lr * jnp.sqrt(1.0 - b2 ** t_safe) / (1.0 - b1 ** t_safe)
        else:
            step_size = lr
        new_p = p - step_size * new_m / (jnp.sqrt(new_v) + eps)
        if weight_decay > 0.0:
            new_p = new_p - lr * weight_decay * p
        if used is not None:
            new_p = jnp.where(used, new_p, p)
            new_m = jnp.where(used, new_m, m)
            new_v = jnp.where(used, new_v, v)
        return new_p, new_m, new_v, new_t

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_t = (treedef.flatten_up_to(state.leaf_steps)
              if state.leaf_steps is not None else [None] * len(flat_p))
    out = [upd(p, g, m, v, t)
           for p, g, m, v, t in zip(flat_p, flat_g, flat_m, flat_v, flat_t)]
    new_params = treedef.unflatten([o[0] for o in out])
    new_mu = treedef.unflatten([o[1] for o in out])
    new_nu = treedef.unflatten([o[2] for o in out])
    new_ls = (treedef.unflatten([o[3] for o in out])
              if state.leaf_steps is not None else None)
    return new_params, AdamWState(step=step, mu=new_mu, nu=new_nu,
                                  leaf_steps=new_ls)


class adamw:
    """Optax-style wrapper: ``opt = adamw(lr); state = opt.init(params);
    params, state = opt.update(grads, state, params)``."""

    supports_ok = True  # update() accepts the fused skip-nonfinite flag

    def __init__(self, lr, b1=0.9, b2=0.999, eps=1e-6, weight_decay=0.0,
                 correct_bias=True, skip_unused=True):
        self.lr, self.b1, self.b2 = lr, b1, b2
        self.eps, self.weight_decay = eps, weight_decay
        self.correct_bias = correct_bias
        self.skip_unused = skip_unused

    def init(self, params):
        return adamw_init(params)

    def update(self, grads, state, params, lr=None, ok=None):
        return adamw_update(
            grads, state, params, lr=self.lr if lr is None else lr,
            b1=self.b1, b2=self.b2, eps=self.eps,
            weight_decay=self.weight_decay, correct_bias=self.correct_bias,
            ok=ok, skip_unused=self.skip_unused)
