"""Train state pytree: params + optimizer state + step counter."""

from typing import Any, NamedTuple

import jax.numpy as jnp

from kmbart_tpu.training.adamw import AdamWState, adamw_init


class TrainState(NamedTuple):
    params: Any
    opt_state: AdamWState
    step: jnp.ndarray  # int32

    @classmethod
    def create(cls, params):
        return cls(params=params, opt_state=adamw_init(params),
                   step=jnp.zeros((), jnp.int32))
