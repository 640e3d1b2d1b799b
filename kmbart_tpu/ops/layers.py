"""Elementary layers with the TPU mixed-precision policy.

Policy: parameters live in fp32; matmuls run in the config compute dtype
(bf16 by default) with fp32 accumulation (``preferred_element_type``);
layer norm and softmax stay in fp32. On TPU this keeps the MXU fed with
bf16 operands at full throughput while preserving fp32-quality statistics.

Parity target: the Linear / LayerNorm / GELU / dropout semantics of the
HF 3.0.2 BART blocks the reference inherits (src/model/modules.py:8-14).
"""

import math

import jax
import jax.numpy as jnp

# Erf-based (exact) GELU — torch.nn.functional.gelu default, which is what
# transformers 3.0.2 BART uses for activation_function="gelu".
_SQRT_2 = math.sqrt(2.0)


def gelu(x):
    return x * 0.5 * (1.0 + jax.lax.erf(x / _SQRT_2))


def gelu_new(x):
    return 0.5 * x * (1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x ** 3)))


ACTIVATIONS = {"gelu": gelu, "gelu_new": gelu_new, "relu": jax.nn.relu}


def dense(x, kernel, bias=None, dtype=jnp.bfloat16):
    """y = x @ kernel + bias with bf16 operands / fp32 accumulation.

    kernel layout is (in_features, out_features) — torch checkpoints
    ([out, in]) are transposed at import time (checkpoint/torch_import.py).
    """
    y = jnp.dot(x.astype(dtype), kernel.astype(dtype),
                preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def layer_norm(x, scale, bias, eps=1e-5):
    """Fp32 layer norm over the last axis (torch.nn.LayerNorm semantics)."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def dropout(x, rate, rng, train):
    """Inverted dropout; identity when not training or rate == 0."""
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
