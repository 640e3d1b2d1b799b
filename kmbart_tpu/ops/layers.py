"""Elementary layers with the TPU mixed-precision policy.

Policy: parameters live in fp32; matmuls run in the config compute dtype
(bf16 by default) with fp32 accumulation (``preferred_element_type``),
and the *residual stream stays in the compute dtype* — dense/attention/
layer-norm outputs are written back in bf16, halving HBM traffic on every
activation pass (profiled on v5e: the fp32-stream variant spent ~2x the
bytes on layer-boundary reads/writes). Layer-norm and softmax statistics
are still computed in fp32 internally. With ``dtype="float32"`` every
cast is a no-op, which is what the torch-parity tests pin.

Parity target: the Linear / LayerNorm / GELU / dropout semantics of the
HF 3.0.2 BART blocks the reference inherits (src/model/modules.py:8-14).
"""

import functools
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
    """y = x @ kernel + bias: operands in ``dtype``, fp32 accumulation,
    output written back in ``dtype`` (XLA fuses the bias add + downcast
    into the matmul epilogue — one half-width output write).

    kernel layout is (in_features, out_features) — torch checkpoints
    ([out, in]) are transposed at import time (checkpoint/torch_import.py).
    """
    y = jnp.dot(x.astype(dtype), kernel.astype(dtype),
                preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def layer_norm(x, scale, bias, eps=1e-5, out_dtype=None):
    """Layer norm over the last axis (torch.nn.LayerNorm semantics);
    statistics in fp32, output in ``out_dtype`` (default: input dtype,
    keeping the residual stream in the compute dtype)."""
    if out_dtype is None:
        out_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _dropout_threshold(rate):
    """uint8 keep threshold; actual keep probability is (threshold+1)/256."""
    return min(255, int(round((1.0 - rate) * 256)) - 1)


def _dropout_mask(rng, rate, shape):
    """Keep-mask from the hardware RNG.

    The threefry key reseeds XLA's RngBitGenerator (rbg): on TPU that is
    the on-chip PRNG instead of ~10 vector ops/word of threefry — round-2
    v5e profiling showed threefry mask generation alone was ~3 ms of an
    87 ms train step. 8 random bits per element; the keep probability is
    quantised to 1/256 (exact to 4e-3 for the reference's 0.1/0.2/0.5
    rates). Deterministic per (key, shape) within a backend, which is all
    dropout needs — parameter-noise reproducibility stays threefry.
    """
    threshold = jnp.uint8(_dropout_threshold(rate))
    data = jax.random.key_data(rng).reshape(-1)
    rbg = jax.random.wrap_key_data(jnp.concatenate([data, data]), impl="rbg")
    return jax.random.bits(rbg, shape, dtype=jnp.uint8) <= threshold


def _dropout_apply(x, rate, rng):
    mask = _dropout_mask(rng, rate, x.shape)
    # scale by the QUANTISED keep probability (threshold+1)/256, not the
    # exact 1/(1-rate) — the mask keeps (threshold+1)/256 of elements, so
    # this is what makes E[dropout(x)] == x hold exactly
    scale = jnp.asarray(256.0 / (_dropout_threshold(rate) + 1), x.dtype)
    return jnp.where(mask, x * scale, 0).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _dropout_regen(x, rate, rng):
    return _dropout_apply(x, rate, rng)


def _dropout_regen_fwd(x, rate, rng):
    # Residual is just the key: the backward pass regenerates the identical
    # mask instead of carrying a [B, T, D] bool per dropout site through
    # the layer scan (the stacked mask buffers were ~3.5 ms/step on v5e).
    return _dropout_apply(x, rate, rng), rng


def _dropout_regen_bwd(rate, rng, g):
    return _dropout_apply(g, rate, rng), jnp.zeros(rng.shape, _float0)


_float0 = jax.dtypes.float0
_dropout_regen.defvjp(_dropout_regen_fwd, _dropout_regen_bwd)


def dropout(x, rate, rng, train):
    """Inverted dropout; identity when not training or rate == 0."""
    if not train or rate == 0.0 or rng is None:
        return x
    return _dropout_regen(x, float(rate), rng)
