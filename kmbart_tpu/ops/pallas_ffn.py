"""Fused FFN (fc1 -> GELU -> fc2) Pallas kernel for the training hot path.

Round-5 step itemization (BASELINE.md "the 76% matmul slice") named the
encoder FFN matmul fusions the largest remaining per-op inefficiency of
the plain batch-128 train step: the down-proj
bf16[128,72,3072]x[3072,768] fusion runs at 104-106 TF/s (53% of the
197 TF/s v5e bf16 MXU peak) and the up-proj at 122-125 TF/s, both
carrying convert(bf16<->fp32)+reduce epilogues the round-4 compiler-flag
study could not move. The isolated probe (benchmarks/ffn_probe.py)
measured a fused Pallas forward 1.3-1.9x faster than the composite
dense->gelu->dense chain at the exact step shapes.

Forward kernel: grid (row-tiles, F-tiles), F innermost. Per program
  a   = x_i @ W1[:, j] + b1[j]          (MXU, fp32 accumulation)
  a16 = bf16(a)                          -> written once (bwd residual)
  h   = gelu(a16)                        (VPU, fp32 internally)
  acc += h @ W2[j, :]                    (MXU, fp32 VMEM scratch)
  last j: y = bf16(acc + b2)
The [N, F] intermediate is computed and consumed in VMEM — the fc2 read
of the gelu activations (56 MB/encoder layer at batch 128) never touches
HBM, and both bias/convert epilogues run inside the MXU loop instead of
as separate fusion epilogues.

Backward kernel (same grid): per program
  dh  = g_i @ W2[j, :]^T                 (MXU)
  da  = dh * gelu'(a16[i, j])            (VPU, fp32)  -> written (bf16)
  dx  += da @ W1[:, j]^T                 (MXU, fp32 VMEM scratch)
so the [N, F] dh intermediate (113 MB/layer round trip in the composite
backward) also never reaches HBM. The weight/bias grads stay XLA
(dW1 = x^T @ da, dW2 = gelu(a16)^T @ g, db = row-sums): they contract
over the big N axis across row tiles, which a one-pass kernel cannot do
without cross-program accumulation, and XLA already runs them near peak
(the round-5 itemization measured vocab dW at 92% of peak; the FFN dW
shapes have the same tall-k structure).

GELU: Pallas TPU has no ``erf`` lowering, so the kernel evaluates the
Abramowitz-Stegun 7.1.26 rational approximation in fp32
(|err| <= 1.5e-7, ~400x below one bf16 ULP of erf's range) on the
bf16-rounded activations — the same round-to-bf16 point the composite
path has (ops/layers.py dense() downcast), so outputs differ from the
composite by <= 2 bf16 ULPs (probe maxerr 0.031 on O(2) outputs).

Numerics elsewhere are the composite sequence exactly: bf16 operands,
fp32 dot accumulation, fp32 bias adds, bf16 activations out, fp32
weight/bias grads.

SPMD: custom_partitioning declares the row axis (batch*time after the
wrapper's flatten) data-parallel and the weight operands replicated —
zero collectives under DP; under Megatron-TP the weights are sharded on
F, so GSPMD would insert gathers — the model call site keeps the
composite path under TP (attention.py gates the same way).

Parity target: the reference's FFN block semantics
(HF 3.0.2 BartEncoderLayer/BartDecoderLayer fc1/fc2 + F.gelu, inherited
at src/model/modules.py:8-14); wired in at models/bart.py
_residual_ffn.

``KMBART_NO_FUSED_FFN=1`` disables the op (A/B + escape hatch);
``KMBART_FUSED_FFN_TILES=tn,tf`` overrides the block shape.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Abramowitz-Stegun 7.1.26 erf coefficients (fp32 evaluation).
_AS = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_P = 0.3275911
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf_f32(z):
    s = jnp.sign(z)
    z = jnp.abs(z)
    t = 1.0 / (1.0 + _P * z)
    poly = t * (_AS[0] + t * (_AS[1] + t * (_AS[2] + t * (_AS[3] + t * _AS[4]))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu_f32(z):
    return z * 0.5 * (1.0 + _erf_f32(z * _INV_SQRT2))


def _dgelu_f32(z):
    # d/dz [z * Phi(z)] = Phi(z) + z * phi(z)
    phi = _INV_SQRT_2PI * jnp.exp(-0.5 * z * z)
    return 0.5 * (1.0 + _erf_f32(z * _INV_SQRT2)) + z * phi


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, a_ref,
                acc_ref, *, nf):
    j = pl.program_id(1)
    a = jax.lax.dot_general(
        x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    a = a + b1_ref[...].astype(jnp.float32)
    a16 = a.astype(jnp.bfloat16)
    a_ref[...] = a16
    h = _gelu_f32(a16.astype(jnp.float32)).astype(jnp.bfloat16)
    contrib = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = contrib

    @pl.when(j > 0)
    def _acc():
        acc_ref[...] += contrib

    @pl.when(j == nf - 1)
    def _flush():
        y_ref[...] = (acc_ref[...] + b2_ref[...].astype(jnp.float32)
                      ).astype(y_ref.dtype)


def _bwd_kernel(g_ref, a_ref, w1_ref, w2_ref, da_ref, dx_ref,
                acc_ref, *, nf):
    j = pl.program_id(1)
    # dh = g @ W2_j^T   (contract over D = rhs dim 1)
    dh = jax.lax.dot_general(
        g_ref[...], w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    da = dh * _dgelu_f32(a_ref[...].astype(jnp.float32))
    da16 = da.astype(jnp.bfloat16)
    da_ref[...] = da16
    # dx += da @ W1_j^T  (contract over F tile = rhs dim 1)
    contrib = jax.lax.dot_general(
        da16, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = contrib

    @pl.when(j > 0)
    def _acc():
        acc_ref[...] += contrib

    @pl.when(j == nf - 1)
    def _flush():
        dx_ref[...] = acc_ref[...].astype(dx_ref.dtype)


def _tiles(n, f):
    env = os.environ.get("KMBART_FUSED_FFN_TILES")
    if env:
        tn, tf = (int(v) for v in env.split(","))
        return tn, tf
    tn = 1024 if n % 1024 == 0 else 512 if n % 512 == 0 else 256
    return tn, 512


def _fwd_call(x, w1, b1, w2, b2, interpret):
    n, d = x.shape
    f = w1.shape[1]
    tn, tf = _tiles(n, f)
    grid = (n // tn, f // tf)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nf=grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, tf), lambda i, j: (0, j)),
            pl.BlockSpec((1, tf), lambda i, j: (0, j)),
            pl.BlockSpec((tf, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tn, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, tf), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x.dtype),
            jax.ShapeDtypeStruct((n, f), jnp.bfloat16),
        ],
        scratch_shapes=[pltpu.VMEM((tn, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, w1, b1, w2, b2)


def _bwd_call(g, a, w1, w2, interpret):
    n, d = g.shape
    f = w1.shape[1]
    tn, tf = _tiles(n, f)
    grid = (n // tn, f // tf)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, nf=grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, tf), lambda i, j: (i, j)),
            pl.BlockSpec((d, tf), lambda i, j: (0, j)),
            pl.BlockSpec((tf, d), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tn, tf), lambda i, j: (i, j)),
            pl.BlockSpec((tn, d), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, f), jnp.bfloat16),
            jax.ShapeDtypeStruct((n, d), g.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((tn, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(g, a, w1, w2)


def _partition(interpret, is_bwd):
    from jax.sharding import NamedSharding, PartitionSpec as P

    def partition(mesh, arg_shapes, result_shape):
        try:
            spec = tuple(arg_shapes[0].sharding.spec)
        except AttributeError:
            spec = ()
        n_ax = spec[0] if spec else None
        rows = NamedSharding(mesh, P(n_ax, None))
        rep2 = NamedSharding(mesh, P(None, None))
        if is_bwd:
            arg_shardings = (rows, rows, rep2, rep2)
            result_shardings = (rows, rows)

            def lower_fn(g, a, w1, w2):
                return _bwd_call(g, a, w1, w2, interpret)
        else:
            arg_shardings = (rows, rep2, rep2, rep2, rep2)
            result_shardings = (rows, rows)

            def lower_fn(x, w1, b1, w2, b2):
                return _fwd_call(x, w1, b1, w2, b2, interpret)
        return mesh, lower_fn, result_shardings, arg_shardings

    def infer_sharding(mesh, arg_shapes, result_shape):
        try:
            spec = tuple(arg_shapes[0].sharding.spec)
        except AttributeError:
            spec = ()
        n_ax = spec[0] if spec else None
        out = NamedSharding(mesh, P(n_ax, None))
        return (out, out)

    return partition, infer_sharding


@functools.lru_cache(maxsize=None)
def _fused_ffn_fn(interpret):
    from jax.experimental.custom_partitioning import custom_partitioning

    fwd_cp = custom_partitioning(
        lambda x, w1, b1, w2, b2: _fwd_call(x, w1, b1, w2, b2, interpret))
    p, i = _partition(interpret, is_bwd=False)
    fwd_cp.def_partition(
        p, infer_sharding_from_operands=i,
        sharding_rule="n d, d f, u f, f d, v d -> n d, n f",
        need_replication_factors=("d", "f", "u", "v"))

    bwd_cp = custom_partitioning(
        lambda g, a, w1, w2: _bwd_call(g, a, w1, w2, interpret))
    p, i = _partition(interpret, is_bwd=True)
    bwd_cp.def_partition(
        p, infer_sharding_from_operands=i,
        sharding_rule="n d, n f, d f, f d -> n f, n d",
        need_replication_factors=("d", "f"))

    @jax.custom_vjp
    def f(x, w1, b1, w2, b2):
        y, _ = fwd_cp(x, w1.astype(x.dtype), b1.reshape(1, -1),
                      w2.astype(x.dtype), b2.reshape(1, -1))
        return y

    def fwd(x, w1, b1, w2, b2):
        w1c = w1.astype(x.dtype)
        w2c = w2.astype(x.dtype)
        y, a16 = fwd_cp(x, w1c, b1.reshape(1, -1), w2c, b2.reshape(1, -1))
        return y, (x, a16, w1c, w2c)

    def bwd(res, g):
        x, a16, w1c, w2c = res
        g16 = g.astype(x.dtype)
        da16, dx = bwd_cp(g16, a16, w1c, w2c)
        # weight/bias grads in fp32 (the param dtype): tall-k contractions
        # XLA already runs near peak; fp32 accumulation via the dot output
        h = _gelu_f32(a16.astype(jnp.float32)).astype(x.dtype)
        dw2 = jax.lax.dot_general(
            h, g16, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db2 = jnp.sum(g.astype(jnp.float32), axis=0)
        dw1 = jax.lax.dot_general(
            x, da16, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1 = jnp.sum(da16.astype(jnp.float32), axis=0)
        return dx, dw1, db1, dw2, db2

    f.defvjp(fwd, bwd)
    return f


def fused_ffn(x, w1, b1, w2, b2, interpret=False):
    """y = gelu(x @ w1 + b1) @ w2 + b2, fused; x [..., D] any leading dims
    (flattened internally), w1/w2/b1/b2 fp32 params. Returns x.dtype.
    Differentiable; weight grads fp32."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    y = _fused_ffn_fn(bool(interpret))(xf, w1, b1, w2, b2)
    return y.reshape(*lead, d)


def fused_ffn_supported(n_rows, d, f, activation, act_dropout, train,
                        dtype=jnp.bfloat16):
    """Gate: TPU backend, bf16 compute, exact-erf GELU, no activation
    dropout, and MXU/grid-aligned shapes. ``KMBART_NO_FUSED_FFN=1``
    disables (A/B + escape hatch; the TP/PP CLIs set it — the kernel's
    row-parallel partitioning would all-gather the F-sharded Megatron
    weights, and shard_map pipeline bodies bypass custom_partitioning)."""
    if os.environ.get("KMBART_NO_FUSED_FFN") == "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if dtype != jnp.bfloat16:
        return False
    if activation != "gelu":
        return False
    if train and act_dropout > 0.0:
        return False
    if d % 128 != 0 or f % 512 != 0:
        return False
    return n_rows % 256 == 0
