"""Fused Pallas attention for the TRAINING hot path (short sequences).

Round-4 profile of the plain batch-128 fine-tune step (BASELINE.md): the
XLA composite attention (ops/attention.py:attention_core) cost ~10.5 ms of
a 62 ms device step while its score/value matmuls are only ~0.1 TFLOP
(~0.5 ms at v5e peak) — the rest is materialised [B, H, Tq, Tk] fp32
scores, two softmax passes, the probs convert, and the [B,T,768] ->
[B,T,H,hd] head-split retile (a physical copy, ~2.6 ms alone).

This kernel removes all of that for the shapes this model family trains at
(Tq, Tk <= 256): one grid program per *batch element*, operands stay FLAT
[B, T, D] exactly as the QKV projections produce them (no head-split
reshape anywhere), and each head's [Tq, Tk] score tile lives entirely in
VMEM — full softmax in registers, no online rescaling needed. Both the
forward AND the backward are fused kernels (the older long-sequence kernel
in ops/pallas_attention.py differentiates through XLA math, which
re-materialises scores and gave back the win at these shapes).

Numerics match the composite: q scaled by head_dim**-0.5 in bf16, QK/PV on
the MXU in bf16 with fp32 accumulation, softmax statistics in fp32,
additive -1e9 key-padding bias, optional causal mask. Attention-prob
dropout is NOT supported (the reference's configs pin attention_dropout
0.0 — config/pretrain_base.json); the caller gates on that.

Parity target: HF 3.0.2 SelfAttention used by the reference
(src/model/modules.py:8-14) — same math as ops/attention.py.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9


def _softmax_rows(s):
    """Row softmax in fp32; identical to jax.nn.softmax(axis=-1)."""
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _causal_mask(tq, tk):
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    return k_pos <= q_pos


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, num_heads, causal):
    """One batch element: q [1, Tq, D], k/v [1, Tk, D], bias [1, Tk] fp32."""
    tq = q_ref.shape[1]
    tk = k_ref.shape[1]
    hd = q_ref.shape[2] // num_heads
    scale = hd ** -0.5
    bias = bias_ref[0].astype(jnp.float32)                   # [1, Tk]
    cmask = _causal_mask(tq, tk) if causal else None
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)           # bf16, matches
    k = k_ref[0]                                             # composite path
    v = v_ref[0]
    for h in range(num_heads):
        cols = slice(h * hd, (h + 1) * hd)
        s = jax.lax.dot_general(
            q[:, cols], k[:, cols], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + bias       # [Tq, Tk] f32
        if cmask is not None:
            s = jnp.where(cmask, s, NEG_INF)
        p = _softmax_rows(s).astype(q_ref.dtype)
        o_ref[0, :, cols] = jax.lax.dot_general(
            p, v[:, cols], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, num_heads, causal):
    """Recompute-softmax backward, one batch element per program.

    dv = p^T g;  dp = g v^T;  ds = p * (dp - rowsum(dp*p));
    dq = (ds k) * scale;  dk = ds^T (q*scale).

    Mosaic lowers transposed-LHS contractions ((0,0) dimension numbers)
    ~2-3x slower than clean (M,K)x(K,N) dots at these tile sizes (measured
    in _exp/attn_bwd_variants.py), so when Tq == Tk we RECOMPUTE the score
    matrix transposed (s_T = k q^T) and express dv/dk as clean dots on the
    transposed side — 7 clean dots beat 5 dots of which 2 are transposed
    (enc 1.50 -> 1.12 ms, dec 1.61 -> 1.08 ms isolated). For Tq != Tk
    (cross-attention) the transposed-side recompute costs more than it
    saves; keep the 5-dot form there.
    """
    tq = q_ref.shape[1]
    tk = k_ref.shape[1]
    hd = q_ref.shape[2] // num_heads
    scale = hd ** -0.5
    bias = bias_ref[0].astype(jnp.float32)                    # [1, Tk]
    cmask = _causal_mask(tq, tk) if causal else None
    qs = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    transpose_free = tq == tk
    for h in range(num_heads):
        cols = slice(h * hd, (h + 1) * hd)
        qh, kh, vh, gh = qs[:, cols], k[:, cols], v[:, cols], g[:, cols]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + bias
        if cmask is not None:
            s = jnp.where(cmask, s, NEG_INF)
        p = _softmax_rows(s)                                  # [Tq, Tk] f32
        dp = jax.lax.dot_general(                              # g @ v^T
            gh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_b = ds.astype(q_ref.dtype)
        dq_ref[0, :, cols] = (jax.lax.dot_general(             # ds @ k
            ds_b, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
        if transpose_free:
            # transposed-side recompute: s_T [Tk, Tq], bias enters as a
            # per-ROW offset (softmax is shift-invariant per column of s_T
            # only across k — the bias varies with k, i.e. with the ROW
            # here, so it must be added before the column softmax)
            sT = jax.lax.dot_general(
                kh, qh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) + bias.reshape(tk, 1)
            if cmask is not None:
                # transposed causal mask built directly (tpu.transpose on
                # a bool vector fails to legalize in Mosaic)
                k_pos = jax.lax.broadcasted_iota(jnp.int32, (tk, tq), 0)
                q_pos = jax.lax.broadcasted_iota(jnp.int32, (tk, tq), 1)
                sT = jnp.where(k_pos <= q_pos, sT, NEG_INF)
            mT = jnp.max(sT, axis=0, keepdims=True)
            eT = jnp.exp(sT - mT)
            pT = eT / jnp.sum(eT, axis=0, keepdims=True)      # [Tk, Tq]
            pT_b = pT.astype(q_ref.dtype)
            dv_ref[0, :, cols] = jax.lax.dot_general(          # p^T @ g
                pT_b, gh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dv_ref.dtype)
            dpT = jax.lax.dot_general(                         # v @ g^T
                vh, gh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            rT = jnp.sum(dpT * pT, axis=0, keepdims=True)
            dsT_b = (pT * (dpT - rT)).astype(q_ref.dtype)
            dk_ref[0, :, cols] = jax.lax.dot_general(          # ds^T @ q_s
                dsT_b, qh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        else:
            p_b = p.astype(q_ref.dtype)
            dv_ref[0, :, cols] = jax.lax.dot_general(          # p^T @ g
                p_b, gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dv_ref.dtype)
            dk_ref[0, :, cols] = jax.lax.dot_general(          # ds^T @ q_s
                ds_b, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _specs(b_dummy, tq, tk, d):
    del b_dummy
    return [
        pl.BlockSpec((1, tq, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, tk, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, tk, d), lambda i: (i, 0, 0)),
        # bias rides as [B, 1, Tk] so its block == full trailing dims
        # (TPU block tiling requires that for non-8/128 extents)
        pl.BlockSpec((1, 1, tk), lambda i: (i, 0, 0)),
    ]


def _head_group(num_heads):
    """Heads handled per grid program.

    Default: all heads in one program (grid = (B,), the BART-base-winning
    layout). ``KMBART_FUSED_ATTN_GROUP=<G>`` splits the head loop across a
    second grid axis — each program covers G heads via a D-column BlockSpec
    slice — so high-head-count models (BART-large: 16) trade per-program
    loop length for pipelined grid steps. Read at TRACE time."""
    g = int(os.environ.get("KMBART_FUSED_ATTN_GROUP") or "0")
    if g <= 0 or g >= num_heads or num_heads % g != 0:
        return num_heads
    return g


def _grouped_specs(tq, tk, d_blk):
    return [
        pl.BlockSpec((1, tq, d_blk), lambda i, j: (i, 0, j)),
        pl.BlockSpec((1, tk, d_blk), lambda i, j: (i, 0, j)),
        pl.BlockSpec((1, tk, d_blk), lambda i, j: (i, 0, j)),
        pl.BlockSpec((1, 1, tk), lambda i, j: (i, 0, 0)),
    ]


def _fwd_call(q, k, v, key_bias, num_heads, causal, interpret):
    B, Tq, D = q.shape
    Tk = k.shape[1]
    group = _head_group(num_heads)
    if group != num_heads:
        hd = D // num_heads
        kernel = functools.partial(_fwd_kernel, num_heads=group,
                                   causal=causal)
        return pl.pallas_call(
            kernel,
            grid=(B, num_heads // group),
            in_specs=_grouped_specs(Tq, Tk, group * hd),
            out_specs=pl.BlockSpec((1, Tq, group * hd),
                                   lambda i, j: (i, 0, j)),
            out_shape=jax.ShapeDtypeStruct((B, Tq, D), q.dtype),
            interpret=interpret,
        )(q, k, v, key_bias)
    kernel = functools.partial(_fwd_kernel, num_heads=num_heads,
                               causal=causal)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=_specs(B, Tq, Tk, D),
        out_specs=pl.BlockSpec((1, Tq, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Tq, D), q.dtype),
        interpret=interpret,
    )(q, k, v, key_bias)


def _bwd_call(q, k, v, key_bias, g, num_heads, causal, interpret):
    B, Tq, D = q.shape
    Tk = k.shape[1]
    group = _head_group(num_heads)
    if group != num_heads:
        hd = D // num_heads
        d_blk = group * hd
        kernel = functools.partial(_bwd_kernel, num_heads=group,
                                   causal=causal)
        specs = _grouped_specs(Tq, Tk, d_blk)
        specs.append(pl.BlockSpec((1, Tq, d_blk), lambda i, j: (i, 0, j)))
        return pl.pallas_call(
            kernel,
            grid=(B, num_heads // group),
            in_specs=specs,
            out_specs=[
                pl.BlockSpec((1, Tq, d_blk), lambda i, j: (i, 0, j)),
                pl.BlockSpec((1, Tk, d_blk), lambda i, j: (i, 0, j)),
                pl.BlockSpec((1, Tk, d_blk), lambda i, j: (i, 0, j)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, Tq, D), q.dtype),
                jax.ShapeDtypeStruct((B, Tk, D), k.dtype),
                jax.ShapeDtypeStruct((B, Tk, D), v.dtype),
            ],
            interpret=interpret,
        )(q, k, v, key_bias, g)
    kernel = functools.partial(_bwd_kernel, num_heads=num_heads,
                               causal=causal)
    specs = _specs(B, Tq, Tk, D)
    specs.append(pl.BlockSpec((1, Tq, D), lambda i: (i, 0, 0)))   # g
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((1, Tq, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Tk, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Tk, D), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tq, D), q.dtype),
            jax.ShapeDtypeStruct((B, Tk, D), k.dtype),
            jax.ShapeDtypeStruct((B, Tk, D), v.dtype),
        ],
        interpret=interpret,
    )(q, k, v, key_bias, g)


# ---- SPMD partitioning ----------------------------------------------------
# Under pjit the pallas_call lowers to an opaque tpu_custom_call that XLA's
# SPMD partitioner cannot split (it would replicate via all-gathers).
# custom_partitioning teaches it the kernel's parallel structure WITHOUT
# threading the mesh through the model code:
#   - batch dim (grid axis): embarrassingly parallel -> shard freely (DP)
#   - feature dim D = H*hd: attention is per-head, so a Megatron-style
#     "model"-axis sharding that cuts on head boundaries is exact
#     head-parallelism — each shard runs the kernel with its LOCAL head
#     count and zero collectives
#   - sequence dims / the bias: must stay whole (softmax rows + absolute
#     positions for the causal iota) -> need_replication factors.


def _spec3(sharding, ndim=3):
    try:
        spec = tuple(sharding.spec)
    except AttributeError:
        return (None,) * ndim
    return spec + (None,) * (ndim - len(spec))


def _axis_count(mesh, axes):
    if axes is None:
        return 1
    if isinstance(axes, (tuple, list)):
        n = 1
        for a in axes:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axes]


def _attention_partition(num_heads, causal, interpret, is_bwd):
    from jax.sharding import NamedSharding, PartitionSpec as P

    def partition(mesh, arg_shapes, result_shape):
        q_sh = arg_shapes[0].sharding
        spec = _spec3(q_sh)
        b_ax, d_ax = spec[0], spec[2]
        D = arg_shapes[0].shape[2]
        hd = D // num_heads
        d_div = _axis_count(mesh, d_ax)
        if num_heads % d_div != 0 or (D // d_div) % hd != 0:
            d_ax, d_div = None, 1        # off-head-boundary cut: replicate D
        local_heads = num_heads // d_div
        qkv = NamedSharding(mesh, P(b_ax, None, d_ax))
        bias = NamedSharding(mesh, P(b_ax, None, None))
        if is_bwd:
            arg_shardings = (qkv, qkv, qkv, bias, qkv)
            result_shardings = (qkv, qkv, qkv)

            def lower_fn(q, k, v, key_bias, g):
                return _bwd_call(q, k, v, key_bias, g, local_heads, causal,
                                 interpret)
        else:
            arg_shardings = (qkv, qkv, qkv, bias)
            result_shardings = qkv

            def lower_fn(q, k, v, key_bias):
                return _fwd_call(q, k, v, key_bias, local_heads, causal,
                                 interpret)
        return mesh, lower_fn, result_shardings, arg_shardings

    def infer_sharding(mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = _spec3(arg_shapes[0].sharding)
        out = NamedSharding(mesh, P(spec[0], None, spec[2]))
        return (out, out, out) if is_bwd else out

    return partition, infer_sharding


@functools.lru_cache(maxsize=None)
def _train_attention_fn(num_heads, causal, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning

    fwd_cp = custom_partitioning(
        lambda q, k, v, key_bias: _fwd_call(
            q, k, v, key_bias, num_heads, causal, interpret))
    p, i = _attention_partition(num_heads, causal, interpret, is_bwd=False)
    fwd_cp.def_partition(
        p, infer_sharding_from_operands=i,
        sharding_rule="b tq d, b tk d, b tk d, b u tk -> b tq d",
        need_replication_factors=("tq", "tk", "u"))

    bwd_cp = custom_partitioning(
        lambda q, k, v, key_bias, g: _bwd_call(
            q, k, v, key_bias, g, num_heads, causal, interpret))
    p, i = _attention_partition(num_heads, causal, interpret, is_bwd=True)
    bwd_cp.def_partition(
        p, infer_sharding_from_operands=i,
        sharding_rule=("b tq d, b tk d, b tk d, b u tk, b tq d"
                       " -> b tq d, b tk d, b tk d"),
        need_replication_factors=("tq", "tk", "u"))

    @jax.custom_vjp
    def f(q, k, v, key_bias):
        return fwd_cp(q, k, v, key_bias)

    def fwd(q, k, v, key_bias):
        return fwd_cp(q, k, v, key_bias), (q, k, v, key_bias)

    def bwd(res, g):
        q, k, v, key_bias = res
        dq, dk, dv = bwd_cp(q, k, v, key_bias, g.astype(q.dtype))
        return dq, dk, dv, jnp.zeros_like(key_bias)

    f.defvjp(fwd, bwd)
    return f


def train_attention_flat(q_flat, k_flat, v_flat, key_mask, *, num_heads,
                         causal=False, interpret=False):
    """Fused attention on FLAT (pre-head-split) projections.

    q_flat [B, Tq, D]; k_flat/v_flat [B, Tk, D] (D = H*hd, bf16);
    key_mask [B, Tk] 1-keep/0-pad (or None). Returns [B, Tq, D] in the
    input dtype. Differentiable (fused Pallas forward + backward).
    """
    B, Tk = k_flat.shape[0], k_flat.shape[1]
    if key_mask is None:
        key_bias = jnp.zeros((B, Tk), jnp.float32)
    else:
        key_bias = jnp.where(key_mask.astype(bool), 0.0, NEG_INF
                             ).astype(jnp.float32)
    fn = _train_attention_fn(int(num_heads), bool(causal), bool(interpret))
    return fn(q_flat, k_flat, v_flat, key_bias.reshape(B, 1, Tk))


def train_attention_supported(q_len, k_len, head_dim, num_heads,
                              dropout_rate, train, causal=False):
    """Gate: TPU backend, no active attention-prob dropout, head dim a
    multiple of 8, and the whole [Tq, Tk] score tile VMEM-resident
    (short-sequence regime; the long-sequence kernel in
    ops/pallas_attention.py covers the rest).

    ``KMBART_NO_FUSED_ATTN=1`` disables the kernel (A/B / escape hatch);
    ``KMBART_FUSED_ATTN_HEADS_MAX=<N>`` overrides the head-count cap
    (A/B at BART-large's 16 heads — benchmarks/large_attn_ab.py)."""
    if os.environ.get("KMBART_NO_FUSED_ATTN") == "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    # (multi-device meshes are supported: custom_partitioning above teaches
    # the SPMD partitioner the kernel's batch/head parallel structure —
    # zero all-gathers under DP and Megatron-TP shardings,
    # tests/test_pallas_train_attention.py::test_fused_partitions_on_mesh)
    if train and dropout_rate > 0.0:
        return False
    if causal and q_len != k_len:
        return False
    if q_len > 256 or k_len > 256:
        return False
    if num_heads > int(os.environ.get("KMBART_FUSED_ATTN_HEADS_MAX", "12")):
        # measured on v5e: BART-base (12 heads) wins 65.2 -> 63.4 ms/step,
        # but BART-large (16 heads, batch 64) LOSES ~2% (108.1 -> 110.2 ms
        # both reps, _exp/large_ab) — the per-head dot issue overhead grows
        # with head count while the composite einsum stays one batched op.
        # Round-5 re-measurement incl. the head-grouped grid variant:
        # benchmarks/large_attn_ab.py + BASELINE.md round-5.
        return False
    return (q_len % 8 == 0 and k_len % 8 == 0 and head_dim % 8 == 0
            and head_dim * num_heads % 128 == 0)
