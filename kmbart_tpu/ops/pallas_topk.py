"""Pallas top-k kernel for tiny k over huge rows (beam candidate selection).

The XLA fallback (ops/topk.py) does k argmax passes with the whole
[B, beams*vocab] matrix resident in HBM — k full HBM sweeps. This kernel
splits each row across grid programs, keeps each chunk in VMEM, and runs the
k argmax+mask passes entirely on-chip; the
per-chunk top-k lists are then merged with one tiny lax.top_k. Exact, with
lax.top_k tie-breaking (lowest index wins, sorted descending).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -jnp.inf
_CHUNK = 64 * 1024  # elements per grid program (f32 chunk = 256 KB VMEM)


def _topk_kernel(x_ref, vals_ref, idx_ref, scratch_ref, vacc_ref, iacc_ref,
                 *, k):
    scratch_ref[:] = x_ref[0, 0].astype(jnp.float32)
    n = scratch_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, _):
        row = scratch_ref[:]
        m = jnp.max(row)
        # lowest index among maxima (lax.top_k tie-breaking)
        idx = jnp.min(jnp.where(row == m, col, n))
        # Mosaic lowers neither scalar VMEM stores nor value
        # dynamic_update_slice: accumulate via lane-masked vector selects
        vacc_ref[:] = jnp.where(lane == i, m, vacc_ref[:])
        iacc_ref[:] = jnp.where(lane == i, idx, iacc_ref[:])
        scratch_ref[:] = jnp.where(col == idx, NEG_INF, row)
        return 0

    jax.lax.fori_loop(0, k, body, 0)
    vals_ref[0, 0] = vacc_ref[:]
    idx_ref[0, 0] = iacc_ref[:]


def pallas_top_k(x, k, *, chunk=_CHUNK, interpret=False):
    """x [B, N] -> (vals [B, k] f32, idx [B, k] i32), exact."""
    from jax.experimental.pallas import tpu as pltpu

    B, N = x.shape
    splits = max(1, -(-N // chunk))
    n_pad = splits * chunk
    if n_pad != N:
        x = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, n_pad - N)),
                    constant_values=NEG_INF)
    # 4-D so the trailing block dims equal the array dims (TPU tiling rule)
    x4 = x.reshape(B, splits, 1, chunk)

    kernel = functools.partial(_topk_kernel, k=k)
    vals, idx = pl.pallas_call(
        kernel,
        grid=(B, splits),
        in_specs=[pl.BlockSpec((1, 1, 1, chunk), lambda b, s: (b, s, 0, 0))],
        out_specs=(pl.BlockSpec((1, 1, 1, k), lambda b, s: (b, s, 0, 0)),
                   pl.BlockSpec((1, 1, 1, k), lambda b, s: (b, s, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((B, splits, 1, k), jnp.float32),
                   jax.ShapeDtypeStruct((B, splits, 1, k), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((1, chunk), jnp.float32),
                        pltpu.VMEM((1, k), jnp.float32),
                        pltpu.VMEM((1, k), jnp.int32)],
        interpret=interpret,
    )(x4)

    # exact merge: global top-k lives in the union of per-chunk top-ks.
    # lax.top_k on the flattened [splits*k] keeps the earliest (= lowest
    # split, = lowest global index) entry among ties.
    offsets = (jnp.arange(splits, dtype=jnp.int32) * chunk)[None, :, None, None]
    global_idx = (idx + offsets).reshape(B, splits * k)
    flat_vals = vals.reshape(B, splits * k)
    top_vals, top_pos = jax.lax.top_k(flat_vals, k)
    top_idx = jnp.take_along_axis(global_idx, top_pos, axis=1)
    return top_vals.astype(x.dtype), top_idx


def pallas_topk_supported(n, k):
    """Not auto-selected: measured ~3x slower than the iterative XLA
    fallback on v5e (the per-(row, chunk) grid programs serialise on the
    single core and the k-pass fori_loop doesn't pipeline, while the XLA
    version's k HBM sweeps overlap with surrounding decode work). Kept as
    an exact, tested alternative for many-core parts / future Mosaic
    scheduling improvements."""
    return False