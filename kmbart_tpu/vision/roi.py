"""ROI pooling / ROI align in JAX.

Parity target: the detectron2 ``_shared_roi_transform`` the reference's
extractor drives (scripts/feature_extractor.py:61, scripts/utils.py:55):
crop each ROI from the stride-16 C4 feature map to a fixed grid, run the
res5 head on it, then spatially mean-pool.

TPU design: fully vectorised bilinear gathers — each ROI produces a static
[P, P] grid of sample points; there is no dynamic shape anywhere, so a
whole batch of ROIs is a single fused gather+reduce for XLA.
"""

import jax.numpy as jnp


def _bilinear_sample(features, y, x):
    """features [H, W, C]; y/x arbitrary same-shaped float grids ->
    [*grid, C] bilinearly interpolated values (zero padding outside)."""
    H, W, C = features.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy1 = y - y0
    wx1 = x - x0

    def at(yi, xi):
        inside = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        vals = features[yc, xc]
        return jnp.where(inside[..., None], vals, 0.0)

    top = at(y0, x0) * (1 - wx1)[..., None] + at(y0, x0 + 1) * wx1[..., None]
    bot = at(y0 + 1, x0) * (1 - wx1)[..., None] + at(y0 + 1, x0 + 1) * wx1[..., None]
    return top * (1 - wy1)[..., None] + bot * wy1[..., None]


def roi_align(features, boxes, output_size, spatial_scale, sampling_ratio=2,
              aligned=True):
    """ROIAlign (Mask R-CNN): features [H, W, C], boxes [N, 4] xyxy in image
    coords -> [N, P, P, C]. ``aligned=True`` applies the detectron2 -0.5
    pixel-center shift."""
    features = jnp.asarray(features)
    boxes = jnp.asarray(boxes, jnp.float32)
    P = output_size
    shift = 0.5 if aligned else 0.0
    b = boxes * spatial_scale - shift
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1e-6 if aligned else 1.0)
    roi_h = jnp.maximum(y2 - y1, 1e-6 if aligned else 1.0)
    bin_w = roi_w / P
    bin_h = roi_h / P
    S = sampling_ratio

    # sample grid: for bin (i, j), S x S points at fractional offsets
    ii = jnp.arange(P)
    ss = (jnp.arange(S) + 0.5) / S
    # ys [N, P, S]: y1 + (i + s) * bin_h
    ys = y1[:, None, None] + (ii[None, :, None] + ss[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (ii[None, :, None] + ss[None, None, :]) * bin_w[:, None, None]
    # full grid [N, P, S, P, S]
    yg = jnp.broadcast_to(ys[:, :, :, None, None], ys.shape + (P, S))
    xg = jnp.broadcast_to(xs[:, None, None, :, :], (xs.shape[0], P, S, P, S))

    import jax
    sampled = jax.vmap(lambda y, x: _bilinear_sample(features, y, x))(
        yg.reshape(yg.shape[0], -1), xg.reshape(xg.shape[0], -1))
    C = features.shape[-1]
    sampled = sampled.reshape(-1, P, S, P, S, C)
    return jnp.mean(sampled, axis=(2, 4))


def roi_pool(features, boxes, output_size, spatial_scale, max_bin=8):
    """Max ROIPool (Fast R-CNN / caffe bottom-up-attention flavour):
    quantised bins, exact integer-pixel max per bin via a static ``max_bin``
    sample budget (exact whenever a bin spans <= max_bin pixels, which holds
    for the detector's 14x14 pool over <=63-px feature maps)."""
    import jax

    features = jnp.asarray(features)
    boxes = jnp.asarray(boxes, jnp.float32)
    H, W, C = features.shape
    P = output_size
    S = max_bin
    b = jnp.round(boxes * spatial_scale)
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    roi_w = jnp.maximum(x2 - x1 + 1, 1.0)
    roi_h = jnp.maximum(y2 - y1 + 1, 1.0)
    bin_w = roi_w / P
    bin_h = roi_h / P

    ii = jnp.arange(P, dtype=jnp.float32)
    # bin start/end (inclusive/exclusive) in integer pixels, caffe rounding
    def starts_ends(o, bin_sz):
        s = jnp.floor(o[:, None] + ii[None, :] * bin_sz[:, None])
        e = jnp.ceil(o[:, None] + (ii[None, :] + 1) * bin_sz[:, None])
        return s.astype(jnp.int32), e.astype(jnp.int32)

    xs_s, xs_e = starts_ends(x1, bin_w)
    ys_s, ys_e = starts_ends(y1, bin_h)
    t = jnp.arange(S)

    # integer sample positions [N, P, S] with validity masks
    xi = xs_s[:, :, None] + t[None, None, :]
    xv = xi < xs_e[:, :, None]
    yi = ys_s[:, :, None] + t[None, None, :]
    yv = yi < ys_e[:, :, None]
    xi = jnp.clip(xi, 0, W - 1)
    yi = jnp.clip(yi, 0, H - 1)

    def one_roi(yi_r, yv_r, xi_r, xv_r):
        # gather [P, S, P, S, C]
        vals = features[yi_r[:, :, None, None], xi_r[None, None, :, :]]
        mask = (yv_r[:, :, None, None] & xv_r[None, None, :, :])[..., None]
        vals = jnp.where(mask, vals, -jnp.inf)
        out = jnp.max(vals, axis=(1, 3))
        return jnp.where(jnp.isfinite(out), out, 0.0)

    return jax.vmap(one_roi)(yi, yv, xi, xv)
