"""Non-maximum suppression, TPU-native.

Parity target: the CUDA ``nms`` kernel the reference's detector imports
(``from models.bua.layers.nms import nms``, scripts/feature_extractor.py:12)
and its class-wise max-confidence selection loop
(scripts/feature_extractor.py:90-106).

TPU design: fixed-shape iterative suppression under ``lax.fori_loop`` — at
step t the highest-scoring unsuppressed box is selected and everything with
IoU > threshold against it is suppressed. O(N) selections of O(N) vectorised
IoU rows; N is the detector's proposal budget (static), so the whole thing
jits. A C++ host-side NMS for the offline pipeline lives in
native/kmbart_native.cpp with the same semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np


def box_iou(boxes_a, boxes_b):
    """IoU matrix [A, B] for xyxy boxes (detectron2 convention, +0 area)."""
    area_a = jnp.clip(boxes_a[:, 2] - boxes_a[:, 0], 0) * \
        jnp.clip(boxes_a[:, 3] - boxes_a[:, 1], 0)
    area_b = jnp.clip(boxes_b[:, 2] - boxes_b[:, 0], 0) * \
        jnp.clip(boxes_b[:, 3] - boxes_b[:, 1], 0)
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _iou_rows(sel, boxes):
    """IoU of one selected box per batch row vs all boxes.

    sel [..., 4], boxes [..., N, 4] -> [..., N]. Computed on the fly per
    greedy step instead of precomputing the [N, N] matrix — at the RPN's
    6000 pre-NMS candidates the full matrix is 144 MB; the row is 96 KB.
    """
    area_s = jnp.clip(sel[..., 2] - sel[..., 0], 0) * \
        jnp.clip(sel[..., 3] - sel[..., 1], 0)
    area_b = jnp.clip(boxes[..., 2] - boxes[..., 0], 0) * \
        jnp.clip(boxes[..., 3] - boxes[..., 1], 0)
    lt = jnp.maximum(sel[..., None, :2], boxes[..., :2])
    rb = jnp.minimum(sel[..., None, 2:], boxes[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_s[..., None] + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms_mask(boxes, scores, iou_threshold, valid=None, max_keep=None):
    """Boolean keep-mask NMS (fixed shape). ``valid`` masks padded rows.

    ``max_keep`` bounds the iteration count: each greedy step keeps exactly
    the next-highest unsuppressed box, so the first K kept boxes are
    identical to full NMS — when only the top K survivors matter (RPN's
    post_nms_topk), 6000 candidates need 300 iterations, not 6000."""
    keep = nms_mask_batched(boxes[None], scores[None], iou_threshold,
                            valid=None if valid is None else valid[None],
                            max_keep=max_keep)
    return keep[0]


def nms_mask_batched(boxes, scores, iou_threshold, valid=None, max_keep=None):
    """nms_mask over a batch: boxes [B, N, 4], scores [B, N] -> keep
    [B, N]. The greedy loop iterates over box RANKS, so the whole batch
    shares ONE fori_loop of ``max_keep`` steps (the sequential-loop
    latency was the dominant cost of per-image NMS on v5e), with the
    selected boxes' IoU rows computed on the fly."""
    B, n = scores.shape
    if valid is None:
        valid = jnp.ones((B, n), bool)
    rows = jnp.arange(B)
    col = jnp.arange(n)[None, :]

    def body(_, state):
        keep, alive = state
        s = jnp.where(alive, scores, -jnp.inf)
        idx = jnp.argmax(s, axis=1)                        # [B]
        best = jnp.take_along_axis(s, idx[:, None], axis=1)[:, 0]
        has = best > -jnp.inf
        keep = keep.at[rows, idx].set(keep[rows, idx] | has)
        sel = boxes[rows, idx]                             # [B, 4]
        suppress = (_iou_rows(sel, boxes) > iou_threshold) & has[:, None]
        alive = alive & ~suppress & (col != idx[:, None])
        return keep, alive

    steps = n if max_keep is None else min(n, max_keep)
    keep, _ = jax.lax.fori_loop(0, steps, body,
                                (jnp.zeros((B, n), bool), valid))
    return keep


def nms(boxes, scores, iou_threshold):
    """Indices of kept boxes, score-descending (torchvision/CUDA-nms
    return convention). Uses the C++ kernel on host when built
    (native/kmbart_native.cpp), otherwise the lax version."""
    from kmbart_tpu import _native
    if _native.available():
        return _native.nms(np.asarray(boxes, np.float32),
                           np.asarray(scores, np.float32), iou_threshold)
    keep = np.asarray(nms_mask(jnp.asarray(boxes, jnp.float32),
                               jnp.asarray(scores, jnp.float32),
                               iou_threshold))
    idx = np.nonzero(keep)[0]
    return idx[np.argsort(-np.asarray(scores)[idx], kind="stable")]


def class_wise_max_conf(boxes, scores, iou_threshold=0.3):
    """The reference's per-class NMS confidence pooling
    (scripts/feature_extractor.py:90-98): for every class c >= 1 run NMS on
    (boxes, scores[:, c]) and raise each kept box's max_conf to its class
    score.

    All classes share one IoU matrix, so the suppression runs as a single
    fori_loop over box ranks with [C, N] vector state (vs vmapping
    ``nms_mask`` per class, which re-streamed the [C, N, N] IoU tensor every
    step — ~100x less HBM traffic for the detector's 1601 classes)."""
    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    return class_wise_max_conf_batched(boxes[None], scores[None],
                                       iou_threshold)[0]


def class_wise_max_conf_batched(boxes, scores, iou_threshold=0.3):
    """class_wise_max_conf over a batch of images in ONE rank loop:
    boxes [B, N, 4], scores [B, N, C+1] -> max_conf [B, N]. All images
    and classes advance together each greedy step ([B, C, N] vector
    state), so a batch costs the same ``N`` sequential steps as a single
    image — the per-image serial loops dominated the batched detector's
    runtime on v5e."""
    B, n = boxes.shape[:2]
    iou = box_iou_batched(boxes)                # [B, N, N] (N=300: ~3 MB)
    cls_scores = jnp.swapaxes(scores[..., 1:], 1, 2)       # [B, C, N]
    C = cls_scores.shape[1]
    b_idx = jnp.arange(B)[:, None]
    c_idx = jnp.arange(C)[None, :]
    col = jnp.arange(n)[None, None, :]

    def body(_, state):
        alive, kept = state
        s = jnp.where(alive, cls_scores, -jnp.inf)
        idx = jnp.argmax(s, axis=2)                        # [B, C]
        best = jnp.take_along_axis(s, idx[..., None], axis=2)[..., 0]
        has = best > -jnp.inf
        kept = kept.at[b_idx, c_idx, idx].max(jnp.where(has, best, 0.0))
        iou_rows = iou[b_idx, idx]                         # [B, C, N]
        suppress = (iou_rows > iou_threshold) & has[..., None]
        alive = alive & ~suppress & (col != idx[..., None])
        return alive, kept

    alive = jnp.ones((B, C, n), bool)
    kept = jnp.zeros((B, C, n), jnp.float32)
    _, kept = jax.lax.fori_loop(0, n, body, (alive, kept))
    return jnp.max(kept, axis=1)


def box_iou_batched(boxes):
    """Pairwise IoU per batch row: [B, N, 4] -> [B, N, N]."""
    area = jnp.clip(boxes[..., 2] - boxes[..., 0], 0) * \
        jnp.clip(boxes[..., 3] - boxes[..., 1], 0)
    lt = jnp.maximum(boxes[..., :, None, :2], boxes[..., None, :, :2])
    rb = jnp.minimum(boxes[..., :, None, 2:], boxes[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area[..., :, None] + area[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)
