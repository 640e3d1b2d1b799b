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


def nms_mask(boxes, scores, iou_threshold, valid=None, max_keep=None):
    """Boolean keep-mask NMS (fixed shape). ``valid`` masks padded rows.

    ``max_keep`` bounds the iteration count: each greedy step keeps exactly
    the next-highest unsuppressed box, so the first K kept boxes are
    identical to full NMS — when only the top K survivors matter (RPN's
    post_nms_topk), 6000 candidates need 300 iterations, not 6000."""
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    if valid is None:
        valid = jnp.ones((n,), bool)

    def body(_, state):
        keep, alive = state
        s = jnp.where(alive, scores, -jnp.inf)
        idx = jnp.argmax(s)
        has = s[idx] > -jnp.inf
        keep = keep.at[idx].set(keep[idx] | has)
        suppress = (iou[idx] > iou_threshold) & has
        alive = alive & ~suppress & (jnp.arange(n) != idx)
        return keep, alive

    steps = n if max_keep is None else min(n, max_keep)
    keep, _ = jax.lax.fori_loop(0, steps, body,
                                (jnp.zeros((n,), bool), valid))
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
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)                 # [N, N], shared by classes
    cls_scores = scores[:, 1:].T                # [C, N]
    C = cls_scores.shape[0]
    c_idx = jnp.arange(C)
    col = jnp.arange(n)[None, :]

    def body(_, state):
        alive, kept = state
        s = jnp.where(alive, cls_scores, -jnp.inf)
        idx = jnp.argmax(s, axis=1)                        # [C]
        best = jnp.take_along_axis(s, idx[:, None], axis=1)[:, 0]
        has = best > -jnp.inf
        kept = kept.at[c_idx, idx].max(jnp.where(has, best, 0.0))
        iou_rows = iou[idx]                                # [C, N]
        suppress = (iou_rows > iou_threshold) & has[:, None]
        alive = alive & ~suppress & (col != idx[:, None])
        return alive, kept

    alive = jnp.ones((C, n), bool)
    kept = jnp.zeros((C, n), jnp.float32)
    _, kept = jax.lax.fori_loop(0, n, body, (alive, kept))
    return jnp.max(kept, axis=0)
