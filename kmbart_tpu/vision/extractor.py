"""Bottom-up-attention feature extractor, TPU-native.

Parity target: ``FeatureExtractor`` (scripts/feature_extractor.py:18-116)
over the bottom-up-attention Faster R-CNN (config/extract_config.yaml):
  - preprocessing: BGR image, caffe pixel-mean subtraction, shortest side
    600 / longest 1000 (``get_image_blob``);
  - given-boxes path: backbone -> ROIPool(14) -> res5(dilation 2) ->
    spatial mean-pool (2048-d) -> 1601-way softmax scores;
  - proposal path: RPN proposals -> same transform -> per-class NMS(0.3)
    max-confidence pooling -> CONF_THRESH 0.5 with 10..50 boxes kept.

TPU design: the whole per-image pipeline jits with a static ROI budget;
boxes are padded to ``max_boxes`` and masked. CUDA NMS becomes the
fixed-shape lax NMS in vision/nms.py.
"""


import jax
import jax.numpy as jnp
import numpy as np

from kmbart_tpu.vision import resnet
from kmbart_tpu.vision.nms import class_wise_max_conf, nms_mask
from kmbart_tpu.vision.roi import roi_pool

PIXEL_MEAN_BGR = np.array([102.9801, 115.9465, 122.7717], np.float32)


def get_image_blob(image_bgr, pixel_mean=PIXEL_MEAN_BGR, min_size=600,
                   max_size=1000):
    """Resize + mean-subtract (scripts/feature_extractor.py uses the bua
    ``get_image_blob``). Returns (blob [H', W', 3] float32, im_scale)."""
    import cv2
    h, w = image_bgr.shape[:2]
    scale = min_size / min(h, w)
    if round(scale * max(h, w)) > max_size:
        scale = max_size / max(h, w)
    resized = cv2.resize(image_bgr.astype(np.float32), None, fx=scale,
                         fy=scale, interpolation=cv2.INTER_LINEAR)
    return resized - pixel_mean, scale


def init_extractor_params(rng, num_classes=1601, num_attributes=401,
                          rpn_channels=512, num_anchors=12, depth=101):
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(rng, 7)
    d = 2048
    return {
        "resnet": resnet.init_resnet_c4(k1, depth),
        "rpn_conv": resnet._conv_init(k2, 3, 3, 1024, rpn_channels),
        "rpn_conv_bias": jnp.zeros((rpn_channels,), jnp.float32),
        "rpn_obj": resnet._conv_init(k3, 1, 1, rpn_channels, num_anchors),
        "rpn_obj_bias": jnp.zeros((num_anchors,), jnp.float32),
        "rpn_delta": resnet._conv_init(k4, 1, 1, rpn_channels, num_anchors * 4),
        "rpn_delta_bias": jnp.zeros((num_anchors * 4,), jnp.float32),
        "cls_score": jax.random.normal(k5, (d, num_classes), jnp.float32) * 0.01,
        "cls_score_bias": jnp.zeros((num_classes,), jnp.float32),
        "attr_score": jax.random.normal(k6, (d, num_attributes), jnp.float32) * 0.01,
        "attr_score_bias": jnp.zeros((num_attributes,), jnp.float32),
        "bbox_pred": jax.random.normal(k7, (d, num_classes * 4), jnp.float32) * 0.001,
        "bbox_pred_bias": jnp.zeros((num_classes * 4,), jnp.float32),
    }


def make_anchors(feat_h, feat_w, stride=16, scales=(4, 8, 16, 32),
                 ratios=(0.5, 1.0, 2.0)):
    """Caffe-style anchors: base size = stride * scale at each ratio."""
    anchors = []
    for ratio in ratios:
        for scale in scales:
            size = stride * scale
            w = size * np.sqrt(1.0 / ratio)
            h = size * np.sqrt(ratio)
            anchors.append([-w / 2, -h / 2, w / 2, h / 2])
    base = np.array(anchors, np.float32)  # [A, 4]
    ys, xs = np.meshgrid(np.arange(feat_h), np.arange(feat_w), indexing="ij")
    centers = np.stack([xs, ys, xs, ys], axis=-1).astype(np.float32) * stride \
        + stride / 2
    return (centers[:, :, None, :] + base[None, None]).reshape(-1, 4)


def apply_deltas(boxes, deltas, weights=(1.0, 1.0, 1.0, 1.0)):
    wx, wy, ww, wh = weights
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * widths
    cy = boxes[:, 1] + 0.5 * heights
    dx, dy, dw, dh = (deltas[:, 0] / wx, deltas[:, 1] / wy,
                      jnp.clip(deltas[:, 2] / ww, -10, 4.135),
                      jnp.clip(deltas[:, 3] / wh, -10, 4.135))
    pcx = dx * widths + cx
    pcy = dy * heights + cy
    pw = jnp.exp(dw) * widths
    ph = jnp.exp(dh) * heights
    return jnp.stack([pcx - pw / 2, pcy - ph / 2,
                      pcx + pw / 2, pcy + ph / 2], axis=1)


class FeatureExtractor:
    """Drop-in for the reference FeatureExtractor: ``extract_feature(image,
    boxes=None)`` -> {'boxes', 'scores', 'features'} in original-image
    coordinates."""

    def __init__(self, params=None, rng=None, num_classes=1601,
                 num_attributes=401, rpn_channels=512, depth=101,
                 min_boxes=10, max_boxes=50, conf_thresh=0.5,
                 pre_nms_topk=6000, post_nms_topk=300, rpn_min_size=16,
                 rpn_nms_thresh=0.7, nms_thresh=0.3,
                 anchor_scales=(4, 8, 16, 32),
                 bbox_reg_weights=(1.0, 1.0, 1.0, 1.0),
                 min_size=600, max_size=1000, pixel_mean=None,
                 dtype=jnp.bfloat16):
        if params is None:
            params = init_extractor_params(
                rng if rng is not None else jax.random.PRNGKey(0),
                num_classes=num_classes, num_attributes=num_attributes,
                rpn_channels=rpn_channels,
                num_anchors=3 * len(anchor_scales), depth=depth)
        self.params = params
        self.min_boxes = min_boxes
        self.max_boxes = max_boxes
        self.conf_thresh = conf_thresh
        self.pre_nms_topk = pre_nms_topk
        self.post_nms_topk = post_nms_topk
        self.rpn_min_size = rpn_min_size
        self.rpn_nms_thresh = rpn_nms_thresh
        self.nms_thresh = nms_thresh
        self.anchor_scales = tuple(anchor_scales)
        self.bbox_reg_weights = tuple(bbox_reg_weights)
        self.min_size = min_size
        self.max_size = max_size
        self.pixel_mean = (PIXEL_MEAN_BGR if pixel_mean is None
                           else np.asarray(pixel_mean, np.float32))
        self.dtype = dtype
        # jitted entry points (compiled once per padded-blob/ROI-count shape;
        # blobs are padded to 32-divisible sizes like detectron2's
        # size_divisibility, so bucket counts stay small)
        self._backbone_j = jax.jit(self._backbone)
        self._roi_features_j = jax.jit(self._roi_features)
        self._proposal_j = jax.jit(self._proposal_pipeline,
                                   static_argnames=("im_h", "im_w"))
        self._proposal_batch_j = jax.jit(self._proposal_pipeline_batch)

    # ---- core per-image computations (jitted per feature-map shape) -------

    def _roi_features(self, params, feat, boxes):
        """feat [H, W, C]; boxes [N, 4] in *resized-image* coords ->
        (pooled [N, 2048], scores [N, classes])."""
        pooled = roi_pool(feat, boxes, output_size=14, spatial_scale=1.0 / 16)
        x = resnet.res5_head(params["resnet"], pooled, dilation=2,
                             dtype=self.dtype)
        feats = jnp.mean(x, axis=(1, 2))  # [N, 2048]
        scores = jnp.dot(feats.astype(self.dtype),
                         params["cls_score"].astype(self.dtype),
                         preferred_element_type=jnp.float32) \
            + params["cls_score_bias"]
        return feats, jax.nn.softmax(scores, axis=-1)

    def _backbone(self, params, blob):
        return resnet.backbone_c4(params["resnet"], blob[None],
                                  dtype=self.dtype)[0]

    def _rpn_boxes(self, params, feat, im_h, im_w):
        """RPN head: decode + clip + min-size filter + pre-NMS top-k.
        Returns (top_boxes [pre_nms_topk, 4], top_scores)."""
        x = jax.nn.relu(resnet.conv(feat[None], params["rpn_conv"],
                                    dtype=self.dtype)[0]
                        + params["rpn_conv_bias"])
        obj = resnet.conv(x[None], params["rpn_obj"], dtype=self.dtype)[0] \
            + params["rpn_obj_bias"]
        deltas = resnet.conv(x[None], params["rpn_delta"], dtype=self.dtype)[0] \
            + params["rpn_delta_bias"]
        H, W, A = obj.shape
        anchors = jnp.asarray(make_anchors(H, W, scales=self.anchor_scales))
        obj = obj.reshape(-1)
        deltas = deltas.reshape(-1, 4)
        boxes = apply_deltas(anchors, deltas, weights=self.bbox_reg_weights)
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, im_w), jnp.clip(boxes[:, 1], 0, im_h),
            jnp.clip(boxes[:, 2], 0, im_w), jnp.clip(boxes[:, 3], 0, im_h),
        ], axis=1)
        ok = ((boxes[:, 2] - boxes[:, 0]) >= self.rpn_min_size) & \
             ((boxes[:, 3] - boxes[:, 1]) >= self.rpn_min_size)
        obj = jnp.where(ok, obj, -jnp.inf)
        k = min(self.pre_nms_topk, boxes.shape[0])
        top_scores, top_idx = jax.lax.top_k(obj, k)
        return boxes[top_idx], top_scores

    def _rpn_proposals(self, params, feat, im_h, im_w):
        """Returns (proposals [post_nms_topk, 4], validity mask)."""
        top_boxes, top_scores = self._rpn_boxes(params, feat, im_h, im_w)
        # only post_nms_topk survivors matter: cap the greedy iterations
        keep = nms_mask(top_boxes, top_scores, self.rpn_nms_thresh,
                        valid=jnp.isfinite(top_scores),
                        max_keep=self.post_nms_topk)
        score_kept = jnp.where(keep, top_scores, -jnp.inf)
        n = min(self.post_nms_topk, top_boxes.shape[0])
        final_scores, final_idx = jax.lax.top_k(score_kept, n)
        return top_boxes[final_idx], jnp.isfinite(final_scores)

    def _proposal_pipeline(self, params, blob, *, im_h, im_w):
        """backbone -> RPN -> ROI features -> class-wise NMS confidences,
        fused into one jitted program."""
        feat = self._backbone(params, blob)
        proposals, valid = self._rpn_proposals(params, feat, im_h, im_w)
        feats, scores = self._roi_features(params, feat, proposals)
        max_conf = class_wise_max_conf(proposals, scores, self.nms_thresh)
        max_conf = jnp.where(valid, max_conf, 0.0)
        return proposals, feats, scores, max_conf

    def _proposal_pipeline_batch(self, params, blobs, sizes):
        """Batched proposal path: blobs [N, H, W, 3] (padded to a common
        32-divisible shape), sizes [N, 2] = (im_h, im_w) pre-padding. One
        batched backbone pass + a vmapped RPN/ROI/NMS — the round-1 0.60
        s/img was dominated by per-image dispatch + tunnel latency, which
        this amortises over N images. ``im_h/im_w`` become traced clip
        bounds (the RPN math is identical)."""
        from kmbart_tpu.vision.nms import (class_wise_max_conf_batched,
                                           nms_mask_batched)

        feat = resnet.backbone_c4(params["resnet"], blobs,
                                  dtype=self.dtype)  # [B, h, w, C]
        # RPN decode is cheap per image — vmap it; both NMS stages then run
        # as ONE rank loop for the whole batch (their sequential greedy
        # steps dominated the per-image runtime on v5e)
        top_boxes, top_scores = jax.vmap(
            lambda f, s: self._rpn_boxes(params, f, s[0], s[1]))(feat, sizes)
        keep = nms_mask_batched(top_boxes, top_scores, self.rpn_nms_thresh,
                                valid=jnp.isfinite(top_scores),
                                max_keep=self.post_nms_topk)
        score_kept = jnp.where(keep, top_scores, -jnp.inf)
        n = min(self.post_nms_topk, top_boxes.shape[1])
        final_scores, final_idx = jax.lax.top_k(score_kept, n)
        proposals = jnp.take_along_axis(top_boxes, final_idx[..., None],
                                        axis=1)
        valid = jnp.isfinite(final_scores)

        # ROI pool + res5 per image via lax.map, NOT vmap: vmapping this
        # stage materialises batched remat intermediates that blow out HBM
        # (measured: a 123 GB allocation at batch 8); the scan keeps
        # single-image working memory
        feats, scores = jax.lax.map(
            lambda fp: self._roi_features(params, fp[0], fp[1]),
            (feat, proposals))
        max_conf = class_wise_max_conf_batched(proposals, scores,
                                               self.nms_thresh)
        max_conf = jnp.where(valid, max_conf, 0.0)
        # keep only the top max_boxes rows BY max_conf on device: the host
        # filter (CONF_THRESH with 10..50 bounds) can never keep more, so
        # only ~1/6 of the feats/scores cross the host link. ``sel_idx``
        # restores the reference's original (proposal-rank) row order.
        # ``full_cnt`` is the above-threshold count over ALL post-NMS
        # proposals — the host needs it to tell "exactly max_boxes kept"
        # (original order) from "clipped to max_boxes" (conf-descending,
        # scripts/feature_extractor.py:104-110), which the truncated
        # top_conf alone cannot distinguish.
        full_cnt = jnp.sum(max_conf >= self.conf_thresh, axis=1)
        m = min(self.max_boxes, max_conf.shape[1])
        top_conf, sel_idx = jax.lax.top_k(max_conf, m)
        take = lambda x: jnp.take_along_axis(
            x, sel_idx.reshape(sel_idx.shape + (1,) * (x.ndim - 2)), axis=1)
        return (take(proposals), take(feats), take(scores), top_conf,
                sel_idx, full_cnt)

    # ---- public API ----------------------------------------------------------

    @staticmethod
    def _pad32(blob):
        """Pad to 32-divisible spatial dims (detectron2 size_divisibility)."""
        h, w = blob.shape[:2]
        ph = (-h) % 32
        pw = (-w) % 32
        if ph or pw:
            blob = np.pad(blob, ((0, ph), (0, pw), (0, 0)))
        return blob

    def extract_feature(self, image, boxes=None):
        if boxes is None:
            return self._extract_without_bbox(image)
        return self._extract_with_bbox(image, boxes)

    @classmethod
    def from_config(cls, path, params=None, rng=None, *, load_weights=True,
                    dtype=jnp.bfloat16):
        """Build an extractor from a detectron2-schema YAML
        (config/extract_config.yaml; ref config/extract_config.yaml via
        scripts/feature_extractor.py's get_cfg().merge_from_file). Loads
        MODEL.WEIGHTS when the file exists and ``load_weights`` is set."""
        import os
        from kmbart_tpu.vision.config import load_extract_config

        cfg = load_extract_config(path)
        ex = cls(params=params, rng=rng, dtype=dtype,
                 **cfg["extractor"], **cfg["input"])
        weights = cfg.get("weights")
        if load_weights and weights and os.path.exists(weights):
            from kmbart_tpu.vision.import_weights import load_detector_weights
            ex.params, _ = load_detector_weights(weights, ex.params)
        return ex

    def _extract_with_bbox(self, image, boxes):
        """Given-boxes path (scripts/feature_extractor.py:50-73)."""
        blob, im_scale = get_image_blob(image, pixel_mean=self.pixel_mean,
                                        min_size=self.min_size,
                                        max_size=self.max_size)
        blob = self._pad32(blob)
        scaled = np.asarray(boxes, np.float32) * im_scale
        feat = self._backbone_j(self.params, jnp.asarray(blob))
        feats, scores = self._roi_features_j(self.params, feat,
                                             jnp.asarray(scaled))
        return {
            "boxes": np.asarray(scaled) / im_scale,
            "scores": np.asarray(scores),
            "features": np.asarray(feats),
        }

    def _keep_indices(self, max_conf):
        """CONF_THRESH filter with the 10..50 box bounds
        (scripts/feature_extractor.py:104-110)."""
        keep = np.nonzero(max_conf >= self.conf_thresh)[0]
        if len(keep) < self.min_boxes:
            keep = np.argsort(-max_conf)[: self.min_boxes]
        elif len(keep) > self.max_boxes:
            keep = np.argsort(-max_conf)[: self.max_boxes]
        return keep

    def _batch_keep(self, cnt, sel_idx_row):
        """Host half of the batched keep rule. ``cnt`` is the
        above-threshold count over ALL post-NMS proposals (device-side);
        ``sel_idx_row`` maps arriving conf-descending rows back to original
        proposal rank. Returns (n_keep, row order), matching _keep_indices:
        original proposal order when cnt is within [min_boxes, max_boxes]
        (np.nonzero), conf-descending when clipped to either bound
        (np.argsort(-max_conf))."""
        m = len(sel_idx_row)
        if self.min_boxes <= cnt <= m:
            return cnt, np.argsort(sel_idx_row[:cnt], kind="stable")
        n_keep = int(np.clip(cnt, self.min_boxes, m))
        return n_keep, np.arange(n_keep)

    def _extract_without_bbox(self, image):
        """Proposal path (scripts/feature_extractor.py:75-116)."""
        blob, im_scale = get_image_blob(image, pixel_mean=self.pixel_mean,
                                        min_size=self.min_size,
                                        max_size=self.max_size)
        h, w = blob.shape[:2]
        blob = self._pad32(blob)
        proposals, feats, scores, max_conf = self._proposal_j(
            self.params, jnp.asarray(blob), im_h=h, im_w=w)
        keep = self._keep_indices(np.asarray(max_conf))
        return {
            "boxes": np.asarray(proposals)[keep] / im_scale,
            "scores": np.asarray(scores)[keep],
            "features": np.asarray(feats)[keep],
        }

    def extract_feature_batch(self, images):
        """Proposal path over a LIST of images in one device call.

        Blobs are padded to the largest 32-divisible shape in the batch
        (exactly detectron2's batched ``size_divisibility`` padding the
        reference detector uses); per-image results match the single-image
        path whenever the images share a padded shape. Returns a list of
        per-image dicts like extract_feature(boxes=None)."""
        blobs, scales, sizes = [], [], []
        for image in images:
            blob, s = get_image_blob(image, pixel_mean=self.pixel_mean,
                                     min_size=self.min_size,
                                     max_size=self.max_size)
            blobs.append(blob)
            scales.append(s)
            sizes.append(blob.shape[:2])
        H = max(((h + 31) // 32) * 32 for h, _ in sizes)
        W = max(((w + 31) // 32) * 32 for _, w in sizes)
        # ship the blob in the compute dtype: the first conv casts to it
        # anyway (identical rounding), and the upload through the host
        # link was the single largest cost of the round-1 proposal path
        blob_dtype = np.float32 if self.dtype == jnp.float32 else self.dtype
        stacked = np.zeros((len(blobs), H, W, 3), np.float32)
        for i, blob in enumerate(blobs):
            stacked[i, :blob.shape[0], :blob.shape[1]] = blob
        (proposals, feats, scores, top_conf, sel_idx,
         full_cnt) = self._proposal_batch_j(
            self.params, jnp.asarray(stacked.astype(blob_dtype)),
            jnp.asarray(np.asarray(sizes, np.float32)))
        proposals = np.asarray(proposals)
        feats = np.asarray(feats, np.float32)
        scores = np.asarray(scores, np.float32)
        full_cnt = np.asarray(full_cnt)
        sel_idx = np.asarray(sel_idx)
        out = []
        for i, im_scale in enumerate(scales):
            # rows arrive conf-descending; _batch_keep reproduces the
            # CONF_THRESH / 10..50 rule and _keep_indices' row order. The
            # count comes from the device over ALL post-NMS proposals, so
            # count > max_boxes (clipped, conf-desc) is distinguishable
            # from count == max_boxes (in range, original order).
            n_keep, order = self._batch_keep(int(full_cnt[i]), sel_idx[i])
            out.append({
                "boxes": proposals[i][:n_keep][order] / im_scale,
                "scores": scores[i][:n_keep][order],
                "features": feats[i][:n_keep][order],
            })
        return out
