"""Import bottom-up-attention / detectron2 detector checkpoints.

Parity target: ``DetectionCheckpointer(...).resume_or_load``
(scripts/feature_extractor.py:24) loading
``bua-caffe-frcn-r101_with_attributes.pth`` (config/extract_config.yaml).

Maps detectron2-style names onto the vision pytree
(vision/extractor.py ``init_extractor_params``):
  - conv weights [out, in, kh, kw] -> HWIO;
  - (Frozen)BatchNorm folded into the scale/bias affine:
    scale = gamma / sqrt(var + eps), bias = beta - mean * scale;
  - rpn_head.conv / objectness_logits / anchor_deltas;
  - roi_heads.box_predictor.cls_score / bbox_pred (+ attribute head when
    present).
Uses the pure-python torch .bin/.pth reader (checkpoint/torch_import.py).
"""

import numpy as np

from kmbart_tpu.checkpoint.torch_import import load_torch_checkpoint


def _fold_bn(sd, prefix, eps=1e-5):
    gamma = sd.get(prefix + ".weight")
    beta = sd.get(prefix + ".bias")
    mean = sd.get(prefix + ".running_mean")
    var = sd.get(prefix + ".running_var")
    if gamma is None:
        return None
    if mean is None:  # affine-only frozen BN already folded
        return {"scale": np.asarray(gamma, np.float32),
                "bias": np.asarray(beta, np.float32)}
    scale = np.asarray(gamma, np.float32) / np.sqrt(
        np.asarray(var, np.float32) + eps)
    bias = np.asarray(beta, np.float32) - np.asarray(mean, np.float32) * scale
    return {"scale": scale, "bias": bias}


def _conv(sd, name):
    w = sd.get(name + ".weight")
    return None if w is None else np.ascontiguousarray(
        np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0)))


def load_detector_weights(path, params):
    """Overlay a detector checkpoint onto an initialised pytree.
    Returns (params, report)."""
    import jax.numpy as jnp

    sd = load_torch_checkpoint(path)
    # detectron2 Checkpointer wraps state dict under 'model.'
    if any(k.startswith("model.backbone") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    report = []
    loaded = 0

    def put(dst, key, value):
        nonlocal loaded
        if value is None:
            return
        tgt = dst[key]
        if isinstance(value, dict):
            for k2, v2 in value.items():
                if tuple(np.shape(v2)) != tuple(tgt[k2].shape):
                    report.append(f"shape mismatch {key}.{k2}")
                    return
            dst[key] = {k2: jnp.asarray(v2) for k2, v2 in value.items()}
        else:
            if tuple(value.shape) != tuple(tgt.shape):
                report.append(
                    f"shape mismatch {key}: {value.shape} vs {tgt.shape}")
                return
            dst[key] = jnp.asarray(value)
        loaded += 1

    resnet = {k: (list(v) if isinstance(v, list) else dict(v))
              for k, v in params["resnet"].items()}
    put(resnet["stem"], "conv1", _conv(sd, "backbone.stem.conv1"))
    put(resnet["stem"], "bn1", _fold_bn(sd, "backbone.stem.conv1.norm"))

    stage_src = {"res2": "backbone.res2", "res3": "backbone.res3",
                 "res4": "backbone.res4", "res5": "roi_heads.res5"}
    for stage, src in stage_src.items():
        blocks = [dict(b) for b in resnet[stage]]
        for i, block in enumerate(blocks):
            base = f"{src}.{i}"
            for conv_name in ("conv1", "conv2", "conv3"):
                put(block, conv_name, _conv(sd, f"{base}.{conv_name}"))
                put(block, "bn" + conv_name[-1],
                    _fold_bn(sd, f"{base}.{conv_name}.norm"))
            if "shortcut" in block:
                put(block, "shortcut", _conv(sd, f"{base}.shortcut"))
                put(block, "shortcut_bn", _fold_bn(sd, f"{base}.shortcut.norm"))
        resnet[stage] = blocks

    out = dict(params)
    out["resnet"] = resnet

    def linear(name):
        w = sd.get(name + ".weight")
        b = sd.get(name + ".bias")
        return (None if w is None else np.asarray(w, np.float32).T,
                None if b is None else np.asarray(b, np.float32))

    rpn = "proposal_generator.rpn_head"
    put(out, "rpn_conv", _conv(sd, f"{rpn}.conv"))
    if sd.get(f"{rpn}.conv.bias") is not None:
        out["rpn_conv_bias"] = jnp.asarray(sd[f"{rpn}.conv.bias"], dtype=jnp.float32)
    put(out, "rpn_obj", _conv(sd, f"{rpn}.objectness_logits"))
    if sd.get(f"{rpn}.objectness_logits.bias") is not None:
        out["rpn_obj_bias"] = jnp.asarray(
            sd[f"{rpn}.objectness_logits.bias"], dtype=jnp.float32)
    put(out, "rpn_delta", _conv(sd, f"{rpn}.anchor_deltas"))
    if sd.get(f"{rpn}.anchor_deltas.bias") is not None:
        out["rpn_delta_bias"] = jnp.asarray(
            sd[f"{rpn}.anchor_deltas.bias"], dtype=jnp.float32)

    for ours, theirs in (("cls_score", "roi_heads.box_predictor.cls_score"),
                         ("bbox_pred", "roi_heads.box_predictor.bbox_pred"),
                         ("attr_score", "roi_heads.box_predictor.attr_score")):
        w, b = linear(theirs)
        put(out, ours, w)
        if b is not None and b.shape == np.shape(out[ours + "_bias"]):
            out[ours + "_bias"] = jnp.asarray(b)
            loaded += 1

    report.append(f"loaded {loaded} detector tensors/groups")
    return out, report
