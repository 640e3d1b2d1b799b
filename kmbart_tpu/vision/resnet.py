"""Caffe-style ResNet backbone + res5 ROI head in functional JAX.

Parity target: the bottom-up-attention detector trunk the reference shells
out to (``build_bua_resnet_backbone``, config/extract_config.yaml: ResNet-101,
OUT_FEATURES ["res4"], frozen BN, caffe ordering with stride in the 1x1
conv, res5 dilation 2) — the C4 Faster R-CNN layout: stem + res2/3/4 at
stride 16 feed the RPN and the ROI transform; res5 runs per-ROI.

TPU design: NHWC layout with HWIO kernels (XLA's native conv layout),
frozen BatchNorm folded to a scale/bias affine, params as a plain pytree so
the caffe/torch checkpoint importer (vision/import_weights.py) can fill it.
"""

import jax
import jax.numpy as jnp
import numpy as np

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def _conv_init(rng, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = np.sqrt(2.0 / fan_in)
    return jax.random.normal(rng, (kh, kw, cin, cout), jnp.float32) * std


def _bn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def conv(x, kernel, stride=1, dilation=1, dtype=jnp.bfloat16):
    pad_h = dilation * (kernel.shape[0] - 1) // 2
    pad_w = dilation * (kernel.shape[1] - 1) // 2
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(stride, stride),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def frozen_bn(x, p):
    return x * p["scale"] + p["bias"]


def init_bottleneck(rng, cin, cmid, cout, shortcut):
    ks = jax.random.split(rng, 4)
    p = {
        "conv1": _conv_init(ks[0], 1, 1, cin, cmid), "bn1": _bn_init(cmid),
        "conv2": _conv_init(ks[1], 3, 3, cmid, cmid), "bn2": _bn_init(cmid),
        "conv3": _conv_init(ks[2], 1, 1, cmid, cout), "bn3": _bn_init(cout),
    }
    if shortcut:
        p["shortcut"] = _conv_init(ks[3], 1, 1, cin, cout)
        p["shortcut_bn"] = _bn_init(cout)
    return p


def bottleneck(x, p, stride=1, dilation=1, dtype=jnp.bfloat16):
    """Caffe ordering: the stride lives in the 1x1 conv (stride_in_1x1)."""
    out = jax.nn.relu(frozen_bn(conv(x, p["conv1"], stride=stride, dtype=dtype), p["bn1"]))
    out = jax.nn.relu(frozen_bn(conv(out, p["conv2"], dilation=dilation, dtype=dtype), p["bn2"]))
    out = frozen_bn(conv(out, p["conv3"], dtype=dtype), p["bn3"])
    if "shortcut" in p:
        sc = frozen_bn(conv(x, p["shortcut"], stride=stride, dtype=dtype),
                       p["shortcut_bn"])
    else:
        sc = x
    return jax.nn.relu(out + sc)


def init_resnet_c4(rng, depth=101):
    """stem + res2/3/4 (the C4 backbone) and res5 (the ROI head)."""
    n2, n3, n4, n5 = STAGE_BLOCKS[depth]
    keys = jax.random.split(rng, 8)
    params = {
        "stem": {"conv1": _conv_init(keys[0], 7, 7, 3, 64),
                 "bn1": _bn_init(64)},
    }

    def stage(rng, n_blocks, cin, cmid, cout):
        ks = jax.random.split(rng, n_blocks)
        blocks = [init_bottleneck(ks[0], cin, cmid, cout, shortcut=True)]
        for i in range(1, n_blocks):
            blocks.append(init_bottleneck(ks[i], cout, cmid, cout, shortcut=False))
        return blocks

    params["res2"] = stage(keys[1], n2, 64, 64, 256)
    params["res3"] = stage(keys[2], n3, 256, 128, 512)
    params["res4"] = stage(keys[3], n4, 512, 256, 1024)
    params["res5"] = stage(keys[4], n5, 1024, 512, 2048)
    return params


def backbone_c4(params, images, dtype=jnp.bfloat16):
    """images [N, H, W, 3] (BGR, pixel-mean subtracted) -> res4 feature map
    [N, H/16, W/16, 1024]."""
    x = conv(images, params["stem"]["conv1"], stride=2, dtype=dtype)
    x = jax.nn.relu(frozen_bn(x, params["stem"]["bn1"]))
    # caffe max pool 3x3/2 with SAME-ish padding
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "SAME")
    for i, block in enumerate(params["res2"]):
        x = bottleneck(x, block, stride=1, dtype=dtype)
    for i, block in enumerate(params["res3"]):
        x = bottleneck(x, block, stride=2 if i == 0 else 1, dtype=dtype)
    for i, block in enumerate(params["res4"]):
        x = bottleneck(x, block, stride=2 if i == 0 else 1, dtype=dtype)
    return x


def res5_head(params, roi_features, dilation=2, dtype=jnp.bfloat16):
    """roi_features [N, P, P, 1024] -> [N, P', P', 2048].

    With RES5_DILATION=2 (extract_config.yaml) the first block keeps
    stride 1 and the 3x3 convs dilate, preserving the pooled resolution."""
    x = roi_features
    stride = 1 if dilation == 2 else 2
    for i, block in enumerate(params["res5"]):
        x = bottleneck(x, block, stride=stride if i == 0 else 1,
                       dilation=dilation, dtype=dtype)
    return x
