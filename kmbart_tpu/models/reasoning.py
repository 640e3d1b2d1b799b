"""Text-image matching classifier (auxiliary, ATOMIC pretraining data QA).

Parity target: ``ReasoningClassification`` (src/model/model.py:408-426) —
tanh-projected text + image representations, concatenated into a binary
matched/shuffled head with CE loss — and ``AtomicCollator``
(src/data/collation.py:250-293): shuffle a fraction of events across the
batch as negatives, encode text with a frozen backbone, zero-pad image
features to a fixed slot count.

TPU delta: the text backbone is pluggable; the default uses this
framework's BART encoder (mean-pooled) instead of the reference's
downloaded BERT — no HuggingFace dependency.
"""

import jax
import jax.numpy as jnp
import numpy as np

from kmbart_tpu.models.heads import masked_cross_entropy
from kmbart_tpu.ops.layers import dense


def init_reasoning_params(rng, txt_dim, image_dim, inner_dim, init_std=0.02):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "txt_kernel": jax.random.normal(k1, (txt_dim, inner_dim)) * init_std,
        "txt_bias": jnp.zeros((inner_dim,)),
        "image_kernel": jax.random.normal(k2, (image_dim, inner_dim)) * init_std,
        "image_bias": jnp.zeros((inner_dim,)),
        "out_kernel": jax.random.normal(k3, (2 * inner_dim, 2)) * init_std,
        "out_bias": jnp.zeros((2,)),
    }


def reasoning_loss(params, txt, image, label, dtype=jnp.bfloat16):
    """txt [B, txt_dim]; image [B, image_dim]; label [B] in {0,1}."""
    tx = jnp.tanh(dense(txt, params["txt_kernel"], params["txt_bias"], dtype))
    ix = jnp.tanh(dense(image, params["image_kernel"], params["image_bias"],
                        dtype))
    x = jnp.concatenate([ix, tx], axis=-1)
    logits = dense(x, params["out_kernel"], params["out_bias"], dtype)
    loss, _ = masked_cross_entropy(logits, label,
                                   jnp.ones(label.shape, bool))
    return loss, logits


class AtomicCollator:
    """Shuffled-negative batch builder (src/data/collation.py:250-293).

    ``text_encode_fn(list[str]) -> np.ndarray [B, txt_dim]`` replaces the
    reference's in-collator BERT forward."""

    def __init__(self, text_encode_fn, image_seq_length, image_feature_size,
                 shuffle_ratio, rng=None):
        self._encode = text_encode_fn
        self._image_seq_length = image_seq_length
        self._feat = image_feature_size
        self._shuffle_ratio = shuffle_ratio
        self._rng = rng if rng is not None else np.random.default_rng()

    def __call__(self, batch):
        event = np.array([x.get("event", "") for x in batch], dtype=object)
        label = np.ones(len(batch), dtype=np.int32)
        new_order = self._rng.permutation(len(batch))
        shuffled = self._rng.random(len(batch)) > self._shuffle_ratio
        event[shuffled] = event[new_order[shuffled]]
        label[shuffled] = 0

        text = np.asarray(self._encode([str(e) for e in event]), np.float32)

        L, F = self._image_seq_length, self._feat
        image = np.zeros((len(batch), L, F), np.float32)
        for i, x in enumerate(batch):
            feats = np.asarray(x.get("image_features",
                                     np.zeros((0, F), np.float32)))[:L]
            image[i, : len(feats)] = feats

        return {"text": text, "image": image.reshape(len(batch), -1),
                "label": label}
