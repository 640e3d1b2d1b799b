"""Data-parallel generation over a device mesh.

The reference has no distributed inference at all (generation is rank-0
only, src/validation.py:136-137); here the jitted beam program runs with
the batch sharded over the ``data`` mesh axis — XLA partitions the whole
while-loop (encoder, beam-stationary cache, select) per device with no
code changes, which is the single-program multi-chip serving story.
Runs on the 8-virtual-device CPU mesh (tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from kmbart_tpu.parallel.mesh import make_mesh


def test_generate_batch_sharded_matches_single(tiny_cfg):
    from kmbart_tpu.models.conditional import (
        MultiModalBartForConditionalGeneration)

    cfg = tiny_cfg.replace(dtype="float32")
    m = MultiModalBartForConditionalGeneration(cfg, rng=jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    B, T = 16, 10
    ids = rng.integers(4, cfg.vocab_size - 30, (B, T)).astype(np.int32)
    ids[:, 1:3] = cfg.img_feat_id
    batch = dict(
        input_ids=ids,
        attention_mask=np.ones((B, T), np.int32),
        image_features=rng.normal(size=(B, cfg.max_img_num,
                                        cfg.image_feature_size)
                                  ).astype(np.float32))
    kw = dict(max_length=10, num_beams=3, early_stopping=True)
    expect = np.asarray(m.generate(batch, **kw))

    mesh = make_mesh(devices=jax.devices()[:8])
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    sharded_batch = {k: jax.device_put(jnp.asarray(v), data)
                     for k, v in batch.items()}
    sharded_params = jax.device_put(m.params, repl)
    m_sharded = MultiModalBartForConditionalGeneration(
        cfg, params=sharded_params)
    got = np.asarray(m_sharded.generate(sharded_batch, **kw))
    np.testing.assert_array_equal(got, expect)
