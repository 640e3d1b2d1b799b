"""Serving engine: dynamic batching + fixed-shape execution."""

import numpy as np
import pytest

import jax

from kmbart_tpu.models.conditional import init_conditional_params
from kmbart_tpu.serving.engine import GenerationEngine


def test_engine_batches_and_resolves(tiny_cfg, np_rng):
    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    engine = GenerationEngine(params, cfg, max_batch_size=8,
                              encoder_seq_len=16, max_length=8, num_beams=2,
                              early_stopping=True)
    try:
        futures = []
        for i in range(5):
            ids = np_rng.integers(4, 80, (1, 6 + i)).astype(np.int32)
            futures.append((ids, engine.submit(ids)))
        for ids, fut in futures:
            out = fut.result(timeout=120)
            assert out.shape == (1, 8)
            assert out[0, 0] == cfg.decoder_start_token_id
        # coalesced requests must match individually-generated outputs
        from kmbart_tpu.generation.api import generate
        ids0, fut0 = futures[0]
        padded = np.full((1, 16), cfg.pad_token_id, np.int32)
        padded[:, :ids0.shape[1]] = ids0
        mask = (padded != cfg.pad_token_id).astype(np.int32)
        solo = generate(params, cfg,
                        {"input_ids": padded, "attention_mask": mask},
                        max_length=8, num_beams=2, early_stopping=True)
        np.testing.assert_array_equal(fut0.result(), solo)
    finally:
        engine.shutdown()


def test_engine_multirow_and_errors(tiny_cfg, np_rng):
    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(1), cfg)
    engine = GenerationEngine(params, cfg, max_batch_size=8,
                              encoder_seq_len=16, max_length=6)
    try:
        ids = np_rng.integers(4, 80, (3, 7)).astype(np.int32)
        out = engine.submit(ids).result(timeout=120)
        assert out.shape == (3, 6)
    finally:
        engine.shutdown()


def test_engine_host_results_and_feature_dtype(tiny_cfg, np_rng):
    """Futures resolve to HOST numpy arrays (one device fetch per coalesced
    batch, not one per consumer), and feature_dtype=bfloat16 ships the
    padded ROI tensor at half width without changing output shape."""
    import jax.numpy as jnp
    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(2), cfg)
    engine = GenerationEngine(params, cfg, max_batch_size=4,
                              encoder_seq_len=16, max_length=6,
                              feature_dtype=jnp.bfloat16)
    try:
        ids = np_rng.integers(4, 80, (2, 7)).astype(np.int32)
        ids[:, 1:3] = cfg.img_feat_id
        feats = np_rng.normal(size=(2, cfg.max_img_num,
                                    cfg.image_feature_size)).astype(np.float32)
        out = engine.submit(ids, image_features=feats).result(timeout=120)
        assert isinstance(out, np.ndarray)
        assert out.shape == (2, 6)
    finally:
        engine.shutdown()


def test_http_server(tiny_cfg, np_rng, toy_assets):
    """HTTP front end end-to-end: health + text + token-id requests."""
    import json
    import urllib.request

    from kmbart_tpu.data.tokenization import ConditionTokenizer
    from kmbart_tpu.serving.http import serve

    tok = ConditionTokenizer(assets_dir=toy_assets)
    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(2), cfg)
    engine = GenerationEngine(params, cfg, tokenizer=tok, max_batch_size=4,
                              encoder_seq_len=24, max_length=8)
    server = serve(engine, port=0, block=False)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(base + "/health", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"

        req = urllib.request.Request(
            base + "/generate",
            data=json.dumps({"text": "a person waits"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert "generations" in out and len(out["generations"]) == 1

        ids = np_rng.integers(4, 80, (2, 6)).tolist()
        req = urllib.request.Request(
            base + "/generate",
            data=json.dumps({"input_ids": ids}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["generations"]) == 2

        # bad request -> 400 with an error message, server stays alive
        req = urllib.request.Request(base + "/generate", data=b'{"bogus": 1}',
                                     headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(base + "/health", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        server.shutdown()
        engine.shutdown()


def test_bucket_selection():
    """The engine pads to the smallest measured-good bucket, never into a
    known-bad batch size (the batch-80 tiling hole on v5e)."""
    from kmbart_tpu.serving.engine import GenerationEngine

    eng = GenerationEngine.__new__(GenerationEngine)
    eng.max_batch_size = 112
    eng.batch_buckets = (8, 16, 32, 64, 96, 112)
    assert eng._bucket_for(1) == 8
    assert eng._bucket_for(8) == 8
    assert eng._bucket_for(9) == 16
    assert eng._bucket_for(70) == 96   # NOT 80
    assert eng._bucket_for(97) == 112
    assert eng._bucket_for(300) == 112

    # the default table caps at max_batch_size
    import kmbart_tpu.serving.engine as se
    buckets = tuple(b for b in se.DEFAULT_BATCH_BUCKETS if b <= 40)
    assert buckets == (8, 16, 32)


@pytest.mark.slow
def test_engine_under_load(tiny_cfg, np_rng):
    """Backpressure behavior: a burst far larger than one batch drains
    fully, every future resolves with the right shape, rows never cross
    between requests, and oversized submits are rejected."""
    import pytest as _pytest
    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    engine = GenerationEngine(params, cfg, max_batch_size=8,
                              encoder_seq_len=16, max_length=6, num_beams=1,
                              max_wait_ms=2.0)
    try:
        with _pytest.raises(ValueError):
            engine.submit(np.full((9, 6), 5, np.int32))
        futures = []
        for i in range(40):
            n = 1 + (i % 3)
            ids = np_rng.integers(4, 80, (n, 5 + (i % 4))).astype(np.int32)
            futures.append((n, engine.submit(ids)))
        for n, fut in futures:
            out = fut.result(timeout=300)
            assert out.shape == (n, 6)
            assert (out[:, 0] == cfg.decoder_start_token_id).all()
    finally:
        engine.shutdown()


def test_continuous_engine_resolves_and_matches(tiny_cfg, np_rng):
    """ContinuousGenerationEngine: submit -> future surface, outputs equal
    the solo generate() result (trim=False width), multi-row re-join."""
    from kmbart_tpu.generation.api import generate
    from kmbart_tpu.serving.continuous import ContinuousGenerationEngine

    cfg = tiny_cfg.replace(dtype="float32")
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    # admit_width > pool_size: regression for the admit drain popping
    # more requests than free slots (killed the loop thread)
    engine = ContinuousGenerationEngine(
        params, cfg, pool_size=4, encoder_seq_len=16, chunk_steps=2,
        num_beams=2, max_length=8, early_stopping=True, admit_width=8)
    try:
        futures = []
        for i in range(6):  # > pool_size: exercises slot turnover
            ids = np_rng.integers(4, 80, (1, 6 + (i % 3))).astype(np.int32)
            futures.append((ids, engine.submit(ids)))
        for ids, fut in futures:
            out = fut.result(timeout=180)
            assert out.shape == (1, 8)
            padded = np.full((1, 16), cfg.pad_token_id, np.int32)
            padded[:, :ids.shape[1]] = ids
            mask = (padded != cfg.pad_token_id).astype(np.int32)
            solo = generate(params, cfg,
                            {"input_ids": padded, "attention_mask": mask},
                            max_length=8, num_beams=2, early_stopping=True,
                            trim=False)
            np.testing.assert_array_equal(out, solo)

        ids = np_rng.integers(4, 80, (3, 7)).astype(np.int32)
        out = engine.submit(ids).result(timeout=180)
        assert out.shape == (3, 8)
    finally:
        engine.shutdown()
