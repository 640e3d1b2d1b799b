"""Headline benchmark: beam-search decode throughput on the flagship model.

Protocol (BASELINE.md): beam k=5 VCG-style generation on BART-base dims —
the reference's north-star component is the token-by-token HF 3.0.2 beam
loop (SURVEY.md §3.3); ours is a single jitted lax.while_loop on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The decode sweep covers batch {96, 112} and reports the peak
configuration (the round-3 sweep is monotone 419 -> 552 sent/s from 32
to the 112 peak, then 128 regresses ~6% — BASELINE.md). Extra fields:
the winning batch size, per-token decode step time, train throughput,
and train MFU (model FLOPs / v5e bf16 peak — see BASELINE.md for the
formula and for how this differs from the profiler's MXU-busy fraction).

vs_baseline: the reference publishes no throughput numbers and its
torch/transformers-3.0.2 CUDA stack cannot run in this image, so the
anchor is the era-hardware estimate derived in BASELINE.md (~45
sentences/sec for HF 3.0.2 BART-base beam-5, batch 32, max_length 32 on a
V100-class GPU). The measured torch-CPU stand-in ratio is also reported
separately as vs_torch_cpu when torch is available.
"""

import json
import os
import sys
import time

import numpy as np

ENC_LEN = 72
DEC_LEN = 40
MAX_LEN = 32
BEAMS = 5
DECODE_BATCHES = (112, 160)  # round-3 peak (112) + the round-4 second
# plateau (144-176, peak 160, ~+3.5% over 112 same-day; BASELINE.md)
# (batch, grad_accum_steps): direct batches plus one accumulated point —
# grad accumulation amortises the optimizer pass over the micro-batches
# (one AdamW application per effective batch), a standard large-batch
# recipe the CLIs expose via --grad_accum_steps. OOM points are skipped.
TRAIN_POINTS = ((32, 1), (128, 1), (512, 4))  # round-3 also swept 192
# (1926 samples/s — between the 128 and 512 points, not load-bearing);
# dropped to keep the whole bench inside a ~8 min budget on the tunnel

# BASELINE.md "Reference throughput anchor": estimated HF 3.0.2 beam-5
# decode on the reference's era GPU (V100-class), sentences/sec.
REFERENCE_GPU_ESTIMATE = 45.0

# Frozen torch-CPU anchor (round-4 verdict #8): the live torch-CPU
# denominator shares this contended 1-CPU host and swings >±30% even
# thread-pinned + median-of-3 (measured 1.32 / 1.09 / 0.79 sent/s across
# round-4/5 runs while the TPU numerator held ±0.5%), so the TRENDABLE
# ratio divides by this recorded least-contended median instead;
# vs_torch_cpu stays live for drift attribution only.
TORCH_CPU_ANCHOR_SENT_PER_SEC = 1.32

# v5e bf16 peak matmul throughput, FLOP/s
V5E_PEAK_FLOPS = 197e12


def _setup_jax():
    """Persistent compile cache: TPU compiles through the tunnel take
    minutes; cache them across bench invocations."""
    import jax
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/kmbart_jaxcache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def _decode_batch(jax, cfg, batch_size, rng):
    ids = rng.integers(4, 50000, (batch_size, ENC_LEN)).astype(np.int32)
    ids[:, 1:31] = cfg.img_feat_id
    return {
        "input_ids": jax.device_put(ids),
        "attention_mask": jax.device_put(
            np.ones((batch_size, ENC_LEN), np.int32)),
        "image_features": jax.device_put(rng.normal(
            size=(batch_size, cfg.max_img_num, cfg.image_feature_size)
        ).astype(np.float32)),
    }


def bench_decode():
    """Device decode throughput over the batch sweep: inputs pre-placed
    with device_put so the measurement reflects the chip, not this
    environment's host<->TPU tunnel (~60 MB/s through the axon relay —
    100x slower than the PCIe/ICI paths of real deployments).

    Returns (best sentences/sec, best batch, per-token step ms at best)."""
    jax = _setup_jax()
    from kmbart_tpu.config import bart_base_config
    from kmbart_tpu.generation.api import generate
    from kmbart_tpu.models.conditional import init_conditional_params

    cfg = bart_base_config()
    params = jax.device_put(init_conditional_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    kwargs = dict(max_length=MAX_LEN, num_beams=BEAMS, early_stopping=True,
                  rng=jax.device_put(jax.random.PRNGKey(0)))
    best = (0.0, 0, 0.0)
    for batch_size in DECODE_BATCHES:
        batch = _decode_batch(jax, cfg, batch_size, rng)
        out = generate(params, cfg, batch, **kwargs)  # compile + warmup
        n_iters = 5
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = generate(params, cfg, batch, **kwargs)
        dt = time.perf_counter() - t0
        assert np.asarray(out).shape[0] == batch_size  # width may HF-trim
        tput = batch_size * n_iters / dt
        step_ms = dt / n_iters / (MAX_LEN - 1) * 1e3
        if tput > best[0]:
            best = (tput, batch_size, step_ms)
    return best


SAMPLING_BATCH = 96  # round-4 peak for the beam-sampling path (BASELINE.md)


def bench_sampling():
    """Beam-5 SAMPLING (do_sample, top-k 50) throughput at the round-4
    peak batch — the round-3 verdict's target path (424-434 sent/s in
    round 4); tracked so the invariant-walk win can't silently regress."""
    jax = _setup_jax()
    from kmbart_tpu.config import bart_base_config
    from kmbart_tpu.generation.api import generate
    from kmbart_tpu.models.conditional import init_conditional_params

    cfg = bart_base_config()
    params = jax.device_put(init_conditional_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    batch = _decode_batch(jax, cfg, SAMPLING_BATCH, rng)
    kwargs = dict(max_length=MAX_LEN, num_beams=BEAMS, do_sample=True,
                  top_k=50, early_stopping=True,
                  rng=jax.device_put(jax.random.PRNGKey(0)))
    out = generate(params, cfg, batch, **kwargs)  # compile + warmup
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = generate(params, cfg, batch, **kwargs)
    dt = time.perf_counter() - t0
    assert np.asarray(out).shape[0] == SAMPLING_BATCH
    return SAMPLING_BATCH * n_iters / dt


LARGE_MICRO_BATCH, LARGE_ACCUM = 32, 4   # BASELINE.md "BART-large recipe"
LARGE_DECODE_BATCH = 48


def bench_large():
    """BART-large tracked scale point (round-4 verdict #2): train
    samples/s + MFU at the round-3 recipe (micro-batch 32 x grad-accum 4)
    and beam-5 decode sent/s at batch 48. Returns a dict of fields."""
    jax = _setup_jax()
    from kmbart_tpu.config import bart_large_config
    from kmbart_tpu.generation.api import generate
    from kmbart_tpu.models.conditional import (
        conditional_loss, init_conditional_params)
    from kmbart_tpu.parallel.train_step import build_train_step
    from kmbart_tpu.training.adamw import adamw
    from kmbart_tpu.training.state import TrainState

    cfg = bart_large_config()
    rng = np.random.default_rng(0)
    out = {}
    params = jax.device_put(init_conditional_params(jax.random.PRNGKey(0), cfg))

    # --- beam-5 decode (FIRST: the train step donates its state, which
    # owns these param arrays — decoding after would read deleted arrays) --
    dbatch = _decode_batch(jax, cfg, LARGE_DECODE_BATCH, rng)
    kwargs = dict(max_length=MAX_LEN, num_beams=BEAMS, early_stopping=True,
                  rng=jax.device_put(jax.random.PRNGKey(0)))
    generate(params, cfg, dbatch, **kwargs)  # compile + warmup
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        generate(params, cfg, dbatch, **kwargs)
    dt = time.perf_counter() - t0
    out["large_decode_sent_per_sec"] = round(
        LARGE_DECODE_BATCH * n_iters / dt, 2)
    del dbatch

    # --- train at the accumulation recipe ---------------------------------

    def loss_fn(p, b, r):
        loss, _ = conditional_loss(p, cfg, b, train=True, rng=r)
        return loss, {}

    B = LARGE_MICRO_BATCH * LARGE_ACCUM
    step = build_train_step(loss_fn, adamw(lr=1e-5), donate=True,
                            grad_accum_steps=LARGE_ACCUM)
    ids = rng.integers(4, 50000, (B, ENC_LEN)).astype(np.int32)
    ids[:, 1:31] = cfg.img_feat_id
    dec = rng.integers(4, 50000, (B, DEC_LEN)).astype(np.int32)
    batch = jax.device_put({
        "input_ids": ids,
        "attention_mask": np.ones((B, ENC_LEN), np.int32),
        "image_features": rng.normal(
            size=(B, cfg.max_img_num,
                  cfg.image_feature_size)).astype(np.float32),
        "decoder_input_ids": dec,
        "decoder_attention_mask": np.ones((B, DEC_LEN), np.int32),
        "labels": dec.copy(),
    })
    key = jax.random.PRNGKey(0)
    state = TrainState.create(params)
    state, m = step(state, batch, key)
    float(m["loss"])
    n_iters = 12
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state, batch, key)
    float(m["loss"])
    dt = time.perf_counter() - t0
    tput = B * n_iters / dt
    out["large_train_samples_per_sec"] = round(tput, 2)
    out["large_train_mfu"] = round(
        tput * train_flops_per_sample(cfg) / V5E_PEAK_FLOPS, 4)
    return out


HOST_LOADER_ROWS = 1024
HOST_LOADER_BATCH = 128


def bench_host_loader():
    """Host input-pipeline throughput (round-4 verdict #5): packed
    feature cache + 2 shared-memory process workers over a synthetic
    VCG-shaped split at full dims (2048+4-d features, 1601-class soft
    labels), the round-4 probe protocol. Returns samples/sec."""
    import pickle
    import tempfile

    from kmbart_tpu.data.bpe import build_toy_assets
    from kmbart_tpu.data.collation import Collator
    from kmbart_tpu.data.datasets import VCGDataset
    from kmbart_tpu.data.feature_cache import pack_split
    from kmbart_tpu.data.loader import DataLoader
    from kmbart_tpu.data.tokenization import ConditionTokenizer

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        build_toy_assets(d)
        tok = ConditionTokenizer(assets_dir=d)
        split_dir = os.path.join(d, "train")
        os.makedirs(split_dir)
        entries = []
        for i in range(HOST_LOADER_ROWS):
            n_box = int(rng.integers(10, 31))
            with open(os.path.join(split_dir, f"img{i}.pkl"), "wb") as f:
                pickle.dump({
                    "image_features": rng.normal(
                        size=(n_box, 2048)).astype(np.float32),
                    "boxes": rng.random((n_box, 4)).astype(np.float32),
                    "mrm_labels": rng.random((n_box, 1601)
                                             ).astype(np.float32),
                }, f)
            entries.append({"img_id": f"img{i}", "task_type": "intent",
                            "event": "1 sits at a table reading the menu",
                            "labels": "the person orders some dinner",
                            "index": i})
        with open(os.path.join(d, "train.json"), "w") as f:
            json.dump(entries, f)
        pack_split(d, "train")
        ds = VCGDataset(d, split="train")
        col = Collator(tok, has_label=True, mlm_enabled=True,
                       mrm_enabled=True, ap_enabled=True, rp_enabled=True,
                       mlm_probability=0.3, mrm_probability=0.3)
        loader = DataLoader(ds, batch_size=HOST_LOADER_BATCH,
                            collate_fn=col, num_workers=2,
                            use_processes=True, shm_transport=True)
        try:
            for _ in loader:  # warm epoch (pool spawn + page cache)
                pass
            t0 = time.perf_counter()
            n = 0
            for batch in loader:
                n += len(batch["input_ids"])
            dt = time.perf_counter() - t0
        finally:
            loader.close()
    return n / dt


def train_flops_per_sample(cfg, enc_len=ENC_LEN, dec_len=DEC_LEN):
    """Model FLOPs of one fwd+bwd sample: 6 x (matmul params x tokens they
    see) + attention score/value FLOPs. Embedding gathers excluded."""
    d = cfg.d_model
    enc_layer = 12 * d * d               # qkvo (4d^2) + ffn (8d^2)
    dec_layer = 16 * d * d               # + cross-attn qkvo
    lm_head = d * cfg.vocab_size
    img_embed = cfg.image_feature_size * d
    matmul = (cfg.encoder_layers * enc_layer * enc_len
              + cfg.decoder_layers * dec_layer * dec_len
              + lm_head * dec_len
              + img_embed * cfg.max_img_num)
    heads_attn = (cfg.encoder_layers * enc_len * enc_len * d       # enc self
                  + cfg.decoder_layers * dec_len * dec_len * d     # dec self
                  + cfg.decoder_layers * dec_len * enc_len * d)    # cross
    return 6 * matmul + 2 * 6 * heads_attn  # QK^T and AV, fwd+bwd


def bench_train():
    """VCG fine-tune train step over the batch sweep: samples/sec and
    model-FLOPs utilization (BART-base, enc 72 / dec 40) on one chip.
    Returns {batch: (samples/sec, mfu)}."""
    jax = _setup_jax()
    from kmbart_tpu.config import bart_base_config
    from kmbart_tpu.models.conditional import (
        conditional_loss, init_conditional_params)
    from kmbart_tpu.parallel.train_step import build_train_step
    from kmbart_tpu.training.adamw import adamw
    from kmbart_tpu.training.state import TrainState

    cfg = bart_base_config()
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    def loss_fn(p, b, step_rng):
        loss, _ = conditional_loss(p, cfg, b, train=True, rng=step_rng)
        return loss, {}

    key = jax.random.PRNGKey(0)
    out = {}
    for B, accum in TRAIN_POINTS:
        # donate=True matches the real trainer (training/trainer.py); the
        # round-4 profile showed donate=False adds ~1.3 ms of defensive
        # copies to the fused-attention step
        step = build_train_step(loss_fn, adamw(lr=1e-5), donate=True,
                                grad_accum_steps=accum)
        ids = rng.integers(4, 50000, (B, ENC_LEN)).astype(np.int32)
        ids[:, 1:31] = cfg.img_feat_id
        dec = rng.integers(4, 50000, (B, DEC_LEN)).astype(np.int32)
        batch = {
            "input_ids": ids,
            "attention_mask": np.ones((B, ENC_LEN), np.int32),
            "image_features": rng.normal(
                size=(B, cfg.max_img_num,
                      cfg.image_feature_size)).astype(np.float32),
            "decoder_input_ids": dec,
            "decoder_attention_mask": np.ones((B, DEC_LEN), np.int32),
            "labels": dec.copy(),
        }
        try:
            # fresh leaf copies: the donated step consumes the state's
            # buffers, and ``params`` is shared across sweep points
            state = TrainState.create(
                jax.tree.map(lambda a: jax.numpy.array(a), params))
            dev_batch = jax.device_put(batch)
            state, m = step(state, dev_batch, key)  # compile
            float(m["loss"])
            # 24 iters: the round-4 host-gap probe measured 64.9 ms/step at
            # n=10 vs 62.3 at n=60 — short loops pay unamortized axon-tunnel
            # dispatch; 24 is within 1% of the sustained rate
            n_iters = 24
            t0 = time.perf_counter()
            for _ in range(n_iters):
                state, m = step(state, dev_batch, key)
            float(m["loss"])  # sync
            dt = time.perf_counter() - t0
        except jax.errors.JaxRuntimeError as e:
            # only runtime failures (HBM OOM at the largest sweep points)
            # are skippable; anything else should crash the bench loudly
            print(f"# bench_train: skipping batch {B} (accum {accum}): "
                  f"{str(e).splitlines()[0][:120]}", file=sys.stderr)
            continue
        tput = B * n_iters / dt
        out[B] = (tput, tput * train_flops_per_sample(cfg) / V5E_PEAK_FLOPS)
    return out


PRETRAIN_BATCH = 128
PRETRAIN_REL = 80  # max_rel_count (src/data/collation.py:28)


def bench_pretrain():
    """Multitask 4-head pretraining step (LM + MRM + attribute + relation,
    src/model/model.py:125-309 parity) — the reference's PRIMARY workload
    (pretrain.py). Returns (samples/sec, step ms, trunk-MFU lower bound:
    head FLOPs are excluded from the numerator, so true MFU is higher)."""
    jax = _setup_jax()
    from kmbart_tpu.config import bart_base_config
    from kmbart_tpu.models.pretraining import (init_pretraining_params,
                                               pretraining_loss)
    from kmbart_tpu.parallel.train_step import build_train_step
    from kmbart_tpu.training.adamw import adamw
    from kmbart_tpu.training.state import TrainState

    B, R = PRETRAIN_BATCH, PRETRAIN_REL
    cfg = bart_base_config()
    params = init_pretraining_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 50000, (B, ENC_LEN)).astype(np.int32)
    ids[:, 1:31] = cfg.img_feat_id
    dec = rng.integers(4, 50000, (B, DEC_LEN)).astype(np.int32)
    soft = rng.random((B, DEC_LEN, cfg.num_labels)).astype(np.float32)
    soft /= soft.sum(-1, keepdims=True)
    batch = jax.device_put({
        "input_ids": ids,
        "attention_mask": np.ones((B, ENC_LEN), np.int32),
        "image_features": rng.normal(
            size=(B, cfg.max_img_num,
                  cfg.image_feature_size)).astype(np.float32),
        "decoder_input_ids": dec,
        "decoder_attention_mask": np.ones((B, DEC_LEN), np.int32),
        "labels": dec.copy(),
        "mrm_soft_labels": soft,
        "mrm_mask": (rng.random((B, DEC_LEN)) < 0.2),
        "attribute_labels": rng.integers(
            0, cfg.num_attributes, (B, DEC_LEN)).astype(np.int32),
        "attribute_mask": (rng.random((B, DEC_LEN)) < 0.2).astype(np.int32),
        "relation_pairs": rng.integers(0, DEC_LEN, (B, R, 2)).astype(np.int32),
        "relation_labels": rng.integers(
            0, cfg.num_relations, (B, R)).astype(np.int32),
        "relation_mask": (rng.random((B, R)) < 0.5),
    })

    def loss_fn(p, b, r):
        loss, _ = pretraining_loss(p, cfg, b, train=True, rng=r)
        return loss, {}

    step = build_train_step(loss_fn, adamw(lr=1e-5), donate=True)
    key = jax.random.PRNGKey(0)
    state = TrainState.create(params)
    state, m = step(state, batch, key)
    float(m["loss"])
    n_iters = 24  # see bench_train: amortizes tunnel dispatch
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state, batch, key)
    float(m["loss"])
    dt = time.perf_counter() - t0
    tput = B * n_iters / dt
    return (tput, dt / n_iters * 1e3,
            tput * train_flops_per_sample(cfg) / V5E_PEAK_FLOPS)


def bench_serving(target_rate, secs=12.0, engine="static",
                  pool_size=160, chunk_steps=4):
    """Serving engine under open-loop Poisson load (text-only requests:
    the per-request 246 KB ROI-feature payload is tunnel-bound in THIS
    environment — see BASELINE.md round-4 serving section — and would
    measure the relay, not the engine). Offered rate is set just under
    the offline decode ceiling; reports sustained completion rate and
    request latency percentiles.

    ``engine``: "static" = bucket-coalescing GenerationEngine;
    "continuous" = slot-pool ContinuousGenerationEngine
    (serving/continuous.py) — requests admit into finished rows of the
    in-flight pool at chunk granularity."""
    import threading
    jax = _setup_jax()
    from kmbart_tpu.config import bart_base_config
    from kmbart_tpu.models.conditional import init_conditional_params
    from kmbart_tpu.serving.engine import GenerationEngine

    cfg = bart_base_config()
    params = jax.device_put(init_conditional_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    if engine == "continuous":
        from kmbart_tpu.serving.continuous import ContinuousGenerationEngine
        eng = ContinuousGenerationEngine(
            params, cfg, pool_size=pool_size, encoder_seq_len=ENC_LEN,
            chunk_steps=chunk_steps, num_beams=BEAMS, max_length=MAX_LEN,
            early_stopping=True)
    else:
        buckets = (112, 160)  # at 0.85x-ceiling offered load the window
        # coalescing almost always lands on these two; smaller buckets
        # would each cost a compile-cache load in the bench budget
        eng = GenerationEngine(params, cfg, max_batch_size=buckets[-1],
                               encoder_seq_len=ENC_LEN,
                               batch_buckets=buckets,
                               max_wait_ms=5.0, num_beams=BEAMS,
                               max_length=MAX_LEN, early_stopping=True)
    try:
        if engine == "continuous":
            # pre-compile admit + chunk + harvest
            eng.submit(rng.integers(
                4, 50000, (1, ENC_LEN)).astype(np.int32)).result(timeout=600)
        else:
            for b in (112, 160):  # pre-compile every bucket
                eng.submit(rng.integers(
                    4, 50000, (b, ENC_LEN)).astype(np.int32)).result(timeout=600)
        ids_pool = rng.integers(4, 50000, (256, ENC_LEN)).astype(np.int32)
        lat, lock = [], threading.Lock()
        gaps = rng.exponential(1.0 / target_rate,
                               size=int(target_rate * secs * 1.2))
        t_start = time.perf_counter()
        n_sent = 0
        for gap in gaps:
            target = t_start + gaps[:n_sent + 1].sum()
            now = time.perf_counter()
            if now > t_start + secs:
                break
            if target > now:
                time.sleep(target - now)
            t0 = time.perf_counter()
            fut = eng.submit(ids_pool[n_sent % 256:n_sent % 256 + 1])
            fut.add_done_callback(
                lambda f, t0=t0: (f.exception() is None and
                                  (lock.acquire(),
                                   lat.append(time.perf_counter() - t0),
                                   lock.release())))
            n_sent += 1
        deadline = time.perf_counter() + 30
        while len(lat) < n_sent and time.perf_counter() < deadline:
            time.sleep(0.05)
        wall = time.perf_counter() - t_start
    finally:
        eng.shutdown()
    lat_ms = np.sort(np.array(lat)) * 1e3
    return {"offered": round(target_rate, 1),
            "sustained": round(len(lat) / wall, 2),
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
            "p99_ms": round(float(np.percentile(lat_ms, 99)), 1)}


def bench_torch_cpu():
    """transformers BART beam search, torch CPU — the only runnable torch
    stand-in on this machine (reported as vs_torch_cpu, NOT the anchor).

    The denominator shares this contention-noisy 1-CPU host (round-4 runs
    swung 322 -> 3368 -> 583 on the ratio), so per the round-4 verdict #8
    the threads are pinned and the MEDIAN of 3 interleaved repetitions is
    reported, each rep printed to stderr for drift attribution."""
    try:
        import torch
        import transformers
    except Exception:
        return None
    torch.set_num_threads(1)
    torch.set_num_interop_threads(1)
    cfg = transformers.BartConfig(
        vocab_size=50320, d_model=768, encoder_layers=6, decoder_layers=6,
        encoder_attention_heads=12, decoder_attention_heads=12,
        encoder_ffn_dim=3072, decoder_ffn_dim=3072,
        max_position_embeddings=1024, pad_token_id=1, bos_token_id=0,
        eos_token_id=2, decoder_start_token_id=0)
    model = transformers.BartForConditionalGeneration(cfg).eval()
    rng = np.random.default_rng(0)
    B = 16
    ids = torch.tensor(rng.integers(4, 50000, (B, ENC_LEN)), dtype=torch.long)
    am = torch.ones_like(ids)
    reps = []
    with torch.no_grad():
        model.generate(input_ids=ids[:4], attention_mask=am[:4],
                       num_beams=BEAMS, max_length=MAX_LEN)  # warmup
        for _ in range(3):
            t0 = time.perf_counter()
            model.generate(input_ids=ids, attention_mask=am,
                           num_beams=BEAMS, max_length=MAX_LEN)
            reps.append(B / (time.perf_counter() - t0))
    print(f"# torch_cpu reps: {[round(r, 2) for r in reps]}", file=sys.stderr)
    return float(np.median(reps))


def _phase(name, fn, *a, **kw):
    """Run one bench phase; failures degrade to None (stderr note), and
    per-phase wall time goes to stderr so a driver timeout is attributable."""
    t0 = time.perf_counter()
    try:
        out = fn(*a, **kw)
    except Exception as e:
        print(f"# bench {name} failed: {str(e).splitlines()[0][:120]}",
              file=sys.stderr)
        out = None
    print(f"# bench phase {name}: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    return out


def main():
    tput, best_batch, step_ms = _phase("decode", bench_decode) or \
        sys.exit("bench_decode failed")
    sampling = _phase("sampling", bench_sampling)
    serving = _phase("serving", bench_serving, target_rate=0.85 * tput)
    train = _phase("train", bench_train)
    pretrain = _phase("pretrain", bench_pretrain)
    large = _phase("large", bench_large)
    host_loader = _phase("host_loader", bench_host_loader)
    torch_cpu = None
    if os.environ.get("KMBART_BENCH_SKIP_TORCH") != "1":
        torch_cpu = _phase("torch_cpu", bench_torch_cpu)
    record = {
        "metric": "beam5_decode_throughput",
        "value": round(tput, 2),
        "unit": "sentences/sec",
        "vs_baseline": round(tput / REFERENCE_GPU_ESTIMATE, 2),
        "batch": best_batch,
        "decode_step_ms": round(step_ms, 3),
    }
    if train:
        base = train.get(TRAIN_POINTS[0][0])
        if base:
            record["train_samples_per_sec"] = round(base[0], 2)
            record["train_mfu"] = round(base[1], 4)
        peak_b = max(train, key=lambda b: train[b][0])
        record["train_peak_samples_per_sec"] = round(train[peak_b][0], 2)
        record["train_peak_mfu"] = round(train[peak_b][1], 4)
        record["train_peak_batch"] = peak_b
        plain = train.get(128)
        if plain:
            # the no-grad-accum point the round-3 verdict tracks
            record["train_128_samples_per_sec"] = round(plain[0], 2)
            record["train_128_mfu"] = round(plain[1], 4)
    if pretrain:
        record["pretrain_samples_per_sec"] = round(pretrain[0], 2)
        record["pretrain_step_ms"] = round(pretrain[1], 2)
        record["pretrain_trunk_mfu"] = round(pretrain[2], 4)
    if serving:
        record["serving_offered_per_sec"] = serving["offered"]
        record["serving_sustained_per_sec"] = serving["sustained"]
        record["serving_p50_ms"] = serving["p50_ms"]
        record["serving_p99_ms"] = serving["p99_ms"]
    if sampling:
        record["sampling_sent_per_sec"] = round(sampling, 2)
    if large:
        record.update(large)
    if host_loader:
        record["host_samples_per_sec"] = round(host_loader, 2)
    record["vs_torch_cpu_anchored"] = round(
        tput / TORCH_CPU_ANCHOR_SENT_PER_SEC, 2)
    if torch_cpu:
        record["vs_torch_cpu"] = round(tput / torch_cpu, 2)
        record["torch_cpu_sent_per_sec"] = round(torch_cpu, 2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
