"""Dynamic-batching generation engine for serving.

No reference counterpart (the reference is research code; SURVEY.md's
mandate includes production serving). Requests are queued, coalesced into
fixed-shape batches (padded to the compiled bucket so the jitted decode
program never recompiles), executed on a background thread, and resolved
through futures.

TPU design: one compiled beam/greedy program per (options) signature;
batches are padded to ``max_batch_size`` with dummy rows — throughput-bound
serving on a single program, no shape polymorphism.
"""

import queue
import threading
from concurrent.futures import Future

import numpy as np

from kmbart_tpu.generation.api import generate

# Measured-good decode batch sizes (beam-5, BART-base, v5e; BASELINE.md
# round-3 batch sweep: 419/474/475/512/535/552/521 sent/s at
# 32/48/64/80/96/112/128 — monotone up to the 552 peak at 112, then 128
# regresses ~6%; the round-4 extension found a second, slightly higher
# plateau at 144-176 (peak 160, ~+3.5% over 112 same-day) before a hard
# ~25% cliff at 192, so 160 is the top bucket and 128 is deliberately
# absent — a 113..160-row burst pads straight to the 160 plateau instead
# of landing in the 128 dip. The engine only compiles/pads to sizes from
# this table (smallest entry >= the pending request count). The round-2
# "batch-80 hole" was an artifact of the forced-token NaN bug in the
# fast-select logsumexp (fixed in ops/pallas_vocab_stats.py), not a
# tiling property. Override per deployment via the ``batch_buckets`` ctor
# arg after running the bench sweep on the target hardware/model.
DEFAULT_BATCH_BUCKETS = (8, 16, 32, 48, 64, 80, 96, 112, 160)


class _Request:
    __slots__ = ("batch", "future", "n")

    def __init__(self, batch, n):
        self.batch = batch
        self.future = Future()
        self.n = n


class GenerationEngine:
    def __init__(self, params, cfg, tokenizer=None, *, max_batch_size=32,
                 encoder_seq_len=None, max_wait_ms=5.0, batch_buckets=None,
                 feature_dtype=np.float32, **gen_options):
        """gen_options: forwarded to generate() (num_beams, max_length, ...).

        ``encoder_seq_len``: static bucket; requests are padded to it
        (defaults to the first request's width rounded up to a multiple
        of 8).

        ``batch_buckets``: ascending measured-good batch sizes (see
        DEFAULT_BATCH_BUCKETS); a batch pads to the smallest bucket that
        fits, capped by ``max_batch_size`` — so a burst of 70 requests
        lands on the measured-good 96, never in the batch-80 tiling hole.

        ``feature_dtype``: dtype the padded ROI-feature tensor is shipped
        to the device in. The model computes its image embedding in bf16
        anyway, so ``jnp.bfloat16`` halves host->device feature bytes
        (the batch is padded to the bucket, so a sparse batch uploads the
        full bucket's rows — on narrow links this dominates; BASELINE.md
        round-4 serving section) at a <1e-2 relative feature quantisation
        that is invisible after the bf16 matmul. float32 default keeps
        serving bit-identical to the offline CLI decode."""
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_batch_size = max_batch_size
        buckets = tuple(b for b in (batch_buckets or DEFAULT_BATCH_BUCKETS)
                        if b <= max_batch_size)
        if not buckets or buckets[-1] < max_batch_size:
            buckets = buckets + (max_batch_size,)
        self.batch_buckets = buckets
        self.encoder_seq_len = encoder_seq_len
        self.max_wait_ms = max_wait_ms
        self.feature_dtype = feature_dtype
        self.gen_options = gen_options
        self._queue = queue.Queue()
        self._carry = None  # request that didn't fit the previous batch
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- public -------------------------------------------------------------

    def submit(self, input_ids, attention_mask=None, image_features=None):
        """Queue one request (single example or small batch). Returns a
        Future resolving to the generated token array [n * num_return, L]."""
        input_ids = np.atleast_2d(np.asarray(input_ids, np.int32))
        n = input_ids.shape[0]
        if n > self.max_batch_size:
            raise ValueError(
                f"request of {n} rows exceeds max_batch_size="
                f"{self.max_batch_size}; split it across submits")
        if attention_mask is None:
            attention_mask = (input_ids != self.cfg.pad_token_id).astype(np.int32)
        batch = {"input_ids": input_ids,
                 "attention_mask": np.asarray(attention_mask, np.int32),
                 "image_features": image_features}
        req = _Request(batch, n)
        self._queue.put(req)
        return req.future

    def generate_text(self, text, **kw):
        """Convenience: encode -> submit -> decode (requires tokenizer)."""
        enc = self.tokenizer.encode(text)
        fut = self.submit(np.asarray([enc], np.int32), **kw)
        out = fut.result()
        return [self.tokenizer.decode(row, skip_special_tokens=True)
                for row in out]

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=5)

    # -- internals -------------------------------------------------------------

    def _pad_width(self, width):
        if self.encoder_seq_len is not None:
            return self.encoder_seq_len
        return ((width + 7) // 8) * 8

    def _loop(self):
        while not self._stop.is_set():
            if self._carry is not None:
                first, self._carry = self._carry, None
            else:
                try:
                    first = self._queue.get(timeout=0.05)
                except queue.Empty:
                    continue
            reqs = [first]
            total = first.n
            # coalesce whatever arrives within the batching window; a
            # request that would overflow the batch is carried to the next
            # one (it must NOT be clipped — rows would silently cross
            # requests)
            deadline = self.max_wait_ms / 1000.0
            import time
            t0 = time.perf_counter()
            while total < self.max_batch_size and \
                    (time.perf_counter() - t0) < deadline:
                try:
                    r = self._queue.get_nowait()
                except queue.Empty:
                    time.sleep(0.0005)
                    continue
                if total + r.n > self.max_batch_size:
                    self._carry = r
                    break
                reqs.append(r)
                total += r.n
            try:
                self._run_batch(reqs)
            except Exception as e:  # surface errors through the futures
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _bucket_for(self, n):
        for b in self.batch_buckets:
            if n <= b:
                return b
        return self.batch_buckets[-1]

    def _run_batch(self, reqs):
        width = self._pad_width(max(r.batch["input_ids"].shape[1]
                                    for r in reqs))
        n_total = sum(r.n for r in reqs)
        B = self._bucket_for(n_total)
        ids = np.full((B, width), self.cfg.pad_token_id, np.int32)
        mask = np.zeros((B, width), np.int32)
        feats = None
        if any(r.batch.get("image_features") is not None for r in reqs):
            feats = np.zeros((B, self.cfg.max_img_num,
                              self.cfg.image_feature_size),
                             self.feature_dtype)
        row = 0
        for r in reqs:
            b = r.batch
            w = b["input_ids"].shape[1]
            ids[row:row + r.n, :w] = b["input_ids"][:, :width]
            mask[row:row + r.n, :w] = b["attention_mask"][:, :width]
            if feats is not None and b.get("image_features") is not None:
                f = np.asarray(b["image_features"], self.feature_dtype)
                feats[row:row + r.n, :f.shape[1]] = f[:, :self.cfg.max_img_num]
            row += r.n
        # dummy rows keep the compiled shape; give them a real token so the
        # decode loop terminates naturally
        ids[row:, 0] = self.cfg.eos_token_id
        mask[row:, 0] = 1

        # trim=False: responses keep the compiled max_length width so a
        # request's shape doesn't depend on which batch it was coalesced
        # into (the dummy fill rows finish immediately and would otherwise
        # interact with the HF-style trim)
        out = generate(self.params, self.cfg,
                       {"input_ids": ids, "attention_mask": mask,
                        "image_features": feats}, trim=False,
                       **self.gen_options)
        # ONE host fetch per coalesced batch: resolving futures with device
        # slices would defer the device->host copy into each consumer's
        # .result(), turning one transfer into num_requests round trips
        # (serialised, and brutal through a tunnel-attached chip)
        out = np.asarray(out)
        n_ret = out.shape[0] // B
        row = 0
        for r in reqs:
            r.future.set_result(out[row * n_ret:(row + r.n) * n_ret])
            row += r.n
