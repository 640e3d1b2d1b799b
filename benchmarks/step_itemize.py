"""Itemize the plain-128 fine-tune train step by joining the xplane
profile against the step's own optimized HLO.

The join matters: name-based bucketing (utils/xplane.py group_breakdown)
misclassifies two big slices — multi-output backward fusions that
CONTAIN a dot/convolution land in "elementwise/fusion", and the Pallas
attention backward custom-calls (named ``transpose_jvp___...`` by the
VJP scope) land in "copy/transpose". This script classifies each
executed op by what its HLO computation contains:

  matmul    — fusion/op whose computation holds a dot or convolution
  pallas    — tpu_custom_call (the fused attention fwd/bwd kernels)
  elementwise — fusion with no dot/conv/reduce-window and no custom call
  copy      — copy/transpose/bitcast at top level
  other     — everything else (rng, reduce, infeed, ...)

Usage:  python benchmarks/step_itemize.py [--batch 128] [--iters 8]
Prints a per-bucket table and the top-10 single ops.
"""

import argparse
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def classify_hlo(hlo_text):
    """Map executed-op name -> bucket, from optimized HLO text.

    Fusion instructions name their called computation (``calls=%fused_X``
    or a ``%fused_computation.N`` body); we scan each computation body
    for dot/convolution. Top-level ops classify by opcode.
    """
    # computation name -> set of opcodes appearing in its body
    comp_ops = {}
    cur = None
    for line in hlo_text.splitlines():
        m = re.match(r"\s*(?:ENTRY\s+)?%?([\w.\-]+)\s*\([^)]*\)\s*->", line)
        if m and "=" not in line.split("->")[0]:
            cur = m.group(1)
            comp_ops.setdefault(cur, set())
            continue
        if cur is None:
            continue
        m = re.search(r"=\s*[\w\[\],{}:\s]*?\b([a-z][\w\-]*)\(", line)
        if m:
            comp_ops[cur].add(m.group(1))
    # instruction name -> bucket
    inst_bucket = {}
    for line in hlo_text.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*[\w\[\],{}\s/]*?\b"
                     r"([a-z][\w\-]*)\(", line)
        if not m:
            continue
        name, op = m.groups()
        if op == "fusion":
            mc = re.search(r"calls=%?([\w.\-]+)", line)
            body = comp_ops.get(mc.group(1), set()) if mc else set()
            if body & {"dot", "convolution"}:
                inst_bucket[name] = "matmul"
            elif "custom-call" in body:
                inst_bucket[name] = "pallas"
            else:
                inst_bucket[name] = "elementwise"
        elif op == "custom-call":
            inst_bucket[name] = "pallas" if "tpu_custom_call" in line else "other"
        elif op in ("dot", "convolution"):
            inst_bucket[name] = "matmul"
        elif op in ("copy", "transpose", "bitcast", "reshape"):
            inst_bucket[name] = "copy"
        elif op in ("rng", "rng-bit-generator"):
            inst_bucket[name] = "rng"
        else:
            inst_bucket[name] = "other"
    return inst_bucket


def build_step(jax, batch):
    from kmbart_tpu.config import bart_base_config
    from kmbart_tpu.models.conditional import (conditional_loss,
                                               init_conditional_params)
    from kmbart_tpu.parallel.train_step import build_train_step
    from kmbart_tpu.training.adamw import adamw
    from kmbart_tpu.training.state import TrainState

    cfg = bart_base_config()
    params = init_conditional_params(jax.random.PRNGKey(0), cfg)

    def loss_fn(p, b, r):
        loss, _ = conditional_loss(p, cfg, b, train=True, rng=r)
        return loss, {}

    step = build_train_step(loss_fn, adamw(lr=1e-5), donate=True)
    state = TrainState.create(params)
    rng = np.random.default_rng(0)
    B = batch
    ids = rng.integers(4, 50000, (B, 72)).astype(np.int32)
    ids[:, 1:31] = cfg.img_feat_id
    dec = rng.integers(4, 50000, (B, 40)).astype(np.int32)
    dev_batch = jax.device_put({
        "input_ids": ids,
        "attention_mask": np.ones((B, 72), np.int32),
        "image_features": rng.normal(size=(B, cfg.max_img_num,
                                           cfg.image_feature_size)
                                     ).astype(np.float32),
        "decoder_input_ids": dec,
        "decoder_attention_mask": np.ones((B, 40), np.int32),
        "labels": dec.copy(),
    })
    return step, state, dev_batch, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    from kmbart_tpu.utils.xplane import op_breakdown, read_xspace

    step, state, dev_batch, cfg = build_step(jax, args.batch)
    key = jax.random.PRNGKey(0)

    # optimized HLO of the exact executable we profile (build_train_step
    # returns a jitted callable, so .lower() reflects the real step)
    hlo = step.lower(state, dev_batch, key).compile().as_text()
    inst_bucket = classify_hlo(hlo)

    state, m = step(state, dev_batch, key)
    float(m["loss"])  # compile + warm
    tmp = tempfile.mkdtemp(prefix="itemize_")
    jax.profiler.start_trace(tmp)
    for _ in range(args.iters):
        state, m = step(state, dev_batch, key)
    float(m["loss"])
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    planes = read_xspace(sorted(paths)[-1])
    rows = op_breakdown(planes, plane_filter=("/device:TPU",))

    buckets, unmatched = {}, 0.0
    for name, us, cnt in rows:
        base = name.split(".")[0] if name not in inst_bucket else name
        b = inst_bucket.get(name) or inst_bucket.get(base)
        if b is None:
            # executed-op names may carry suffixes; try prefix match
            hits = [v for k, v in inst_bucket.items() if name.startswith(k)]
            b = hits[0] if hits else None
        if b is None:
            unmatched += us
            b = "other"
        buckets[b] = buckets.get(b, 0.0) + us

    per_iter = {k: v / args.iters / 1e3 for k, v in buckets.items()}
    total = sum(per_iter.values())
    print(f"device step total: {total:.2f} ms  (batch {args.batch}, "
          f"{args.iters} iters)")
    for k, v in sorted(per_iter.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<12} {v:7.2f} ms  ({100 * v / total:4.1f}%)")
    if unmatched:
        print(f"  [unmatched-by-HLO-join: {unmatched / args.iters / 1e3:.2f}"
              " ms counted in 'other']")
    print("\ntop single ops (per-iter ms):")
    for name, us, cnt in rows[:10]:
        print(f"  {us / args.iters / 1e3:7.3f}  x{cnt // args.iters:<3} "
              f"{inst_bucket.get(name, '?'):<11} {name[:80]}")


if __name__ == "__main__":
    main()
