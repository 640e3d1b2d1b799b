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

``--matmuls`` additionally ranks every matmul-bearing fusion by the time
it LOSES vs the v5e bf16 MXU peak (197 TF/s): per fusion, the dot FLOPs
are summed from the optimized-HLO operand shapes (2 x out_elems x k per
dot), joined against the xplane time, and the worst offenders printed
with their shapes and achieved TF/s — the round-4 verdict's missing
table for the 76%-internal-efficiency matmul slice.
"""

import argparse
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


_INST_RE = re.compile(
    # name = <shape tokens, incl. TPU tiled layouts like {2,1,0:T(8,128)}
    # and tuple shapes — skipped as WHOLE whitespace-delimited tokens,
    # since layout annotations contain ':'/'('/')'> opcode(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(?:\S+\s+)*?([a-z][\w\-]*)\(")
_HDR_RE = re.compile(r"^\s*(?:ENTRY\s+)?%?([\w.\-]+)\s*(\(.*\))\s*->")


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
        m = _HDR_RE.match(line)
        if m and "=" not in line.split("->")[0]:
            cur = m.group(1)
            comp_ops.setdefault(cur, set())
            continue
        if cur is None:
            continue
        m = _INST_RE.match(line)
        if m:
            comp_ops[cur].add(m.group(2))
    # instruction name -> bucket
    inst_bucket = {}
    for line in hlo_text.splitlines():
        m = _INST_RE.match(line)
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


V5E_PEAK_TFS = 197.0  # bf16 MXU peak, TF/s (bench.py V5E_PEAK_FLOPS)

_DEF_RE = re.compile(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*"
                     r"(\w+)\[([\d,]*)\]")
_PARAM_RE = re.compile(r"([\w.\-]+):\s*(\w+)\[([\d,]*)\]")
_COMP_RE = _HDR_RE
_OPND_RE = re.compile(r"\bdot\(\s*%?([\w.\-]+)\s*,\s*%?([\w.\-]+)")
_LHS_C_RE = re.compile(r"lhs_contracting_dims=\{([\d,]+)\}")
_CONV_OPND_RE = re.compile(r"\bconvolution\(\s*%?([\w.\-]+)\s*,\s*%?([\w.\-]+)")
_DIMLBL_RE = re.compile(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)")


def _dims(s):
    return [int(x) for x in s.split(",") if x]


def _dot_flops(line, scope):
    """FLOPs + a compact shape tag for one optimized-HLO dot line.

    2 x out_elems x k: batch dims appear in the output shape, so the
    product over output elements times the contracted extent covers
    batched and plain dots alike. Operand shapes come from the
    computation-scope name->shape map (dot lines name operands only).
    """
    md = _DEF_RE.match(line)
    mo = _OPND_RE.search(line)
    mc = _LHS_C_RE.search(line)
    if not (md and mo and mc):
        return None
    out_dims = _dims(md.group(3))
    lhs = scope.get(mo.group(1))
    rhs = scope.get(mo.group(2))
    if lhs is None:
        return None
    k = 1
    for ax in (int(a) for a in mc.group(1).split(",")):
        if ax < len(lhs[1]):
            k *= lhs[1][ax]
    out_elems = 1
    for d_ in out_dims:
        out_elems *= d_
    rtag = f"x[{','.join(map(str, rhs[1]))}]" if rhs else ""
    tag = (f"{lhs[0]}[{','.join(map(str, lhs[1]))}]{rtag}"
           f"->[{md.group(3)}]")
    return 2.0 * out_elems * k, tag


def _conv_flops(line, scope):
    """FLOPs + shape tag for one optimized-HLO convolution line.

    The TPU backend canonicalizes every dot_general into a convolution
    (``dim_labels=b0f_io0->b0f``, window size 1), so matmuls appear as
    convs in on-chip HLO. Contracted extent = rhs 'i' dim x the kernel
    spatial dims (labels '0','1',... in the rhs label string); FLOPs =
    2 x out_elems x k covers both matmuls-as-convs and real convs.
    """
    md = _DEF_RE.match(line)
    mo = _CONV_OPND_RE.search(line)
    ml = _DIMLBL_RE.search(line)
    if not (md and mo and ml):
        return None
    rhs = scope.get(mo.group(2))
    lhs = scope.get(mo.group(1))
    if rhs is None:
        return None
    rhs_lbl = ml.group(2)
    if len(rhs_lbl) != len(rhs[1]):
        return None
    k = 1
    for pos, ch in enumerate(rhs_lbl):
        if ch == "i" or ch.isdigit():
            k *= rhs[1][pos]
    out_elems = 1
    for d_ in _dims(md.group(3)):
        out_elems *= d_
    ltag = f"{lhs[0]}[{','.join(map(str, lhs[1]))}]" if lhs else "?"
    tag = (f"{ltag}x[{','.join(map(str, rhs[1]))}]"
           f"->[{md.group(3)}]")
    return 2.0 * out_elems * k, tag


def matmul_details(hlo_text):
    """instruction name -> (dot FLOPs summed over the fusion body, shape
    tags) for every matmul-bearing fusion / top-level dot."""
    comp_dots = {}   # computation name -> [(flops, tag), ...]
    inst_dots = {}   # dot instruction name -> (flops, tag)
    cur, scope = None, {}
    for line in hlo_text.splitlines():
        m = _COMP_RE.match(line)
        if m and "=" not in line.split("->")[0]:
            cur = m.group(1)
            comp_dots.setdefault(cur, [])
            # seed the scope with the computation's parameter shapes
            scope = {n: (t, _dims(d))
                     for n, t, d in _PARAM_RE.findall(m.group(2))}
            continue
        md = _DEF_RE.match(line)
        if md:
            scope[md.group(1)] = (md.group(2), _dims(md.group(3)))
        if cur is not None and (" dot(" in line or " convolution(" in line):
            d = (_dot_flops(line, scope) if " dot(" in line
                 else _conv_flops(line, scope))
            if d and md:
                comp_dots[cur].append(d)
                inst_dots[md.group(1)] = d
    details = {}
    for line in hlo_text.splitlines():
        m = _INST_RE.match(line)
        if not m:
            continue
        name, op = m.groups()
        if op == "fusion":
            mc = re.search(r"calls=%?([\w.\-]+)", line)
            dots = comp_dots.get(mc.group(1), []) if mc else []
            if dots:
                details[name] = (sum(f for f, _ in dots),
                                 [t for _, t in dots])
        elif op in ("dot", "convolution") and name in inst_dots:
            f, t = inst_dots[name]
            details[name] = (f, [t])
    return details


def all_instruction_names(hlo_text):
    """Every instruction name defined anywhere in the module — used to
    gate the fuzzy joins: an executed-op name that IS a real HLO
    instruction must only ever match itself (a non-matmul
    convert_reduce_fusion.133 must not inherit convert_reduce_fusion's
    FLOPs via the base-name fallback)."""
    names = set()
    for line in hlo_text.splitlines():
        m = _INST_RE.match(line)
        if m:
            names.add(m.group(1))
    return names


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
    ap.add_argument("--matmuls", action="store_true",
                    help="rank matmul fusions by time lost vs MXU peak")
    args = ap.parse_args()

    import jax
    from kmbart_tpu.utils.xplane import op_breakdown, read_xspace

    step, state, dev_batch, cfg = build_step(jax, args.batch)
    key = jax.random.PRNGKey(0)

    # optimized HLO of the exact executable we profile (build_train_step
    # returns a jitted callable, so .lower() reflects the real step)
    hlo = step.lower(state, dev_batch, key).compile().as_text()
    inst_bucket = classify_hlo(hlo)
    known = all_instruction_names(hlo)

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
        b = inst_bucket.get(name)
        if b is None and name not in known:
            # fuzzy matches only for names the HLO doesn't define
            # (xplane display suffixes); '.'-boundary, never prefix-of-
            # a-different-number (fusion.247 must NOT match fusion.24)
            b = inst_bucket.get(name.split(".")[0])
            if b is None:
                hits = [v for k, v in inst_bucket.items()
                        if name.startswith(k + ".")]
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

    if args.matmuls:
        details = matmul_details(hlo)
        ranked = []
        for name, us, cnt in rows:
            hit = details.get(name)
            if hit is None and name not in known:
                hit = details.get(name.split(".")[0])
                if hit is None:
                    cands = [v for k, v in details.items()
                             if name.startswith(k + ".")]
                    hit = cands[0] if cands else None
            if hit is None:
                continue
            flops, tags = hit
            per_call = cnt // args.iters or 1
            t_ms = us / args.iters / 1e3
            tfs = flops * per_call / (t_ms / 1e3) / 1e12 if t_ms else 0.0
            ideal_ms = flops * per_call / (V5E_PEAK_TFS * 1e12) * 1e3
            ranked.append((t_ms - ideal_ms, t_ms, tfs, per_call, name, tags))
        ranked.sort(reverse=True)
        print(f"\nworst matmul fusions (time lost vs {V5E_PEAK_TFS:.0f} TF/s"
              " peak, per-iter):")
        print(f"  {'lost_ms':>8} {'ms':>7} {'TF/s':>6} {'x':>4}  shapes")
        for lost, t_ms, tfs, n, name, tags in ranked[:12]:
            tag = "; ".join(tags[:2]) + (" …" if len(tags) > 2 else "")
            print(f"  {lost:8.3f} {t_ms:7.3f} {tfs:6.1f} {n:4d}  "
                  f"{tag[:90]}  [{name[:40]}]")
        tot = sum(r[1] for r in ranked)
        ideal = sum(r[1] - r[0] for r in ranked)
        if tot:
            print(f"  matmul total {tot:.2f} ms, ideal-at-peak {ideal:.2f} ms "
                  f"-> slice efficiency {100 * ideal / tot:.1f}%")
        else:
            print("  [no matmul fusions joined — HLO parse failure?]")


if __name__ == "__main__":
    main()
