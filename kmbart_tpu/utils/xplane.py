"""Minimal XPlane (jax.profiler trace) reader — no TF/proto deps.

``jax.profiler.start_trace`` writes ``*.xplane.pb`` (an ``XSpace`` proto).
The tensorboard profile plugin in this image cannot parse it (protobuf
version mismatch), so this module decodes the wire format directly and
aggregates per-op device time — the loop that drove every round-1/2
kernel optimization (BASELINE.md "decode optimization log").

Usage:
    from kmbart_tpu.utils.xplane import read_xspace, op_breakdown
    planes = read_xspace("trace/plugins/profile/<ts>/<host>.xplane.pb")
    for name, us, cnt in op_breakdown(planes)[:30]:
        print(f"{us:10.1f} us  x{cnt:<5d} {name}")

Wire schema (tensorflow/tsl xplane.proto):
    XSpace{ planes=1 }  XPlane{ id=1, name=2, lines=3, event_metadata=4(map),
    stat_metadata=5(map) }  XLine{ id=1, name=2, events=4 }
    XEvent{ metadata_id=1, offset_ps=2, duration_ps=3 }
    XEventMetadata{ id=1, name=2, display_name=4 }
"""


def _varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, i = _varint(buf, i)
        elif wire == 1:  # 64-bit
            val = buf[i:i + 8]
            i += 8
        elif wire == 2:  # length-delimited
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wire == 5:  # 32-bit
            val = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _parse_event(buf):
    meta = dur = 0
    for f, _, v in _fields(buf):
        if f == 1:
            meta = v
        elif f == 3:
            dur = v
    return meta, dur


def _parse_line(buf):
    name = ""
    events = []
    for f, _, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 4:
            events.append(_parse_event(v))
    return name, events


def _parse_event_metadata(buf):
    mid = 0
    name = disp = ""
    for f, _, v in _fields(buf):
        if f == 1:
            mid = v
        elif f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 4:
            disp = v.decode("utf-8", "replace")
    return mid, disp or name


def _parse_map_entry(buf, value_parser):
    key = None
    val = None
    for f, _, v in _fields(buf):
        if f == 1:
            key = v
        elif f == 2:
            val = value_parser(v)
    return key, val


def _parse_plane(buf):
    name = ""
    lines = []
    emeta = {}
    for f, _, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3:
            lines.append(_parse_line(v))
        elif f == 4:
            k, (mid, mname) = _parse_map_entry(v, _parse_event_metadata)
            emeta[k if k is not None else mid] = mname
    return {"name": name, "lines": lines, "event_metadata": emeta}


def read_xspace(path):
    """Parse an .xplane.pb file -> list of plane dicts."""
    with open(path, "rb") as f:
        buf = f.read()
    return [_parse_plane(v) for fld, _, v in _fields(buf) if fld == 1]


def op_breakdown(planes, plane_filter=("/device:TPU", "/device:CPU")):
    """Aggregate device-op time: [(op_name, total_us, count)] descending.

    Uses the per-plane "XLA Ops" lines (one event per executed HLO op).
    """
    total = {}
    count = {}
    for plane in planes:
        if not any(s in plane["name"] for s in plane_filter):
            continue
        for line_name, events in plane["lines"]:
            # Exact match: the device plane also carries an "Async XLA Ops"
            # line whose DMA events OVERLAP compute — summing it would
            # triple-count the step (observed 563 ms of async-copy inside a
            # 62 ms step on the axon runtime).
            if line_name != "XLA Ops":
                continue
            for meta_id, dur_ps in events:
                name = plane["event_metadata"].get(meta_id, str(meta_id))
                total[name] = total.get(name, 0) + dur_ps
                count[name] = count.get(name, 0) + 1
    rows = [(n, t / 1e6, count[n]) for n, t in total.items()]
    rows.sort(key=lambda r: -r[1])
    return rows


def group_breakdown(planes, groups=None, **kw):
    """Bucket op_breakdown rows by substring -> {bucket: total_us}."""
    if groups is None:
        groups = {
            "matmul": ("dot", "conv"),
            "elementwise/fusion": ("fusion", "add", "multiply", "select"),
            "copy/transpose": ("copy", "transpose", "bitcast", "reshape"),
            "reduce": ("reduce",),
            "rng": ("rng", "threefry"),
            "gather/scatter": ("gather", "scatter", "dynamic"),
        }
    out = {}
    for name, us, _ in op_breakdown(planes, **kw):
        low = name.lower()
        for bucket, keys in groups.items():
            if any(k in low for k in keys):
                out[bucket] = out.get(bucket, 0.0) + us
                break
        else:
            out["other"] = out.get("other", 0.0) + us
    return dict(sorted(out.items(), key=lambda kv: -kv[1]))


def main(argv=None):
    import argparse
    import glob
    p = argparse.ArgumentParser(description="xplane trace op breakdown")
    p.add_argument("path", help=".xplane.pb file or trace dir")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args(argv)
    path = args.path
    import os
    if os.path.isdir(path):
        hits = sorted(glob.glob(path + "/**/*.xplane.pb", recursive=True))
        if not hits:
            raise SystemExit(f"no .xplane.pb under {path}")
        path = hits[-1]
    planes = read_xspace(path)
    print(f"# {path}")
    for bucket, us in group_breakdown(planes).items():
        print(f"{us / 1e3:10.3f} ms  {bucket}")
    print()
    for name, us, cnt in op_breakdown(planes)[: args.top]:
        print(f"{us:12.1f} us  x{cnt:<6d} {name}")


if __name__ == "__main__":
    main()
