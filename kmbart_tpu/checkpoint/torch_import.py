"""PyTorch checkpoint import without torch: read ``pytorch_model.bin`` and
map it onto this framework's parameter pytree.

Parity target: ``FromPretrainedMixin`` (src/model/mixins.py:458-883) —
in particular the **partial load** (mixins.py:511-530): parameters named in
``config.partial_load`` may be shape-mismatched and only the overlapping
slice is copied (``param[tuple(map(slice, input.size()))].copy_(input)``).
That is what lets facebook/bart-base (50265-row embeddings) initialise a
50320-row multimodal vocabulary.

The ``.bin`` reader handles both formats torch.save has used: the zip
container (torch >= 1.6: ``data.pkl`` + one file per storage) and the
legacy sequential-pickle stream. No torch import required.
"""

import io
import os
import pickle
import struct
import zipfile

import numpy as np

_DTYPES = {
    "FloatStorage": np.float32, "DoubleStorage": np.float64,
    "HalfStorage": np.float16, "LongStorage": np.int64,
    "IntStorage": np.int32, "ShortStorage": np.int16,
    "CharStorage": np.int8, "ByteStorage": np.uint8,
    "BoolStorage": np.bool_, "BFloat16Storage": None,  # handled specially
}


class _Storage:
    def __init__(self, dtype_name, key, numel):
        self.dtype_name = dtype_name
        self.key = key
        self.numel = numel
        self.data = None  # filled after load


class _LazyTensor:
    """Deferred tensor view: zip checkpoints parse the pickle before the
    storage payloads are available, so materialisation happens later."""

    def __init__(self, storage, offset, size, stride):
        self.storage, self.offset = storage, offset
        self.size, self.stride = tuple(size), tuple(stride)

    def materialize(self):
        arr = self.storage.data
        if arr is None:
            raise ValueError(f"storage {self.storage.key} not loaded")
        if not self.size:
            return arr[self.offset].copy() if arr.ndim else arr.copy()
        itemsize = arr.dtype.itemsize
        flat = arr[self.offset:]
        return np.lib.stride_tricks.as_strided(
            flat, shape=self.size,
            strides=tuple(s * itemsize for s in self.stride)).copy()


def _rebuild_tensor(storage, storage_offset, size, stride, *args):
    return _LazyTensor(storage, storage_offset, size, stride)


def _bf16_to_f32(raw):
    u16 = np.frombuffer(raw, dtype=np.uint16)
    u32 = u16.astype(np.uint32) << 16
    return u32.view(np.float32)


class _Unpickler(pickle.Unpickler):
    def __init__(self, f, storages):
        super().__init__(f, encoding="latin1")
        self._storages = storages

    def persistent_load(self, pid):
        # ('storage', storage_type, key, location, numel)
        assert pid[0] == "storage"
        typename = getattr(pid[1], "__name__", str(pid[1]))
        st = _Storage(typename, pid[2], pid[4])
        self._storages.append(st)
        return st

    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2" or name == "_rebuild_tensor":
            return _rebuild_tensor
        if name.endswith("Storage"):
            class _T:  # a stand-in type whose __name__ carries the dtype
                pass
            _T.__name__ = name
            return _T
        if module == "collections" and name == "OrderedDict":
            return dict
        if name == "_rebuild_parameter":
            return lambda data, requires_grad, hooks: data
        # anything else (device objects, dtypes) -> inert placeholder
        return lambda *a, **k: None


def _decode_storage(st: _Storage, raw: bytes):
    if st.dtype_name == "BFloat16Storage":
        st.data = _bf16_to_f32(raw)
    else:
        st.data = np.frombuffer(raw, dtype=_DTYPES[st.dtype_name]).copy()


def load_torch_checkpoint(path):
    """Read a torch-saved state dict -> {name: np.ndarray} (no torch)."""
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:2] == b"PK":  # zip container (torch >= 1.6)
        storages = []
        with zipfile.ZipFile(path) as zf:
            pkl_name = next(n for n in zf.namelist() if n.endswith("data.pkl"))
            root = pkl_name[: -len("data.pkl")]
            with zf.open(pkl_name) as f:
                result = _Unpickler(f, storages).load()
            for st in storages:
                with zf.open(root + "data/" + st.key) as f:
                    _decode_storage(st, f.read())
        return _finalize(result)

    # legacy format: magic, protocol, sys_info, then the pickled obj,
    # then storage keys + raw data
    with open(path, "rb") as f:
        up = pickle.Unpickler(f)
        magic = up.load()
        if magic != 0x1950A86A20F9469CFC6C:
            raise ValueError("not a torch checkpoint")
        up.load()  # protocol
        up.load()  # sys info
        storages = []
        result = _Unpickler(f, storages).load()
        key_order = pickle.Unpickler(f).load()
        by_key = {st.key: st for st in storages}
        for key in key_order:
            st = by_key[key]
            itemsize = (2 if st.dtype_name in ("HalfStorage", "BFloat16Storage")
                        else np.dtype(_DTYPES.get(st.dtype_name, np.float32)).itemsize)
            (numel,) = struct.unpack("<q", f.read(8))
            _decode_storage(st, f.read(numel * itemsize))
    return _finalize(result)


def _finalize(obj):
    """Materialise lazy tensors; flatten nested state dicts to dotted names."""
    out = {}

    def walk(prefix, cur):
        if isinstance(cur, dict):
            for k, v in cur.items():
                walk(f"{prefix}{k}." if isinstance(v, dict) else prefix + str(k), v)
        elif isinstance(cur, _LazyTensor):
            out[prefix] = cur.materialize()
        elif isinstance(cur, np.ndarray):
            out[prefix] = cur
        elif isinstance(cur, _Storage):
            out[prefix] = cur.data

    walk("", obj)
    return out


# ---------------------------------------------------------------------------
# name mapping: torch state dict <-> framework pytree
# ---------------------------------------------------------------------------

def _partial_copy(dst: np.ndarray, src: np.ndarray):
    """Reference partial load (mixins.py:526-530): copy the overlapping
    top-left slice of src into dst."""
    out = np.array(dst, copy=True)
    idx = tuple(slice(0, min(a, b)) for a, b in zip(dst.shape, src.shape))
    out[idx] = src[idx]
    return out


def _assign(tree_leaf, value, name, partial_load, report):
    value = np.asarray(value, dtype=np.float32)
    if tuple(tree_leaf.shape) != tuple(value.shape):
        if name in partial_load:
            report.append(f"partially loaded {name} {value.shape} => {tree_leaf.shape}")
            return _partial_copy(np.asarray(tree_leaf), value)
        raise ValueError(
            f"size mismatch for {name}: checkpoint {value.shape} vs model {tree_leaf.shape}")
    return value


def state_dict_to_pytree(sd, cfg, params, strict=False):
    """Map a torch-layout state dict onto an initialised parameter pytree.

    ``params`` provides the target shapes (and any values the checkpoint does
    not cover keep their initialisation, mirroring from_pretrained's
    missing-key behaviour). torch Linear weights [out, in] are transposed;
    per-layer tensors are stacked onto the leading layer axis.
    Returns (new_params, report_lines).
    """
    import jax.numpy as jnp

    partial = set(cfg.partial_load)
    report = []
    sd = dict(sd)
    # tolerate a missing "model." prefix (base-model checkpoints)
    if sd and not any(k.startswith("model.") for k in sd) and \
            any(k.startswith(("encoder.", "decoder.", "shared.")) for k in sd):
        sd = {"model." + k: v for k, v in sd.items()}

    used = set()

    def take(name):
        used.add(name)
        return sd.get(name)

    def linear(name, transpose=True):
        w = take(name + ".weight")
        b = take(name + ".bias")
        if w is not None and transpose:
            w = np.asarray(w).T
        return w, b

    new = {"model": {k: v for k, v in params["model"].items()}}
    model = new["model"]

    def set_path(d, path, name, value):
        if value is None:
            return
        *parents, leaf = path
        cur = d
        for p in parents:
            cur = cur[p]
        cur[leaf] = jnp.asarray(
            _assign(cur[leaf], value, name, partial, report))

    # shared embedding (+ tied copies are ignored)
    set_path(model, ["shared"], "model.shared.weight", take("model.shared.weight"))
    used.update({"model.encoder.embed_tokens.weight",
                 "model.decoder.embed_tokens.weight"})

    for side in ("encoder", "decoder"):
        sdict = dict(model[side])
        model[side] = sdict
        set_path(model, [side, "embed_positions"],
                 f"model.{side}.embed_positions.weight",
                 take(f"model.{side}.embed_positions.weight"))
        if "layernorm_embedding" in sdict:
            sdict["layernorm_embedding"] = dict(sdict["layernorm_embedding"])
            set_path(model, [side, "layernorm_embedding", "scale"],
                     f"model.{side}.layernorm_embedding.weight",
                     take(f"model.{side}.layernorm_embedding.weight"))
            set_path(model, [side, "layernorm_embedding", "bias"],
                     f"model.{side}.layernorm_embedding.bias",
                     take(f"model.{side}.layernorm_embedding.bias"))
        if side == "encoder":
            w, b = linear("model.encoder.embed_images.linear")
            sdict["embed_images"] = dict(sdict["embed_images"])
            set_path(model, [side, "embed_images", "kernel"],
                     "model.encoder.embed_images.linear.weight", w)
            set_path(model, [side, "embed_images", "bias"],
                     "model.encoder.embed_images.linear.bias", b)

        n_layers = (cfg.encoder_layers if side == "encoder" else cfg.decoder_layers)
        layers = {k: (dict(v) if isinstance(v, dict) else v)
                  for k, v in sdict["layers"].items()}
        sdict["layers"] = layers

        def stack_attn(attn_key, torch_key):
            block = dict(layers[attn_key])
            for proj, ours in (("q_proj", "q"), ("k_proj", "k"),
                               ("v_proj", "v"), ("out_proj", "o")):
                ws, bs = [], []
                missing = False
                for i in range(n_layers):
                    base = f"model.{side}.layers.{i}.{torch_key}.{proj}"
                    w, b = linear(base)
                    if w is None:
                        missing = True
                        break
                    ws.append(w)
                    bs.append(b)
                if missing:
                    continue
                block[f"{ours}_kernel"] = jnp.asarray(_assign(
                    block[f"{ours}_kernel"], np.stack(ws),
                    f"{side}.{torch_key}.{proj}.weight", partial, report))
                block[f"{ours}_bias"] = jnp.asarray(_assign(
                    block[f"{ours}_bias"], np.stack(bs),
                    f"{side}.{torch_key}.{proj}.bias", partial, report))
            layers[attn_key] = block

        def stack_ln(our_key, torch_key):
            block = dict(layers[our_key])
            ws, bs = [], []
            for i in range(n_layers):
                w = take(f"model.{side}.layers.{i}.{torch_key}.weight")
                b = take(f"model.{side}.layers.{i}.{torch_key}.bias")
                if w is None:
                    return
                ws.append(w)
                bs.append(b)
            block["scale"] = jnp.asarray(np.stack(ws).astype(np.float32))
            block["bias"] = jnp.asarray(np.stack(bs).astype(np.float32))
            layers[our_key] = block

        def stack_fc(our_prefix, torch_name):
            ws, bs = [], []
            for i in range(n_layers):
                w, b = linear(f"model.{side}.layers.{i}.{torch_name}")
                if w is None:
                    return
                ws.append(w)
                bs.append(b)
            layers[f"{our_prefix}_kernel"] = jnp.asarray(
                np.stack(ws).astype(np.float32))
            layers[f"{our_prefix}_bias"] = jnp.asarray(
                np.stack(bs).astype(np.float32))

        stack_attn("self_attn", "self_attn")
        stack_ln("self_attn_layer_norm", "self_attn_layer_norm")
        if side == "decoder":
            stack_attn("encoder_attn", "encoder_attn")
            stack_ln("encoder_attn_layer_norm", "encoder_attn_layer_norm")
        stack_fc("fc1", "fc1")
        stack_fc("fc2", "fc2")
        stack_ln("final_layer_norm", "final_layer_norm")

    # heads + final_logits_bias at the top level
    for key in params:
        if key == "model":
            continue
        if key == "final_logits_bias":
            v = take("final_logits_bias")
            if v is not None:
                new[key] = jnp.asarray(_assign(
                    params[key], np.asarray(v).reshape(-1),
                    "final_logits_bias", partial, report))
            else:
                new[key] = params[key]
        elif key.endswith("_head"):
            head = dict(params[key])
            for ours, theirs in (("dense_kernel", "dense.weight"),
                                 ("dense_bias", "dense.bias"),
                                 ("out_kernel", "out_proj.weight"),
                                 ("out_bias", "out_proj.bias")):
                v = take(f"{key}.{theirs}")
                if v is not None:
                    if ours.endswith("kernel"):
                        v = np.asarray(v).T
                    head[ours] = jnp.asarray(_assign(
                        head[ours], v, f"{key}.{theirs}", partial, report))
            new[key] = head
        else:
            new[key] = params[key]

    unexpected = [k for k in sd if k not in used]
    if strict and unexpected:
        raise ValueError(f"unexpected keys: {unexpected[:10]}")
    if unexpected:
        report.append(f"unused checkpoint keys: {len(unexpected)}")
    return new, report


def pytree_to_state_dict(params, cfg):
    """Framework pytree -> torch-layout numpy state dict (for export and for
    round-trip tests). Inverse of state_dict_to_pytree."""
    sd = {}
    model = params["model"]
    sd["model.shared.weight"] = np.asarray(model["shared"])
    sd["model.encoder.embed_tokens.weight"] = sd["model.shared.weight"]
    sd["model.decoder.embed_tokens.weight"] = sd["model.shared.weight"]
    for side in ("encoder", "decoder"):
        s = model[side]
        n_layers = cfg.encoder_layers if side == "encoder" else cfg.decoder_layers
        sd[f"model.{side}.embed_positions.weight"] = np.asarray(s["embed_positions"])
        if "layernorm_embedding" in s:
            sd[f"model.{side}.layernorm_embedding.weight"] = np.asarray(
                s["layernorm_embedding"]["scale"])
            sd[f"model.{side}.layernorm_embedding.bias"] = np.asarray(
                s["layernorm_embedding"]["bias"])
        if side == "encoder":
            sd["model.encoder.embed_images.linear.weight"] = np.asarray(
                s["embed_images"]["kernel"]).T
            sd["model.encoder.embed_images.linear.bias"] = np.asarray(
                s["embed_images"]["bias"])
        L = s["layers"]
        for i in range(n_layers):
            base = f"model.{side}.layers.{i}"
            for attn_key, torch_key in ((("self_attn",) * 2),
                                        *((("encoder_attn",) * 2,)
                                          if side == "decoder" else ())):
                for proj, ours in (("q_proj", "q"), ("k_proj", "k"),
                                   ("v_proj", "v"), ("out_proj", "o")):
                    sd[f"{base}.{torch_key}.{proj}.weight"] = np.asarray(
                        L[attn_key][f"{ours}_kernel"][i]).T
                    sd[f"{base}.{torch_key}.{proj}.bias"] = np.asarray(
                        L[attn_key][f"{ours}_bias"][i])
            for ln in (("self_attn_layer_norm",)
                       + (("encoder_attn_layer_norm",) if side == "decoder" else ())
                       + ("final_layer_norm",)):
                sd[f"{base}.{ln}.weight"] = np.asarray(L[ln]["scale"][i])
                sd[f"{base}.{ln}.bias"] = np.asarray(L[ln]["bias"][i])
            sd[f"{base}.fc1.weight"] = np.asarray(L["fc1_kernel"][i]).T
            sd[f"{base}.fc1.bias"] = np.asarray(L["fc1_bias"][i])
            sd[f"{base}.fc2.weight"] = np.asarray(L["fc2_kernel"][i]).T
            sd[f"{base}.fc2.bias"] = np.asarray(L["fc2_bias"][i])

    if "final_logits_bias" in params:
        sd["final_logits_bias"] = np.asarray(params["final_logits_bias"])[None, :]
    for key in params:
        if key.endswith("_head"):
            h = params[key]
            sd[f"{key}.dense.weight"] = np.asarray(h["dense_kernel"]).T
            sd[f"{key}.dense.bias"] = np.asarray(h["dense_bias"])
            sd[f"{key}.out_proj.weight"] = np.asarray(h["out_kernel"]).T
            sd[f"{key}.out_proj.bias"] = np.asarray(h["out_bias"])
    return sd
