"""ctypes bindings for the C++ host kernels (native/kmbart_native.cpp).

Auto-builds with g++ on first import when the shared object is missing
(source-tree installs); every entry point has a pure-Python fallback, so
the framework works without a toolchain too.
"""

import ctypes
import os
import subprocess

import numpy as np

_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "kmbart_native.so")
_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "kmbart_native.cpp")

_lib = None


def _try_build():
    if not os.path.exists(_SRC):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded shared library, or None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.nms.restype = ctypes.c_int
    lib.meteor_align.restype = ctypes.c_int
    lib.bleu_counts.restype = None
    lib.gather_pad_rows.restype = None
    _lib = lib
    return _lib


def available():
    return get_lib() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def nms(boxes, scores, iou_threshold):
    """C++ NMS; returns kept indices sorted by descending score."""
    lib = get_lib()
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(boxes)
    keep = np.zeros(n, np.uint8)
    lib.nms(_ptr(boxes, ctypes.c_float), _ptr(scores, ctypes.c_float),
            ctypes.c_int(n), ctypes.c_float(float(iou_threshold)),
            _ptr(keep, ctypes.c_uint8))
    idx = np.nonzero(keep)[0]
    return idx[np.argsort(-scores[idx], kind="stable")]


def meteor_align(match):
    """match: bool [n_stages, hn, rn] stage-priority matrices ->
    (h_stage [hn], align [hn], chunks)."""
    lib = get_lib()
    match = np.ascontiguousarray(match, np.uint8)
    s, hn, rn = match.shape
    h_stage = np.empty(hn, np.int32)
    align = np.empty(hn, np.int32)
    chunks = lib.meteor_align(
        _ptr(match, ctypes.c_uint8), ctypes.c_int(s), ctypes.c_int(hn),
        ctypes.c_int(rn), _ptr(h_stage, ctypes.c_int32),
        _ptr(align, ctypes.c_int32))
    return h_stage, align, int(chunks)


def bleu_counts(hyp_tokens, ref_token_lists, max_n=4):
    """Clipped n-gram counts: (correct [max_n], guess [max_n])."""
    lib = get_lib()
    hyp = np.ascontiguousarray(hyp_tokens, np.int32)
    refs = np.ascontiguousarray(
        np.concatenate([np.asarray(r, np.int32) for r in ref_token_lists])
        if ref_token_lists else np.zeros(0, np.int32))
    ref_lens = np.asarray([len(r) for r in ref_token_lists], np.int32)
    correct = np.zeros(max_n, np.int64)
    guess = np.zeros(max_n, np.int64)
    lib.bleu_counts(_ptr(hyp, ctypes.c_int32), ctypes.c_int(len(hyp)),
                    _ptr(refs, ctypes.c_int32), _ptr(ref_lens, ctypes.c_int32),
                    ctypes.c_int(len(ref_lens)), ctypes.c_int(max_n),
                    _ptr(correct, ctypes.c_int64), _ptr(guess, ctypes.c_int64))
    return correct, guess


def gather_pad_rows(src, offsets, counts, max_rows):
    """Packed rows -> [batch, max_rows, feat] zero-padded batch."""
    lib = get_lib()
    src = np.ascontiguousarray(src, np.float32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    counts = np.ascontiguousarray(counts, np.int32)
    batch = len(offsets)
    feat = src.shape[1]
    dst = np.empty((batch, max_rows, feat), np.float32)
    lib.gather_pad_rows(_ptr(src, ctypes.c_float),
                        _ptr(offsets, ctypes.c_int64),
                        _ptr(counts, ctypes.c_int32), ctypes.c_int(batch),
                        ctypes.c_int(max_rows), ctypes.c_int(feat),
                        _ptr(dst, ctypes.c_float))
    return dst
