"""C++ native-kernel tests (skipped when no toolchain is available)."""

import numpy as np
import pytest

from kmbart_tpu import _native

pytestmark = pytest.mark.skipif(not _native.available(),
                                reason="native library unavailable")


def test_native_nms_matches_python(np_rng):
    from tests.test_vision import _np_nms
    for _ in range(5):
        n = 60
        xy = np_rng.uniform(0, 80, (n, 2))
        wh = np_rng.uniform(5, 40, (n, 2))
        boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
        scores = np_rng.random(n).astype(np.float32)
        ours = _native.nms(boxes, scores, 0.5)
        ref = _np_nms(boxes, scores, 0.5)
        np.testing.assert_array_equal(np.sort(ours), np.sort(ref))


def test_native_bleu_counts():
    hyp = np.asarray([1, 2, 3, 4, 1, 5], np.int32)   # "the cat sat on the mat"
    ref = [np.asarray([1, 2, 6, 4, 1, 5], np.int32)]  # "the cat is on the mat"
    correct, guess = _native.bleu_counts(hyp, ref, max_n=4)
    np.testing.assert_array_equal(correct, [5, 3, 1, 0])
    np.testing.assert_array_equal(guess, [6, 5, 4, 3])


def test_native_meteor_resolve():
    # candidates: hyp0->ref1, hyp1->{ref0, ref2}; the chunk-minimizing
    # resolution keeps (0->1, 1->2), one chunk
    cands = np.asarray([[0, 1, 1, 1, 0], [1, 1, 0, 1, 0], [1, 1, 2, 1, 0]],
                       np.int32)
    idx = _native.meteor_resolve(cands, rn=3)
    assert idx == [0, 2]
    # rn > 63 -> native refuses, caller falls back to Python
    assert _native.meteor_resolve(cands, rn=70) is None


def test_native_meteor_resolve_matches_python_fuzz(np_rng):
    """Native beam resolution must equal the pure-Python resolver on random
    candidate sets (spans included)."""
    from kmbart_tpu.eval.meteor import Meteor
    for _ in range(25):
        hn, rn = int(np_rng.integers(1, 14)), int(np_rng.integers(1, 14))
        cands = []
        for _ in range(int(np_rng.integers(0, 18))):
            i = int(np_rng.integers(0, hn))
            n = int(np_rng.integers(1, min(3, hn - i) + 1))
            j = int(np_rng.integers(0, rn))
            m = int(np_rng.integers(1, min(3, rn - j) + 1))
            cands.append((i, n, j, m, int(np_rng.integers(0, 4))))
        cands = sorted(set(cands))
        # call the Python loop directly by disabling the native fast path
        import kmbart_tpu._native as nat
        lib, nat._lib = nat._lib, None
        avail = nat.available
        nat.available = lambda: False
        try:
            py = Meteor._resolve(cands, rn)
        finally:
            nat._lib = lib
            nat.available = avail
        idx = _native.meteor_resolve(np.asarray(cands, np.int32).reshape(-1, 5),
                                     rn)
        native = [cands[k] for k in idx]
        assert sorted(native) == sorted(py), (cands, rn, native, py)


def test_native_gather_pad_rows(np_rng):
    src = np_rng.normal(size=(10, 5)).astype(np.float32)
    offsets = np.asarray([0, 4, 7], np.int64)
    counts = np.asarray([4, 3, 3], np.int32)
    out = _native.gather_pad_rows(src, offsets, counts, max_rows=4)
    assert out.shape == (3, 4, 5)
    np.testing.assert_array_equal(out[0], src[0:4])
    np.testing.assert_array_equal(out[1, :3], src[4:7])
    np.testing.assert_array_equal(out[1, 3], 0.0)


def test_feature_cache_roundtrip(fixture_dataset, tmp_path):
    import os
    from kmbart_tpu.data.feature_cache import FeatureCache, pack_split
    vcg = os.path.join(fixture_dataset, "vcg")
    index = pack_split(vcg, "train", out_dir=str(tmp_path))
    cache = FeatureCache(str(tmp_path), "train")
    img_id = next(iter(index))
    feats, scores = cache.get(img_id)
    import pickle
    with open(os.path.join(vcg, "train", img_id + ".pkl"), "rb") as f:
        raw = pickle.load(f)
    np.testing.assert_allclose(feats[:, :-4], raw["image_features"])
    np.testing.assert_allclose(feats[:, -4:], raw["boxes"])
    np.testing.assert_allclose(scores, raw["mrm_labels"])
    batch, counts = cache.gather_batch(list(index)[:3], max_rows=6)
    assert batch.shape == (3, 6, feats.shape[1])
    np.testing.assert_array_equal(batch[0, :counts[0]], cache.get(list(index)[0])[0][:6])


def test_dataset_uses_packed_cache(fixture_dataset):
    """COCODataset/VCGDataset transparently read the packed cache when the
    split has been packed (identical outputs to the pickle path)."""
    import os
    from kmbart_tpu.data.datasets import VCGDataset
    from kmbart_tpu.data.feature_cache import pack_split

    vcg = os.path.join(fixture_dataset, "vcg")
    plain = VCGDataset(vcg, split="train", use_feature_cache=False)
    ref = plain[0]
    pack_split(vcg, "train")
    cached = VCGDataset(vcg, split="train")  # auto-detects the pack
    assert cached._cache is not None
    got = cached[0]
    np.testing.assert_allclose(got["image_features"], ref["image_features"],
                               rtol=1e-6)
    np.testing.assert_allclose(got["mrm_labels"], ref["mrm_labels"], rtol=1e-6)
