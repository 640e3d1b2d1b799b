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


def test_native_meteor_align():
    # stage 0 matrix: hyp0<->ref0, hyp1<->ref1 contiguous; stage 1: hyp3<->ref2
    match = np.zeros((2, 4, 3), np.uint8)
    match[0, 0, 0] = match[0, 1, 1] = 1
    match[1, 3, 2] = 1
    h_stage, align, chunks = _native.meteor_align(match)
    np.testing.assert_array_equal(h_stage, [0, 0, -1, 1])
    np.testing.assert_array_equal(align, [0, 1, -1, 2])
    assert chunks == 2


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
