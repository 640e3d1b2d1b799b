"""Data-layer tests: BPE, condition packing, collator masking, datasets."""

import numpy as np
import pytest

from kmbart_tpu.data.collation import Collator
from kmbart_tpu.data.datasets import (
    COCODataset, ConcatDataset, ReasonDataset, VCGDataset, VGDataset)
from kmbart_tpu.data.loader import DataLoader, ShardedSampler


def test_bpe_roundtrip(tokenizer):
    base = tokenizer.get_base_tokenizer()
    text = "the person eats dinner, quickly!"
    ids = base.encode(text)
    assert base.decode(ids) == text
    # special tokens survive and are never split
    ids2 = base.encode("<intent><img_feat></img>")
    assert ids2 == [tokenizer.intent_id, tokenizer.img_feat_id,
                    tokenizer.end_img_id]


def test_bpe_real_merges(tmp_path):
    """Exercise the merge loop with a mini merge table."""
    import json
    from kmbart_tpu.data.bpe import ByteLevelBPE, bytes_to_unicode
    b2u = bytes_to_unicode()
    sp = b2u[ord(" ")]
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for ch in b2u.values():
        vocab.setdefault(ch, len(vocab))
    for tok in ("he", "hel", "hell", "hello", sp + "w", sp + "wo", "rl",
                "rld", sp + "world", "<mask>"):
        vocab.setdefault(tok, len(vocab))
    merges = ["#version: test", "h e", "he l", "hel l", "hell o",
              f"{sp} w", f"{sp}w o", "r l", "rl d", f"{sp}wo rld"]
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("\n".join(merges) + "\n")
    bpe = ByteLevelBPE(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
    toks = bpe.tokenize("hello world")
    assert toks == ["hello", sp + "world"]
    assert bpe.decode(bpe.encode("hello world")) == "hello world"


def _train_mini_bpe(corpus_words, n_merges):
    """Tiny deterministic BPE trainer (most-frequent pair, lexicographic
    tie-break) so the fuzz runs over a REAL layered merge table."""
    from collections import Counter
    from kmbart_tpu.data.bpe import bytes_to_unicode
    b2u = bytes_to_unicode()
    words = Counter()
    for w in corpus_words:
        words[tuple(b2u[b] for b in w.encode("utf-8"))] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for word, c in words.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (a, b), cnt = max(sorted(pairs.items()), key=lambda kv: kv[1])
        if cnt < 2:
            break
        merges.append((a, b))
        new_words = Counter()
        for word, c in words.items():
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_words[tuple(out)] += c
        words = new_words
    return merges


_FUZZ_WORDS = [
    "the", "a", "person", "man", "woman", "dog", "sitting", "on", "bench",
    "wants", "to", "eat", "dinner", "quickly", "because", "they", "are",
    "hungry", "before", "after", "intent", "image", "table", "running",
    "standing", "holding", "looking", "at", "with", "and", "in", "of",
]


def test_bpe_hf_parity_fuzz(tmp_path):
    """Fuzz our BPE token-for-token against transformers.BartTokenizer
    (slow) over the SAME vocab/merges: contractions, unicode categories,
    emoji, whitespace runs, leading spaces, digit/letter boundaries, and
    special-token splicing. Every real-data metric rides on byte-exact
    tokenization (ref: src/data/tokenization.py:2). VERDICT round-3 item 2."""
    import json
    transformers = pytest.importorskip("transformers")
    from kmbart_tpu.data.bpe import ByteLevelBPE, bytes_to_unicode

    # train a ~160-merge table over the fuzz word pool (with and without
    # the leading-space form, as GPT-2 pretokenization produces both)
    corpus = _FUZZ_WORDS * 3 + [" " + w for w in _FUZZ_WORDS] * 5 + [
        "n't", "'ll", "'ve", "'re", "'s", " 123", "2021", "...", "!!",
    ]
    merges = _train_mini_bpe(corpus, 160)
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for ch in bytes_to_unicode().values():
        vocab.setdefault(ch, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    vocab["<mask>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(
        json.dumps(vocab, ensure_ascii=False))
    (tmp_path / "merges.txt").write_text(
        "#version: fuzz\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n")

    ours = ByteLevelBPE(str(tmp_path / "vocab.json"),
                        str(tmp_path / "merges.txt"))
    hf = transformers.BartTokenizer(str(tmp_path / "vocab.json"),
                                    str(tmp_path / "merges.txt"))

    rng = np.random.default_rng(0)
    nasties = [
        "", " ", "  ", "\t", "\n", " \n\t ", "the  the", " leading space",
        "trailing space ", "don't can't won't it's we're they've i'll i'm",
        "naïve café jalapeño über señor",
        "日本語のテキスト", "русский текст", "مرحبا بالعالم",
        "emoji 😀🎉🚀 end", "mixed123words456", "1,000.50 at 5:30",
        "UPPER Case MiXeD", "a b", "dash-joined and under_scored",
        "!!!???...", "quote \"inside\" 'single'", "percent 50% & at&t",
        "​zero width", "ĠliteralGbyte", "ñ", "🤖", "ab\ncd\nef",
    ]
    cases = list(nasties)
    for _ in range(300):
        n = int(rng.integers(1, 12))
        words = [str(rng.choice(_FUZZ_WORDS)) for _ in range(n)]
        s = " ".join(words)
        r = rng.random()
        if r < 0.2:
            s = s + str(rng.choice([".", "!", "?", "...", ",", "'s"]))
        elif r < 0.35:
            s = " " + s
        elif r < 0.45:
            s = s.replace(" ", "  ", 1)
        elif r < 0.55:
            s = s.title()
        elif r < 0.65:
            s = s + " " + str(rng.integers(0, 9999))
        cases.append(s)
    for text in cases:
        ids_ours = ours.encode(text)
        ids_hf = hf.encode(text, add_special_tokens=False)
        assert ids_ours == ids_hf, (text, ids_ours, ids_hf)
        # byte-exact decode both ways (no cleanup so spacing is raw)
        assert (ours.decode(ids_ours, clean_up_tokenization_spaces=False)
                == hf.decode(ids_hf, clean_up_tokenization_spaces=False)), text

    # special-token splicing: same 16 added tokens on both sides
    from kmbart_tpu.data.tokenization import ADDED_TOKENS
    ours.add_special_tokens(list(ADDED_TOKENS))
    hf.add_special_tokens({"additional_special_tokens": [
        transformers.AddedToken(t, lstrip=False, rstrip=False,
                                normalized=False) for t in ADDED_TOKENS]})
    for t in ADDED_TOKENS:
        assert ours.convert_tokens_to_ids(t) == \
            hf.convert_tokens_to_ids(t), t
    splice_cases = [
        "<intent> the man wants to eat",
        "<img><img_feat><img_feat></img> a dog",
        "<event> person sitting </event><mlm> the dog </mlm>",
        "text<before>glued",
        "<caption> naïve café 😀 <cls>",
        " <after> leading space <img_feat> ",
        "<token1><token2><token3><region_caption>",
    ]
    for text in splice_cases:
        ids_ours = ours.encode(text)
        ids_hf = hf.encode(text, add_special_tokens=False)
        assert ids_ours == ids_hf, (text, ids_ours, ids_hf)


def test_encode_condition_layout(tokenizer):
    enc = tokenizer.encode_condition(
        task_type=["intent", "after"], img_num=[2, 0],
        event=["1 waits", ""], mlm=["eats food", "runs"])
    ids = enc["input_ids"]
    assert ids[0, 0] == tokenizer.intent_id
    assert ids[1, 0] == tokenizer.after_id
    assert (ids[0] == tokenizer.img_feat_id).sum() == 2
    assert (ids[1] == tokenizer.img_feat_id).sum() == 0
    assert enc["img_mask"].sum() == 2
    # masks cover the text between the markers, not the markers
    ev = np.nonzero(enc["event_mask"][0])[0]
    assert ids[0, ev[0] - 1] == tokenizer.begin_event_id
    assert ids[0, ev[-1] + 1] == tokenizer.end_event_id


def test_encode_label_split(tokenizer):
    out = tokenizer.encode_label(["eats"], img_num=[2])
    labels, dec = out["labels"][0], out["decoder_input_ids"][0]
    assert tokenizer.bos_token_id not in labels.tolist()
    assert tokenizer.eos_token_id not in dec.tolist()
    assert labels[0] == tokenizer.begin_img_id
    assert dec[3] == tokenizer.end_img_id and dec[4] == tokenizer.bos_token_id
    assert out["label_img_mask"].sum() == 2


def _entry(rng, task="intent", nimg=3, feat=20, C=7, idx=0):
    e = {"task_type": task, "labels": "the person eats dinner",
         "event": "1 sits at a table", "index": idx}
    if nimg:
        e["image_features"] = rng.normal(size=(nimg, feat)).astype(np.float32)
        e["mrm_labels"] = rng.dirichlet(np.ones(C), nimg).astype(np.float32)
    return e


def test_collator_static_shapes(tokenizer, np_rng):
    col = Collator(tokenizer, has_label=True, mlm_enabled=True,
                   mrm_enabled=True, mlm_probability=0.3, mrm_probability=0.3,
                   max_img_num=4, image_feature_size=20, num_mrm_labels=7,
                   rng=np.random.default_rng(1))
    b1 = col([_entry(np_rng, nimg=3), _entry(np_rng, nimg=0)])
    b2 = col([_entry(np_rng, nimg=4), _entry(np_rng, nimg=1),
              _entry(np_rng, nimg=2)])
    for k in ("input_ids", "labels", "decoder_input_ids", "mrm_soft_labels"):
        assert b1[k].shape[1:] == b2[k].shape[1:], k


def test_collator_mrm_semantics(tokenizer, np_rng):
    col = Collator(tokenizer, has_label=True, mlm_enabled=True,
                   mrm_enabled=True, mlm_probability=0.0, mrm_probability=1.0,
                   max_img_num=4, image_feature_size=20, num_mrm_labels=7,
                   rng=np.random.default_rng(2))
    entry = _entry(np_rng, nimg=3)
    orig_feats = entry["image_features"].copy()
    batch = col([entry])
    # p=1.0: every image slot masked -> input ids become <cls>
    img_span = batch["input_ids"] == tokenizer.cls_token_id
    assert img_span.sum() == 3
    # features zeroed except the 4 bbox dims
    np.testing.assert_array_equal(batch["image_features"][0, :3, :-4], 0.0)
    np.testing.assert_allclose(batch["image_features"][0, :3, -4:],
                               orig_feats[:, -4:])
    # decoder-side: labels carry <cls> at the mirrored positions with the
    # detector soft label attached; lm loss will ignore them via cls->-100
    assert batch["mrm_mask"].sum() == 3
    np.testing.assert_allclose(
        batch["mrm_soft_labels"][batch["mrm_mask"]],
        np.asarray(entry["mrm_labels"]), rtol=1e-6)


def test_collator_label_ignore_index(tokenizer, np_rng):
    col = Collator(tokenizer, has_label=True, max_img_num=4,
                   image_feature_size=20)
    batch = col([_entry(np_rng, nimg=2)])
    labels = batch["labels"][0]
    assert (labels != tokenizer.pad_token_id).all()
    assert (labels[labels >= 0] != tokenizer.begin_img_id).all()
    assert -100 in labels  # padding masked


def test_collator_vcg_event_swap(tokenizer, np_rng):
    """before/after/intent during MLM pretraining: event text moves to the
    <mlm> span (src/data/collation.py:86-89)."""
    col = Collator(tokenizer, has_label=True, mlm_enabled=True,
                   mlm_probability=0.0, max_img_num=4, image_feature_size=20,
                   rng=np.random.default_rng(3))
    batch = col([_entry(np_rng, task="intent", nimg=0)])
    ids = batch["input_ids"][0]
    begin_ev = np.nonzero(ids == tokenizer.begin_event_id)[0]
    end_ev = np.nonzero(ids == tokenizer.end_event_id)[0]
    assert end_ev[0] == begin_ev[0] + 1  # event emptied
    assert (ids == tokenizer.begin_mlm_id).sum() == 1


def test_collator_mlm_masks_only_mlm_span(tokenizer, np_rng):
    col = Collator(tokenizer, has_label=True, mlm_enabled=True,
                   mlm_probability=1.0, max_img_num=4, image_feature_size=20,
                   rng=np.random.default_rng(4))
    batch = col([_entry(np_rng, task="caption", nimg=0)])
    ids = batch["input_ids"][0]
    begin = np.nonzero(ids == tokenizer.begin_mlm_id)[0][0]
    end = np.nonzero(ids == tokenizer.end_mlm_id)[0][0]
    outside = np.concatenate([ids[:begin + 1], ids[end:]])
    assert tokenizer.mask_token_id not in outside.tolist()


def test_collator_drops_none_entries(tokenizer, np_rng):
    col = Collator(tokenizer, has_label=True, max_img_num=4,
                   image_feature_size=20)
    batch = col([_entry(np_rng), None, _entry(np_rng, idx=1)])
    assert batch["input_ids"].shape[0] == 2


def test_collator_invariant_checks(tokenizer):
    with pytest.raises(ValueError):
        Collator(tokenizer, has_label=False, mlm_enabled=True)
    with pytest.raises(ValueError):
        Collator(tokenizer, has_label=True, ap_enabled=True, mrm_enabled=False)


def test_datasets_and_vg(fixture_dataset, np_rng):
    import os
    vcg = VCGDataset(os.path.join(fixture_dataset, "vcg"), split="train")
    item = vcg[0]
    assert item["image_features"].shape[1] == 20
    assert item["task_type"] in ("intent", "before", "after")

    vcg_pre = VCGDataset(os.path.join(fixture_dataset, "vcg"), split="train",
                         pretrain=True)
    assert vcg_pre[0]["task_type"] == "caption" and "event" not in vcg_pre[0]

    vg = VGDataset(os.path.join(fixture_dataset, "vg"), split="train")
    it = vg[0]
    # whole image + objects + region
    assert it["image_features"].shape[0] == len(it["object_ids"]) + 2
    assert it["mrm_labels"].shape == (it["image_features"].shape[0], 7)

    reason = ReasonDataset(os.path.join(fixture_dataset, "reason"), split="train")
    items = [reason[i] for i in range(len(reason))]
    assert any(x is None for x in items)  # missing pickle path
    assert any(x is not None for x in items)

    concat = ConcatDataset([vcg, vg])
    assert len(concat) == len(vcg) + len(vg)
    assert concat[len(vcg)]["task_type"] == "region_caption"


def test_vg_through_collator(fixture_dataset, tokenizer):
    import os
    vg = VGDataset(os.path.join(fixture_dataset, "vg"), split="train")
    col = Collator(tokenizer, has_label=True, mlm_enabled=True,
                   mrm_enabled=True, ap_enabled=True, rp_enabled=True,
                   mlm_probability=0.3, mrm_probability=0.3, max_img_num=4,
                   image_feature_size=20, num_mrm_labels=7,
                   rng=np.random.default_rng(5))
    batch = col([vg[0], vg[2]])
    assert batch["relation_pairs"].shape[2] == 2
    assert batch["attribute_mask"].shape == batch["labels"].shape
    # relation indices must point inside the decoder sequence
    assert (batch["relation_pairs"] < batch["labels"].shape[1]).all()
    if batch["relation_mask"].any():
        pairs = batch["relation_pairs"][batch["relation_mask"]]
        assert (pairs > 0).all()


def test_sharded_sampler():
    s0 = ShardedSampler(10, num_replicas=4, rank=0, shuffle=False)
    s3 = ShardedSampler(10, num_replicas=4, rank=3, shuffle=False)
    i0, i3 = list(s0), list(s3)
    assert len(i0) == len(i3) == 3
    assert set(i0).isdisjoint(set(i3) - {0, 1, 2})  # disjoint modulo padding
    sh = ShardedSampler(10, num_replicas=2, rank=0, shuffle=True, seed=1)
    sh.set_epoch(0)
    a = list(sh)
    sh.set_epoch(1)
    b = list(sh)
    assert a != b


def test_loader_prefetch(fixture_dataset, tokenizer):
    import os
    ds = VCGDataset(os.path.join(fixture_dataset, "vcg"), split="train")
    col = Collator(tokenizer, has_label=True, max_img_num=4,
                   image_feature_size=20)
    loader = DataLoader(ds, batch_size=4, collate_fn=col, num_workers=2,
                        shuffle=True)
    batches = list(loader)
    assert sum(b["input_ids"].shape[0] for b in batches) == len(ds)
    assert len(batches) == len(loader)


def test_loader_process_workers(fixture_dataset, tokenizer):
    import os
    ds = VCGDataset(os.path.join(fixture_dataset, "vcg"), split="train")
    col = Collator(tokenizer, has_label=True, max_img_num=4,
                   image_feature_size=20)
    thread_loader = DataLoader(ds, batch_size=5, collate_fn=col)
    proc_loader = DataLoader(ds, batch_size=5, collate_fn=col, num_workers=2,
                             use_processes=True, batch_divisor=2)
    ref = list(thread_loader)
    got = list(proc_loader)
    # divisor=2 trims odd remainders
    assert all(b["input_ids"].shape[0] % 2 == 0 for b in got)
    np.testing.assert_array_equal(got[0]["input_ids"],
                                  ref[0]["input_ids"][:got[0]["input_ids"].shape[0]])


class _TaggingCollator:
    """Adds a non-array key so the shm transport's 'other' path is hit."""

    def __init__(self, inner):
        self.inner = inner

    def __call__(self, samples):
        batch = self.inner(samples)
        batch["task_type"] = ["vcg"] * len(samples)
        return batch


@pytest.mark.slow
def test_loader_shm_transport(fixture_dataset, tokenizer):
    """Process workers ship dense batches via the shared-memory ring:
    batches must match the in-process path exactly, non-array values must
    survive, and oversize batches must fall back to the pickled pipe."""
    import os
    ds = VCGDataset(os.path.join(fixture_dataset, "vcg"), split="train")
    # picklable (spawn ships it through the pool initializer)
    col = _TaggingCollator(Collator(tokenizer, has_label=True, max_img_num=4,
                                    image_feature_size=20))

    ref = list(DataLoader(ds, batch_size=5, collate_fn=col))
    for shm_bytes in (None, 256):  # 256 B forces the inline fallback
        loader = DataLoader(ds, batch_size=5, collate_fn=col, num_workers=2,
                            use_processes=True, shm_bytes=shm_bytes)
        got = list(loader)
        assert len(got) == len(ref)
        for g, r in zip(got, ref):
            assert list(g) == list(r)  # key order preserved
            assert g["task_type"] == r["task_type"]
            for k, v in r.items():
                if isinstance(v, np.ndarray):
                    np.testing.assert_array_equal(g[k], v)
        # epoch 2 reuses the persistent pool + ring
        got2 = list(loader)
        np.testing.assert_array_equal(got2[0]["input_ids"],
                                      ref[0]["input_ids"])
        ring = loader._shm_ring
        loader.close()
        assert loader._shm_ring is None and not ring._shm  # unlinked


def test_collator_model_fuzz(tokenizer, np_rng):
    """Randomised batches through collation + the full pretraining loss:
    every combination of image counts/task types must produce finite losses
    with static shapes."""
    import jax
    from kmbart_tpu.config import tiny_config
    from kmbart_tpu.models.pretraining import (
        init_pretraining_params, pretraining_loss)
    from kmbart_tpu.parallel.mesh import device_arrays

    cfg = tiny_config(
        vocab_size=len(tokenizer) + 8, img_feat_id=tokenizer.img_feat_id,
        cls_token_id=tokenizer.cls_token_id,
        pad_token_id=tokenizer.pad_token_id,
        bos_token_id=tokenizer.bos_token_id,
        eos_token_id=tokenizer.eos_token_id)
    col = Collator(tokenizer, has_label=True, mlm_enabled=True,
                   mrm_enabled=True, mlm_probability=0.4, mrm_probability=0.4,
                   max_img_num=cfg.max_img_num, image_feature_size=20,
                   num_mrm_labels=cfg.num_labels,
                   rng=np.random.default_rng(11))
    params = init_pretraining_params(jax.random.PRNGKey(0), cfg)
    loss_jit = jax.jit(lambda p, b: pretraining_loss(p, cfg, b)[0])

    words = ["walks", "sits", "eats", "runs", "12", "a dog,", "isn't here"]
    tasks = ["intent", "before", "after", "caption"]
    shapes = set()
    for trial in range(6):
        batch = []
        for b in range(4):
            n = int(np_rng.integers(0, cfg.max_img_num + 1))
            e = {"task_type": tasks[int(np_rng.integers(0, 4))],
                 "labels": " ".join(np_rng.choice(words, 3)),
                 "event": " ".join(np_rng.choice(words, 2)),
                 "index": b}
            if n:
                e["image_features"] = np_rng.normal(size=(n, 20)).astype(np.float32)
                e["mrm_labels"] = np_rng.dirichlet(
                    np.ones(cfg.num_labels), n).astype(np.float32)
            batch.append(e)
        out = col(batch)
        arrays = device_arrays(out)
        shapes.add(tuple(sorted((k, v.shape) for k, v in arrays.items())))
        loss = loss_jit(params, arrays)
        assert np.isfinite(float(loss)), trial
    assert len(shapes) == 1, "collator output shapes must be static"


def test_loader_pool_persists_across_epochs(fixture_dataset, tokenizer):
    """The worker pool is created once and reused by later epochs (the
    per-epoch spawn of 8 interpreters cost more than a short epoch), and
    close() tears it down."""
    from kmbart_tpu.data.collation import Collator
    from kmbart_tpu.data.datasets import VCGDataset
    from kmbart_tpu.data.loader import DataLoader

    ds = VCGDataset(data_dir=fixture_dataset + "/vcg", split="train")
    col = Collator(tokenizer, has_label=True, max_img_num=4,
                   image_feature_size=20)
    loader = DataLoader(ds, batch_size=4, collate_fn=col,
                        num_workers=2, use_processes=True)
    n1 = sum(b["input_ids"].shape[0] for b in loader)
    pool1 = loader._pool
    assert pool1 is not None
    n2 = sum(b["input_ids"].shape[0] for b in loader)
    assert loader._pool is pool1          # reused, not respawned
    assert n1 == n2 > 0
    loader.close()
    assert loader._pool is None
