"""Evaluation-stack tests with hand-computed ground truths."""

import math

import numpy as np
import pytest

from kmbart_tpu.eval.bleu import Bleu
from kmbart_tpu.eval.cider import Cider
from kmbart_tpu.eval.meteor import Meteor, FUNCTION_WORDS
from kmbart_tpu.eval.ptb_tokenizer import PTBTokenizer, ptb_tokenize_sentence
from kmbart_tpu.eval.metrics import compute_metric_inference, use_same_id


def test_ptb_tokenizer():
    t = PTBTokenizer()
    out = t.tokenize({0: [{"caption": "The man, who isn't tall, said: \"Hello!\""}]})
    toks = out[0][0].split()
    assert "," not in toks and "!" not in toks and ":" not in toks
    assert "is" in toks and "n't" in toks          # contraction split
    assert toks[0] == "the"                        # lowercased
    assert "hello" in toks


def test_ptb_final_period():
    toks = ptb_tokenize_sentence("the dog runs.")
    assert toks == ["the", "dog", "runs", "."]
    toks2 = ptb_tokenize_sentence("it costs 3.50 dollars.")
    assert "3.50" in toks2                         # inner period kept


def test_bleu_hand_computed():
    gts = {0: ["the cat is on the mat"]}
    res = {0: ["the cat sat on the mat"]}
    score, _ = Bleu(4).compute_score(gts, res)
    assert score[0] == pytest.approx(5 / 6, rel=1e-6)
    assert score[1] == pytest.approx(math.sqrt(5 / 6 * 3 / 5), rel=1e-6)
    assert score[2] == pytest.approx((5 / 6 * 3 / 5 * 1 / 4) ** (1 / 3), rel=1e-6)
    assert score[3] < 1e-3                         # zero 4-gram matches


def test_bleu_perfect_and_brevity():
    gts = {0: ["a b c d e"], 1: ["f g h i j"]}
    res = {0: ["a b c d e"], 1: ["f g h i j"]}
    score, _ = Bleu(4).compute_score(gts, res)
    assert score[3] == pytest.approx(1.0, abs=1e-6)
    # short hypothesis -> brevity penalty
    res2 = {0: ["a b c"], 1: ["f g h"]}
    score2, _ = Bleu(4).compute_score(gts, res2)
    assert score2[0] == pytest.approx(math.exp(1 - 10 / 6), rel=1e-4)


def test_cider_identical_pairs():
    gts = {0: ["a b c"], 1: ["d e f"]}
    res = {0: ["a b c"], 1: ["d e f"]}
    score, scores = Cider().compute_score(gts, res)
    # orders 1..3 similarity 1, order 4 empty -> (3/4)*10
    assert score == pytest.approx(7.5, rel=1e-6)
    assert scores[0] == pytest.approx(7.5, rel=1e-6)


def test_cider_disjoint_is_zero():
    gts = {0: ["a b c"], 1: ["d e f"]}
    res = {0: ["x y z"], 1: ["u v w"]}
    score, _ = Cider().compute_score(gts, res)
    assert score == pytest.approx(0.0, abs=1e-9)


def test_cider_length_penalty():
    gts = {0: ["a b c d e f g h"], 1: ["p q r s"]}
    res = {0: ["a b"], 1: ["p q r s"]}
    _, scores = Cider().compute_score(gts, res)
    assert scores[0] < scores[1]


def test_meteor_identical():
    m = Meteor()
    score, _ = m.compute_score({0: ["the cat sat on the mat"]},
                               {0: ["the cat sat on the mat"]})
    assert score == pytest.approx(1.0, abs=1e-9)


def test_meteor_hand_computed():
    m = Meteor()
    # "the cat sat" vs "the cat ran": matches 'the'(function) 'cat'(content)
    score, _ = m.compute_score({0: ["the cat ran"]}, {0: ["the cat sat"]})
    P = (0.75 * 1 + 0.25 * 1) / (0.75 * 2 + 0.25 * 1)
    fmean = P * P / (0.85 * P + 0.15 * P)
    pen = 0.6 * (1 / 2) ** 0.2
    assert score == pytest.approx((1 - pen) * fmean, rel=1e-6)


def test_meteor_stem_stage():
    m = Meteor()
    s_exact, _ = m.compute_score({0: ["dogs run"]}, {0: ["dogs run"]})
    s_stem, _ = m.compute_score({0: ["dogs run"]}, {0: ["dog runs"]})
    s_none, _ = m.compute_score({0: ["dogs run"]}, {0: ["cat sleeps"]})
    assert s_exact > s_stem > s_none == 0.0


def test_meteor_order_penalty():
    m = Meteor()
    good, _ = m.compute_score({0: ["a brown dog runs home quickly"]},
                              {0: ["a brown dog runs home quickly"]})
    scrambled, _ = m.compute_score({0: ["a brown dog runs home quickly"]},
                                   {0: ["quickly home runs dog brown a"]})
    assert good > scrambled > 0


def test_use_same_id():
    assert use_same_id("5 waves at 12") == "1 waves at 1"
    assert use_same_id("1's hat") == "1's hat"


def test_compute_metric_inference_end_to_end():
    refs_list = [
        {"intent": ["order some food", "ask for the menu"], "before": [],
         "after": ["eat the meal"]},
        {"intent": ["wave at a friend"], "before": ["walk inside"],
         "after": []},
    ]
    gens_list = [
        {"index": 0, "task_type": "intent", "generations": ["order some food"]},
        {"index": 0, "task_type": "before", "generations": ["ignored empty ref"]},
        {"index": 0, "task_type": "after", "generations": ["eat a meal"]},
        {"index": 1, "task_type": "intent", "generations": ["wave at a friend"]},
    ]
    out = compute_metric_inference(gens_list, refs_list, verbose=False)
    for k in ("BLEU1", "BLEU2", "BLEU3", "BLEU4", "METEOR", "CIDEr"):
        assert k in out and np.isfinite(out[k]), k
    assert out["BLEU1"] > 0.5
    assert out["METEOR"] > 0.3


def test_diversity(tmp_path):
    import json
    train_file = tmp_path / "train.json"
    train_file.write_text(json.dumps(
        [{"intent": ["order some food"], "before": ["walk in"]}]))
    refs_list = [{"intent": ["order some food"]}]
    gens_list = [
        {"index": 0, "task_type": "intent",
         "generations": ["order some food", "buy a new hat"]},
    ]
    out = compute_metric_inference(gens_list, refs_list,
                                   calculate_diversity=True,
                                   train_file=str(train_file), verbose=False)
    assert out["Unique"] == 1.0
    assert out["Novel"] == pytest.approx(0.5)


def test_meteor_synonym_and_paraphrase_stages(tmp_path):
    syn = tmp_path / "syn.txt"
    syn.write_text("sofa ||| couch\n")
    para = tmp_path / "para.txt"
    para.write_text("sits down ||| takes a seat\n")
    m = Meteor(synonym_file=str(syn), paraphrase_file=str(para))
    base = Meteor()
    s_syn, _ = m.compute_score({0: ["the sofa"]}, {0: ["the couch"]})
    s_base, _ = base.compute_score({0: ["the sofa"]}, {0: ["the couch"]})
    assert s_syn > s_base  # synonym stage matched couch<->sofa


def test_bleu_native_matches_python():
    from kmbart_tpu import _native
    if not _native.available():
        pytest.skip("native library unavailable")
    gts = {0: ["the cat is on the mat", "a cat sits on a mat"],
           1: ["hello world again"]}
    res = {0: ["the cat sat on the mat"], 1: ["hello there world"]}
    s_native, per_n = Bleu(4, use_native=True).compute_score(gts, res)
    s_python, per_p = Bleu(4, use_native=False).compute_score(gts, res)
    np.testing.assert_allclose(s_native, s_python, rtol=1e-12)
    for a, b in zip(per_n, per_p):
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_meteor_aligner_minimizes_chunks():
    """The jar's resolution prefers fewer chunks at equal coverage; a
    closest-index greedy matcher would pick b->0 here (2 chunks)."""
    m = Meteor()
    al = m._align("a b".split(), "b a b".split())
    assert sorted(al) == [(0, 1, 1, 1, 0), (1, 1, 2, 1, 0)]
    assert m._chunks(al) == 1


def test_meteor_golden_reorder():
    """METEOR 1.5 en (rank: alpha=.85 beta=.2 gamma=.6 delta=.75) on the
    classic reorder example. All 6 words match exactly in 3 chunks:
    P=R=1, fmean=1, frag=3/6, pen=.6*.5^.2, score=1-pen=0.4776697."""
    m = Meteor()
    score, _ = m.compute_score({0: ["the cat sat on the mat"]},
                               {0: ["on the mat sat the cat"]})
    assert score == pytest.approx(0.4776696620, abs=1e-9)


def test_meteor_golden_synonym():
    """big<->large via the shipped synonym table (stage weight 0.8):
    m = 1*(0.25[a] + 0.75[dog]) + 0.8*0.75[big] = 1.6 over weighted
    length 1.75; single full chunk -> no penalty; score = 1.6/1.75."""
    m = Meteor()
    score, _ = m.compute_score({0: ["a big dog"]}, {0: ["a large dog"]})
    assert score == pytest.approx(1.6 / 1.75, abs=1e-9)


def test_meteor_golden_paraphrase_span():
    """'passed away'<->'died' (shipped table) matches a 2-word hypothesis
    span to a 1-word reference span at weight 0.6. Full single-chunk
    coverage: P = (1.75 + .6*2*.75)/3.25, R = (1.75 + .6*.75)/2.5,
    pen = 0."""
    m = Meteor()
    score, _ = m.compute_score({0: ["he died last night"]},
                               {0: ["he passed away last night"]})
    P = (1.75 + 0.6 * 1.5) / 3.25
    R = (1.75 + 0.6 * 0.75) / 2.5
    want = P * R / (0.85 * P + 0.15 * R)
    assert score == pytest.approx(want, abs=1e-9)
    assert score == pytest.approx(0.8696625023, abs=1e-9)


def test_meteor_warns_when_stages_inert(tmp_path):
    empty = tmp_path / "none.txt"
    empty.write_text("")
    with pytest.warns(UserWarning, match="INERT"):
        Meteor(synonym_file=None, paraphrase_file=None)


def test_meteor_default_stages_active():
    """Default construction loads the shipped tables: neither the synonym
    nor the paraphrase stage may be inert."""
    m = Meteor()
    assert m._synonym_table or m._wordnet is not None
    assert m._paraphrases


# (input, expected post-filter token string) — expectations hand-derived
# from Stanford CoreNLP 3.4.1 PTBTokenizer -preserveLines -lowerCase
# followed by pycocoevalcap's (uppercase) PUNCTUATIONS filter, which the
# reference runs as a Java subprocess (src/evaluation.py:10,48-49).
PTB_GOLDEN_CORPUS = [
    # plain + casing + whitespace
    ("A man riding a horse.", "a man riding a horse"),
    ("  Two   dogs run  fast.  ", "two dogs run fast"),
    ("THE QUICK BROWN FOX", "the quick brown fox"),
    ("", ""),
    # contractions
    ("He doesn't like it.", "he does n't like it"),
    ("They aren't here.", "they are n't here"),
    ("I can't see it.", "i ca n't see it"),
    ("She won't stop.", "she wo n't stop"),
    ("It's a sunny day.", "it 's a sunny day"),
    ("I'm happy.", "i 'm happy"),
    ("We'll go tomorrow.", "we 'll go tomorrow"),
    ("They've eaten.", "they 've eaten"),
    ("You're welcome.", "you 're welcome"),
    ("He'd rather walk.", "he 'd rather walk"),
    ("Isn't it lovely?", "is n't it lovely"),
    ("The dog's bone.", "the dog 's bone"),
    ("The dogs' bones.", "the dogs bones"),
    ("James's car.", "james 's car"),
    # assimilations
    ("You cannot enter.", "you can not enter"),
    ("I'm gonna win.", "i 'm gon na win"),
    ("We wanna play.", "we wan na play"),
    ("You gotta see this.", "you got ta see this"),
    ("Lemme see.", "lem me see"),
    ("Gimme the ball.", "gim me the ball"),
    # o'clock stays whole; "rock" unaffected
    ("It is five o'clock.", "it is five o'clock"),
    # quotes
    ('He said "hello" to her.', "he said hello to her"),
    ('"Stop right there!"', "stop right there"),
    ("She said “good morning” loudly.", "she said good morning loudly"),
    ("A so-called 'expert' spoke.", "a so-called expert spoke"),
    # brackets survive the (case-sensitive) punctuation filter as -lrb- etc.
    ("A cat (on a mat) sleeps.", "a cat -lrb- on a mat -rrb- sleeps"),
    ("Values [1] and {2} differ.", "values -lsb- 1 -rsb- and -lcb- 2 -rcb- differ"),
    # numbers / currency / percent / time
    ("It costs $5.", "it costs $ 5"),
    ("It costs $5.50 now.", "it costs $ 5.50 now"),
    ("Over 1,000 people came.", "over 1,000 people came"),
    ("About 50% of them left.", "about 50 % of them left"),
    ("The train leaves at 5:30 today.", "the train leaves at 5:30 today"),
    ("Score was 3.14 exactly.", "score was 3.14 exactly"),
    ("He arrived at 12, then left.", "he arrived at 12 then left"),
    # punctuation classes
    ("Wait; then go.", "wait then go"),
    ("Really? Yes!", "really yes"),
    ("One, two, and three.", "one two and three"),
    ("Items: apples, pears.", "items apples pears"),
    ("Well... maybe.", "well maybe"),
    ("A dash -- like this -- works.", "a dash like this works"),
    ("A well-known artist.", "a well-known artist"),
    ("Blue-green water.", "blue-green water"),
    # abbreviations keep their periods
    ("Mr. Smith waved.", "mr. smith waved"),
    ("Mrs. Jones and Dr. Lee met.", "mrs. jones and dr. lee met"),
    ("The U.S. flag waved.", "the u.s. flag waved"),
    ("J. K. Rowling wrote it.", "j. k. rowling wrote it"),
    ("Meet at 3 p.m. sharp.", "meet at 3 p.m. sharp"),
    ("St. Louis is big.", "st. louis is big"),
    # context-dependent abbreviations: "no."/"st."/"ft." keep the period
    # only next to a digit or capitalized word (CoreNLP behavior)
    ("He says no.", "he says no"),
    ("No. 5 won the race.", "no. 5 won the race"),
    ("The shop on Main St. closed.", "the shop on main st. closed"),
    ("The ship sank in 20 ft. of water.",
     "the ship sank in 20 ft. of water"),
    ("Mt. Everest is high.", "mt. everest is high"),
    ("Apples, pears, etc. were sold.", "apples pears etc. were sold"),
    # ampersand stays inside tokens
    ("AT&T built the line.", "at&t built the line"),
    # mixed
    ("The boy's kite (red) isn't flying.",
     "the boy 's kite -lrb- red -rrb- is n't flying"),
    ('"I can\'t," she said.', "i ca n't she said"),
    ("Don't touch the $100 bill!", "do n't touch the $ 100 bill"),
    ("It's 5:30; we're late.", "it 's 5:30 we 're late"),
    ("He said: \"wait\".", "he said wait"),
    ("Photo #42 of the set.", "photo # 42 of the set"),
]


def test_ptb_golden_corpus():
    """60-sentence golden corpus: contractions, assimilations, quotes,
    brackets (which survive the case-sensitive punctuation filter as
    -lrb-/-rrb-), digit-guarded commas/colons, currency, abbreviation
    periods, ampersand-joined tokens. Exact-match against the expected
    CoreNLP-PTB + punctuation-filter output."""
    tok = PTBTokenizer()
    inp = {i: [{"caption": c}] for i, (c, _) in enumerate(PTB_GOLDEN_CORPUS)}
    out = tok.tokenize(inp)
    for i, (c, exp) in enumerate(PTB_GOLDEN_CORPUS):
        assert out[i][0] == exp, (c, out[i][0], exp)
