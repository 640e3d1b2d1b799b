"""METEOR scorer, pure Python (replaces the meteor-1.5.jar Java subprocess).

Parity target: pycocoevalcap's ``Meteor`` (src/evaluation.py:12), i.e.
METEOR 1.5 for English with ``-norm``: staged matchers (exact 1.0,
stem 0.6, synonym 0.8, paraphrase 0.6), content/function word weighting
(delta), harmonic mean (alpha) and fragmentation penalty (gamma, beta), with
corpus-level scores computed from **aggregated sufficient statistics** over
segments (not averaged per-segment scores), each segment scored against its
best reference.

Deviations (documented per SURVEY.md §7 hard-part #3):
  - the stem stage uses NLTK's Snowball English stemmer (same algorithm
    family as the Java implementation's Snowball stemmer);
  - the synonym stage needs WordNet data; it activates automatically when
    ``nltk`` WordNet corpora are installed, otherwise that stage is skipped;
  - the paraphrase stage activates when a paraphrase table file is provided
    (``Meteor(paraphrase_file=...)``; format: one ``phrase ||| phrase`` pair
    per line);
  - the aligner is a closest-index greedy one-to-one matcher per stage
    rather than the jar's full beam search; it maximises matches first and
    is a close proxy for minimal chunks on caption-length text.
"""

from collections import defaultdict

# METEOR 1.5 English defaults (task: rank)
ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75
STAGE_WEIGHTS = (1.0, 0.6, 0.8, 0.6)  # exact, stem, syn, para

# METEOR-style English function-word list (common closed-class words)
FUNCTION_WORDS = frozenset("""
a an the this that these those some any each every no such own same other
another all both few many much more most several
i you he she it we they me him her us them my your his its our their mine
yours hers ours theirs myself yourself himself herself itself ourselves
themselves who whom whose which what
and or but nor so yet for because although though while if unless until
when whenever where wherever after before since as than whether
in on at by with from to of about against between into through during
without within along across behind beyond plus except up down off above
below over under again further once near
is am are was were be been being do does did doing have has had having
will would shall should may might must can could ought
not n't only very too also just there here then now
""".split())


def _snowball():
    try:
        from nltk.stem.snowball import SnowballStemmer
        return SnowballStemmer("english").stem
    except Exception:  # pragma: no cover - nltk is baked into the image
        return lambda w: w


def _wordnet_synsets():
    try:
        from nltk.corpus import wordnet
        wordnet.synsets("test")  # raises LookupError without corpus data
        return wordnet
    except Exception:
        return None


class Meteor:
    def __init__(self, paraphrase_file=None, synonym_file=None):
        """``synonym_file``: optional flat synonym table ("w ||| s" or
        "w s1 s2 ..." per line) used when NLTK WordNet corpora are absent
        (this image has none); ``paraphrase_file``: METEOR paraphrase table
        ("phrase ||| phrase" per line)."""
        self._stem = _snowball()
        self._wordnet = _wordnet_synsets()
        self._synonym_table = None
        if synonym_file:
            table = defaultdict(set)
            with open(synonym_file, encoding="utf-8") as f:
                for line in f:
                    parts = (line.rstrip("\n").split(" ||| ")
                             if " ||| " in line else line.split())
                    for a in parts:
                        for b in parts:
                            if a != b:
                                table[a].add(b)
            self._synonym_table = table
        self._paraphrases = None
        if paraphrase_file:
            table = defaultdict(set)
            with open(paraphrase_file, encoding="utf-8") as f:
                for line in f:
                    parts = line.rstrip("\n").split(" ||| ")
                    if len(parts) >= 2:
                        table[parts[0]].add(parts[1])
                        table[parts[1]].add(parts[0])
            self._paraphrases = table

    # -- matchers ----------------------------------------------------------

    def _synonyms(self, word):
        if self._synonym_table is not None:
            return self._synonym_table.get(word, set())
        if self._wordnet is None:
            return set()
        syns = set()
        for synset in self._wordnet.synsets(word):
            for lemma in synset.lemmas():
                syns.add(lemma.name().replace("_", " ").lower())
        return syns

    def _stage_match(self, stage, h, r, syn_h=None):
        if stage == 0:
            return h == r
        if stage == 1:
            return self._stem(h) == self._stem(r)
        if stage == 2:
            return syn_h is not None and r in syn_h
        if stage == 3:
            return self._paraphrases is not None and \
                r in self._paraphrases.get(h, ())
        return False

    def _align(self, hyp, ref):
        """Greedy staged one-to-one alignment.

        Returns list of (hyp_idx, ref_idx, stage). Uses the C++ aligner core
        (native/kmbart_native.cpp meteor_align) when built; identical
        semantics to the Python loop below."""
        has_syn = self._wordnet is not None or self._synonym_table is not None
        active = [0, 1, 2 if has_syn else -1,
                  3 if self._paraphrases is not None else -1]
        stages = [s for s in active if s >= 0]

        from kmbart_tpu import _native
        if _native.available() and hyp and ref:
            import numpy as np
            match = np.zeros((len(stages), len(hyp), len(ref)), np.uint8)
            for si, stage in enumerate(stages):
                for i, hw in enumerate(hyp):
                    syn_h = self._synonyms(hw) if stage == 2 else None
                    for j, rw in enumerate(ref):
                        if self._stage_match(stage, hw, rw, syn_h):
                            match[si, i, j] = 1
            h_stage, align, _ = _native.meteor_align(match)
            return [(i, int(align[i]), stages[int(h_stage[i])])
                    for i in range(len(hyp)) if align[i] >= 0]

        matches = []
        h_used = [False] * len(hyp)
        r_used = [False] * len(ref)
        for stage in stages:
            for i, hw in enumerate(hyp):
                if h_used[i]:
                    continue
                syn_h = self._synonyms(hw) if stage == 2 else None
                best_j = -1
                for j, rw in enumerate(ref):
                    if r_used[j]:
                        continue
                    if self._stage_match(stage, hw, rw, syn_h):
                        if best_j < 0 or abs(j - i) < abs(best_j - i):
                            best_j = j
                if best_j >= 0:
                    h_used[i] = True
                    r_used[best_j] = True
                    matches.append((i, best_j, stage))
        return matches

    @staticmethod
    def _chunks(matches):
        if not matches:
            return 0
        matches = sorted(matches)
        ch = 1
        for (i1, j1, _), (i2, j2, _) in zip(matches, matches[1:]):
            if not (i2 == i1 + 1 and j2 == j1 + 1):
                ch += 1
        return ch

    # -- statistics ---------------------------------------------------------

    def _segment_stats(self, hyp_words, ref_words):
        matches = self._align(hyp_words, ref_words)

        def split_counts(words, idx_set):
            content = sum(1 for i in idx_set if words[i] not in FUNCTION_WORDS)
            return content, len(idx_set) - content

        stats = {
            "hyp_len_c": sum(1 for w in hyp_words if w not in FUNCTION_WORDS),
            "hyp_len_f": sum(1 for w in hyp_words if w in FUNCTION_WORDS),
            "ref_len_c": sum(1 for w in ref_words if w not in FUNCTION_WORDS),
            "ref_len_f": sum(1 for w in ref_words if w in FUNCTION_WORDS),
            "chunks": self._chunks(matches),
            "match_total_h": len(matches),
            "match_total_r": len(matches),
        }
        for s in range(4):
            idx_h = [m[0] for m in matches if m[2] == s]
            idx_r = [m[1] for m in matches if m[2] == s]
            c_h, f_h = split_counts(hyp_words, idx_h)
            c_r, f_r = split_counts(ref_words, idx_r)
            stats[f"m{s}_hc"], stats[f"m{s}_hf"] = c_h, f_h
            stats[f"m{s}_rc"], stats[f"m{s}_rf"] = c_r, f_r
        return stats

    @staticmethod
    def _score_from_stats(st):
        w = STAGE_WEIGHTS
        wp = sum(w[s] * (DELTA * st[f"m{s}_hc"] + (1 - DELTA) * st[f"m{s}_hf"])
                 for s in range(4))
        wr = sum(w[s] * (DELTA * st[f"m{s}_rc"] + (1 - DELTA) * st[f"m{s}_rf"])
                 for s in range(4))
        denom_p = DELTA * st["hyp_len_c"] + (1 - DELTA) * st["hyp_len_f"]
        denom_r = DELTA * st["ref_len_c"] + (1 - DELTA) * st["ref_len_f"]
        if denom_p == 0 or denom_r == 0:
            return 0.0
        P, R = wp / denom_p, wr / denom_r
        if P == 0 or R == 0:
            return 0.0
        fmean = P * R / (ALPHA * P + (1 - ALPHA) * R)
        m_avg = 0.5 * (st["match_total_h"] + st["match_total_r"])
        frag = st["chunks"] / m_avg if m_avg > 0 else 0.0
        if st["chunks"] == 1 and st["match_total_h"] == st["hyp_len_c"] + st["hyp_len_f"] \
                and st["match_total_r"] == st["ref_len_c"] + st["ref_len_f"]:
            frag = 0.0  # meteor: single chunk covering everything -> no penalty
        pen = GAMMA * (frag ** BETA) if frag > 0 else 0.0
        return (1.0 - pen) * fmean

    def score_segment(self, hypothesis, references):
        """Best-reference segment score + its stats."""
        hyp_words = hypothesis.lower().split()
        best, best_stats = 0.0, None
        for ref in references:
            st = self._segment_stats(hyp_words, ref.lower().split())
            sc = self._score_from_stats(st)
            if best_stats is None or sc > best:
                best, best_stats = sc, st
        return best, best_stats

    def compute_score(self, gts, res):
        """pycocoevalcap interface: aggregate stats over segments, final
        score from the sums (the jar's 'EVAL ||| stats' protocol)."""
        keys = sorted(gts.keys(), key=str)
        agg = defaultdict(float)
        scores = []
        for k in keys:
            sc, st = self.score_segment(res[k][0], gts[k])
            scores.append(sc)
            for name, v in st.items():
                agg[name] += v
        final = self._score_from_stats(agg) if keys else 0.0
        return final, scores
