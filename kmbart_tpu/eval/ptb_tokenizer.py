"""PTB-style caption tokenizer, pure Python (replaces the Java subprocess).

Parity target: pycocoevalcap's ``PTBTokenizer`` (imported at
src/evaluation.py:10) — the Stanford CoreNLP PTBTokenizer run with
``-preserveLines -lowerCase``, followed by dropping the PUNCTUATIONS token
list. This reimplements the Penn-Treebank ``tokenizer.sed`` rules the
Stanford tokenizer is based on: punctuation separation, contraction
splitting (n't 'll 've 're 'm 's 'd), quote normalisation to ``/'' pairs,
bracket normalisation to -LRB-/-RRB- style tokens — then lowercases and
filters the same punctuation list, so downstream BLEU/METEOR/CIDEr see the
same token streams for ordinary caption text.
"""

import re

PUNCTUATIONS = ["''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
                ".", "?", "!", ",", ":", "-", "--", "...", ";"]

_BRACKETS = {"(": "-LRB-", ")": "-RRB-", "{": "-LCB-", "}": "-RCB-",
             "[": "-LSB-", "]": "-RSB-"}

_CONTRACTIONS = re.compile(
    r"(?i)\b(\w+)(n't)\b|(\w+)('ll|'re|'ve|'m|'s|'d)\b")


def ptb_tokenize_sentence(text):
    """Tokenize one sentence into PTB-ish tokens (pre punctuation filter)."""
    s = " " + text.strip() + " "
    # directional quotes -> PTB backtick/quote pairs
    s = s.replace("“", " `` ").replace("”", " '' ")
    s = re.sub(r'(^|[ \(\[{<])"', r"\1 `` ", s)
    s = s.replace('"', " '' ")
    # ellipsis
    s = s.replace("...", " ... ")
    # most punctuation
    s = re.sub(r"([,;:@#$%&?!])", r" \1 ", s)
    # final period (and period before closing quote/bracket)
    s = re.sub(r"([^.])(\.)(\s*(?:[\]\)}>\"']*)\s*)$", r"\1 \2\3", s)
    s = re.sub(r"(\.)(\s)", r" \1\2", s)
    # brackets
    for k, v in _BRACKETS.items():
        s = s.replace(k, " %s " % v)
    s = s.replace("--", " -- ")
    # possessives / contractions
    s = re.sub(r"(?i)([^' ])('s|'m|'d|'ll|'re|'ve)([ .,!?;:])", r"\1 \2\3", s)
    s = re.sub(r"(?i)([^' ])(n't)([ .,!?;:])", r"\1 \2\3", s)
    s = re.sub(r"([^' ])(' )", r"\1 \2", s)
    return s.lower().split()


class PTBTokenizer:
    """Drop-in for pycocoevalcap.tokenizer.ptbtokenizer.PTBTokenizer."""

    def tokenize(self, captions_for_image):
        """{key: [{'caption': str}, ...]} -> {key: [str, ...]} where each
        output string is the space-joined, punctuation-filtered token list."""
        out = {}
        for k, caps in captions_for_image.items():
            out[k] = [
                " ".join(w for w in ptb_tokenize_sentence(c["caption"])
                         if w not in PUNCTUATIONS)
                for c in caps
            ]
        return out
