"""Hot-path optimizations must be byte-equivalent to their reference specs.

The fused pandas UDF runs the optimized implementations; the single-node
oracle runs the same module, so golden parity alone would not catch a
semantics drift introduced by an optimization. These tests pin the optimized
paths against the straightforward reference implementations on the fixture
corpus plus adversarial literals.
"""

from __future__ import annotations

import numpy as np
import pytest

from curator_spark import rules
from curator_spark.lm import _CHAR_TO_ID, _OOV, get_lm

ADVERSARIAL = [
    "",
    " ",
    "\t\n",
    "a@b.co 555-123-4567 1.2.3.4 123-45-6789 badword1",
    "x@y not-an-email @ lone",
    "9.9.9.9.9 300.1.2.3 1.2.3.4",
    "123-45-6789 and (555) 123-4567 or 555.123.4567",
    "BADWORD2 badword2 Badword2, slurword! hateterm?",
    "emailless digits 12345 dashes --- dots ...",
    "le la les et je ne pas une des dans",
    "هذا نص عربي قصير مع كلمات اضافية للاختبار",
    "这是 一个 中文 句子",
    "the the the the the",
    "word",
]


@pytest.fixture(scope="module")
def corpus(pages_pdf):
    return [
        rules.extract_text(h)[: rules.TRUNCATE_CHARS] for h in pages_pdf["html"]
    ] + ADVERSARIAL


def test_scrub_fast_path_equals_sequential(corpus):
    for t in corpus:
        assert rules.scrub_text(t) == rules.scrub_text_sequential(t), t[:80]


def test_langid_matches_naive_vote(corpus):
    def naive(text):
        if not text:
            return ("und", 0.0)
        n_ar = len(rules._ARABIC_RE.findall(text))
        n_zh = len(rules._CJK_RE.findall(text))
        n = len(text)
        if n_ar * 2 > n:
            return ("ar", min(1.0, n_ar / n))
        if n_zh * 2 > n:
            return ("zh", min(1.0, n_zh / n))
        toks = [t.lower() for t in rules.tokens(text)]
        if not toks:
            return ("und", 0.0)
        scores = {lang: sum(1 for t in toks if t in lex) for lang, lex in rules.LANG_LEXICONS.items()}
        best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        return ("und", 0.0) if best[1] == 0 else (best[0], best[1] / len(toks))

    for t in corpus:
        assert rules.langid(t) == naive(t), t[:80]


def test_lm_batch_matches_per_row(corpus):
    """The concatenated-batch scorer must be BIT-identical to per-row
    perplexity (same lp slices, same pairwise mean)."""
    lm = get_lm()
    batch = lm.perplexities(corpus)
    per_row = [lm.perplexity(t) for t in corpus]
    assert batch.tolist() == per_row
    # sub-batching boundary: force multiple 2M-char chunks
    wide = [t * 50 for t in corpus[:40] if t] + corpus
    assert lm.perplexities(wide).tolist() == [lm.perplexity(t) for t in wide]


def test_lm_batch_handles_none_rows():
    """A null text row must score as "" in place — not shift every later
    row's slot (the flush sentinel must be distinct from None)."""
    lm = get_lm()
    texts = ["hello world text", None, "another document here", None, "tail"]
    got = lm.perplexities(texts).tolist()
    want = [lm.perplexity(t if t is not None else "") for t in texts]
    assert got == want
    assert lm.perplexities([None]).tolist() == [0.0]


def test_lm_surrogates_score_as_oov():
    """Lone surrogates (surrogateescape-decoded input) must score, not crash."""
    lm = get_lm()
    s = "abc \udcff def normal text here"
    assert lm.perplexity(s) > 0.0
    assert lm.perplexities([s, "plain"]).tolist() == [lm.perplexity(s), lm.perplexity("plain")]


def test_lm_encoder_matches_char_dict(corpus):
    lm = get_lm()
    for t in corpus:
        lowered = t.lower()
        new = lm._encode(lowered)
        old = np.fromiter(
            (_CHAR_TO_ID.get(c, _OOV) for c in lowered), dtype=np.int64, count=len(lowered)
        )
        assert np.array_equal(new, old), t[:80]
