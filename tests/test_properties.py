"""Property-based tests (hypothesis) over the pure row semantics — beyond
the reference's test strategy (SURVEY.md §5: it has none). These pin
invariants that must hold for ANY input at 10^12-document scale, where
every weird byte sequence eventually appears."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from curator_spark import rules
from curator_spark.lm import get_lm

text_strategy = st.text(max_size=400)
bytes_strategy = st.binary(max_size=400)


@settings(max_examples=200, deadline=None)
@given(bytes_strategy)
def test_extract_never_raises_and_returns_str(b):
    out = rules.extract_text(b)
    assert isinstance(out, str)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_langid_contract(t):
    lang, conf = rules.langid(t)
    assert lang in {"en", "fr", "es", "de", "ar", "zh", "und"}
    assert 0.0 <= conf <= 1.0
    if not t.strip():
        assert lang == "und" and conf == 0.0


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_scrub_is_idempotent_and_counts_match(t):
    out1, c1 = rules.scrub_text(t)
    out2, c2 = rules.scrub_text(out1)
    # placeholders contain no PII/toxicity -> second pass is a no-op
    assert out2 == out1
    assert all(v == 0 for v in c2.values())
    assert all(v >= 0 for v in c1.values())
    # fast path must equal the sequential spec on arbitrary input
    assert (out1, c1) == rules.scrub_text_sequential(t)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_heuristic_stats_bounds(t):
    s = rules.heuristic_stats(t)
    assert s["n_chars"] == len(t)
    assert s["n_words"] >= 0
    assert 0.0 <= s["stop_density"] <= 1.0
    assert 0.0 <= s["repeated_line_frac"] <= 1.0
    assert 0.0 <= s["dup_word_frac"] < 1.0 or s["n_words"] == 0
    assert s["symbol_ratio"] >= 0.0


@settings(max_examples=100, deadline=None)
@given(text_strategy)
def test_perplexity_finite_nonnegative(t):
    p = get_lm().perplexity(t)
    assert p >= 0.0
    assert p == p  # not NaN
    if len(t) < 3:
        assert p == 0.0


@settings(max_examples=100, deadline=None)
@given(text_strategy)
def test_verdict_clip_and_hard_rules(t):
    lang, conf = rules.langid(t)
    ppl = get_lm().perplexity(t)
    _, counts = rules.scrub_text(t)
    flags = rules.rule_flags(rules.heuristic_stats(t), ppl, lang, conf, counts["toxicity"])
    score, keep, fired = rules.score_and_verdict(flags)
    assert 0 <= score <= 5
    assert keep == (score >= rules.KEEP_THRESHOLD)
    assert set(fired) <= set(rules.RULE_NAMES)
    if any(flags[r] for r in rules.HARD_RULES):
        assert score == 0 and not keep
