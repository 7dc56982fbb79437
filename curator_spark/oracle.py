"""Single-node pandas oracle: golden labels for the quality-filter pipeline.

Produces the ``golden_labels`` table of FIXTURES.md §2 by running the SAME
pure row functions (rules.py, lm.py) that the Spark stages run — the analog
of the reference's golden-cassette + sha256 hash-book verification
(/root/reference/tests/integrations/test_all.py:24-25). Tests assert the
distributed pipeline reproduces this byte-for-byte (text) and at F1≥0.99
(keep/drop; structurally F1=1.0).
"""

from __future__ import annotations

import pandas as pd

from . import rules
from .lm import get_lm


def golden_labels(pages: pd.DataFrame) -> pd.DataFrame:
    """pages(url, warc_ts, html, text, lang) -> golden label rows."""
    lm = get_lm()
    out = []
    for r in pages.itertuples(index=False):
        extracted, error = rules.extract_status(r.html)
        truncated = extracted[: rules.TRUNCATE_CHARS]
        lang_pred, lang_conf = rules.langid(truncated)
        ppl = lm.perplexity(truncated)
        scrubbed, scrub_counts = rules.scrub_text(truncated)
        stats = rules.heuristic_stats(truncated)
        flags = rules.rule_flags(stats, ppl, lang_pred, lang_conf, scrub_counts["toxicity"])
        score, keep, fired = rules.score_and_verdict(flags)
        out.append(
            {
                "url": r.url,
                "extracted_text": extracted,
                "scrubbed_text": scrubbed,
                "lang_pred": lang_pred,
                "lang_conf": lang_conf,
                "perplexity": ppl,
                "n_chars": stats["n_chars"],
                "n_words": stats["n_words"],
                "score": score,
                "keep": keep,
                "drop_rules": fired,
                "scrubs": scrub_counts,
                "error": error,
            }
        )
    return pd.DataFrame.from_records(out)
