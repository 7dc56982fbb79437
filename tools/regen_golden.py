"""Regenerate tests/golden/sf0001_hash_book.json after a DELIBERATE
semantics change to rules.py / lm.py / datagen.py.

The frozen book exists to make accidental drift loud
(tests/test_golden_hash_book.py); run this only when the change is
intended, and say so in the commit that updates the book.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from curator_spark.datagen import build_pages_pdf  # noqa: E402
from curator_spark.oracle import golden_labels  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "sf0001_hash_book.json")


def main() -> None:
    g = golden_labels(build_pages_pdf(SF_DIR)).sort_values("url").reset_index(drop=True)
    records = []
    for r in g.itertuples(index=False):
        records.append(
            {
                "url": r.url,
                "scrubbed_sha256": hashlib.sha256(r.scrubbed_text.encode()).hexdigest(),
                "extracted_sha256": hashlib.sha256(r.extracted_text.encode()).hexdigest(),
                "lang_pred": r.lang_pred,
                "perplexity": repr(r.perplexity),
                "lang_conf": repr(r.lang_conf),
                "score": int(r.score),
                "keep": bool(r.keep),
                "drop_rules": list(r.drop_rules),
            }
        )
    book = {
        "n": len(records),
        "keep_count": int(g["keep"].sum()),
        "corpus_sha256": hashlib.sha256(json.dumps(records, sort_keys=True).encode()).hexdigest(),
        "records": records,
    }
    with open(OUT, "w") as f:
        json.dump(book, f, indent=1)
    print(f"{OUT}: n={book['n']} keep={book['keep_count']} sha={book['corpus_sha256'][:16]}")


if __name__ == "__main__":
    main()
