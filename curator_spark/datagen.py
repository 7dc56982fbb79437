"""Deterministic Common-Crawl-style ``pages`` table generator.

BASELINE.json input_hint fixes the input shape:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.
No external data is allowed, so pages are *derived deterministically* from
the driver-provided ``documents.parquet`` (seed content) plus seeded
augmentation that injects every content class the filter must exercise
(FIXTURES.md §1): clean prose, PII, toxicity tokens, repeated-line spam,
symbol spam, gibberish, non-English marker words — and a Zipf-skewed host
pool so salted repartitioning has real skew to defuse.

Everything is a pure function of (doc_id, rep, source text); regeneration is
byte-stable (analog of the reference's seeded corpus sampling,
/root/reference/examples/custom/download_data.py:14-22, shuffle(seed=42)).
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timedelta, timezone

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import rules

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

# A few hot hosts take ~40% of all pages: the host-level skew the north rule
# requires the repartitioner to handle explicitly.
_HOT_HOST = "cdn.hotmirror.com"
_N_COLD_HOSTS = 50

_LANG_MARKERS = {
    "fr": "le la les et je ne pas une des dans",
    "es": "el la los las y o en es no se",
    "de": "der die das und oder von zu ist nicht sind",
    "zh": "这是 一个 中文 句子 和 更多 字符 的 文本 内容",
    "ar": "هذا نص عربي قصير مع كلمات اضافية للاختبار",
}

_GIBBERISH_ALPHABET = "qxzjvkwyfbghmpdtcsrnl0123456789#@%&*+=~^"


def _gibberish(seed: int, n: int = 400) -> str:
    """Deterministic high-perplexity byte soup (no '<', no whitespace runs)."""
    out = []
    h = hashlib.sha256(f"gib-{seed}".encode()).digest()
    while len(out) < n:
        for b in h:
            out.append(_GIBBERISH_ALPHABET[b % len(_GIBBERISH_ALPHABET)])
            if len(out) % 7 == 6:
                out.append(" ")
            if len(out) >= n:
                break
        h = hashlib.sha256(h).digest()
    return "".join(out)


def host_for(doc_id: int, rep: int) -> str:
    k = (doc_id * 31 + rep * 7) % 100
    if k < 40:
        return _HOT_HOST
    return f"site{(doc_id * 13 + rep) % _N_COLD_HOSTS}.example.org"


def make_page(doc_id: int, rep: int, text: str, lang: str, source: str) -> dict:
    """Pure page constructor. Content class = doc_id % 10."""
    body = text
    cls = doc_id % 10
    if cls == 5:  # PII
        body += (
            f" Contact us: user{doc_id}@example.com or call 555-123-{doc_id % 10000:04d}"
            f" from host 192.168.{doc_id % 256}.{(doc_id * 7) % 256} id {doc_id % 900 + 100:03d}-42-{doc_id % 9000 + 1000:04d}"
        )
    elif cls == 6:  # toxicity lexicon hits (hard drop + scrub)
        tox = rules.TOXICITY_LEXICON[doc_id % len(rules.TOXICITY_LEXICON)]
        body = body + f" this page contains {tox} twice {tox} indeed"
    elif cls == 7:  # repeated-line boilerplate spam
        line = body[:40] if body else "subscribe to our newsletter now"
        body = "\n".join([body] + [line] * 6)
    elif cls == 8:  # symbol spam
        body = body + (" $$$ %%% @@@ ### !!! ***" * 8)
    elif cls == 9:  # gibberish
        body = _gibberish(doc_id + rep * 1_000_003)
    if lang in _LANG_MARKERS:
        marker = _LANG_MARKERS[lang]
        body = ((marker + " ") * 4) + body
    url = f"https://{host_for(doc_id, rep)}/{source}/p{doc_id}r{rep}"
    title = f"doc {doc_id}"
    html = (
        f"<html><head><title>{title}</title></head><body>"
        f'<nav>home | about | login | search</nav><div id="main"><p>{body}</p></div>'
        f"<footer>(c) 2024 example inc | privacy | terms</footer></body></html>"
    ).encode("utf-8")
    warc_ts = _EPOCH + timedelta(seconds=(doc_id * 37 + rep * 101) % 31_536_000)
    return {"url": url, "warc_ts": warc_ts, "html": html, "text": body, "lang": lang}


PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


def build_pages_pdf(sf_dir: str, replication: int = 1) -> pd.DataFrame:
    """documents.parquet at ``sf_dir`` -> pages DataFrame (rows × replication)."""
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    recs = [
        make_page(int(r.doc_id), rep, r.text, r.lang, r.source)
        for rep in range(replication)
        for r in docs.itertuples(index=False)
    ]
    return pd.DataFrame.from_records(recs)


# Small enough that any bench core count gets several waves of scan tasks
# (48 files at the default x24 replication): file granularity IS the scan
# parallelism knob for the shuffle-free pipeline plan.
ROWS_PER_FILE = 2_500


def write_pages(sf_dir: str, out_path: str, replication: int = 1) -> str:
    """Materialize the pages table as a multi-file parquet dataset
    (~10k rows/file). One big file would make the Spark scan a single task
    (files only split at maxPartitionBytes granularity), serializing the
    input decode; many files model a real distributed table layout and let
    the scan parallelize at any core count."""
    pdf = build_pages_pdf(sf_dir, replication)
    table = pa.Table.from_pandas(pdf, schema=PAGES_SCHEMA, preserve_index=False)
    os.makedirs(out_path, exist_ok=True)
    n = table.num_rows
    n_files = max(1, (n + ROWS_PER_FILE - 1) // ROWS_PER_FILE)
    for i in range(n_files):
        chunk = table.slice(i * ROWS_PER_FILE, ROWS_PER_FILE)
        pq.write_table(chunk, os.path.join(out_path, f"part-{i:05d}.parquet"), row_group_size=4096)
    return out_path


def pages_path_for(sf_dir: str, cache_root: str | None = None, replication: int = 1) -> str:
    """Content-addressed local cache of the generated pages parquet
    (write-once; analog of the reference's cache-dir-by-fingerprint,
    /root/reference/src/bespokelabs/curator/llm/llm.py:140-165)."""
    if cache_root is None:
        cache_root = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".data")
        if not os.access(os.path.dirname(cache_root), os.W_OK):
            import tempfile

            cache_root = os.path.join(tempfile.gettempdir(), "curator_spark_data")
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    # v2: layout version (rows-per-file) is part of the cache identity
    out = os.path.join(cache_root, f"pages_{tag}_x{replication}_v2.pq")
    if not os.path.isdir(out):
        write_pages(sf_dir, out, replication)
    return out
