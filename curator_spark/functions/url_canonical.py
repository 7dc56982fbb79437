"""Canonical-URL normalization — the URL-identity step a web pipeline runs
BEFORE url-keyed dedup/grouping (C4/CCNet dedup by canonical URL; the
reference has no URL ops — like `public_suffix` this is a web-corpus
fidelity op in its own right).

Three pinned-equal forms, same layout as ``functions.public_suffix``:

- ``canonical_url(col)``   — pure-codegen Spark Column (regexp chain)
- ``canonical_url_py(s)``  — python twin (the oracle-side unit of reuse)
- ``canonical_url_sql(c)`` — DuckDB expression generator for oracles

Normalization contract (a pure function of the input string; every rule is
deliberately expressible identically in Java regex, RE2 and python re —
end-of-text anchors are ``\\z`` / ``$`` / ``\\Z`` per engine, never the
newline-sensitive Java ``$``):

1. NULL -> NULL. Leading/trailing ASCII SPACES (0x20 only) trimmed.
2. Fragment stripped: first ``#`` and everything after (``#[\\s\\S]*`` —
   the class union is engine-independent even where ``\\s`` differs).
3. No ``scheme://`` prefix -> PASSTHROUGH of the trimmed, fragment-less
   string (mailto:, relative paths, garbage: not this function's job).
4. Scheme lowercased. Authority: userinfo (``^[^@]*@``) stripped, host
   lowercased, the scheme's DEFAULT port stripped (http :80, https :443 —
   other schemes keep any port), then ONE trailing host dot stripped
   (port-less hosts only; ``com.:8080`` keeps its dot by contract).
5. Query: tracking params removed (``utm_*``, ``gclid``, ``fbclid`` —
   ``name=value`` forms only), delimiters re-collapsed, trailing ``?``/
   ``&`` runs dropped.
6. Empty path+query -> ``/`` (so ``http://x.com`` == ``http://x.com/``);
   a bare query gets the ``/`` prefix. Path case/encoding untouched
   (paths are case-sensitive; percent-decoding is NOT attempted).

Scale note: pure codegen, no UDF. The default-port CASE references the
(host-regex) subexpression in each branch and codegen does NOT CSE across
CASE branches (see BENCH.md round-4 eTLD+1 note) — in a hot path, stage
``canonical_url`` once via ``withColumn`` instead of referencing it from
several conditional expressions.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)"
_HEAD_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*"
_TRACK_RE = r"([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&]*"
_COLLAPSE_RE = r"([?&])&+"


def canonical_url(url: Column) -> Column:
    """Spark Column form (codegen regexp chain; see module contract)."""
    s = F.regexp_replace(F.trim(url), r"#[\s\S]*", "")
    scheme = F.regexp_extract(s, _SCHEME_RE, 1)
    lsch = F.lower(scheme)
    auth = F.regexp_extract(s, _AUTH_RE, 1)
    rest = F.regexp_replace(s, _HEAD_RE, "")

    host = F.lower(F.regexp_replace(auth, r"^[^@]*@", ""))
    host = (
        F.when(lsch == "http", F.regexp_replace(host, r":80\z", ""))
        .when(lsch == "https", F.regexp_replace(host, r":443\z", ""))
        .otherwise(host)
    )
    host = F.regexp_replace(host, r"\.\z", "")

    r = F.regexp_replace(rest, _TRACK_RE, "$1")
    r = F.regexp_replace(r, _COLLAPSE_RE, "$1")
    r = F.regexp_replace(r, r"[?&]+\z", "")
    path = (
        F.when(r == "", F.lit("/"))
        .when(r.startswith("?"), F.concat(F.lit("/"), r))
        .otherwise(r)
    )
    out = F.when(scheme == "", s).otherwise(
        F.concat(lsch, F.lit("://"), host, path)
    )
    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(out)


_P_FRAG = re.compile(r"#[\s\S]*")
_P_SCHEME = re.compile(_SCHEME_RE)
_P_AUTH = re.compile(_AUTH_RE)
_P_HEAD = re.compile(_HEAD_RE)
_P_USER = re.compile(r"^[^@]*@")
_P_P80 = re.compile(r":80\Z")
_P_P443 = re.compile(r":443\Z")
_P_DOT = re.compile(r"\.\Z")
_P_TRACK = re.compile(_TRACK_RE)
_P_COLLAPSE = re.compile(_COLLAPSE_RE)
_P_TAIL = re.compile(r"[?&]+\Z")


def canonical_url_py(url: str | None) -> str | None:
    """Python twin — same chain, ``re`` semantics (``\\Z`` = end of text)."""
    if url is None:
        return None
    s = _P_FRAG.sub("", url.strip(" "))
    m = _P_SCHEME.match(s)
    if m is None:
        return s
    lsch = m.group(1).lower()
    auth = _P_AUTH.match(s).group(1)
    rest = _P_HEAD.sub("", s, count=1)

    host = _P_USER.sub("", auth, count=1).lower()
    if lsch == "http":
        host = _P_P80.sub("", host)
    elif lsch == "https":
        host = _P_P443.sub("", host)
    host = _P_DOT.sub("", host)

    r = _P_TRACK.sub(r"\1", rest)
    r = _P_COLLAPSE.sub(r"\1", r)
    r = _P_TAIL.sub("", r)
    path = "/" if r == "" else ("/" + r if r.startswith("?") else r)
    return f"{lsch}://{host}{path}"


def canonical_url_sql(col: str) -> str:
    """DuckDB expression generator (RE2: ``$`` = end of text, replacement
    backrefs ``\\1``, explicit ``'g'`` for global replace)."""
    s = f"regexp_replace(trim({col}, ' '), '#[\\s\\S]*', '', 'g')"
    scheme = f"regexp_extract({s}, '{_SCHEME_RE}', 1)"
    lsch = f"lower({scheme})"
    auth = f"regexp_extract({s}, '{_AUTH_RE}', 1)"
    rest = f"regexp_replace({s}, '{_HEAD_RE}', '')"

    host0 = f"lower(regexp_replace({auth}, '^[^@]*@', ''))"
    host1 = (
        f"CASE WHEN {lsch} = 'http' THEN regexp_replace({host0}, ':80$', '') "
        f"WHEN {lsch} = 'https' THEN regexp_replace({host0}, ':443$', '') "
        f"ELSE {host0} END"
    )
    host = f"regexp_replace({host1}, '\\.$', '')"

    track = _TRACK_RE.replace("'", "''")
    r1 = f"regexp_replace({rest}, '{track}', '\\1', 'g')"
    r2 = f"regexp_replace({r1}, '{_COLLAPSE_RE}', '\\1', 'g')"
    r3 = f"regexp_replace({r2}, '[?&]+$', '')"
    path = (
        f"CASE WHEN {r3} = '' THEN '/' "
        f"WHEN {r3} LIKE '?%' THEN '/' || {r3} "
        f"ELSE {r3} END"
    )
    return (
        f"CASE WHEN {col} IS NULL THEN NULL "
        f"WHEN {scheme} = '' THEN {s} "
        f"ELSE {lsch} || '://' || {host} || {path} END"
    )
