"""canonical_url: hand-case contract + three-engine parity (Column /
python twin / DuckDB generator), same pinning style as test_public_suffix.
The registry-level parity (the `canon_url` column folded into
`scalar_funcs`) is additionally driver-checked via the oracle."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from curator_spark.functions.url_canonical import (
    canonical_url,
    canonical_url_py,
    canonical_url_sql,
)

HAND = [
    (None, None),
    ("", ""),
    ("   ", ""),
    ("plain text", "plain text"),  # no scheme -> passthrough
    ("example.com/foo#bar", "example.com/foo"),
    ("HTTP://X.COM", "http://x.com/"),  # empty path -> '/'
    ("http://a.com:80/", "http://a.com/"),  # default port stripped
    ("https://a.com:80/", "https://a.com:80/"),  # :80 NOT default for https
    ("https://a.com:443/p", "https://a.com/p"),
    (
        "HTTPS://User:Pw@WWW.Example.COM.:443/Path/Page?a=1&utm_source=x&b=2#frag",
        "https://www.example.com/Path/Page?a=1&b=2",  # path case preserved
    ),
    ("http://EXAMPLE.com:8080?x=1", "http://example.com:8080/?x=1"),
    ("http://[2001:DB8::1]:80/x", "http://[2001:db8::1]/x"),  # v6 + port
    ("http://x.com?utm_source=1", "http://x.com/"),  # query collapses away
    ("http://x.com/p?gclid=abc&fbclid=d&q=1", "http://x.com/p?q=1"),
    ("ftp://A.B:21/C", "ftp://a.b:21/C"),  # unknown scheme keeps its port
    ("mailto:a@b.com", "mailto:a@b.com"),  # no '://' -> passthrough
    ("http://a.com.", "http://a.com/"),  # trailing host dot
    ("http://a.com.:8080/", "http://a.com.:8080/"),  # dot kept behind a port
    ("http://x.com/p?utm=1&utm_a=2", "http://x.com/p?utm=1"),  # utm_ prefix only
    ("http://x.com/p?a=1&utm_b=&c=2", "http://x.com/p?a=1&c=2"),
    ("  http://T.com/Q?fbclid=zz  ", "http://t.com/Q"),
    ("http://x.com/p?a=1#f?utm_source=2", "http://x.com/p?a=1"),  # frag first
    ("http://x.com#f", "http://x.com/"),
    # r5 review classes: '&' is a legal PATH char — path is split off
    # before query cleanup and never touched
    ("http://x.com/a&gclid=1", "http://x.com/a&gclid=1"),
    (
        "http://x.com/dl&utm_source=f?file=real.pdf",
        "http://x.com/dl&utm_source=f?file=real.pdf",
    ),
    ("http://x.com/a&", "http://x.com/a&"),  # path trailing & kept
    ("http://x.com/p?a=1&b=2&gclid=x", "http://x.com/p?a=1&b=2"),
    # r5 review: ALL trailing host dots strip (idempotence)
    ("http://a.com..", "http://a.com/"),
    ("http://a.com../p", "http://a.com/p"),
    # r5 review round 2: MIXED trailing default-port/dot runs strip as ONE
    # pass (two alternating passes are not a fixpoint)
    ("http://x:80.", "http://x/"),
    ("http://a.com.:80", "http://a.com/"),
    ("https://x:443:443.", "https://x/"),
    ("ftp://x.:21", "ftp://x.:21/"),  # non-default port keeps its dot
]


def test_hand_cases_python_twin():
    for url, want in HAND:
        assert canonical_url_py(url) == want, url


def test_three_engine_parity(spark):
    urls = [u for u, _ in HAND] + [
        "scheme+x-y://HOST/p",
        "http://x.com/p?&a=1",
        "http://x.com/p??a=1",
        "http://x.com/%41?A=B",
        "https://x.com:8443/p?utm_campaign=c",
        "http://u@h.com/p",
        "http://x.com/p?utm_a=1&utm_b=2&utm_c=3",
        "https://a.b.c.example.co.uk:443/deep/path/?utm_source=s&x=y&gclid=g",
        "http://host/path?q=v%20al&utm_term=t",
        "//protocol.relative/x",  # no scheme -> passthrough
        "http:///pathonly",  # empty authority
        "http://:80/x",  # port-only authority (degenerate)
    ]
    py = [canonical_url_py(u) for u in urls]

    con = duckdb.connect()
    vals = ", ".join(
        "(" + ("NULL" if u is None else "'" + u.replace("'", "''") + "'") + ")"
        for u in urls
    )
    dk = [
        r[0]
        for r in con.sql(
            f"SELECT {canonical_url_sql('u')} FROM (VALUES {vals}) t(u)"
        ).fetchall()
    ]

    df = spark.createDataFrame(list(enumerate(urls)), "i long, u string")
    sp = [
        r.c
        for r in df.select("i", canonical_url(F.col("u")).alias("c"))
        .orderBy("i")
        .collect()
    ]
    for u, a, b, c in zip(urls, py, dk, sp):
        assert a == b == c, (u, a, b, c)


def test_canonical_url_is_idempotent_and_codegen_only(spark):
    # canonical output canonicalizes to itself (fixpoint) for scheme'd
    # urls — incl. the multi-dot and path-'&' classes the r5 review
    # showed break a weaker contract
    for url, want in HAND:
        if want and "://" in (want or ""):
            assert canonical_url_py(want) == want, want
    for extra in ("http://a.com...", "http://x.com/a&?&utm_source=1&"):
        once = canonical_url_py(extra)
        assert canonical_url_py(once) == once, (extra, once)
    # pure codegen: no interpreted lambda / python eval in the plan
    df = spark.range(4).select(
        F.concat(F.lit("HTTP://A"), F.col("id").cast("string"), F.lit(".COM:80/p?utm_source=x")).alias("u")
    )
    plan = df.select(canonical_url(F.col("u")).alias("c"))._jdf.queryExecution().toString()
    assert "lambdafunction" not in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_with_canonical_url_staged_equals_spec(spark):
    """The SHIPPED staged form must be value-identical to the canonical_url
    spec Column over an adversarial url mix (every branch lit), and its
    plan must contain exactly ONE evaluation-site of each expensive regex
    — checked structurally by asserting the temp columns are gone and no
    interpreted lambda appears."""
    from curator_spark.functions.url_canonical import with_canonical_url

    urls = [u for u, _ in HAND] + [
        "http://x.com/a&gclid=1?q=2",
        "https://U@H.com.:443/p?utm_a=1&&b=2&",
        "http://a.com...",
    ]
    df = spark.createDataFrame(list(enumerate(urls)), "i long, u string")
    spec = df.select("i", canonical_url(F.col("u")).alias("c"))
    shipped = with_canonical_url(df, "u", "c").select("i", "c")
    a = {(r.i, r.c) for r in spec.collect()}
    b = {(r.i, r.c) for r in shipped.collect()}
    assert a == b
    assert set(with_canonical_url(df, "u", "c").columns) == {"i", "u", "c"}
    with pytest.raises(ValueError):
        with_canonical_url(df.withColumn("_cu_s", F.lit(1)), "u", "c")


def test_fuzz_three_engine_parity_and_idempotence(spark):
    """4000 seeded random url-ish garbage strings (every metachar the
    contract touches: #, @, :, ?, &, [, ], dots, spaces, tabs, newlines)
    — python twin == DuckDB == Spark spec == Spark staged, and the python
    twin is a fixpoint on its own output. This fuzz found three real
    contract bugs when first run (fragment-exposed trailing spaces,
    multi-@ authorities, stacked default ports)."""
    import random

    from curator_spark.functions.url_canonical import with_canonical_url

    rng = random.Random(0xF00D)
    # '8'/'4' make ':80'/':443' reachable, and the token list injects
    # tracking params + port/dot runs — the first fuzz alphabet could not
    # generate a default port at all, which is exactly how the mixed
    # port/dot-run non-fixpoint shipped behind a green fuzz (r5 review)
    alpha = list("abXZ0984.:/?&=#@%+-_[]! \t\n~$")
    tokens = [":80", ":443", ":80.", ".:80", "utm_a=1", "gclid=2", "?utm_b=", "&&"]
    prefixes = ["http://", "HTTPS://", "ftp://", "", "//", "http:/", "x://", "  http://"]

    def rand_url():
        parts = [
            rng.choice(tokens) if rng.random() < 0.15 else rng.choice(alpha)
            for _ in range(rng.randint(0, 40))
        ]
        return rng.choice(prefixes) + "".join(parts)

    urls = [rand_url() for _ in range(4000)] + [None, ""]

    py = [canonical_url_py(u) for u in urls]
    assert all(
        u is None or canonical_url_py(canonical_url_py(u)) == canonical_url_py(u)
        for u in urls
    )

    con = duckdb.connect()
    vals = ", ".join(
        "(" + str(i) + "," + ("NULL" if u is None else "'" + u.replace("'", "''") + "'") + ")"
        for i, u in enumerate(urls)
    )
    dk = [
        r[0]
        for r in con.sql(
            f"SELECT {canonical_url_sql('u')} FROM (VALUES {vals}) t(i,u) ORDER BY i"
        ).fetchall()
    ]
    assert py == dk

    df = spark.createDataFrame(list(enumerate(urls)), "i long, u string")
    sp = [r.c for r in df.select("i", canonical_url(F.col("u")).alias("c")).orderBy("i").collect()]
    st = [r.c for r in with_canonical_url(df, "u", "c").select("i", "c").orderBy("i").collect()]
    assert py == sp == st
