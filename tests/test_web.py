"""URL / host-level curation operators (operators/web.py).

The family is the web-corpus staple the reference lacks (it streams
JSON/web data — reference network_nodes.py:172-241 — with no domain
tooling): host extraction, URL canonicalization, per-domain aggregates,
allow/block filtering, URL-normalized dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metalpipe_spark.operators.web import (
    domain_stats,
    extract_host,
    host_filter,
    host_filter_table,
    url_dedup,
    url_normalize,
)


def _norm_one(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(url_normalize("url").alias("n")).first()["n"]


@pytest.mark.parametrize(
    "raw,want",
    [
        # case + www + default port + fragment
        (
            "HTTP://WWW.Example.COM:80/A/b#frag",
            "http://example.com/A/b",
        ),
        ("https://site.org:443/x", "https://site.org/x"),
        # non-default port kept; userinfo stripped
        ("https://u:p@site.org:8443/x", "https://site.org:8443/x"),
        # empty path -> /; trailing slashes trimmed
        ("https://site.org", "https://site.org/"),
        ("https://site.org/a/b///", "https://site.org/a/b"),
        # tracking params out, survivors sorted, empty query dropped
        (
            "https://site.org/p?utm_source=f&b=2&a=1&fbclid=XY",
            "https://site.org/p?a=1&b=2",
        ),
        ("https://site.org/p?utm_campaign=x", "https://site.org/p"),
        # not URL-shaped: pass through untouched
        ("not a url", "not a url"),
    ],
)
def test_url_normalize_cases(spark, raw, want):
    assert _norm_one(spark, raw) == want


def test_url_normalize_null_propagates(spark):
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(url_normalize("url").alias("n")).first()["n"] is None


def test_url_normalize_is_codegen(spark):
    """The whole family must ride the scan — no Python eval in the plan."""
    df = spark.range(10).select(
        F.concat(F.lit("https://h.com/x?id="), F.col("id")).alias("url")
    )
    plan = (
        df.select(url_normalize("url"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_extract_host_strip_www(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.A.com/x",), ("http://b.org:8080/",), ("junk",)],
        "url string",
    )
    got = [r["h"] for r in df.select(extract_host("url").alias("h")).collect()]
    assert got == ["a.com", "b.org", ""]


def test_domain_stats_counts_canonical_urls(spark):
    # two dirty spellings of ONE page + one other page on a.com
    df = spark.createDataFrame(
        [
            ("https://a.com/p?utm_source=x", 10),
            ("HTTPS://WWW.A.com/p", 20),
            ("https://a.com/q", 30),
            ("https://b.org/", 40),
        ],
        "url string, n int",
    )
    got = {
        r["host"]: (r["n_docs"], r["n_urls"], r["total_size"])
        for r in domain_stats(df, "url", size_col="n").collect()
    }
    assert got == {"a.com": (3, 2, 60), "b.org": (1, 1, 40)}


def test_host_filter_allow_then_block(spark):
    df = spark.createDataFrame(
        [("https://a.com/1",), ("https://b.org/2",), ("https://c.net/3",)],
        "url string",
    )
    kept = host_filter(df, "url", allowlist=["A.com", "b.org"], blacklist=["b.org"])
    assert [r["url"] for r in kept.collect()] == ["https://a.com/1"]


@pytest.mark.parametrize("use_bloom", [False, True])
def test_host_filter_table_block_never_admits_listed(spark, use_bloom):
    df = spark.createDataFrame(
        [(i, f"https://host{i}.com/x") for i in range(50)], "id int, url string"
    )
    blocked = spark.createDataFrame(
        [(f"host{i}.com",) for i in range(0, 50, 5)], "host string"
    )
    out = host_filter_table(df, blocked, "url", mode="block", use_bloom=use_bloom)
    ids = {r["id"] for r in out.collect()}
    # one-sided contract: a listed host NEVER survives (Bloom FPs may
    # only drop extra rows)
    assert ids.isdisjoint(set(range(0, 50, 5)))
    if not use_bloom:  # exact path keeps everything unlisted
        assert ids == set(range(50)) - set(range(0, 50, 5))
    assert out.columns == ["id", "url"]


def test_host_filter_table_allow_keeps_listed(spark):
    df = spark.createDataFrame(
        [(1, "https://a.com/x"), (2, "https://b.org/y")], "id int, url string"
    )
    allowed = spark.createDataFrame([("a.com",)], "host string")
    out = host_filter_table(df, allowed, "url", mode="allow")
    assert [r["id"] for r in out.collect()] == [1]


def test_url_dedup_min_id_per_canonical(spark):
    df = spark.createDataFrame(
        [
            (7, "https://a.com/p?utm_source=x&k=1"),
            (3, "HTTPS://WWW.A.com:443/p/?k=1"),
            (5, "https://a.com/other"),
        ],
        "doc_id int, url string",
    )
    got = {
        r["url_norm"]: r["doc_id"] for r in url_dedup(df, "url").collect()
    }
    assert got == {"https://a.com/p?k=1": 3, "https://a.com/other": 5}


def test_yaml_web_nodes_compile(spark, tmp_path):
    """Each web operator has a YAML node class (pipeline surface)."""
    from metalpipe_spark.plans.pipeline import compile_pipeline

    src = spark.createDataFrame(
        [(1, "https://a.com/p?utm_source=x"), (2, "HTTPS://WWW.A.com/p"),
         (3, "https://bad.com/q")],
        "doc_id long, url string",
    )
    path = str(tmp_path / "docs.parquet")
    src.write.parquet(path)
    config = {
        "nodes": {
            "read": {"class": "ParquetReader", "options": {"path": path}},
            "clean": {
                "class": "HostFilter",
                "options": {"blacklist": ["bad.com"]},
            },
            "norm": {"class": "URLNormalize", "options": {}},
            "hosts": {"class": "ExtractHost", "options": {}},
            "stats": {"class": "DomainStats", "options": {}},
            "dedup": {"class": "URLDedup", "options": {}},
        },
        "paths": [
            ["read", "clean", "norm", "hosts"],
            ["clean", "stats"],
            ["clean", "dedup"],
        ],
    }
    p = compile_pipeline(spark, config)
    assert p.dataframes["hosts"].select("host").distinct().count() == 1
    [stat] = p.dataframes["stats"].collect()
    assert (stat["host"], stat["n_docs"], stat["n_urls"]) == ("a.com", 2, 1)
    assert p.dataframes["dedup"].count() == 1
    [d] = p.dataframes["dedup"].collect()
    assert d["doc_id"] == 1  # min-id survivor of the two spellings


# -- host_rank ---------------------------------------------------------------


def _pagerank_reference(edges, damping=0.85, iterations=3):
    """Pure-python twin of host_rank's float formulation."""
    from collections import Counter, defaultdict

    hosts = sorted({h for e in edges for h in e})
    n = len(hosts)
    outdeg = Counter(s for s, _ in edges)
    r = {h: 1.0 / n for h in hosts}
    for _ in range(iterations):
        inflow = defaultdict(float)
        for s, d in edges:
            inflow[d] += r[s] / outdeg[s]
        r = {h: (1 - damping) / n + damping * inflow.get(h, 0.0) for h in hosts}
    return r


def test_host_rank_matches_reference(spark):
    from metalpipe_spark.operators.web import host_rank

    edges = [
        ("a", "b"), ("a", "c"), ("a", "b"),  # multi-edge a->b counts twice
        ("b", "c"), ("c", "a"), ("d", "a"),  # e is dangling (dst only)
        ("a", "e"),
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    want = _pagerank_reference(edges)
    got = {r.host: r["rank"] for r in host_rank(df).collect()}
    assert set(got) == set(want)
    for h in want:
        assert abs(got[h] - want[h]) < 1e-12, h
    # dangling host e: receives, never sends; mass decays (documented)
    assert got["e"] > (1 - 0.85) / 5 - 1e-12
    assert abs(sum(got.values()) - 1.0) > 1e-6  # decay, not redistribution


def test_host_rank_fixed_point_close_to_float(spark):
    from metalpipe_spark.operators.web import host_rank

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    f = {r.host: r["rank"] for r in host_rank(df).collect()}
    i = {
        r.host: r["rank"]
        for r in host_rank(df, fixed_point_scale=10**15).collect()
    }
    for h in f:
        assert abs(f[h] - i[h]) < 1e-9, h
    # fixed-point is bit-stable run to run
    j = {
        r.host: r["rank"]
        for r in host_rank(df, fixed_point_scale=10**15).collect()
    }
    assert i == j


def test_host_rank_validations(spark):
    from metalpipe_spark.operators.web import host_rank

    df = spark.createDataFrame([("a", "b")], "src_host string, dst_host string")
    with pytest.raises(ValueError, match="iterations"):
        host_rank(df, iterations=0)
    with pytest.raises(ValueError, match="scale"):
        host_rank(df, fixed_point_scale=10)
    empty = df.where("1=0")
    with pytest.raises(ValueError, match="empty"):
        host_rank(empty)


def test_host_rank_node(spark):
    from metalpipe_spark.plans.pipeline import compile_pipeline

    spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src_host string, dst_host string"
    ).createOrReplaceTempView("__hr_edges")
    import tempfile

    d = tempfile.mkdtemp()
    spark.table("__hr_edges").write.mode("overwrite").parquet(f"{d}/e")
    config = {
        "nodes": {
            "edges": {"class": "ParquetReader", "options": {"path": f"{d}/e"}},
            "rank": {"class": "HostRank", "options": {"iterations": 2}},
        },
        "paths": [["edges", "rank"]],
    }
    p = compile_pipeline(spark, config)
    rows = {r.host: r["rank"] for r in p.dataframes["rank"].collect()}
    # symmetric 2-cycle: equal ranks
    assert abs(rows["a"] - rows["b"]) < 1e-12


def _robots_df(spark, *bodies):
    return spark.createDataFrame(
        [(f"h{i}.example", b) for i, b in enumerate(bodies)],
        "host string, body string",
    )


def test_parse_robots_groups_and_agent_selection(spark):
    """RFC 9309 grouping: contiguous User-agent runs share rules, rules
    before any group are ignored, exact-agent groups override star
    groups, and ALL groups for the same agent combine."""
    from metalpipe_spark.operators.web import parse_robots

    body = (
        "Disallow: /orphan\n"  # before any group: ignored
        "User-agent: other\nDisallow: /other\n\n"
        "User-agent: MyBot\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /star\n\n"
        "User-agent: mybot\nDisallow: /b\n"  # second mybot group combines
    )
    got = {
        (r["rule"], r["prefix"])
        for r in parse_robots(_robots_df(spark, body), agent="MYBOT").collect()
    }
    assert got == {("disallow", "/a"), ("disallow", "/b")}
    star = {
        (r["rule"], r["prefix"])
        for r in parse_robots(_robots_df(spark, body), agent="unknown").collect()
    }
    assert star == {("disallow", "/star")}


def test_parse_robots_multi_ua_run_and_lexical_dirt(spark):
    """A run of consecutive User-agent lines shares one rule block;
    CRLF endings, comments, mixed-case fields, empty Disallow no-ops
    and unknown directives all parse away."""
    from metalpipe_spark.operators.web import parse_robots

    body = (
        "# header comment\r\n"
        "User-agent: alpha\r\n"
        "USER-AGENT: beta\r\n"
        "disallow: /shared # inline comment\r\n"
        "Disallow:\r\n"
        "Crawl-delay: 7\r\n"
        "Allow: /shared/ok\r\n"
    )
    for agent in ("alpha", "beta"):
        got = {
            (r["rule"], r["prefix"])
            for r in parse_robots(_robots_df(spark, body), agent=agent).collect()
        }
        assert got == {("disallow", "/shared"), ("allow", "/shared/ok")}, agent
    # no star group: an unmatched agent gets no rules at all
    assert parse_robots(_robots_df(spark, body), agent="gamma").count() == 0


def test_parse_robots_wildcard_compilation(spark):
    """'*' and the '$' end anchor compile to anchored regexes; regex
    metachars in literal paths are escaped (a path containing '.' or
    '+' must not become a regex wildcard)."""
    from metalpipe_spark.operators.web import parse_robots

    body = (
        "User-agent: *\n"
        "Disallow: /a*b$\n"
        "Disallow: /file.php\n"
        "Disallow: /c++/\n"
    )
    rows = {
        r["prefix"]: (r["wild"], r["pattern"])
        for r in parse_robots(_robots_df(spark, body)).collect()
    }
    assert rows["/a*b$"] == (True, "^/a.*b$")
    assert rows["/file.php"][0] is False
    assert rows["/file.php"][1] == r"^/file\.php"
    assert rows["/c++/"][1] == r"^/c\+\+/"


def test_robots_filter_longest_match_and_defaults(spark):
    """Longest prefix decides; allow wins exact ties; unlisted hosts
    and unmatched paths are allowed; keep='allowed' filters and keeps
    the caller's own `host` column intact."""
    from metalpipe_spark.operators.web import parse_robots, robots_filter

    body = (
        "User-agent: *\n"
        "Disallow: /p\n"
        "Allow: /p/ok\n"
        "Allow: /tie\n"
        "Disallow: /tie\n"
    )
    rules = parse_robots(_robots_df(spark, body))
    urls = spark.createDataFrame(
        [
            ("k", "https://h0.example/p/no"),
            ("k", "https://h0.example/p/ok/yes"),
            ("k", "https://h0.example/tie"),
            ("k", "https://h0.example/elsewhere"),
            ("k", "https://nowhere.example/p/no"),
        ],
        "host string, url string",
    )
    flagged = robots_filter(urls, rules, "url", keep="all")
    assert flagged.columns == ["host", "url", "crawl_allowed"]
    got = {r["url"]: r["crawl_allowed"] for r in flagged.collect()}
    assert got == {
        "https://h0.example/p/no": False,
        "https://h0.example/p/ok/yes": True,
        "https://h0.example/tie": True,  # allow wins the tie
        "https://h0.example/elsewhere": True,
        "https://nowhere.example/p/no": True,  # no rules for the host
    }
    kept = robots_filter(urls, rules, "url", keep="allowed")
    assert kept.count() == 4 and "crawl_allowed" not in kept.columns
    with pytest.raises(ValueError, match="keep"):
        robots_filter(urls, rules, "url", keep="blocked")


def test_robots_filter_wildcard_match_and_broadcast_plan(spark):
    """Wild rules match via regex ($ anchors the path end); the rule
    table reaches the frontier as a broadcast join (no frontier-side
    shuffle in the plan)."""
    from metalpipe_spark.operators.web import parse_robots, robots_filter

    rules = parse_robots(
        _robots_df(spark, "User-agent: *\nDisallow: /dl/*.zip$\n")
    )
    urls = spark.createDataFrame(
        [
            ("https://h0.example/dl/a.zip",),
            ("https://h0.example/dl/a.zip.txt",),
            ("https://h0.example/dl/deep/b.zip",),
        ],
        "url string",
    )
    got = {
        r["url"]: r["crawl_allowed"]
        for r in robots_filter(urls, rules, "url", keep="all").collect()
    }
    assert got == {
        "https://h0.example/dl/a.zip": False,
        "https://h0.example/dl/a.zip.txt": True,
        "https://h0.example/dl/deep/b.zip": False,
    }
    plan = robots_filter(urls, rules, "url", keep="all")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_yaml_robots_and_histogram_nodes(spark, tmp_path):
    """ParseRobots + RobotsFilter (two-upstream) and HistogramQuantiles
    reach the YAML pipeline surface."""
    from metalpipe_spark.plans.pipeline import compile_pipeline

    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /private\n")],
        "host string, body string",
    )
    urls = spark.createDataFrame(
        [(1, "https://a.example/private/x", 10.0),
         (2, "https://a.example/ok", 20.0),
         (3, "https://b.example/private/y", 30.0)],
        "doc_id long, url string, score double",
    )
    rp, up = str(tmp_path / "robots.parquet"), str(tmp_path / "urls.parquet")
    robots.write.parquet(rp)
    urls.write.parquet(up)
    config = {
        "nodes": {
            "robots": {"class": "ParquetReader", "options": {"path": rp}},
            "frontier": {"class": "ParquetReader", "options": {"path": up}},
            "rules": {"class": "ParseRobots", "options": {"agent": "mybot"}},
            "polite": {"class": "RobotsFilter", "options": {}},
            "dist": {
                "class": "HistogramQuantiles",
                "options": {"column": "score", "lo": 0.0, "hi": 40.0,
                            "bins": 4, "qs": [0.5]},
            },
        },
        "paths": [
            ["robots", "rules", "polite"],
            ["frontier", "polite", "dist"],
        ],
    }
    p = compile_pipeline(spark, config)
    kept = sorted(r["doc_id"] for r in p.dataframes["polite"].collect())
    assert kept == [2, 3]  # /private blocked on a.example only
    [q] = p.dataframes["dist"].collect()
    assert q["q"] == 0.5 and 20.0 <= q["est"] <= 30.0


def test_parse_sitemap_urlset_index_cdata_entities(spark):
    """Sitemap parse: urlset vs sitemapindex classification (a urlset
    body yields no phantom index entries and vice versa), CDATA
    wrappers, XML entity decode, whitespace-padded locs, optional
    lastmod, carried columns preserved."""
    from metalpipe_spark.operators.web import parse_sitemap

    urlset = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://a.example/p?x=1&amp;y=2</loc>"
        "<lastmod>2026-01-01</lastmod></url>"
        "<url><loc><![CDATA[https://a.example/cdata]]></loc></url>"
        "<url><loc>\n  https://a.example/ws\n</loc></url>"
        "</urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>https://b.example/s1.xml</loc>"
        "<lastmod>2025-12-31</lastmod></sitemap>"
        "<sitemap><loc>https://b.example/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [("a.example", urlset), ("b.example", index)],
        "host string, body string",
    )
    rows = sorted(
        (r["host"], r["kind"], r["url"], r["lastmod"])
        for r in parse_sitemap(df).collect()
    )
    assert rows == [
        ("a.example", "url", "https://a.example/cdata", ""),
        ("a.example", "url", "https://a.example/p?x=1&y=2", "2026-01-01"),
        ("a.example", "url", "https://a.example/ws", ""),
        ("b.example", "sitemap", "https://b.example/s1.xml", "2025-12-31"),
        ("b.example", "sitemap", "https://b.example/s2.xml", ""),
    ]


def test_parse_sitemap_node_urls_only(spark, tmp_path):
    """ParseSitemap node reaches the YAML surface; urls_only drops
    sitemapindex children."""
    from metalpipe_spark.plans.pipeline import compile_pipeline

    df = spark.createDataFrame(
        [
            ("<urlset><url><loc>https://a.example/1</loc></url></urlset>",),
            ("<sitemapindex><sitemap><loc>https://a.example/sub.xml</loc>"
             "</sitemap></sitemapindex>",),
        ],
        "body string",
    )
    p = str(tmp_path / "maps.parquet")
    df.write.parquet(p)
    config = {
        "nodes": {
            "read": {"class": "ParquetReader", "options": {"path": p}},
            "parsed": {"class": "ParseSitemap", "options": {"urls_only": True}},
        },
        "paths": [["read", "parsed"]],
    }
    out = compile_pipeline(spark, config).dataframes["parsed"].collect()
    assert [(r["kind"], r["url"]) for r in out] == [
        ("url", "https://a.example/1")
    ]


def test_robots_filter_matches_query_string(spark):
    """Rules match path + query (RFC 9309 as every major crawler reads
    it): query-targeted disallows fire, and '$'-anchored path rules no
    longer match a URL whose query extends past the anchor."""
    from metalpipe_spark.operators.web import parse_robots, robots_filter

    rules = parse_robots(
        _robots_df(
            spark,
            "User-agent: *\nDisallow: /search?q=\nDisallow: /dl/*.zip$\n",
        )
    )
    urls = spark.createDataFrame(
        [
            ("https://h0.example/search?q=x",),
            ("https://h0.example/search",),
            ("https://h0.example/dl/a.zip",),
            ("https://h0.example/dl/a.zip?session=1",),  # $ anchor: allowed
        ],
        "url string",
    )
    got = {
        r["url"]: r["crawl_allowed"]
        for r in robots_filter(urls, rules, "url", keep="all").collect()
    }
    assert got == {
        "https://h0.example/search?q=x": False,
        "https://h0.example/search": True,
        "https://h0.example/dl/a.zip": False,
        "https://h0.example/dl/a.zip?session=1": True,
    }


def test_parse_sitemap_bracket_urls_survive(spark):
    """URLs containing ']' (IPv6-literal hosts) parse in both plain and
    CDATA loc forms; CDATA content is taken raw (no entity decode)."""
    from metalpipe_spark.operators.web import parse_sitemap

    body = (
        "<urlset>"
        "<url><loc>https://[2001:db8::1]/page</loc></url>"
        "<url><loc><![CDATA[https://[2001:db8::2]/a&amp;b]]></loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([(body,)], "body string")
    got = sorted(r["url"] for r in parse_sitemap(df).collect())
    assert got == [
        "https://[2001:db8::1]/page",
        "https://[2001:db8::2]/a&amp;b",  # raw: CDATA is not re-decoded
    ]


def test_robots_filter_folds_www_on_rule_side(spark):
    """A rule table keyed by 'www.example.com' must still bind to
    frontier URLs whose host folds to 'example.com' (ADVICE r13: the
    frontier side folded www but the rule side joined as-is, silently
    allowing everything on the host)."""
    from metalpipe_spark.operators.web import parse_robots, robots_filter

    rules = parse_robots(
        spark.createDataFrame(
            [("www.h0.example", "User-agent: *\nDisallow: /p\n")],
            "host string, body string",
        )
    )
    urls = spark.createDataFrame(
        [
            ("https://h0.example/p/no",),
            ("https://www.h0.example/p/no",),
            ("https://h0.example/ok",),
        ],
        "url string",
    )
    got = {
        r["url"]: r["crawl_allowed"]
        for r in robots_filter(urls, rules, "url", keep="all").collect()
    }
    assert got == {
        "https://h0.example/p/no": False,
        "https://www.h0.example/p/no": False,
        "https://h0.example/ok": True,
    }
    # strip_www=False keeps both sides literal: the bare host no longer
    # matches the www-keyed rules.
    literal = {
        r["url"]: r["crawl_allowed"]
        for r in robots_filter(
            urls, rules, "url", keep="all", strip_www=False
        ).collect()
    }
    assert literal["https://h0.example/p/no"] is True
    assert literal["https://www.h0.example/p/no"] is False


def test_robots_filter_case_folds_rule_hosts_without_strip_www(spark):
    """extract_host always lowercases the frontier side, so a
    mixed-case rule host must fold regardless of strip_www — otherwise
    its Disallow rules are silently ignored."""
    from metalpipe_spark.operators.web import robots_filter

    rules = spark.createDataFrame(
        [("Example.COM", "disallow", "/p", False, "")],
        "host string, rule string, prefix string, wild boolean, pattern string",
    )
    urls = spark.createDataFrame(
        [("https://example.com/p/x",)], "url string"
    )
    got = robots_filter(urls, rules, "url", keep="all", strip_www=False)
    assert got.first()["crawl_allowed"] is False
