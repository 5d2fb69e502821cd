"""URL / host-level curation catalog rows (operators/web.py).

The test corpus has no URL column, so each row synthesizes a
deterministic *dirty* URL per document — mixed-case scheme/host,
``www.`` aliases, default and explicit ports, trailing slashes,
shuffled query params, tracking params, fragments — identically in
Spark and DuckDB, then exercises the operator.  The dirt is chosen so
every normalization rule fires on some rows and collisions exist for
the dedup row (docs sharing ``source`` and ``doc_id mod 20`` map to one
canonical URL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metalpipe_spark.catalog import register
from metalpipe_spark.operators.web import (
    HOST_RE,
    PATH_RE,
    PORT_RE,
    QUERY_RE,
    SCHEME_RE,
    TRACKING_RE,
    domain_stats,
    extract_host,
    host_filter,
    url_dedup,
    url_normalize,
)
from metalpipe_spark.sources.readers import load_table

_BLOCKED = ["src0.example.com", "src13.example.com"]


def _synth_url() -> F.Column:
    """Deterministic dirty URL for a document row (Spark side)."""
    d = F.col("doc_id")
    scheme = F.when(d % 3 == 1, F.lit("HTTP")).otherwise(F.lit("https"))
    www = F.when(d % 5 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    dom = F.when(d % 2 == 0, F.lit(".Example.COM")).otherwise(
        F.lit(".example.com")
    )
    port = (
        F.when(d % 11 == 0, F.lit(":8080"))
        .when(d % 7 == 0, F.when(d % 3 == 1, F.lit(":80")).otherwise(F.lit(":443")))
        .otherwise(F.lit(""))
    )
    slash = F.when(d % 6 == 0, F.lit("/")).otherwise(F.lit(""))
    idp = (d % 4).cast("string")
    query = F.when(
        d % 2 == 0,
        F.concat(F.lit("?id="), idp, F.lit("&v=1&utm_campaign=x")),
    ).otherwise(F.concat(F.lit("?utm_campaign=x&v=1&id="), idp))
    return F.concat(
        scheme,
        F.lit("://"),
        www,
        F.col("source"),
        dom,
        port,
        F.lit("/docs/"),
        (d % 10).cast("string"),
        slash,
        query,
        F.lit("#s"),
        d.cast("string"),
    )


_URL_SQL = """
  (CASE WHEN doc_id % 3 = 1 THEN 'HTTP' ELSE 'https' END) || '://' ||
  (CASE WHEN doc_id % 5 = 0 THEN 'WWW.' ELSE '' END) ||
  source ||
  (CASE WHEN doc_id % 2 = 0 THEN '.Example.COM' ELSE '.example.com' END) ||
  (CASE WHEN doc_id % 11 = 0 THEN ':8080'
        WHEN doc_id % 7 = 0 THEN
          (CASE WHEN doc_id % 3 = 1 THEN ':80' ELSE ':443' END)
        ELSE '' END) ||
  '/docs/' || (doc_id % 10)::VARCHAR ||
  (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) ||
  (CASE WHEN doc_id % 2 = 0
        THEN '?id=' || (doc_id % 4)::VARCHAR || '&v=1&utm_campaign=x'
        ELSE '?utm_campaign=x&v=1&id=' || (doc_id % 4)::VARCHAR END) ||
  '#s' || doc_id::VARCHAR
"""

# The oracle replays url_normalize with the SAME regexes (RE2-safe by
# construction — no lookaround).  The `n` CTE exposes doc_id, n_chars,
# host (www-stripped, lower) and url_norm.
_NORM_CTE = f"""
WITH u AS (
  SELECT doc_id, n_chars, {_URL_SQL} AS url FROM documents
), p AS (
  SELECT doc_id, n_chars, url,
         lower(regexp_extract(url, '{SCHEME_RE}', 1)) AS scheme,
         regexp_replace(
           lower(regexp_extract(url, '{HOST_RE}', 1)), '^www\\.', ''
         ) AS host,
         regexp_extract(url, '{PORT_RE}', 1) AS port,
         regexp_replace(
           regexp_extract(url, '{PATH_RE}', 1), '/+$', ''
         ) AS path0,
         array_to_string(
           list_sort(list_filter(
             string_split(regexp_extract(url, '{QUERY_RE}', 1), '&'),
             x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_RE}')
           )), '&'
         ) AS qn
  FROM u
), n AS (
  SELECT doc_id, n_chars, host,
         CASE WHEN host <> '' THEN
           scheme || '://' || host ||
           (CASE WHEN port <> '' AND NOT (
                   (scheme = 'http' AND port = '80')
                   OR (scheme = 'https' AND port = '443'))
                 THEN ':' || port ELSE '' END) ||
           (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
           (CASE WHEN qn <> '' THEN '?' || qn ELSE '' END)
         ELSE url END AS url_norm
  FROM p
)
"""


def _with_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "n_chars", _synth_url().alias("url"))


@register(
    "q_url_normalize",
    _NORM_CTE + "SELECT doc_id, url_norm FROM n ORDER BY doc_id",
    doc=(
        "URL canonicalization: scheme/host case, www folding, default "
        "ports, trailing slashes, sorted non-tracking query params, "
        "dropped fragments — one codegen expression, no UDF, rides the "
        "scan at any corpus size."
    ),
)
def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    wu = _with_url(spark, sf_dir)
    return wu.select(
        "doc_id", url_normalize("url").alias("url_norm")
    ).orderBy("doc_id")


@register(
    "q_domain_stats",
    _NORM_CTE
    + """
    SELECT host,
           count(*) AS n_docs,
           count(DISTINCT url_norm) AS n_urls,
           sum(n_chars)::BIGINT AS total_size
    FROM n GROUP BY host ORDER BY host
    """,
    doc=(
        "Per-domain aggregates over canonical URLs (n_urls counts "
        "distinct normalized pages, so tracking noise never inflates a "
        "domain).  Host cardinality is broadcast-class at any corpus "
        "size — the join input for domain_mix_sample."
    ),
)
def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    wu = _with_url(spark, sf_dir)
    return domain_stats(wu, "url", size_col="n_chars").orderBy("host")


@register(
    "q_host_filter",
    _NORM_CTE
    + f"""
    SELECT host, count(*) AS n_docs
    FROM n
    WHERE host NOT IN ({", ".join(f"'{h}'" for h in _BLOCKED)})
    GROUP BY host ORDER BY host
    """,
    doc=(
        "Blacklist host filtering: the list rides as plan literals "
        "(isin), pure scan-side codegen — no join, no shuffle.  The "
        "table/Bloom variants (host_filter_table) cover list sizes "
        "beyond literal inlining."
    ),
)
def q_host_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    wu = _with_url(spark, sf_dir)
    kept = host_filter(wu, "url", blacklist=_BLOCKED)
    return (
        kept.groupBy(extract_host("url").alias("host"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("host")
    )


@register(
    "q_url_dedup",
    _NORM_CTE
    + """
    SELECT min(doc_id) AS doc_id, url_norm
    FROM n GROUP BY url_norm ORDER BY url_norm
    """,
    doc=(
        "URL-normalized exact dedup (min-id per canonical URL): the "
        "cheapest duplicate to drop is the one never tokenized — this "
        "runs before any content-level dedup in a web pipeline.  One "
        "map-side-combined shuffle on the canonical URL."
    ),
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    wu = _with_url(spark, sf_dir)
    out = url_dedup(wu, "url", id_col="doc_id")
    return out.select("doc_id", "url_norm").orderBy("url_norm")


_S = 10**15  # host_rank fixed-point scale (bit-reproducible ranks)

_RANK_ORACLE = f"""
WITH e AS (
  SELECT source AS src, 'src' || ((doc_id * 7) % 20)::VARCHAR AS dst
  FROM documents
), hosts AS (
  SELECT DISTINCT host FROM (
    SELECT src AS host FROM e UNION ALL SELECT dst AS host FROM e
  )
), nn AS (SELECT COUNT(*) AS n FROM hosts),
deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
r0 AS (SELECT host, {_S} // n AS r FROM hosts CROSS JOIN nn),
c1 AS (
  SELECT e.dst AS host, SUM(r0.r // deg.outdeg) AS c
  FROM e JOIN deg USING (src) JOIN r0 ON r0.host = e.src GROUP BY e.dst
), r1 AS (
  SELECT h.host,
         ((15 * {_S}) // (100 * nn.n)) + (85 * COALESCE(c1.c, 0)) // 100 AS r
  FROM hosts h CROSS JOIN nn LEFT JOIN c1 ON c1.host = h.host
), c2 AS (
  SELECT e.dst AS host, SUM(r1.r // deg.outdeg) AS c
  FROM e JOIN deg USING (src) JOIN r1 ON r1.host = e.src GROUP BY e.dst
), r2 AS (
  SELECT h.host,
         ((15 * {_S}) // (100 * nn.n)) + (85 * COALESCE(c2.c, 0)) // 100 AS r
  FROM hosts h CROSS JOIN nn LEFT JOIN c2 ON c2.host = h.host
), c3 AS (
  SELECT e.dst AS host, SUM(r2.r // deg.outdeg) AS c
  FROM e JOIN deg USING (src) JOIN r2 ON r2.host = e.src GROUP BY e.dst
), r3 AS (
  SELECT h.host,
         ((15 * {_S}) // (100 * nn.n)) + (85 * COALESCE(c3.c, 0)) // 100 AS r
  FROM hosts h CROSS JOIN nn LEFT JOIN c3 ON c3.host = h.host
)
SELECT host, CAST(r AS DOUBLE) / {_S}.0 AS rank FROM r3 ORDER BY host
"""


@register(
    "q_host_rank",
    _RANK_ORACLE,
    doc=(
        "host_rank (operators/web.py): 3 power iterations of PageRank "
        "(d=0.85) over a deterministic 20-host link graph synthesized "
        "from documents (source -> src[(doc_id*7)%20], multi-edges "
        "kept).  Fixed-point scaled-integer arithmetic makes the ranks "
        "bit-reproducible, so the oracle unrolls the same iterations "
        "as chained CTEs with integer floor division and compares "
        "exactly — no float tolerance."
    ),
)
def q_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metalpipe_spark.operators.web import host_rank
    from metalpipe_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    edges = docs.select(
        F.col("source").alias("src_host"),
        F.concat(
            F.lit("src"), ((F.col("doc_id") * 7) % 20).cast("string")
        ).alias("dst_host"),
    )
    return host_rank(
        edges, damping=0.85, iterations=3, fixed_point_scale=10**15
    ).orderBy("host")


# Shared by q_robots_filter and q_sitemap_frontier: the fixture's
# INTENDED rule table (hn = host numbering) — any parse or precedence
# drift in the operators hash-mismatches against it.
_ROBOTS_RULES_CTES = """hn AS (
      SELECT source, source || '.example.com' AS host,
             CAST(substr(source, 4) AS INT) AS num
      FROM (SELECT DISTINCT source FROM documents)
    ),
    rules AS (
      SELECT host, '/tmp' AS prefix, 0 AS is_allow FROM hn WHERE num % 5 = 0
      UNION ALL SELECT host, '/private', 0 FROM hn WHERE num % 5 <> 0
      UNION ALL SELECT host, '/private/ok', 1 FROM hn WHERE num % 5 <> 0
      UNION ALL SELECT host, '/tmp', 0 FROM hn WHERE num % 5 <> 0
      UNION ALL SELECT host, '/public', 0 FROM hn
                WHERE num % 5 <> 0 AND num % 2 = 1
    )"""


_ROBOTS_ORACLE = f"""
    WITH {_ROBOTS_RULES_CTES},
    urls AS (
      SELECT doc_id, source || '.example.com' AS host,
             CASE CAST(doc_id % 5 AS INT)
               WHEN 0 THEN '/private/doc' || CAST(doc_id AS VARCHAR)
               WHEN 1 THEN '/private/ok/doc' || CAST(doc_id AS VARCHAR)
               WHEN 2 THEN '/tmp/doc' || CAST(doc_id AS VARCHAR)
               WHEN 3 THEN '/public/doc' || CAST(doc_id AS VARCHAR)
               ELSE '/' END AS path
      FROM documents
    ),
    m AS (
      SELECT u.doc_id, r.is_allow,
             row_number() OVER (PARTITION BY u.doc_id
                                ORDER BY length(r.prefix) DESC,
                                         r.is_allow DESC) AS rn
      FROM urls u
      JOIN rules r ON u.host = r.host AND starts_with(u.path, r.prefix)
    )
    SELECT u.doc_id AS doc_id, u.host AS host,
           COALESCE(m.is_allow = 1, TRUE) AS crawl_allowed
    FROM urls u LEFT JOIN (SELECT doc_id, is_allow FROM m WHERE rn = 1) m
      USING (doc_id)
    ORDER BY doc_id
    """


def _robots_fixture(docs: DataFrame) -> DataFrame:
    """Per-host robots.txt bodies (host, body) — the dirty-formatted
    Spark twin of _ROBOTS_RULES_CTES' intended rules: CRLF lines,
    comments, mixed-case fields, an empty-Disallow no-op, an unknown
    directive, and an exact-agent group that overrides a 'Disallow: /'
    star group on every fifth host."""
    num = F.expr("CAST(substring(source, 4) AS INT)")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    star = (
        "# synthetic robots\nUser-Agent: *\nDISALLOW: /private\n"
        "allow: /private/ok\nDisallow: /tmp\nDisallow:\nCrawl-delay: 10\n"
    )
    body = F.when(
        num % 5 == 0,
        F.lit(
            "User-agent: CRAWLER\r\nDisallow: /tmp\r\n\r\n"
            "User-agent: *\r\nDisallow: /\r\n"
        ),
    ).otherwise(
        F.concat(
            F.lit(star),
            F.when(
                num % 2 == 1, F.lit("Disallow: /public # mirror list\n")
            ).otherwise(F.lit("")),
        )
    )
    return docs.select("source").distinct().select(
        host.alias("host"), body.alias("body")
    )


def _frontier_path() -> F.Column:
    """Deterministic per-document path hitting every rule shape."""
    d = F.col("doc_id")
    return (
        F.when(d % 5 == 0, F.concat(F.lit("/private/doc"), d.cast("string")))
        .when(d % 5 == 1, F.concat(F.lit("/private/ok/doc"), d.cast("string")))
        .when(d % 5 == 2, F.concat(F.lit("/tmp/doc"), d.cast("string")))
        .when(d % 5 == 3, F.concat(F.lit("/public/doc"), d.cast("string")))
        .otherwise(F.lit("/"))
    )


@register(
    "q_robots_filter",
    _ROBOTS_ORACLE,
    doc=(
        "parse_robots + robots_filter (operators/web.py, RFC 9309): "
        "dirty per-host robots.txt bodies (CRLF lines, comments, "
        "mixed-case field names, empty Disallow no-ops, unknown "
        "directives, an exact-agent group that overrides a 'Disallow: "
        "/' star group) parse into a host-scale rule table, then a "
        "synthesized URL frontier is filtered by broadcast join + JVM "
        "longest-match fold — the frontier side never shuffles.  The "
        "oracle encodes the fixture's INTENDED rules directly and "
        "replays longest-match-allow-wins as a window argmax, so any "
        "parse or precedence drift hash-mismatches."
    ),
)
def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metalpipe_spark.operators.web import parse_robots, robots_filter

    docs = load_table(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    rules = parse_robots(_robots_fixture(docs), agent="crawler")
    urls = docs.select(
        "doc_id",
        host.alias("host"),
        F.concat(F.lit("https://"), host, _frontier_path()).alias("url"),
    )
    return (
        robots_filter(urls, rules, "url", keep="all")
        .select("doc_id", "host", "crawl_allowed")
        .orderBy("doc_id")
    )


_SITEMAP_ORACLE = f"""
    WITH {_ROBOTS_RULES_CTES},
    u0 AS (
      SELECT doc_id, source || '.example.com' AS host,
             CAST(substr(source, 4) AS INT) AS num,
             CASE CAST(doc_id % 5 AS INT)
               WHEN 0 THEN '/private/doc' || CAST(doc_id AS VARCHAR)
               WHEN 1 THEN '/private/ok/doc' || CAST(doc_id AS VARCHAR)
               WHEN 2 THEN '/tmp/doc' || CAST(doc_id AS VARCHAR)
               WHEN 3 THEN '/public/doc' || CAST(doc_id AS VARCHAR)
               ELSE '/' END AS path,
             CASE WHEN doc_id % 5 = 3 THEN '?a=1&b=2' ELSE '' END AS qs,
             CASE WHEN doc_id % 3 = 0
                  THEN '2026-01-0' || CAST(doc_id % 9 + 1 AS VARCHAR)
                  ELSE '' END AS lastmod
      FROM documents
    ),
    urls AS (SELECT * FROM u0 WHERE num <> 7),
    m AS (
      SELECT u.doc_id, r.is_allow,
             row_number() OVER (PARTITION BY u.doc_id
                                ORDER BY length(r.prefix) DESC,
                                         r.is_allow DESC) AS rn
      FROM urls u
      JOIN rules r ON u.host = r.host AND starts_with(u.path, r.prefix)
    )
    SELECT u.host AS host,
           'https://' || u.host || u.path || u.qs AS url,
           u.lastmod AS lastmod,
           COALESCE(m.is_allow = 1, TRUE) AS crawl_allowed
    FROM urls u LEFT JOIN (SELECT doc_id, is_allow FROM m WHERE rn = 1) m
      USING (doc_id)
    ORDER BY url, lastmod
    """


@register(
    "q_sitemap_frontier",
    _SITEMAP_ORACLE,
    doc=(
        "parse_sitemap -> robots_filter (operators/web.py): per-host "
        "sitemap.xml bodies synthesized from documents (XML entities, "
        "CDATA-wrapped locs, optional lastmod, one host publishing a "
        "sitemapindex whose children are NOT frontier URLs), parsed by "
        "the codegen split/extract chain, then crawl-politeness-"
        "filtered with the SAME robots fixture as q_robots_filter.  "
        "The oracle rebuilds the intended frontier directly, so any "
        "entity-decode, CDATA, kind-classification, or precedence "
        "drift hash-mismatches."
    ),
)
def q_sitemap_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metalpipe_spark.operators.web import (
        parse_robots,
        parse_sitemap,
        robots_filter,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    num = F.expr("CAST(substring(source, 4) AS INT)")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    qs = F.when(d % 5 == 3, F.lit("?a=1&b=2")).otherwise(F.lit(""))
    loc_raw = F.concat(F.lit("https://"), host, _frontier_path(), qs)
    loc_xml = F.regexp_replace(loc_raw, "&", "&amp;")
    loc_part = F.when(
        d % 4 == 0, F.concat(F.lit("<![CDATA["), loc_raw, F.lit("]]>"))
    ).otherwise(loc_xml)
    lastmod = F.when(
        d % 3 == 0,
        F.concat(F.lit("<lastmod>2026-01-0"), (d % 9 + 1).cast("string"),
                 F.lit("</lastmod>")),
    ).otherwise(F.lit(""))
    tag = F.when(num == 7, F.lit("sitemap")).otherwise(F.lit("url"))
    entry = F.concat(
        F.lit("<"), tag, F.lit("><loc>"), loc_part, F.lit("</loc>"),
        lastmod, F.lit("</"), tag, F.lit(">"),
    )
    sitemaps = (
        docs.select(F.col("source"), num.alias("num"), entry.alias("entry"))
        .groupBy("source", "num")
        .agg(F.array_sort(F.collect_list("entry")).alias("entries"))
        .select(
            F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
            F.concat(
                F.lit('<?xml version="1.0"?>'),
                F.when(F.col("num") == 7, F.lit("<sitemapindex>")).otherwise(
                    F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">')
                ),
                F.array_join("entries", ""),
                F.when(F.col("num") == 7, F.lit("</sitemapindex>")).otherwise(
                    F.lit("</urlset>")
                ),
            ).alias("body"),
        )
    )
    frontier = parse_sitemap(sitemaps).where(F.col("kind") == "url")
    rules = parse_robots(_robots_fixture(docs), agent="crawler")
    return (
        robots_filter(frontier, rules, "url", keep="all")
        .select("host", "url", "lastmod", "crawl_allowed")
        .orderBy("url", "lastmod")
    )
