"""Catalog queries driven through the YAML pipeline compiler — proves the
reference's production entry path (config → DAG → results) end-to-end
against the oracle (SURVEY.md §3.1)."""

from __future__ import annotations

import textwrap

from pyspark.sql import DataFrame, SparkSession

from metalpipe_spark.catalog import register


@register(
    "q_pipeline_yaml",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_mktsegment,
           lower(replace(c.c_mktsegment, ' ', '_')) AS segment_slug,
           'etl' AS source
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    ORDER BY o_orderkey
    """,
    doc="YAML pipeline (bin/metalpipe entry path): readers -> filter -> regex -> broadcast join -> constant tag.",
)
def q_pipeline_yaml(spark: SparkSession, sf_dir: str) -> DataFrame:
    text = textwrap.dedent(
        f"""
        pipeline_name: catalog_etl
        nodes:
          orders:
            class: ParquetReader
            options: {{path: "{sf_dir}/orders.parquet"}}
          customers:
            class: ParquetReader
            options: {{path: "{sf_dir}/customer.parquet"}}
          keyed:
            class: Remapper
            options:
              mapping:
                o_custkey: c_custkey
                c_mktsegment: c_mktsegment
                segment_slug: c_mktsegment
          slug:
            class: SubstituteRegex
            options: {{key: segment_slug, match_regex: " ", substitute_string: "_"}}
          building_only:
            class: Filter
            options: {{test: value_is_true, test_keypath: is_building}}
          joined:
            class: Join
            options: {{"on": o_custkey, broadcast: true}}
          tagged:
            class: InsertData
            options:
              values: {{source: etl}}
        paths:
          - [orders, joined, tagged]
          - [customers, keyed, slug, lowered, flag, building_only, joined]
        """
    )
    import yaml

    from metalpipe_spark.plans.pipeline import compile_pipeline

    config = yaml.safe_load(text)
    # Two nodes whose options are Python callables (the reference passes
    # dotted-path functions in YAML; both forms are supported).
    config["nodes"]["lowered"] = {
        "class": "SimpleTransforms",
        "options": {
            "transforms": [
                {"path": "segment_slug", "target_function": "metalpipe_spark.functions.scalars.lower_str",
                 "return_type": "string"}
            ]
        },
    }
    config["nodes"]["flag"] = {
        "class": "FunctionOfMessage",
        "options": {
            "function": "metalpipe_spark.functions.scalars.is_building_segment",
            "return_type": "boolean",
            "key": "c_mktsegment",
            "output_key": "is_building",
        },
    }
    p = compile_pipeline(spark, config)
    return (
        p.dataframes["tagged"]
        .select("o_orderkey", "o_totalprice", "c_mktsegment", "segment_slug", "source")
        .orderBy("o_orderkey")
    )


def _corpus_pipeline_oracle() -> str:
    """The full training-data pipeline as one composed SQL chain —
    every stage reuses the fragment its standalone oracle row already
    proved (PII chain from PII_PATTERNS, quality rules from
    QUALITY_RULES, fingerprint dedup, 64/16 chunking, prefix-sum
    packing)."""
    from metalpipe_spark.operators.text import PII_PATTERNS, QUALITY_RULES

    red = "text"
    for name, pat in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '<{name.upper()}>', 'g')"
    drop_when = " ".join(
        f"WHEN {pred} THEN '{name}'" for name, pred in QUALITY_RULES
    )
    return f"""
    WITH scrubbed AS (
      SELECT doc_id, {red} AS text FROM documents
    ),
    sig AS (
      SELECT doc_id, text, string_split(text, ' ') AS toks,
             len(string_split(text, ' '))::BIGINT AS n_tokens
      FROM scrubbed
    ),
    q AS (
      SELECT doc_id, text, toks, n_tokens,
             greatest(n_tokens - 1, 0) AS bi_all,
             greatest(n_tokens - 2, 0) AS tri_all,
             len(list_distinct(list_transform(range(1, greatest(n_tokens, 1)),
                 i -> toks[i] || ' ' || toks[i+1]))) AS bi_dist,
             len(list_distinct(list_transform(range(1, greatest(n_tokens - 1, 1)),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS tri_dist,
             length(text) AS n_chars,
             length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS n_alnum
      FROM sig
    ),
    rated AS (
      SELECT doc_id, text, toks, n_tokens,
             CASE WHEN bi_all > 0
                  THEN (bi_all - least(bi_dist, bi_all))::DOUBLE / bi_all::DOUBLE
                  ELSE 0.0 END AS dup_bigram_frac,
             CASE WHEN tri_all > 0
                  THEN (tri_all - least(tri_dist, tri_all))::DOUBLE / tri_all::DOUBLE
                  ELSE 0.0 END AS dup_trigram_frac,
             (n_chars - (n_tokens - 1))::DOUBLE / n_tokens::DOUBLE AS mean_word_len,
             CASE WHEN n_chars > 0
                  THEN (n_chars - n_alnum - (n_tokens - 1))::DOUBLE / n_chars::DOUBLE
                  ELSE 0.0 END AS symbol_ratio
      FROM q
    ),
    kept AS (
      SELECT doc_id, text, toks
      FROM rated
      WHERE (CASE {drop_when} ELSE NULL END) IS NULL
    ),
    deduped AS (
      SELECT MIN(doc_id) AS doc_id
      FROM kept
      GROUP BY md5(array_to_string(
        regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'), ' '))
    ),
    clean AS (
      SELECT k.doc_id, k.toks, len(k.toks) AS n
      FROM kept k JOIN deduped USING (doc_id)
    ),
    st AS (
      SELECT doc_id, toks, n,
             unnest(range(1, greatest(n, 1) + 1, 48)) AS s
      FROM clean
    ),
    chunks AS (
      SELECT doc_id, ((s - 1) // 48)::BIGINT AS chunk_id,
             least(64, n - s + 1)::BIGINT AS n_chunk_tokens,
             doc_id * 1048576 + ((s - 1) // 48) AS chunk_key
      FROM st
      WHERE s = 1 OR s + 16 <= n
    ),
    packed AS (
      SELECT doc_id, chunk_id, n_chunk_tokens,
             COALESCE(SUM(n_chunk_tokens) OVER (
               ORDER BY chunk_key
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS prefix
      FROM chunks
    )
    SELECT doc_id, chunk_id, n_chunk_tokens,
           (prefix // 4096)::BIGINT AS shard_id
    FROM packed
    ORDER BY doc_id, chunk_id
    """


@register(
    "q_corpus_pipeline",
    _corpus_pipeline_oracle(),
    doc=(
        "The WHOLE training-data pipeline, hash-checked end-to-end: "
        "PII scrub -> Gopher quality filter -> exact dedup -> 64/16 "
        "chunking -> token-budget shard packing."
    ),
)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from metalpipe_spark.operators.curation import pack_shards
    from metalpipe_spark.operators.dedup import exact_dedup
    from metalpipe_spark.operators.text import (
        chunk_documents,
        quality_filter,
        redact_pii,
    )
    from metalpipe_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents", rebalance=True)
    # The PII regex chain is the most expensive scan in the pipeline and
    # the plan references it 4x (quality keep-list, semi-join back, and
    # both sides of the dedup semi-join).  Persist it — and the
    # post-filter survivors — so each is computed once; MEMORY_AND_DISK
    # spills gracefully at cluster scale (2.4x wall-time on the composed
    # pipeline at sf0.1).
    scrubbed = docs.select("doc_id", redact_pii("text").alias("text")).persist()
    keep = quality_filter(scrubbed).where(F.col("keep")).select("doc_id")
    kept = scrubbed.join(keep, "doc_id", "left_semi").persist()
    deduped = kept.join(exact_dedup(kept), "doc_id", "left_semi")
    chunks = chunk_documents(deduped, chunk_tokens=64, overlap=16).withColumn(
        "chunk_key", F.col("doc_id") * F.lit(1 << 20) + F.col("chunk_id")
    )
    packed = pack_shards(
        chunks.select("doc_id", "chunk_id", "n_chunk_tokens", "chunk_key"),
        "n_chunk_tokens",
        "chunk_key",
        4096,  # pack_shards checkpoints its ranged frame: the 5-stage
        # upstream is computed once and partition membership is frozen
    )
    # pack_shards has already materialized its checkpoint (its internal
    # totals job ran), so the upstream caches are done serving reads —
    # release them instead of holding blocks for the session lifetime.
    scrubbed.unpersist()
    kept.unpersist()
    return packed.select(
        "doc_id", "chunk_id", "n_chunk_tokens", "shard_id"
    ).orderBy("doc_id", "chunk_id")


def _mix_pipeline_oracle() -> str:
    """SQL replay of the round-7 curation chain: normalized exact dedup
    (min-id per CCNet-normalized fingerprint) → hashed-linear model
    quality filter (logit >= 0) → domain-mixture resampling over the
    SURVIVING corpus → deterministic train/val/test split."""
    from metalpipe_spark.catalog.curation import _MIX_CASE
    from metalpipe_spark.catalog.text import _model_quality_oracle, _model_weights

    # Reuse the model-quality oracle's fold by inlining its expression.
    warr = "[" + ", ".join(f"'{float(w)!r}'::DOUBLE" for w in _model_weights()) + "]"
    d = len(_model_weights())
    logit = f"""
             list_reduce(
               list_transform(
                 string_split(text, ' '),
                 tok -> {warr}[
                   (('0x' || substr(md5(tok), 1, 15))::BIGINT % {d}) + 1
                 ]
               ),
               (a, x) -> a + x
             ) / greatest(len(string_split(text, ' ')), 1)
    """
    uniform = (
        "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT"
        " / 1152921504606846976.0"
    )
    # The mixing filter already conditioned on `uniform` (kept rows have
    # LOW uniforms), so the split must draw an INDEPENDENT uniform or
    # 'test' (u < 0.1) would be over-represented — the salt exists for
    # exactly this (measured 65 test vs 9 validation rows unsalted at
    # sf0.01 for nominal 0.1/0.1).
    salted = (
        "('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 15))::BIGINT"
        " / 1152921504606846976.0"
    )
    return rf"""
    WITH n AS (
      SELECT doc_id, lang, text,
             md5(trim(regexp_replace(
               regexp_replace(
                 translate(lower(text),
                           'áàâäãåéèêëíìîïóòôöõúùûüýÿçñ',
                           'aaaaaaeeeeiiiiooooouuuuyycn'),
                 '[^\p{{L}}\p{{N}} ]', ' ', 'g'),
               ' +', ' ', 'g'))) AS norm_fp
      FROM documents
    ),
    dd AS (
      SELECT doc_id, lang, text FROM (
        SELECT doc_id, lang, text,
               row_number() OVER (PARTITION BY norm_fp ORDER BY doc_id) AS rn
        FROM n
      ) WHERE rn = 1
    ),
    q AS (
      SELECT doc_id, lang FROM dd
      WHERE round({logit}, 6) >= 0.0
    ),
    counts AS (SELECT lang, count(*) AS cnt FROM q GROUP BY lang),
    tot AS (SELECT sum(cnt) AS total FROM counts),
    rates AS (
      SELECT lang,
             least('1.0'::DOUBLE,
                   (('0.6'::DOUBLE * total) * {_MIX_CASE}) / cnt) AS rate
      FROM counts CROSS JOIN tot
    ),
    mixed AS (
      SELECT q.doc_id, q.lang
      FROM q JOIN rates r ON q.lang = r.lang
      WHERE {uniform} < r.rate
    )
    SELECT doc_id, lang,
           CASE WHEN {salted} < '0.1'::DOUBLE THEN 'test'
                WHEN '{0.1 + 0.8!r}'::DOUBLE > {salted} THEN 'train'
                ELSE 'validation' END AS split
    FROM mixed
    ORDER BY doc_id
    """


@register(
    "q_mix_pipeline",
    _mix_pipeline_oracle(),
    doc=(
        "Round-7 curation chain composed end-to-end: CCNet-normalized "
        "exact dedup -> hashed-linear model quality filter -> domain-"
        "mixture resampling over the surviving corpus -> deterministic "
        "train/val/test split.  Every stage is a pure filter or one "
        "bounded aggregate; the whole chain shuffles only the dedup "
        "fingerprint window and the few-row mixture counts."
    ),
)
def q_mix_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from metalpipe_spark.catalog.curation import _MIX_WEIGHTS
    from metalpipe_spark.catalog.text import _model_weights
    from metalpipe_spark.operators.curation import domain_mix_sample, split_corpus
    from metalpipe_spark.operators.text import (
        model_quality_filter,
        normalized_dedup,
    )
    from metalpipe_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    dd = normalized_dedup(docs)
    q = (
        model_quality_filter(dd, _model_weights(), threshold=0.0)
        .where(F.col("keep"))
        .select("doc_id", "lang")
    )
    mixed = domain_mix_sample(q, "lang", "doc_id", _MIX_WEIGHTS, budget_frac=0.6)
    # Independent uniform for the split (salt): the mix filter already
    # conditioned on the unsalted doc_id uniform, which would bias the
    # split toward 'test' (see the oracle builder's comment).
    out = split_corpus(
        mixed, "doc_id", {"train": 0.8, "validation": 0.1, "test": 0.1},
        salt="split",
    )
    return out.select("doc_id", "lang", "split").orderBy("doc_id")
