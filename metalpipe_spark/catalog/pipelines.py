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
