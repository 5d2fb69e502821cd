"""Pipeline-config compiler tests (SURVEY.md §3.1): YAML → DataFrame DAG.

Mirrors the reference's pipeline-mechanics tests
(/root/reference/tests/test_metalpipe_processor.py:47-158): linking,
fan-in, end-to-end content assertions on a sink node.
"""

from __future__ import annotations

import os
import textwrap

import pytest
from pyspark.sql import functions as F

from metalpipe_spark.plans.pipeline import (
    apply_secrets,
    compile_pipeline,
    load_yaml_pipeline,
    render_template,
    run_pipeline,
)
from tests.conftest import SF_SMOKE


def test_linear_pipeline_filter_remap(spark):
    config = {
        "nodes": {
            "read": {"class": "ParquetReader", "options": {"path": f"{SF_SMOKE}/customer.parquet"}},
            "only_building": {
                "class": "Filter",
                "options": {"test": "value_is_not_none", "test_keypath": "c_name"},
            },
            "shape": {
                "class": "Remapper",
                "options": {"mapping": {"id": "c_custkey", "segment": "c_mktsegment"}},
            },
        },
        "paths": [["read", "only_building", "shape"]],
    }
    p = compile_pipeline(spark, config)
    assert p.terminals == ["shape"]
    df = p.dataframes["shape"]
    assert df.columns == ["id", "segment"]
    direct = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    assert df.count() == direct.filter(F.col("c_name").isNotNull()).count()


def test_fan_in_union(spark):
    config = {
        "nodes": {
            "a": {"class": "CounterOfThings", "options": {"start": 0, "end": 5}},
            "b": {"class": "CounterOfThings", "options": {"start": 100, "end": 103}},
            "sink": {"class": "BlackHole"},
        },
        "edges": [["a", "sink"], ["b", "sink"]],
    }
    p = compile_pipeline(spark, config)
    rows = sorted(r["count"] for r in p.dataframes["sink"].collect())
    assert rows == [0, 1, 2, 3, 4, 100, 101, 102]


def test_join_node(spark):
    config = {
        "nodes": {
            "orders": {"class": "ParquetReader", "options": {"path": f"{SF_SMOKE}/orders.parquet"}},
            "customer": {"class": "ParquetReader", "options": {"path": f"{SF_SMOKE}/customer.parquet"}},
            "rename": {
                "class": "Remapper",
                "options": {"mapping": {"o_custkey": "c_custkey", "c_name": "c_name"}},
            },
            "joined": {"class": "Join", "options": {"on": "o_custkey", "broadcast": True}},
        },
        "paths": [["orders", "joined"], ["customer", "rename", "joined"]],
    }
    p = compile_pipeline(spark, config)
    df = p.dataframes["joined"]
    assert "c_name" in df.columns and "o_orderkey" in df.columns
    assert df.count() > 0


def test_cycle_detection(spark):
    config = {
        "nodes": {
            "a": {"class": "BlackHole"},
            "b": {"class": "BlackHole"},
        },
        "edges": [["a", "b"], ["b", "a"]],
    }
    with pytest.raises(ValueError, match="cycle"):
        compile_pipeline(spark, config)


def test_yaml_template_secrets_end_to_end(spark, tmp_path):
    secrets = tmp_path / "secrets.yaml"
    secrets.write_text("cache.token: sf_dir_value\n")
    os.environ["MPS_TEST_DATA_DIR"] = SF_SMOKE
    text = textwrap.dedent(
        """
        pipeline_name: smoke
        nodes:
          read:
            class: ParquetReader
            options: {path: "{{ MPS_TEST_DATA_DIR }}/nation.parquet"}
          tag:
            class: InsertData
            options:
              values: {source: cache.token}
        paths:
          - [read, tag]
        """
    )
    p = load_yaml_pipeline(spark, text, secrets_files=[str(secrets)])
    row = p.dataframes["tag"].select("source").head()
    assert row[0] == "sf_dir_value"
    counts = run_pipeline(p)
    assert counts["tag"] == 25


def test_universal_node_options(spark):
    """input_mapping renames on ingest; post_process_function applies a
    dotted-path UDF at a keypath of each output."""
    config = {
        "nodes": {
            "read": {"class": "ParquetReader", "options": {"path": f"{SF_SMOKE}/nation.parquet"}},
            "shaped": {
                "class": "Remapper",
                "options": {
                    "input_mapping": {"n_name": "nation_name"},
                    "mapping": {"name": "nation_name", "key": "n_nationkey"},
                    "post_process_function": "metalpipe_spark.functions.scalars.lower_str",
                    "post_process_keypath": "name",
                },
            },
        },
        "paths": [["read", "shaped"]],
    }
    p = compile_pipeline(spark, config)
    names = [r["name"] for r in p.dataframes["shaped"].orderBy("key").collect()]
    assert names[0] == "nation_0"  # renamed on ingest, lowered on egress


def test_render_template_env(monkeypatch):
    monkeypatch.setenv("MPS_TPL_X", "42")
    assert render_template("v={{ MPS_TPL_X }}") == "v=42"
    with pytest.raises(ValueError, match="unresolved"):
        render_template("v={{ not_a_real_thing_xyz }}")


def test_streaming_pipeline_yaml(spark, tmp_path):
    """A YAML config whose source is the streaming file watchdog and
    whose transform is a tumbling window — compiled and executed with an
    availableNow trigger (the reference's TimeWindowAccumulator intent)."""
    from metalpipe_spark.sources.readers import load_table
    from metalpipe_spark.streaming.streams import run_to_memory

    ev = load_table(spark, SF_SMOKE, "events")
    src = tmp_path / "ev"
    ev.limit(500).write.parquet(str(src))
    ddl = ev.schema.simpleString()[7:-1].replace(":", " ")  # struct<...> -> DDL-ish
    config = {
        "nodes": {
            "watch": {
                "class": "LocalDirectoryWatchdog",
                "options": {"directory": str(src), "schema": ev.schema.json() and ddl},
            },
            "windowed": {
                "class": "TimeWindowAccumulator",
                "options": {
                    "ts_col": "ts",
                    "window": "1 day",
                    "aggregates": [{"fn": "count", "column": "*", "alias": "n"}],
                },
            },
        },
        "paths": [["watch", "windowed"]],
    }
    p = compile_pipeline(spark, config)
    df = p.dataframes["windowed"]
    assert df.isStreaming
    out = run_to_memory(df, "t_stream_yaml", spark, output_mode="complete")
    assert out.agg(F.sum("n")).head()[0] == 500


def test_cli_run_and_draw(spark, tmp_path, capsys):
    import textwrap

    from metalpipe_spark.cli import main

    cfg = tmp_path / "p.yaml"
    cfg.write_text(
        textwrap.dedent(
            f"""
            pipeline_name: cli_smoke
            nodes:
              read:
                class: ParquetReader
                options: {{path: "{SF_SMOKE}/region.parquet"}}
              hole:
                class: BlackHole
            paths:
              - [read, hole]
            """
        )
    )
    assert main(["draw", "--filename", str(cfg)]) == 0
    drawn = capsys.readouterr().out
    assert "read [ParquetReader] -> hole" in drawn
    assert main(["run", "--filename", str(cfg)]) == 0
    ran = capsys.readouterr().out
    assert '"hole": 5' in ran


def test_apply_secrets_nested():
    cfg = {"a": ["tok1", {"b": "tok2"}], "c": "plain"}
    out = apply_secrets(cfg, {"tok1": "X", "tok2": "Y"})
    assert out == {"a": ["X", {"b": "Y"}], "c": "plain"}
