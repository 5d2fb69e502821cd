"""CLI parity with the reference's ``metalpipe run|draw`` entry point
(/root/reference/metalpipe/bin/metalpipe:120-172).

    python -m metalpipe_spark.cli run  --filename pipeline.yaml
    python -m metalpipe_spark.cli draw --filename pipeline.yaml

``run`` compiles the YAML to DataFrames and executes the terminal
actions (streaming terminals run with an availableNow trigger to a
memory sink); ``draw`` prints the DAG without executing.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build(filename: str, master: str | None, capture_dir: str | None = None):
    from metalpipe_spark.plans.pipeline import load_yaml_pipeline
    from metalpipe_spark.session import get_spark

    spark = get_spark(app_name="metalpipe-spark-cli", master=master)
    with open(filename) as fh:
        text = fh.read()
    return spark, load_yaml_pipeline(spark, text, capture_dir=capture_dir)


def cmd_run(args) -> int:
    from metalpipe_spark.streaming.streams import run_to_memory

    spark, p = _build(args.filename, args.master, args.capture_dir)
    counts = {}
    for name, df in p.terminal_frames().items():
        if df.isStreaming:
            out = run_to_memory(df, f"cli_{name}", spark)
            counts[name] = out.count()
        else:
            if p.specs[name].cls == "PrinterOfThings":
                df.show(truncate=False)
            counts[name] = df.count()
    print(json.dumps({"terminals": counts}))
    return 0


def cmd_draw(args) -> int:
    import yaml

    from metalpipe_spark.plans.pipeline import _edges

    with open(args.filename) as fh:
        config = yaml.safe_load(fh.read())
    nodes = config.get("nodes", {})
    edges = _edges(config)
    print(f"pipeline: {config.get('pipeline_name', '?')}")
    for name, spec in nodes.items():
        outs = [b for a, b in edges if a == name]
        arrow = f" -> {', '.join(outs)}" if outs else "  (terminal)"
        print(f"  {name} [{spec.get('class')}]" + arrow)
    return 0


def cmd_queries(args) -> int:
    """List the catalog (name + one-line doc + oracle presence)."""
    from metalpipe_spark.catalog import load_all

    for name, q in sorted(load_all().items()):
        mark = "oracle" if q.oracle else "rows-only"
        print(f"{name:28s} [{mark}] {q.doc}")
    return 0


def cmd_explain(args) -> int:
    """Print the formatted physical plan for a catalog query — the
    plan-inspection loop (explain -> fix -> re-explain) as a first-class
    CLI verb."""
    from metalpipe_spark.catalog import load_all
    from metalpipe_spark.session import get_spark

    spark = get_spark(app_name="metalpipe-spark-explain", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    q = load_all()[args.query]
    df = q.build(spark, args.sf_dir)
    print(
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), args.mode
        )
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="metalpipe-spark")
    sub = ap.add_subparsers(dest="command", required=True)
    for cmd, fn in (("run", cmd_run), ("draw", cmd_draw)):
        sp = sub.add_parser(cmd)
        sp.add_argument("--filename", required=True)
        sp.add_argument("--master", default=None)
        # Record/replay fixturizer (metalpipe_recorder.py:7-45): capture
        # every batch node's output under this directory.
        sp.add_argument("--capture-dir", default=None)
        sp.set_defaults(fn=fn)
    sp = sub.add_parser("queries")
    sp.set_defaults(fn=cmd_queries)
    sp = sub.add_parser("explain")
    sp.add_argument("query")
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sp.add_argument("--master", default=None)
    sp.add_argument("--mode", default="formatted")
    sp.set_defaults(fn=cmd_explain)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
