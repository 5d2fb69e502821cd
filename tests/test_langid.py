"""Trained hashed multiclass language-ID (operators/langid.py).

Closes SURVEY's langid gap with the engine's train → export →
codegen-serve pattern; the marker heuristic (operators/text.py:77)
stays the zero-dependency fallback for unsegmented scripts."""

from __future__ import annotations

from pyspark.sql import functions as F

from metalpipe_spark.operators.langid import (
    LANGID_CLASSES,
    detect_language_model,
    synthetic_multilingual_text,
    train_hashed_langid,
)


def _fixture(spark, n: int, salt: str):
    carr = F.array(*[F.lit(c) for c in LANGID_CLASSES])
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.element_at(
                carr, (F.col("id") % len(LANGID_CLASSES)).cast("int") + 1
            ).alias("lang"),
        )
        .withColumn("text", synthetic_multilingual_text("lang", "doc_id", salt))
    )


def _accuracy(df, pred_col: str) -> float:
    n = df.count()
    return df.where(F.col(pred_col) == F.col("lang")).count() / n


def test_pinned_model_beats_marker_heuristic(spark):
    """The VERDICT r9 'done' bar: pinned-weight accuracy on a held-out
    fixture >= the marker heuristic's (the salt stream 'v1' is disjoint
    from the training salt 'train')."""
    from metalpipe_spark.operators.text import detect_language

    ev = _fixture(spark, 1000, "v1").cache()
    try:
        model_acc = _accuracy(
            ev.withColumn("p", detect_language_model("text")), "p"
        )
        marker_acc = _accuracy(
            ev.withColumn("p", detect_language("text")), "p"
        )
    finally:
        ev.unpersist()
    assert model_acc >= 0.98
    assert model_acc >= marker_acc


def test_train_then_serve_roundtrip(spark):
    """A freshly trained model's exported floats drop into the codegen
    serving fold and classify their own training distribution."""
    tr = _fixture(spark, 300, "roundtrip")
    classes, weights, biases = train_hashed_langid(
        tr, dim=64, max_iter=60, reg_param=1e-3
    )
    assert classes == LANGID_CLASSES
    acc = _accuracy(
        tr.withColumn(
            "p", detect_language_model("text", classes, weights, biases)
        ),
        "p",
    )
    assert acc >= 0.95


def test_serving_is_pure_plan(spark):
    """No Python evaluation in the serving path — the weights are plan
    literals and the fold is JVM HOF."""
    df = _fixture(spark, 10, "plan")
    plan = (
        df.select(detect_language_model("text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_argmax_tie_breaks_to_first_class(spark):
    """Deterministic tie-break: equal logits pick the earliest class —
    the same first-index contract as DuckDB's list_position."""
    classes = ["aa", "bb"]
    weights = {"aa": [0.0, 0.0], "bb": [0.0, 0.0]}
    biases = {"aa": 0.5, "bb": 0.5}
    df = spark.createDataFrame([("x y",)], "text string")
    got = df.select(
        detect_language_model("text", classes, weights, biases).alias("p")
    ).first()["p"]
    assert got == "aa"


def test_null_text_is_total(spark):
    """NULL text coalesces to '' and still yields a prediction (the
    detect_language NULL contract)."""
    df = spark.createDataFrame([(None,)], "text string")
    assert (
        df.select(detect_language_model("text").alias("p")).first()["p"]
        in LANGID_CLASSES
    )
