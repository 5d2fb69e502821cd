"""Train the hashed multiclass language-ID model and pin its weights.

Writes ``metalpipe_spark/operators/langid_weights.py`` (committed, so
serving never depends on a training run).  Training data is the
deterministic synthetic multilingual fixture (salt='train'); evaluation
runs on the catalog salt ('v1') — a disjoint hash stream, i.e. held
out.  Prints model vs marker-heuristic accuracy; the pytest floor is in
tests/test_langid.py.

Usage:  python scripts/train_langid.py [n_train] [dim]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from metalpipe_spark.operators.langid import (
        CJK_CLASSES,
        LANGID_CLASSES,
        detect_language_cjk,
        detect_language_model,
        synthetic_cjk_text,
        synthetic_multilingual_text,
        train_hashed_cjk_langid,
        train_hashed_langid,
    )
    from metalpipe_spark.operators.text import detect_language

    carr = F.array(*[F.lit(c) for c in LANGID_CLASSES])

    def fixture(n: int, salt: str):
        return (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.element_at(
                    carr, (F.col("id") % len(LANGID_CLASSES)).cast("int") + 1
                ).alias("lang"),
            )
            .withColumn(
                "text", synthetic_multilingual_text("lang", "doc_id", salt)
            )
        )

    train_df = fixture(n_train, "train")
    classes, weights, biases, script_weights = train_hashed_langid(
        train_df, dim=dim
    )

    ev = fixture(2000, "v1").cache()
    pred = ev.withColumn(
        "pred",
        detect_language_model(
            "text", classes, weights, biases, script_weights
        ),
    ).cache()
    model_acc = pred.where(F.col("pred") == F.col("lang")).count() / 2000
    per_lang = {
        r["lang"]: (r["ok"], r["n"])
        for r in pred.groupBy("lang")
        .agg(
            F.sum((F.col("pred") == F.col("lang")).cast("int")).alias("ok"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    marker_acc = (
        ev.withColumn("pred", detect_language("text"))
        .where(F.col("pred") == F.col("lang"))
        .count()
        / 2000
    )
    print(f"model accuracy:  {model_acc:.4f}")
    print(f"marker accuracy: {marker_acc:.4f}")
    lang_lines = "\n".join(
        f"  {c}: {ok}/{n} = {ok / n:.4f}"
        for c, (ok, n) in sorted(per_lang.items())
    )
    print("held-out accuracy per language:")
    print(lang_lines)

    # ---- unsegmented-CJK char-bigram model (VERDICT r12 task 4) ----
    cjk_arr = F.array(*[F.lit(c) for c in CJK_CLASSES])

    def cjk_fixture(n: int, salt: str):
        return (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.element_at(
                    cjk_arr, (F.col("id") % len(CJK_CLASSES)).cast("int") + 1
                ).alias("lang"),
            )
            .withColumn("text", synthetic_cjk_text("lang", "doc_id", salt))
        )

    cjk_train = cjk_fixture(n_train, "train")
    cjk_classes, cjk_w, cjk_b, cjk_sw = train_hashed_cjk_langid(
        cjk_train, dim=dim
    )
    cjk_ev = cjk_fixture(2000, "v1").cache()
    cjk_pred = cjk_ev.withColumn(
        "pred", detect_language_cjk("text", cjk_classes, cjk_w, cjk_b, cjk_sw)
    ).cache()
    cjk_acc = cjk_pred.where(F.col("pred") == F.col("lang")).count() / 2000
    cjk_per = {
        r["lang"]: (r["ok"], r["n"])
        for r in cjk_pred.groupBy("lang")
        .agg(
            F.sum((F.col("pred") == F.col("lang")).cast("int")).alias("ok"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    cjk_marker_acc = (
        cjk_ev.withColumn("pred", detect_language("text"))
        .where(F.col("pred") == F.col("lang"))
        .count()
        / 2000
    )
    cjk_lines = "\n".join(
        f"  {c}: {ok}/{n} = {ok / n:.4f}"
        for c, (ok, n) in sorted(cjk_per.items())
    )
    print(f"CJK char-bigram model accuracy (unsegmented): {cjk_acc:.4f}")
    print(f"CJK marker accuracy (unsegmented):            {cjk_marker_acc:.4f}")
    print("held-out CJK accuracy per language:")
    print(cjk_lines)

    out = os.path.join(REPO, "metalpipe_spark", "operators", "langid_weights.py")
    with open(out, "w") as f:
        f.write(
            '"""Pinned hashed-langid weights — GENERATED by '
            "scripts/train_langid.py.\n\n"
            f"Trained on {n_train} synthetic docs (salt='train'), "
            f"dim={dim}, {len(classes)} languages\n"
            "(script-block character fractions appended to the hashed "
            "token features);\n"
            f"held-out (salt='v1') accuracy {model_acc:.4f} vs marker "
            f"heuristic {marker_acc:.4f}.\n\n"
            "Held-out accuracy per language:\n"
            f"{lang_lines}\n\n"
            "CJK char-bigram model (unsegmented zh/ja/ko; hashed "
            "character bigrams +\nscript fractions): held-out accuracy "
            f"{cjk_acc:.4f} vs marker {cjk_marker_acc:.4f}.\n\n"
            "Held-out CJK accuracy per language (unsegmented):\n"
            f"{cjk_lines}\n\n"
            "Regenerate with:\n"
            f"    python scripts/train_langid.py {n_train} {dim}\n"
            '"""\n\n'
        )
        f.write(f"LANGID_TRAINED_CLASSES = {classes!r}\n\n")
        f.write(f"LANGID_DIM = {dim}\n\n")
        f.write("LANGID_WEIGHTS = {\n")
        for c in classes:
            f.write(f"    {c!r}: {[round(w, 10) for w in weights[c]]!r},\n")
        f.write("}\n\n")
        f.write("LANGID_SCRIPT_WEIGHTS = {\n")
        for c in classes:
            f.write(
                f"    {c!r}: {[round(w, 10) for w in script_weights[c]]!r},\n"
            )
        f.write("}\n\n")
        rb = {c: round(biases[c], 10) for c in classes}
        f.write(f"LANGID_BIASES = {rb!r}\n\n")
        f.write(f"CJK_TRAINED_CLASSES = {cjk_classes!r}\n\n")
        f.write(f"CJK_DIM = {dim}\n\n")
        f.write("CJK_WEIGHTS = {\n")
        for c in cjk_classes:
            f.write(f"    {c!r}: {[round(w, 10) for w in cjk_w[c]]!r},\n")
        f.write("}\n\n")
        f.write("CJK_SCRIPT_WEIGHTS = {\n")
        for c in cjk_classes:
            f.write(f"    {c!r}: {[round(w, 10) for w in cjk_sw[c]]!r},\n")
        f.write("}\n\n")
        crb = {c: round(cjk_b[c], 10) for c in cjk_classes}
        f.write(f"CJK_BIASES = {crb!r}\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
