"""Batched embedding inference (operators/inference.py).

The reference has no inference surface (closest: per-message Python
functions, reference metalpipe/node.py:976); this is the
training-data-pipeline extension — the stage that PRODUCES the
embeddings table every similarity consumer assumes."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from metalpipe_spark.operators.inference import (
    HashedProjectionModel,
    embed_documents,
    load_model,
    register_embedding_model,
)


def _hand_embed(text: str, dim: int, salt: str = "") -> list[float]:
    """Independent re-derivation of the fixture math (test-side twin)."""
    import hashlib
    import re

    counts = [0] * dim
    for tok in re.split(r"\s+", text.lower()):
        if not tok:
            continue
        h = hashlib.md5((salt + tok).encode()).hexdigest()
        counts[int(h[:15], 16) % dim] += 1 if int(h[15], 16) % 2 == 0 else -1
    n2 = sum(c * c for c in counts)
    return [c / math.sqrt(n2) for c in counts] if n2 else [0.0] * dim


def test_embed_documents_values_passthrough_and_unit_norm(spark):
    """Embeddings equal the hand-derived fixture math exactly; all
    input columns pass through; non-degenerate rows are unit-norm."""
    rows = [
        (1, "Hello world hello", "a"),
        (2, "spark  and   arrow", "b"),
        (3, "", "c"),
        (4, None, "d"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tag string")
    out = embed_documents(df, model="hashed-projection:8", batch_size=2)
    assert out.columns == ["doc_id", "text", "tag", "embedding"]
    got = {r["doc_id"]: (r["tag"], r["embedding"]) for r in out.collect()}
    assert got[1][0] == "a"
    for doc_id, text, _ in rows:
        want = _hand_embed(text or "", 8)
        assert got[doc_id][1] == want, doc_id
    assert got[3][1] == [0.0] * 8 and got[4][1] == [0.0] * 8
    nrm = sum(v * v for v in got[1][1])
    assert abs(nrm - 1.0) < 1e-12


def test_embed_documents_batching_and_gate_equal_unbatched(spark):
    """batch_size / max_concurrent change execution shape only, never
    values; the salt knob yields a genuinely different model."""
    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 7).cast("string"),
                 F.lit(" common word")).alias("text"),
    )
    a = embed_documents(df, model="hashed-projection:16", batch_size=3,
                        max_concurrent=2).orderBy("doc_id").collect()
    b = embed_documents(df, model="hashed-projection:16",
                        batch_size=1000).orderBy("doc_id").collect()
    assert [r["embedding"] for r in a] == [r["embedding"] for r in b]
    s = embed_documents(df, model="hashed-projection:16:pepper",
                        batch_size=1000).orderBy("doc_id").collect()
    assert [r["embedding"] for r in s] != [r["embedding"] for r in b]


def test_embed_documents_plan_is_one_narrow_python_stage(spark):
    """No shuffle, no collect: the embed stage is scan-shaped — at
    100 TB it scales with input splits."""
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("a b").alias("text")
    )
    plan = (
        embed_documents(df, model="hashed-projection:4")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_embed_documents_validations_and_registry(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="batch_size"):
        embed_documents(df, batch_size=0)
    with pytest.raises(ValueError, match="max_concurrent"):
        embed_documents(df, max_concurrent=0)
    with pytest.raises(ValueError, match="no column"):
        embed_documents(df, text_col="body")
    with pytest.raises(ValueError, match="already exists"):
        embed_documents(df.withColumn("embedding", F.lit(1)))
    # Unknown model names fail LOUD at plan time on the driver, with
    # the plug-in instructions — not as a per-task executor storm.
    with pytest.raises(NotImplementedError, match="register_embedding_model"):
        embed_documents(df, model="torch:all-MiniLM-L6-v2")
    with pytest.raises(ValueError, match="hashed-projection spec"):
        embed_documents(df, model="hashed-projection:abc")
    with pytest.raises(ValueError, match="dim"):
        HashedProjectionModel(0)


def test_register_embedding_model_plugs_into_embed(spark):
    """A custom loader runs through the same cached path; the cache is
    per spec string (same spec -> same instance)."""

    class Doubler:
        dim = 2

        def encode(self, texts):
            import numpy as np

            return np.array([[float(len(t or "")), 2.0] for t in texts])

    register_embedding_model("testlen", lambda args: Doubler())
    df = spark.createDataFrame([(1, "abc"), (2, "")], "doc_id long, text string")
    got = {
        r["doc_id"]: r["embedding"]
        for r in embed_documents(df, model="testlen:").collect()
    }
    assert got == {1: [3.0, 2.0], 2: [0.0, 2.0]}
    assert load_model("testlen:") is load_model("testlen:")


def test_embed_documents_yaml_node(spark, tmp_path):
    """EmbedDocuments is reachable from the YAML pipeline surface."""
    from metalpipe_spark.plans.pipeline import compile_pipeline

    src = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    ).write.parquet(str(src))
    cfg = {
        "nodes": {
            "docs": {"class": "ParquetReader", "options": {"path": str(src)}},
            "embed": {
                "class": "EmbedDocuments",
                "options": {"model": "hashed-projection:4", "batch_size": 16},
            },
        },
        "paths": [["docs", "embed"]],
    }
    p = compile_pipeline(spark, cfg)
    rows = {
        r["doc_id"]: r["embedding"] for r in p.dataframes["embed"].collect()
    }
    assert rows[1] == _hand_embed("alpha beta", 4)
    assert rows[2] == _hand_embed("gamma", 4)


def test_incremental_embed_embeds_only_changed_and_new(spark):
    """The fingerprint anti-join: unchanged docs carry their STORED
    embedding through without re-running the model (proven by planting
    a wrong embedding in the store — a recompute would fix it), changed
    and new docs re-embed, and the model marker guards mixing."""
    import pytest
    from pyspark.sql import functions as F

    from metalpipe_spark.operators.inference import incremental_embed

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    fresh0, store = incremental_embed(docs, None, model="hashed-projection:4")
    assert sorted(r["doc_id"] for r in fresh0.collect()) == [1, 2]
    # Plant a sentinel embedding for doc 1: if the operator re-embedded
    # carried rows, the sentinel would be overwritten.
    store = store.withColumn(
        "embedding",
        F.when(
            F.col("doc_id") == 1, F.array(*[F.lit(9.0)] * 4)
        ).otherwise(F.col("embedding")),
    )
    recrawl = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma CHANGED"), (3, "new doc")],
        "doc_id long, text string",
    )
    fresh, updated = incremental_embed(
        recrawl, store, model="hashed-projection:4"
    )
    assert sorted(r["doc_id"] for r in fresh.collect()) == [2, 3]
    up = {r["doc_id"]: r["embedding"] for r in updated.collect()}
    assert set(up) == {1, 2, 3}
    assert up[1] == [9.0] * 4  # carried, not recomputed
    assert up[2] == _hand_embed("gamma CHANGED", 4)
    assert up[3] == _hand_embed("new doc", 4)
    # model-marker guard: a store embedded by another model fails loud
    with pytest.raises(ValueError, match="model markers"):
        incremental_embed(recrawl, updated, model="hashed-projection:4:salt")
    with pytest.raises(ValueError, match="missing columns"):
        incremental_embed(recrawl, docs, model="hashed-projection:4")


def test_numpy_mlp_model_through_embed_documents(spark):
    """The registered numpy-MLP encoder (VERDICT r14 task 4): a model
    with REAL weight tensors through the full mapInPandas path —
    deterministic across runs/chunkings (weights derive from the spec
    string, not RNG state), unit-norm outputs, input-sensitive."""
    import numpy as np

    from metalpipe_spark.operators.inference import (
        NumpyMLPModel,
        embed_documents,
    )

    rows = [(i, f"doc {i} alpha beta {'x' * (i % 5)}") for i in range(40)]
    rows.append((40, None))
    rows.append((41, ""))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spec = "numpy-mlp:64:32:16"
    a = {
        r["doc_id"]: r["embedding"]
        for r in embed_documents(df, model=spec, batch_size=7).collect()
    }
    b = {
        r["doc_id"]: r["embedding"]
        for r in embed_documents(df, model=spec, batch_size=256,
                                 max_concurrent=2).collect()
    }
    assert a == b  # bit-identical under different chunking + the gate
    assert len(a[0]) == 16
    for i, v in a.items():
        n = float(np.sqrt(sum(x * x for x in v)))
        if i in (40, 41):
            # empty/null text: zero feature vector still flows through
            # the MLP (bias path) — output is the same bias embedding
            assert a[40] == a[41]
        else:
            assert abs(n - 1.0) < 1e-9
    assert a[1] != a[2]  # input-sensitive
    # Same spec == same weights object content; different salt differs.
    m1, m2 = NumpyMLPModel(8, 4, 4), NumpyMLPModel(8, 4, 4)
    assert (m1.w1 == m2.w1).all() and (m1.b2 == m2.b2).all()
    m3 = NumpyMLPModel(8, 4, 4, salt="other")
    assert not (m1.w1 == m3.w1).all()
    # Direct-encode equals the Spark-path output (worker == driver).
    direct = NumpyMLPModel(64, 32, 16).encode([rows[3][1]])[0]
    assert list(direct) == a[3]


def test_numpy_mlp_spec_validation(spark):
    import pytest

    from metalpipe_spark.operators.inference import embed_documents

    df = spark.createDataFrame([(1, "t")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="numpy-mlp spec"):
        embed_documents(df, model="numpy-mlp:64:32")
    with pytest.raises(ValueError, match="numpy-mlp spec"):
        embed_documents(df, model="numpy-mlp:a:b:c")


def test_real_encoder_loaders_fail_loud_without_wheels():
    """r16 verdict task 5: the onnx/torchscript loaders are REGISTERED
    and validate their specs today; without the optional wheels they
    fail LOUD with the activation path (never a silent stub), so when
    a deployment has the dependency nothing but the environment
    changes."""
    import pytest

    from metalpipe_spark.operators.inference import (
        _MODEL_CACHE,
        _LOADERS,
        load_model,
    )

    assert "onnx" in _LOADERS and "torchscript" in _LOADERS
    # spec validation fires before the optional import
    with pytest.raises(ValueError, match="onnx spec"):
        load_model("onnx:model-only")
    _MODEL_CACHE.pop("onnx:model-only", None)
    for spec, module in (
        ("onnx:/m.onnx:/tok.json", "onnxruntime"),
        ("torchscript:/m.pt:/tok.json", "torch"),
    ):
        try:
            __import__(module)
        except ImportError:
            with pytest.raises(ImportError, match="Activation"):
                load_model(spec)
            _MODEL_CACHE.pop(spec, None)


def test_onnx_encoder_end_to_end(spark, tmp_path):
    """Runs ONLY where the optional wheels exist (skips cleanly in
    this container): build a minimal Gather-embedding ONNX graph and a
    word-level tokenizer.json, then drive the full embed_documents
    mapInPandas path through the onnx loader — masked mean pooling,
    L2 norm, dim read from session metadata."""
    import pytest

    onnx = pytest.importorskip("onnx")
    pytest.importorskip("onnxruntime")
    tokenizers = pytest.importorskip("tokenizers")
    import numpy as np
    from onnx import TensorProto, helper, numpy_helper

    from metalpipe_spark.operators.inference import embed_documents

    dim, vocab = 4, {"[PAD]": 0, "[UNK]": 1, "cat": 2, "dog": 3}
    tok = tokenizers.Tokenizer(
        tokenizers.models.WordLevel(vocab, unk_token="[UNK]")
    )
    tok.pre_tokenizer = tokenizers.pre_tokenizers.Whitespace()
    tok_path = str(tmp_path / "tokenizer.json")
    tok.save(tok_path)

    table = numpy_helper.from_array(
        np.arange(len(vocab) * dim, dtype=np.float32).reshape(-1, dim),
        name="emb",
    )
    node = helper.make_node("Gather", ["emb", "input_ids"], ["hidden"])
    graph = helper.make_graph(
        [node],
        "embed",
        [
            helper.make_tensor_value_info(
                "input_ids", TensorProto.INT64, ["b", "s"]
            ),
            helper.make_tensor_value_info(
                "attention_mask", TensorProto.INT64, ["b", "s"]
            ),
        ],
        [
            helper.make_tensor_value_info(
                "hidden", TensorProto.FLOAT, ["b", "s", dim]
            )
        ],
        initializer=[table],
    )
    model_path = str(tmp_path / "m.onnx")
    onnx.save(helper.make_model(graph), model_path)

    df = spark.createDataFrame(
        [(0, "cat dog"), (1, "dog")], ["doc_id", "text"]
    )
    out = embed_documents(
        df, model=f"onnx:{model_path}:{tok_path}:8"
    ).collect()
    got = {r["doc_id"]: np.array(r["embedding"]) for r in out}
    emb = np.arange(len(vocab) * dim, dtype=np.float64).reshape(-1, dim)
    for did, toks in ((0, [2, 3]), (1, [3])):
        want = emb[toks].mean(axis=0)
        want = want / np.sqrt((want * want).sum())
        assert np.allclose(got[did], want)
