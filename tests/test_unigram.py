"""Unigram tokenizer (operators/unigram.py): EM training, Viterbi
encoding, and the determinism discipline."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from metalpipe_spark.operators.unigram import (
    UNK,
    train_unigram,
    unigram_encode,
    unigram_seed_counts,
    viterbi_segment,
)


def _corpus(spark, n=30):
    text = (
        "the quick brown fox jumps over the lazy dog "
        "tokenization normalization internationalization "
    )
    return spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )


def _exhaustive_best(word: str, lp: dict, max_len: int):
    """Brute-force max-log-prob segmentation score (all segmentations)."""
    best = [None]

    def rec(i, score):
        if i == len(word):
            if best[0] is None or score > best[0]:
                best[0] = score
            return
        for j in range(i + 1, min(len(word), i + max_len) + 1):
            p = word[i:j]
            if p in lp:
                rec(j, score + lp[p])

    rec(0, 0.0)
    return best[0]


def test_viterbi_matches_exhaustive_argmax(spark):
    """Viterbi's segmentation attains the exact brute-force optimum on
    every word the vocabulary can cover."""
    pieces = train_unigram(
        _corpus(spark, 10), vocab_size=50, max_piece_len=6, em_iters=1
    )
    lp = {r["piece"]: r["logprob"] for r in pieces.collect()}
    for w in ["the", "quick", "tokenization", "internationalization", "dog"]:
        got = viterbi_segment(w, lp, 6)
        assert "".join(got) == w
        assert sum(lp[p] for p in got) == pytest.approx(
            _exhaustive_best(w, lp, 6), abs=1e-12
        )


def test_train_unigram_bit_reproducible_and_em_improves(spark):
    """Training is bit-identical across partitionings (DECIMAL-exact
    expected-count sums), and more EM iterations never lower the
    corpus log-likelihood of the Viterbi encoding."""
    c = _corpus(spark, 20)
    a = train_unigram(c, vocab_size=40, em_iters=2)
    b = train_unigram(c.repartition(13), vocab_size=40, em_iters=2)
    assert [tuple(r) for r in a.orderBy("rank").collect()] == [
        tuple(r) for r in b.orderBy("rank").collect()
    ]
    # EM guarantee (on the model's own objective): total corpus LL of
    # the fitted model is non-decreasing with more EM rounds.
    lp1 = {
        r["piece"]: r["logprob"]
        for r in train_unigram(c, vocab_size=40, em_iters=1).collect()
    }
    lp3 = {
        r["piece"]: r["logprob"]
        for r in train_unigram(c, vocab_size=40, em_iters=3).collect()
    }

    words = (
        "the quick brown fox jumps over the lazy dog "
        "tokenization normalization internationalization"
    ).split()

    def ll(lp):
        total = 0.0
        for w in words:
            total += _exhaustive_best(w, lp, 6)
        return total

    assert ll(lp3) >= ll(lp1) - 1e-9


def test_unigram_encode_coverage_unk_and_memo(spark):
    """Encoding covers trained text exactly (round-trip by
    concatenation), unknown characters emit <unk>, and the output is
    partition-independent."""
    c = _corpus(spark, 8)
    pieces = train_unigram(c, vocab_size=50, em_iters=1)
    enc = unigram_encode(c.limit(3), pieces)
    rows = enc.collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_pieces"] == len(r["pieces"])
        assert UNK not in r["pieces"]  # trained alphabet fully covers
    odd = spark.createDataFrame(
        [(1, "the Ωmega dog")], "doc_id long, text string"
    )
    [r] = unigram_encode(odd, pieces).collect()
    assert UNK in r["pieces"]  # Ω was never in the training alphabet
    joined = "".join(p for p in r["pieces"])
    assert joined.startswith("the")
    got1 = unigram_encode(c, pieces).orderBy("doc_id").collect()
    got2 = unigram_encode(c.repartition(5), pieces).orderBy("doc_id").collect()
    assert [r["pieces"] for r in got1] == [r["pieces"] for r in got2]


def test_unigram_seed_counts_order_and_validations(spark):
    """Seed candidates follow (count desc, piece asc); trainer input
    guards raise."""
    df = spark.createDataFrame(
        [(1, "ab ab abc")], "doc_id long, text string"
    )
    rows = unigram_seed_counts(df, max_piece_len=3, top_k=5).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    # 'a', 'ab', 'b' all appear 3x; lexicographic among equals
    top3 = [(r["piece"], r["piece_count"]) for r in rows[:3]]
    assert top3 == [("a", 3), ("ab", 3), ("b", 3)]
    with pytest.raises(ValueError, match="vocab_size"):
        train_unigram(df, vocab_size=0)
    with pytest.raises(ValueError, match="shrink"):
        train_unigram(df, shrink=1.5)
    with pytest.raises(ValueError, match="em_iters"):
        train_unigram(df, em_iters=0)
    with pytest.raises(ValueError, match="no words"):
        train_unigram(
            spark.createDataFrame([(1, "  ")], "doc_id long, text string")
        )
    with pytest.raises(ValueError, match="empty piece"):
        unigram_encode(df, {})


def test_tokenizer_nodes_yaml_surface(spark, tmp_path):
    """TrainBPE/BPEEncode and TrainUnigram/UnigramEncode reach the
    YAML pipeline surface, in both the two-upstream (trained table)
    and inline-options forms."""
    from metalpipe_spark.plans.pipeline import compile_pipeline

    corpus = _corpus(spark, 5)
    p = str(tmp_path / "docs.parquet")
    corpus.write.parquet(p)
    config = {
        "nodes": {
            "read": {"class": "ParquetReader", "options": {"path": p}},
            "bpe": {"class": "TrainBPE", "options": {"num_merges": 8}},
            "bpe_enc": {"class": "BPEEncode", "options": {}},
            "uni": {"class": "TrainUnigram",
                    "options": {"vocab_size": 40, "em_iters": 1}},
            "uni_enc": {"class": "UnigramEncode", "options": {}},
            "uni_inline": {
                "class": "UnigramEncode",
                "options": {"pieces": {"the": -1.0, "t": -4.0, "h": -4.1,
                                       "e": -4.2}},
            },
        },
        "paths": [
            ["read", "bpe", "bpe_enc"],
            ["read", "bpe_enc"],
            ["read", "uni", "uni_enc"],
            ["read", "uni_enc"],
            ["read", "uni_inline"],
        ],
    }
    dfs = compile_pipeline(spark, config).dataframes
    assert dfs["bpe_enc"].count() == 5
    assert dfs["uni_enc"].count() == 5
    [r] = dfs["uni_inline"].limit(1).collect()
    assert r["pieces"][0] == "the"


def test_train_unigram_terminates_when_alphabet_exceeds_vocab(spark):
    """vocab_size below the single-char alphabet size must terminate
    (stagnation guard) and return a coverage-sized vocabulary, not loop
    distributed EM forever."""
    df = spark.createDataFrame(
        [(1, "abcdefghij klmnopqrst uvwxyz0123 456789")],
        "doc_id long, text string",
    )
    pieces = train_unigram(df, vocab_size=5, em_iters=1, max_piece_len=3)
    got = {r["piece"] for r in pieces.collect()}
    assert set("abcdefghijklmnopqrstuvwxyz0123456789") <= got


def test_viterbi_scores_face_matches_segmentation(spark):
    """unigram_viterbi_scores equals the score of viterbi_segment's
    path for every distinct word, trained or pinned table alike."""
    from metalpipe_spark.operators.unigram import unigram_viterbi_scores

    pieces = {"the": -1.5, "qu": -2.5, "ick": -2.6,
              **{c: -4.0 - i * 0.01 for i, c in enumerate("abcdefghijklmnopqrstuvwxyz")}}
    df = _corpus(spark, 3)
    max_len = max(len(p) for p in pieces)
    unk_pen = min(pieces.values()) - 10.0
    got = {
        r["word"]: r["score"]
        for r in unigram_viterbi_scores(df, pieces).collect()
    }
    assert got  # non-empty
    for w, s in got.items():
        path = viterbi_segment(w, pieces, max_len, unk_pen)
        assert s == round(sum(pieces.get(p, unk_pen) for p in path), 9), w


def test_viterbi_oracle_sql_escapes_apostrophe_pieces(spark):
    """A piece table containing an apostrophe (plausible once seeded
    from real text) must render VALID oracle SQL — the piece literals
    are SQL-escaped (ADVICE r13: unescaped '{p}' broke on quotes)."""
    import duckdb

    from metalpipe_spark.operators.unigram import (
        viterbi_score_oracle_sql,
        viterbi_segment,
    )

    pieces = {"don't": -1.0, "'": -5.0,
              **{c: -4.0 for c in "dontcare"}}
    sql = viterbi_score_oracle_sql(
        pieces, "w(word) AS (SELECT 'don''t')", max_word_len=6
    )
    got = duckdb.sql(sql).fetchall()
    unk = min(pieces.values()) - 10.0
    path = viterbi_segment("don't", pieces, 5, unk)
    want = round(sum(pieces.get(p, unk) for p in path), 9)
    assert got == [("don't", want)]


def test_viterbi_encode_oracle_matches_engine_on_ties_and_unks(spark):
    """viterbi_encode_oracle_sql (r15 — the full piece-STREAM replay)
    must reproduce unigram_encode's fingerprints on a corpus crafted to
    exercise the hard parts the sf fixture may never hit: exact-score
    TIES between different segmentations (the longest-piece tie-break),
    unknown characters, empty text, and repeated words."""
    import duckdb
    import pandas as pd

    from metalpipe_spark.operators.unigram import (
        unigram_encode,
        viterbi_encode_oracle_sql,
    )
    from pyspark.sql import functions as F

    # "ab" tie: [ab] = -4.0 vs [a][b] = -2.0 + -2.0 = -4.0 — exact
    # float equality; engine picks the LONGER piece.  "xz!" has an
    # unknown char.  Doc 4 is empty; doc 5 repeats words.
    pieces = {
        "ab": -4.0, "a": -2.0, "b": -2.0, "c": -3.0, "abc": -7.0,
        "x": -4.5, "z": -4.25,
    }
    docs = [
        (0, "ab abc ba"),
        (1, "xz! ab"),
        (2, "aaab abab"),
        (3, "cab abba"),
        (4, ""),
        (5, "ab ab ab"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    enc = unigram_encode(df, pieces)
    got = {
        (r["doc_id"], r["n_pieces"], r["enc_md5"])
        for r in enc.select(
            "doc_id",
            "n_pieces",
            F.md5(
                F.concat(
                    F.lit("("), F.concat_ws(")(", "pieces"), F.lit(")")
                )
            ).alias("enc_md5"),
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "docs_fixture",
        pd.DataFrame(docs, columns=["doc_id", "text"]),
    )
    sql = viterbi_encode_oracle_sql(
        pieces, max_word_len=8, src="docs_fixture"
    )
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want
    # The tie must actually resolve to the longer piece in BOTH
    # engines (sanity that the fixture exercises the tie-break):
    one_piece = {r["doc_id"]: r["pieces"] for r in enc.collect()}
    assert one_piece[5] == ["ab", "ab", "ab"]
