"""Production-hash knob (VERDICT r11 task 2): every sketch/dedup family
accepts ``hash="md5"|"xxhash64"``.  md5 stays the default (portable —
the DuckDB oracle replays it, every catalog row pins it); xxhash64 is
the JVM-native production path.  These tests pin EQUIVALENCE OF
SEMANTICS, not values: the same pairs / members / bounds fall out of
both hashes while the underlying hash values differ — exactly the
contract a user flipping the knob on a 100 TB run relies on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark):
    """60 distinct docs + 2 planted near-dup pairs (one word edited)."""
    base = [
        (i, " ".join(f"w{i}t{j}" for j in range(30))) for i in range(60)
    ]
    near = [
        (100, " ".join(f"a{j}" for j in range(30))),
        (101, " ".join(f"a{j}" for j in range(29)) + " EDIT"),
        (200, " ".join(f"b{j}" for j in range(30))),
        (201, " ".join(f"b{j}" for j in range(29)) + " EDIT"),
    ]
    return spark.createDataFrame(base + near, ["doc_id", "text"])


def test_hash_primitives_range_and_divergence(spark):
    from metalpipe_spark.operators.dedup import _hash32, _hash64

    df = spark.range(200).select(F.col("id").cast("string").alias("s"))
    out = df.select(
        _hash64(F.col("s")).alias("m64"),
        _hash64(F.col("s"), "xxhash64").alias("x64"),
        _hash32(F.col("s")).alias("m32"),
        _hash32(F.col("s"), "xxhash64").alias("x32"),
    ).collect()
    assert all(0 <= r["x64"] < 1 << 60 for r in out)  # same range as md5
    assert all(0 <= r["x32"] < 1 << 32 for r in out)
    assert any(r["m64"] != r["x64"] for r in out)  # genuinely different fn
    assert any(r["m32"] != r["x32"] for r in out)
    with pytest.raises(ValueError, match="hash must be"):
        df.select(_hash64(F.col("s"), "sha1")).collect()


def test_minhash_lsh_same_pairs_different_signatures(spark):
    from metalpipe_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    docs = _docs(spark)

    def pairs(h):
        got = minhash_lsh_pairs(
            docs, num_hashes=16, bands=8, hash=h
        ).where(F.col("est_jaccard") >= 0.5)
        return {(r["d1"], r["d2"]) for r in got.collect()}

    p_md5, p_xx = pairs("md5"), pairs("xxhash64")
    assert {(100, 101), (200, 201)} <= p_md5
    assert {(100, 101), (200, 201)} <= p_xx  # same planted structure
    sig_md5 = minhash_signatures(docs).where(F.col("doc_id") == 100).first()
    sig_xx = (
        minhash_signatures(docs, hash="xxhash64")
        .where(F.col("doc_id") == 100)
        .first()
    )
    assert sig_md5["minhash"] != sig_xx["minhash"]  # different values


def test_simhash_neardup_same_pairs(spark):
    from metalpipe_spark.operators.dedup import simhash, simhash_neardup_pairs

    docs = _docs(spark)
    for h in ("md5", "xxhash64"):
        # Planted pairs measure hamming <= 6 under both hashes (one
        # token edited out of 30); blocks=10 keeps pigeonhole recall
        # at max_hamming=6 (needs combo <= blocks - max_hamming).
        got = simhash_neardup_pairs(
            docs, bits=60, max_hamming=6, blocks=10, combo=1, hash=h
        )
        found = {(r["d1"], r["d2"]) for r in got.collect()}
        assert {(100, 101), (200, 201)} <= found, h
    fp_md5 = simhash(docs, bits=60).where(F.col("doc_id") == 100).first()
    fp_xx = (
        simhash(docs, bits=60, hash="xxhash64")
        .where(F.col("doc_id") == 100)
        .first()
    )
    assert fp_md5["simhash"] != fp_xx["simhash"]


def test_bloom_xxhash_one_sided_and_self_describing(spark):
    from metalpipe_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    members = spark.range(500).select(F.concat(F.lit("m"), "id").alias("v"))
    others = spark.range(500).select(F.concat(F.lit("o"), "id").alias("v"))
    bloom = bloom_build(members, "v", m_bits=1 << 14, k=4, hash="xxhash64")
    row = bloom.first()
    assert row["h"] == "xxhash64"  # the fn rides with the geometry
    # No false negatives: the probe re-hashes with the filter's OWN fn
    # (read from the row — a caller cannot mismatch it).
    probed = bloom_probe(members, "v", row)
    assert probed.where(~F.col("maybe_member")).count() == 0
    # Still a real filter: most non-members rejected at this geometry.
    neg = bloom_probe(others, "v", row).where(~F.col("maybe_member")).count()
    assert neg > 450
    # Divergence from md5: same inputs, different mask bits.
    md5_row = bloom_build(members, "v", m_bits=1 << 14, k=4).first()
    assert md5_row["mask"] != row["mask"]
    # Merge refuses mixed hash fns (an OR of differently-hashed masks
    # would be a silently wrong filter — the mixed-geometry rule).
    with pytest.raises(ValueError, match="one geometry"):
        bloom_merge(bloom.unionByName(
            bloom_build(members, "v", m_bits=1 << 14, k=4)
        ))
    merged = bloom_merge(bloom.unionByName(
        bloom_build(others, "v", m_bits=1 << 14, k=4, hash="xxhash64")
    )).first()
    assert merged["h"] == "xxhash64"
    assert (
        bloom_probe(members.unionByName(others), "v", merged)
        .where(~F.col("maybe_member"))
        .count()
        == 0
    )


def test_bloom_pre_knob_row_still_probes_as_md5(spark):
    # A pre-knob persisted/collected row has no `h` field: the probe
    # must treat it as md5 (what it was built with), not error.
    from pyspark.sql import Row

    from metalpipe_spark.operators.sketches import bloom_build, bloom_probe

    members = spark.range(200).select(F.concat(F.lit("m"), "id").alias("v"))
    new_row = bloom_build(members, "v", m_bits=1 << 14, k=4).first()
    legacy = Row(mask=new_row["mask"], m=new_row["m"], k=new_row["k"])
    assert (
        bloom_probe(members, "v", legacy).where(~F.col("maybe_member")).count()
        == 0
    )


def test_hll_estimate_equivalent_accuracy(spark):
    from metalpipe_spark.operators.sketches import (
        hll_count_distinct,
        hll_registers,
    )

    n = 5000
    df = spark.range(n).select(F.concat(F.lit("v"), "id").alias("v"))
    for h in ("md5", "xxhash64"):
        est = hll_count_distinct(df, "v", p=12, hash=h).first()["hll_estimate"]
        assert abs(est - n) / n < 0.05, (h, est)  # ~1.6% stderr at p=12
    r_md5 = {(r["__b"], r["__m"]) for r in hll_registers(df, "v").collect()}
    r_xx = {
        (r["__b"], r["__m"])
        for r in hll_registers(df, "v", hash="xxhash64").collect()
    }
    assert r_md5 != r_xx


def test_count_min_one_sided_and_self_describing(spark):
    from metalpipe_spark.operators.sketches import (
        count_min_lookup,
        count_min_sketch,
    )

    rows = [(f"hot{i % 3}",) for i in range(300)] + [
        (f"cold{i}",) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["v"])
    sketch = count_min_sketch(df, "v", depth=4, width=2048, hash="xxhash64")
    assert sketch.first()["h"] == "xxhash64"
    true = {r["v"]: r["n"] for r in df.groupBy("v").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # Lookup re-hashes with the sketch's own fn (read from the table):
    # estimates stay one-sided — never below the true count.
    est = count_min_lookup(sketch, df.select("v").distinct(), "v").collect()
    assert all(r["cm_estimate"] >= true[r["v"]] for r in est)
    hot = {r["v"]: r["cm_estimate"] for r in est if r["v"].startswith("hot")}
    assert all(v >= 100 for v in hot.values())


def test_band_store_reads_signature_provenance(spark):
    """ADVICE r12: a prebuilt xxhash64 signature table passed with the
    DEFAULT hash='md5' must not poison the persisted store's marker —
    band_store reads the ``mp.hash`` column-metadata stamp
    minhash_signatures writes, and only falls back to the parameter for
    unstamped (externally built) tables."""
    from metalpipe_spark.operators.dedup import band_store, minhash_signatures

    docs = _docs(spark)
    sigs = minhash_signatures(docs, hash="xxhash64")
    assert sigs.schema["minhash"].metadata["mp.hash"] == "xxhash64"
    # The stamp survives projection/filter (it travels with the attribute).
    sigs = sigs.where(F.col("doc_id") >= 0).select("doc_id", "minhash")
    store = band_store(docs, signatures=sigs)  # hash param left at md5
    markers = {r["h"] for r in store.select("h").distinct().collect()}
    assert markers == {"xxhash64"}
    # Unstamped external signatures: the parameter is the only truth.
    # (A plain re-alias PRESERVES metadata; stripping takes an explicit
    # empty metadata dict — i.e. only genuinely external tables lack it.)
    bare = sigs.select(
        "doc_id", F.col("minhash").alias("minhash", metadata={})
    )
    assert not bare.schema["minhash"].metadata
    store2 = band_store(docs, signatures=bare, hash="xxhash64")
    assert {r["h"] for r in store2.select("h").distinct().collect()} == {
        "xxhash64"
    }


def test_incremental_neardup_mixed_store_markers_raise(spark):
    """ADVICE r12: a store holding MIXED h markers (two stores
    hand-unioned) must fail the provenance guard for the mismatched
    fraction, not pass on whichever row first() happened to read."""
    import pytest

    from metalpipe_spark.operators.dedup import (
        band_store,
        incremental_neardup_dedup,
    )

    docs = _docs(spark)
    mixed = band_store(docs, hash="md5").unionByName(
        band_store(docs, hash="xxhash64")
    )
    with pytest.raises(ValueError, match="markers"):
        incremental_neardup_dedup(docs, mixed, hash="md5")
    # And the stamped-signature path drives the guard from the BATCH's
    # effective hash (xxhash64 signatures + default md5 param must
    # compare as xxhash64, not md5).
    from metalpipe_spark.operators.dedup import minhash_signatures

    sigs = minhash_signatures(docs, hash="xxhash64")
    store_xx = band_store(docs, hash="xxhash64")
    fresh, _ = incremental_neardup_dedup(
        docs, store_xx, signatures=sigs
    )  # no raise: effective batch hash == store hash
    assert fresh.count() >= 0
