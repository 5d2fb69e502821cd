"""Approximate sketches, Spark-first and ORACLE-EXACT.

Native approximate aggregates (``approx_count_distinct``,
``approx_percentile``) are engine-specific: their estimates cannot be
replayed bit-for-bit by another engine, so they can never pass a
value-hash correctness gate.  The sketches here are built from the
engine's portable md5-derived hashes and exact integer arithmetic, so
the SAME estimate falls out of Spark and of the DuckDB oracle — the
determinism rule every operator in this repo follows, applied to
cardinality estimation (Flajolet et al. 2007, HyperLogLog).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_count_distinct(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
    hash: str = "md5",
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group —
    ``(group..., hll_estimate)`` — deterministic and exactly replayable
    in ANSI SQL:

    - hash = the portable 60-bit md5 hash (``dedup._hash64``): the
      register index is the top ``p`` bits, the rank is the number of
      leading zeros in the remaining ``w = 60 - p`` bits plus one,
      computed portably as ``w - length(bin(v)) + 1`` (``bin`` exists
      in Spark and DuckDB; no clz needed);
    - the harmonic sum Σ 2^-M[j] is EXACT INTEGER arithmetic: each
      register contributes ``1 << (w + 1 - M[j])`` to a BIGINT sum
      (max rank w+1 → term 1; absent registers contribute
      ``1 << (w + 1)`` each), divided once by ``2^(w+1)`` at the end —
      order-independent by construction, so partitioning never moves a
      bit and both engines agree to the last ulp;
    - the standard small-range correction (``E <= 2.5m`` with empty
      registers → linear counting ``m * ln(m / zeros)``) uses one
      ``ln`` on identical inputs.

    Plan shape: ONE map-side-combined shuffle on (group, bucket) —
    at most ``m = 2^p`` rows per group cross the wire regardless of
    input size — then a tiny per-group aggregate.  Accuracy is the
    classic ~1.04/sqrt(m) (≈1.6% at p=12).  For a mergeable persisted
    sketch, store the (group, bucket, max_rank) register table and
    re-aggregate with ``max`` — register max is the HLL merge."""
    regs = hll_registers(df, col, group_cols=group_cols, p=p, hash=hash)
    return hll_estimate_from_registers(regs, group_cols=group_cols, p=p)


def hll_registers(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
    hash: str = "md5",
) -> DataFrame:
    """The HLL REGISTER TABLE per group — ``(group..., __b, __m)`` with
    at most ``2^p`` rows per group — the mergeable half of
    :func:`hll_count_distinct`: register max IS the HLL merge, so
    per-shard / per-window register tables re-aggregate with ``max``
    into one sketch (``hll_merge_registers``).  This is also the shape
    a STREAMING aggregation can maintain (one watermarked max-agg);
    estimates come later, in batch, from the stored registers.

    ``hash="xxhash64"`` is the production knob (same [0, 2^60) range,
    so the p/w register geometry is unchanged; estimates stay within
    the same ~1.04/sqrt(m) error but are NOT oracle-replayable).
    Register tables only merge with tables built under the SAME hash —
    a mixed-merge is a silently wrong sketch, same rule as mixed Bloom
    geometries."""
    from metalpipe_spark.operators.dedup import _hash64

    groups = list(group_cols or [])
    w = 60 - p
    # Canonical string cast before hashing: a no-op for string columns
    # (every oracle row), and the defined portable behavior for numeric
    # ones (md5 itself rejects BIGINT) — the deterministic_uniform rule.
    h = _hash64(F.col(col).cast("string"), hash)
    bucket = F.shiftright(h, w)
    rem = h.bitwiseAND(F.lit((1 << w) - 1))
    rank = F.when(rem == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.bin(rem)) + F.lit(1)
    )
    return (
        df.select(*groups, bucket.alias("__b"), rank.alias("__r"))
        .groupBy(*groups, "__b")
        .agg(F.max("__r").alias("__m"))
        # The hash fn rides with the persisted registers (bloom/count-min
        # mismatch-proofing): hll_merge_registers refuses a mixed-fn
        # merge mechanically instead of by docstring.  Constant column,
        # added after the agg so the streaming single-agg shape holds.
        .withColumn("__hf", F.lit(hash))
    )


def hll_merge_registers(
    regs: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge register tables (from different shards, days, or
    micro-batches) into one per group: register max — the HLL merge.
    Tables built under different hash fns REFUSE to merge (buckets and
    ranks come from different functions — the merged sketch would be
    silently wrong); the distinct scan is bounded by register-table
    size.  Pre-knob tables carry no ``__hf`` and merge as md5."""
    groups = list(group_cols or [])
    out = regs.groupBy(*groups, "__b").agg(F.max("__m").alias("__m"))
    if "__hf" in regs.columns:
        fns = [r["__hf"] for r in regs.select("__hf").distinct().collect()]
        if len(fns) > 1:
            raise ValueError(
                f"hll_merge_registers: register tables built under mixed "
                f"hash fns {sorted(fns)} cannot merge; re-sketch one side"
            )
        if fns:
            out = out.withColumn("__hf", F.lit(fns[0]))
    return out


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """Estimate from a register table (same arithmetic contract as
    :func:`hll_count_distinct`: integer-exact harmonic sum, one double
    division, small-range linear counting)."""
    groups = list(group_cols or [])
    m = 1 << p
    w = 60 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    # Integer-exact Σ 2^-M: term = 2^(w+1-M) summed as BIGINT, plus
    # 2^(w+1) per absent register; one double division at the end.
    scale = 1 << (w + 1)
    per_group = regs.groupBy(*groups).agg(
        # SQL shiftleft takes a column shift amount (the PySpark wrapper
        # insists on a literal), and __m <= w+1 keeps the shift in range.
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {w + 1} - __m)")).alias("__s"),
        F.count(F.lit(1)).alias("__present"),
    )
    harmonic = (
        F.col("__s") + (F.lit(m) - F.col("__present")) * F.lit(scale)
    ).cast("double") / F.lit(float(scale))
    raw = F.lit(alpha * m * m) / harmonic
    zeros = F.lit(m) - F.col("__present")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return per_group.select(
        *groups, F.round(est, 4).alias("hll_estimate")
    )


def count_min_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 2048,
    hash: str = "md5",
) -> DataFrame:
    """Build a count-min sketch TABLE over a column — ``(row, bucket,
    c)`` with ``depth * width`` rows total regardless of input size
    (Cormode & Muthukrishnan 2005): hash row j maps a value through the
    engine's affine md5 family (``dedup.minhash_coefficients`` — the
    same deterministic coefficients MinHash uses) into ``width``
    buckets and counts collisions.  ONE map-side-combined shuffle whose
    key space is depth x width; the sketch is mergeable by summing
    counters (grouped on row/bucket/depth/width).  ``width`` must be a
    power of two (the multiply-shift bucket hash takes the high
    ``log2(width)`` bits — a MOD of the affine value would collapse all
    depth rows into bijections of the same low bits, see
    ``_bloom_positions``).  The GEOMETRY rides
    along as constant ``depth``/``width`` columns, so
    :func:`count_min_lookup` always hashes with the sketch's own
    parameters — a caller-supplied mismatch would silently produce
    under-estimates of 0 and break the one-sided contract.  Same
    determinism contract as :func:`hll_count_distinct`: md5-derived
    hashing and integer counters, so the DuckDB oracle reproduces
    every counter exactly."""
    h, rows = _cm_bucket_structs(col, depth, width, hash)
    return (
        df.select(F.explode(F.array(*rows)).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "row", "bucket", "c",
            F.lit(depth).alias("depth"), F.lit(width).alias("width"),
            # The hash fn rides with the geometry for the same
            # mismatch-proofing reason depth/width do: the lookup always
            # re-hashes with the sketch's own function.
            F.lit(hash).alias("h"),
        )
    )


def _cm_bucket_structs(col: str, depth: int, width: int, hash: str = "md5"):
    """Multiply-shift bucket rows (see ``_bloom_positions`` for why the
    HIGH bits and not MOD: with a power-of-two width, ``(a*h+b) mod
    width`` is a bijection of ``h mod width`` for every odd ``a``, so
    all depth rows collide identically and min-over-rows degenerates to
    one row's estimate)."""
    from metalpipe_spark.operators.dedup import _hash32, minhash_coefficients

    if width & (width - 1):
        raise ValueError(f"width must be a power of two, got {width}")
    shift = 32 - (width.bit_length() - 1)
    h = _hash32(F.col(col), hash)
    mod = F.lit(1 << 32).cast("long")
    rows = [
        F.struct(
            F.lit(j).alias("row"),
            F.shiftright((F.lit(a) * h + F.lit(b)) % mod, shift).alias("bucket"),
        )
        for j, (a, b) in enumerate(minhash_coefficients(depth))
    ]
    return h, rows


def count_min_lookup(
    sketch: DataFrame,
    queries: DataFrame,
    col: str,
) -> DataFrame:
    """Point-frequency estimates for the values in ``queries[col]``:
    min over the sketch's ``depth`` counters at the value's buckets,
    with the hashing geometry READ FROM THE SKETCH ITSELF (its
    ``depth``/``width`` columns) so a mismatched re-hash is impossible
    by construction.  The sketch (depth x width rows, bounded)
    broadcasts; an absent counter is a true zero (no item ever hashed
    there), so estimates stay one-sided — ``cm_estimate >= true
    count`` always, the property the tests pin.  Query set stays
    distributed (a heavy-hitter candidate list can be millions of
    rows)."""
    meta = sketch.first()
    depth, width = int(meta["depth"]), int(meta["width"])
    # Pre-knob sketches carry no `h` column and were md5 by definition.
    hash = str(meta["h"]) if "h" in meta.__fields__ else "md5"
    _, rows = _cm_bucket_structs(col, depth, width, hash)
    exploded = queries.select(F.col(col), F.explode(F.array(*rows)).alias("rb")).select(
        col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    joined = exploded.join(
        F.broadcast(sketch.select("row", "bucket", "c")), ["row", "bucket"], "left"
    ).select(col, F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    return joined.groupBy(col).agg(F.min("c").alias("cm_estimate"))


def _bloom_shift(m_bits: int) -> int:
    """The ONE authority for Bloom geometry: validates the power-of-two
    bit count and returns the multiply-shift amount ``32 - log2(m)``.
    Every build/probe site derives its shift here — a second inline
    derivation could silently diverge from the positions the stored
    masks were built with."""
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    return 32 - (m_bits.bit_length() - 1)


def _bloom_positions(col, m_bits: int, k: int, hash: str = "md5"):
    """The ``k`` deterministic bit positions of a value: multiply-shift
    hashing (Dietzfelbinger et al. 1997) over the portable 32-bit md5
    hash — ``((a_i*h + b_i) mod 2^32) >> (32 - log2(m))``, the HIGH
    bits of each affine transform.  The high bits matter: with a
    power-of-two ``m``, taking the affine value MOD m keeps only the
    low bits, and ``(a*h + b) mod m`` with odd ``a`` is a BIJECTION of
    ``h mod m`` — every "independent" hash row degenerates into the
    same function and k rows give the false-positive rate of one
    (measured: ~n/m instead of (n_set/m)^k).  Shifted high bits mix
    ``a_i``'s full product, so the rows are genuinely distinct.
    Duplicate positions across the ``k`` rows remain fine (membership =
    "every position set" holds regardless)."""
    from metalpipe_spark.operators.dedup import _hash32

    h = _hash32(col if not isinstance(col, str) else F.col(col), hash)
    return _positions_from_hash(h, _bloom_shift(m_bits), k)


def _positions_from_hash(h, shift: int, k: int):
    from metalpipe_spark.operators.dedup import minhash_coefficients

    mod = F.lit(1 << 32).cast("long")
    return [
        F.shiftright((F.lit(a) * h + F.lit(b)) % mod, shift)
        for a, b in minhash_coefficients(k)
    ]


def _mask_literal(mask) -> Column:
    """The packed mask as ONE plan literal via a single SQL array
    expression.  ``F.lit(list(mask))`` builds the same constant but
    through one py4j round-trip PER WORD — 4096 JVM calls ≈ 2-3 s of
    pure driver time at the default geometry, paid every time a probe
    expression is constructed (measured on stream_corpus_pipeline,
    round 10).  Parsing one ~90 KB ``array(…L)`` string JVM-side is
    milliseconds, and Catalyst folds it to the identical Literal."""
    return F.expr("array(" + ",".join(f"{int(w)}L" for w in mask) + ")")


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 18,
    k: int = 4,
    hash: str = "md5",
) -> DataFrame:
    """Build a Bloom filter over a column as ONE row ``(mask:
    array<long>, m, k)`` — ``m_bits / 64`` packed 64-bit words (Bloom
    1970).  Same determinism contract as the HLL / count-min sketches:
    md5-affine bit positions and integer bit-ors, so the DuckDB oracle
    reproduces membership exactly (it keeps the distinct position SET;
    the packed mask is the same set by construction).

    Plan shape: positions explode in codegen, then ONE map-side-
    combined shuffle whose key space is at most ``m_bits / 64`` words
    (bounded regardless of input size), then a single-row assembly.
    The mask is ``m_bits / 8`` bytes (32 KiB at the 2^18 default) —
    broadcastable state for a probe over any corpus size, the point of
    a Bloom filter at 100 TB: the benchmark's shingle set rides to
    every executor as a fixed-size bitmask instead of a string index.
    Geometry (``m``, ``k``) rides in the row so :func:`bloom_probe`
    always hashes with the filter's own parameters (count-min's
    mismatch-proofing)."""
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    from metalpipe_spark.operators.dedup import _hash32

    shift = _bloom_shift(m_bits)
    n_words = m_bits // 64
    pos = df.withColumn("__bh", _hash32(F.col(col), hash)).select(
        F.explode(
            F.array(*_positions_from_hash(F.col("__bh"), shift, k))
        ).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )
    packed = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("w"), F.col("bits")))
        ).alias("mp")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.element_at(F.col("mp"), i), F.lit(0).cast("long")),
        ).alias("mask"),
        F.lit(m_bits).alias("m"),
        F.lit(k).alias("k"),
        F.lit(hash).alias("h"),
    )
    return packed


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    out_col: str = "maybe_member",
    m_bits: int | None = None,
    k: int | None = None,
) -> DataFrame:
    """Membership test of ``df[col]`` against a :func:`bloom_build`
    filter: appends boolean ``out_col`` (true = possibly in the set,
    false = DEFINITELY not — the one-sided Bloom contract the tests
    pin).  ``m_bits``/``k`` are accepted for signature stability but
    the geometry is always taken from the filter row.

    Plan shape: the mask row is fetched ONCE (a bounded ``m_bits / 8``
    byte driver fetch — 32 KiB at the default) and inlined as a plan
    LITERAL, so the probe is a pure scan: one md5 per value, k codegen
    bit checks against the shared constant array, no join, no shuffle.
    A broadcast-join formulation measured ~4x slower — the joined rows
    each COPY the 4096-long mask into their UnsafeRow, gigabytes of
    memcpy for a constant."""
    from metalpipe_spark.operators.dedup import _hash32

    row = (
        bloom.first()
        if isinstance(bloom, DataFrame)
        else bloom  # pre-collected Row: repeated probes skip the job
    )
    m_bits, k = int(row["m"]), int(row["k"])
    # The filter's own hash fn (count-min's mismatch-proofing); pre-knob
    # rows carry no `h` field and were md5 by definition.
    hash = str(row["h"]) if "h" in row.__fields__ else "md5"
    mask_lit = _mask_literal(row["mask"])
    # Hash ONCE per value: the k position expressions would each
    # recompute the hash otherwise (k-fold scan CPU for no reason).
    probed = df.withColumn("__bloom_h", _hash32(F.col(col), hash))
    positions = _positions_from_hash(F.col("__bloom_h"), _bloom_shift(m_bits), k)
    tmp = [f"__bloom_pos_{j}" for j in range(k)]
    probed = probed.withColumns(dict(zip(tmp, positions)))
    member = None
    for name in tmp:
        check = (
            F.element_at(
                mask_lit, F.expr(f"CAST(`{name}` div 64 AS INT) + 1")
            ).bitwiseAND(F.expr(f"shiftleft(1L, CAST(`{name}` % 64 AS INT))"))
            != 0
        )
        member = check if member is None else member & check
    return probed.withColumn(out_col, member).drop("__bloom_h", *tmp)


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    m_bits: int = 1 << 18,
    k: int = 4,
    min_hits: int = 3,
    hash: str = "md5",
) -> tuple[DataFrame, DataFrame]:
    """Bloom-filter benchmark decontamination: flag corpus documents
    whose distinct word ``n``-grams get at least ``min_hits`` POSITIVE
    Bloom probes against the benchmark's shingle filter, and return
    ``(clean_corpus, report)`` — ``report`` is ``(id_col, bloom_hits)``
    for every flagged document.

    The scale story vs :func:`~metalpipe_spark.operators.dedup.
    decontaminate` (the exact broadcast-shingle-index form): the state
    shipped to executors is a FIXED ``m_bits/8``-byte mask instead of
    the benchmark's full shingle strings — at 100 TB the exact index for
    a large benchmark suite is gigabytes of broadcast, the Bloom mask
    is kilobytes, and the probe stays scan-shaped codegen with no join
    at all.  The price is one-sided false POSITIVES (a clean doc may be
    flagged; a contaminated doc is never missed relative to the same
    shingle rule) — the right side to err on for decontamination.
    Rate ~ (1 - e^(-kn/m))^k; size ``m_bits`` for the benchmark's
    distinct shingle count.  Oracle-exact: the DuckDB twin replays the
    same md5-affine positions against the distinct position set, which
    equals packed-mask membership by construction."""
    from metalpipe_spark.operators.dedup import word_shingles

    # No distinct(): the mask's bit-ors absorb duplicate shingles for
    # free, and a pre-dedup would add a corpus-scale string shuffle to
    # save nothing.
    b_sh = benchmark.select(
        F.explode(word_shingles(text_col, n)).alias("shingle")
    )
    bloom = bloom_build(b_sh, "shingle", m_bits=m_bits, k=k, hash=hash)
    report = bloom_hit_report(
        corpus, bloom, text_col=text_col, id_col=id_col, n=n, min_hits=min_hits
    )
    clean = corpus.join(report.select(id_col), id_col, "left_anti")
    return clean, report


def bloom_hit_report(
    corpus: DataFrame,
    bloom,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_hits: int = 3,
) -> DataFrame:
    """The codegen probe kernel of :func:`bloom_decontaminate` —
    ``(id_col, bloom_hits)`` for every document with at least
    ``min_hits`` Bloom-positive shingles.  ``bloom`` is a
    :func:`bloom_build` DataFrame or its pre-collected Row (pass the
    Row when probing repeatedly, e.g. per micro-batch inside a
    foreachBatch sink — a DataFrame re-runs the mask-build job every
    call).  Explode + pre-projected hash + a map-side-combined count:
    ~10× the per-byte throughput of the higher-order
    :func:`bloom_decontaminate_filter` form, which exists for TRUE
    stream transformations where aggregation is off-limits."""
    from metalpipe_spark.operators.dedup import word_shingles

    c_sh = corpus.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle")
    )
    probed = bloom_probe(c_sh, "shingle", bloom, out_col="__hit")
    return (
        probed.where(F.col("__hit"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("bloom_hits"))
        .where(F.col("bloom_hits") >= min_hits)
    )


def bloom_member_expr(value, bloom_row, m_bits: int, k: int):
    """Membership COLUMN for ``value`` (any string expression, usable
    inside higher-order lambdas) against a collected :func:`bloom_build`
    row — the expression form of :func:`bloom_probe` for places a
    pre-projected hash column cannot exist (e.g. per-element checks
    inside ``F.filter`` over a shingle array).  Bit tests go through
    ``getbit`` (which takes a COLUMN position — the shiftleft wrappers
    only take literals, and lambdas cannot reference named columns).
    Hashes ``k`` times per evaluation; the column-level probe path
    stays the cheaper choice for exploded data."""
    from metalpipe_spark.operators.dedup import _hash32

    mask_lit = _mask_literal(bloom_row["mask"])
    hash = str(bloom_row["h"]) if "h" in bloom_row.__fields__ else "md5"
    h = _hash32(value, hash)
    member = None
    for p in _positions_from_hash(h, _bloom_shift(m_bits), k):
        word = F.element_at(mask_lit, (p / 64).cast("int") + 1)
        check = F.getbit(word, p % F.lit(64)) == 1
        member = check if member is None else member & check
    return member


def bloom_decontaminate_filter(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
    m_bits: int = 1 << 18,
    k: int = 4,
    min_hits: int = 3,
    hash: str = "md5",
) -> DataFrame:
    """STATELESS decontamination filter — keep documents with fewer
    than ``min_hits`` Bloom-positive shingles against the benchmark's
    mask.  Works identically on batch AND STREAMING DataFrames: the
    mask is built and collected ONCE at definition time (the benchmark
    is batch by definition), inlined as a plan literal, and each row's
    shingle array is checked with a higher-order ``F.filter`` — no
    explode, no aggregation, therefore no streaming state or
    watermark.  The per-micro-batch cost is scan-shaped, which is what
    a 100 TB ingest filter has to be.

    Same one-sided contract as :func:`bloom_decontaminate` (never
    misses real contamination under the same shingle rule; false
    positives drop clean docs at the documented rate)."""
    from metalpipe_spark.operators.dedup import word_shingles

    b_sh = benchmark.select(
        F.explode(word_shingles(text_col, n)).alias("shingle")
    )
    row = bloom_build(b_sh, "shingle", m_bits=m_bits, k=k, hash=hash).first()
    hits = F.size(
        F.filter(
            word_shingles(text_col, n),
            lambda s: bloom_member_expr(s, row, m_bits, k),
        )
    )
    return df.where(hits < min_hits)


def bloom_merge(blooms: DataFrame) -> DataFrame:
    """Merge :func:`bloom_build` filters: the union of Bloom sets is
    the elementwise OR of their masks — the same mergeability story as
    the other sketches here (HLL merges by register max, count-min by
    counter sum, Bloom by bit OR), which is what makes per-shard /
    per-day filters composable into one without touching the raw data.
    All input rows must share (m, k); mixed geometries raise (an OR of
    differently-hashed masks would be a silently wrong filter).

    Plan shape: one ``n_words``-row explode + group-wise bit_or —
    bounded by the mask size times the filter count, never data."""
    has_h = "h" in blooms.columns
    geoms = blooms.select("m", "k", *(["h"] if has_h else [])).distinct().collect()
    if len(geoms) != 1:
        raise ValueError(
            "bloom_merge needs one geometry, got "
            + ", ".join(
                f"(m={r['m']}, k={r['k']}"
                + (f", h={r['h']})" if has_h else ")")
                for r in geoms
            )
        )
    m_bits, k = int(geoms[0]["m"]), int(geoms[0]["k"])
    hash = str(geoms[0]["h"]) if has_h else "md5"  # pre-knob masks were md5
    n_words = m_bits // 64
    merged = (
        blooms.select(F.posexplode("mask").alias("i", "w"))
        .groupBy("i")
        .agg(F.expr("bit_or(w)").alias("w"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("i"), F.col("w")))
            ).alias("mp")
        )
        .select(
            # posexplode positions are 0-based; element_at on a MAP is
            # a key lookup, so the sequence must be 0-based too.
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.element_at(F.col("mp"), i),
            ).alias("mask"),
            F.lit(m_bits).alias("m"),
            F.lit(k).alias("k"),
            F.lit(hash).alias("h"),
        )
    )
    return merged


# ---------------------------------------------------------------------------
# Fixed-bin histogram sketch: deterministic mergeable quantiles
# ---------------------------------------------------------------------------
#
# The quantile member of the sketch trio (HLL = cardinality, count-min =
# frequency, histogram = distribution).  Native `approx_percentile` is
# engine-private (KLL-style random compaction — unreplayable), and an
# exact percentile is a full sort at 100 TB.  A fixed-geometry histogram
# is the deterministic middle: bin counts are exact integers, the bin
# table is at most bins+2 rows per group REGARDLESS of input size (one
# map-side-combined shuffle), shards merge by count-sum, and the
# quantile estimate — inverse empirical CDF with uniform-within-bin
# interpolation — replays expression-for-expression in ANSI SQL, so it
# passes a value-hash gate.  Error is bounded by one bin width by
# construction (tested).  Reference parity: the reference has no sketch
# surface at all (its RowStatCollector, civis_nodes.py, collects exact
# per-column stats on a single thread); this is the engine-native
# distribution stat a 100 TB corpus report needs.


def _hist_bin_expr(col: str, lo: float, hi: float, bins: int, scale: str):
    """Bin index column: 0 = underflow (< lo), bins+1 = overflow
    (>= hi), else 1..bins.  The arithmetic is one subtraction, one
    multiply, one divide, one floor — textually identical in the DuckDB
    oracle, so edge values land in the same bin on both engines."""
    x = F.col(col).cast("double")
    if scale == "linear":
        raw = F.floor((x - F.lit(lo)) * F.lit(float(bins)) / F.lit(hi - lo))
    elif scale == "log":
        if lo <= 0:
            raise ValueError(f"log scale needs lo > 0, got {lo}")
        raw = F.floor(
            F.log(x / F.lit(lo)) * F.lit(float(bins)) / F.lit(math.log(hi / lo))
        )
    else:
        raise ValueError(f"scale must be 'linear' or 'log', got {scale!r}")
    return (
        F.when(x < F.lit(lo), F.lit(0))
        .when(x >= F.lit(hi), F.lit(bins + 1))
        .otherwise(F.lit(1) + F.least(F.lit(bins - 1), raw))
        .cast("int")
    )


def _hist_geo(lo: float, hi: float, bins: int, scale: str) -> str:
    return f"{scale}:{lo!r}:{hi!r}:{bins}"


def histogram_registers(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 128,
    group_cols: list[str] | None = None,
    scale: str = "linear",
) -> DataFrame:
    """The histogram REGISTER TABLE per group — ``(group..., __b, __n,
    __geo)`` with at most ``bins + 2`` rows per group (__b 0 and
    bins+1 are the under/overflow bins) — exact BIGINT counts from one
    map-side-combined shuffle.  ``__geo`` stamps the bin geometry the
    way Bloom masks and HLL registers stamp their hash fn: tables with
    different geometries REFUSE to merge (the merged counts would be a
    silently wrong histogram).  ``scale="log"`` bins by ratio (long-
    tailed sizes); its bin EDGES involve exp/ln so only the linear
    scale is oracle-value-checked — log is bound-tested."""
    lo, hi = float(lo), float(hi)
    if not hi > lo:
        raise ValueError(f"histogram needs hi > lo, got [{lo}, {hi})")
    if bins < 1:
        raise ValueError(f"histogram needs bins >= 1, got {bins}")
    groups = list(group_cols or [])
    return (
        df.where(F.col(col).isNotNull())
        .select(*groups, _hist_bin_expr(col, lo, hi, bins, scale).alias("__b"))
        .groupBy(*groups, "__b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__geo", F.lit(_hist_geo(lo, hi, bins, scale)))
    )


def histogram_merge(
    regs: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge register tables (shards, days, micro-batches) into one per
    group: bin-count SUM — exact, order-independent.  Mixed-geometry
    tables raise (bounded distinct scan over the geometry marker, the
    hll_merge_registers pattern)."""
    groups = list(group_cols or [])
    geos = [r["__geo"] for r in regs.select("__geo").distinct().collect()]
    if len(geos) > 1:
        raise ValueError(
            f"histogram_merge: register tables built under mixed "
            f"geometries {sorted(geos)} cannot merge; re-sketch one side"
        )
    out = regs.groupBy(*groups, "__b").agg(F.sum("__n").alias("__n"))
    return out.withColumn("__geo", F.lit(geos[0])) if geos else out.withColumn(
        "__geo", F.lit(None).cast("string")
    )


def histogram_quantile_value_sql(
    lo: float, hi: float, bins: int, b: str, n: str, cum: str, tgt: str
) -> str:
    """The quantile-estimate CASE expression as SQL TEXT, shared
    verbatim by the Spark plan (``F.expr``) and the DuckDB oracle so
    the floating-point operation ORDER is identical character for
    character — the BM25 shared-CTE discipline.  ``b/n/cum/tgt`` are
    the caller's column names: bin index, bin count, inclusive
    cumulative count, target rank."""
    w = f"(({hi!r} - {lo!r}) / {bins})"
    return (
        f"CASE WHEN {b} = 0 THEN {lo!r} "
        f"WHEN {b} = {bins + 1} THEN {hi!r} "
        f"ELSE {lo!r} + ({b} - 1) * {w} "
        f"+ {w} * (CAST({tgt} - ({cum} - {n}) AS DOUBLE) "
        f"/ CAST({n} AS DOUBLE)) END"
    )


def histogram_quantiles(
    regs: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    group_cols: list[str] | None = None,
    geometry: str | None = None,
) -> DataFrame:
    """Quantile estimates from a register table —
    ``(group..., q, est)`` — inverse empirical CDF: the estimate for q
    lives in the first bin whose inclusive cumulative count reaches
    ``ceil(q * total)`` (clamped to rank 1 so q=0 is the distribution
    floor), linearly interpolated within the bin; under/overflow bins
    clamp to lo/hi.  |est - exact quantile| <= one bin width whenever
    the exact quantile is in [lo, hi) (tested).  The window and the
    cross-explode run on register-table-sized data (bins+2 rows per
    group), never on the input.

    ``geometry`` is the ``__geo`` marker string when the caller already
    knows it (``histogram_sketch_quantiles`` passes it through so the
    marker discovery never re-executes an unpersisted corpus-scale
    register plan); ``None`` reads it from the table — the right call
    for PERSISTED register tables, where the distinct scan is
    bins-scale and the mixed-geometry guard is wanted."""
    from pyspark.sql import Window

    groups = list(group_cols or [])
    if geometry is None:
        geos = [r["__geo"] for r in regs.select("__geo").distinct().collect()]
        if not geos or (len(geos) == 1 and geos[0] is None):
            # Empty input (or a merge of empty tables, whose marker is
            # NULL): no groups exist, so no quantiles — return the
            # typed empty result instead of crashing on the marker.
            return regs.sparkSession.createDataFrame(
                [],
                ", ".join(
                    [f"`{g}` {dict(regs.dtypes)[g]}" for g in groups]
                    + ["q double", "est double"]
                ),
            )
        if len(geos) != 1:
            raise ValueError(
                f"histogram_quantiles: expected one geometry, got {sorted(geos)}"
            )
        geometry = geos[0]
    scale, lo_s, hi_s, bins_s = geometry.split(":")
    lo, hi, bins = float(lo_s), float(hi_s), int(bins_s)
    win = Window.partitionBy(*groups).orderBy("__b")
    cum = regs.select(
        *groups,
        "__b",
        "__n",
        F.sum("__n").over(win).alias("__cum"),
        F.sum("__n").over(Window.partitionBy(*groups)).alias("__total"),
    )
    qcol = F.explode(
        F.array(*[F.expr(f"CAST('{q!r}' AS DOUBLE)") for q in qs])
    ).alias("q")
    tgt = F.expr("GREATEST(CAST(1 AS BIGINT), CAST(CEIL(q * __total) AS BIGINT))")
    hit = (
        cum.select(*groups, "__b", "__n", "__cum", "__total", qcol)
        .withColumn("__tgt", tgt)
        .where((F.col("__cum") >= F.col("__tgt")) & (F.col("__cum") - F.col("__n") < F.col("__tgt")))
    )
    if scale == "linear":
        val = F.expr(
            histogram_quantile_value_sql(lo, hi, bins, "__b", "__n", "__cum", "__tgt")
        )
    else:  # log: edges at lo * (hi/lo)^((b-1)/bins); interpolate in log space
        val = F.expr(
            f"CASE WHEN __b = 0 THEN {lo!r} "
            f"WHEN __b = {bins + 1} THEN {hi!r} "
            f"ELSE {lo!r} * EXP((( __b - 1) + (CAST(__tgt - (__cum - __n) AS DOUBLE)"
            f" / CAST(__n AS DOUBLE))) * {math.log(hi / lo)!r} / {bins}) END"
        )
    return hit.select(*groups, "q", val.alias("est")).orderBy(*groups, "q")


def histogram_sketch_quantiles(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = 128,
    group_cols: list[str] | None = None,
    scale: str = "linear",
) -> DataFrame:
    """Sketch-then-estimate in one call (the hll_count_distinct shape):
    quantiles of ``col`` per group from one pass + a register-sized
    window."""
    regs = histogram_registers(
        df, col, lo, hi, bins=bins, group_cols=group_cols, scale=scale
    )
    # Pass the geometry through: discovering it from the table would
    # re-execute the corpus-scale register aggregation once just to
    # read a constant string.
    return histogram_quantiles(
        regs,
        qs=qs,
        group_cols=group_cols,
        geometry=_hist_geo(float(lo), float(hi), bins, scale),
    )


def exact_quantile(
    df: DataFrame,
    col: str,
    qs: tuple[float, ...] = (0.5,),
    group_cols: list[str] | None = None,
    bins: int = 256,
    max_iters: int = 300,
) -> DataFrame:
    """EXACT quantiles per group — ``(group..., q, value)`` where
    ``value`` is the actual element at 1-based rank
    ``max(1, ceil(q * n))`` in ascending order — WITHOUT a global sort,
    via distributed selection (iterative histogram narrowing, the
    classic k-selection algorithm distributed):

    1. one pass computes per-group ``n``/min/max;
    2. each iteration bins the rows still inside each (group, q)'s
       candidate range against a BROADCAST range table and walks the
       bin counts on the driver (``groups × qs × bins`` rows —
       metadata-scale) to shrink the range ``bins``-fold and re-anchor
       the remaining rank;
    3. per-iteration min/max of the surviving range detects the
       all-ties case (``min == max`` → that IS the answer) and
       guarantees progress in value space: each pass re-anchors to the
       winning bin's ACTUAL data min/max, so convergence takes
       ``log_bins(range/ulp)`` passes — ≤ 8 for same-binade data, but
       a group spanning extreme double magnitudes (1e-300 .. 1e300)
       can legitimately need ~265 passes at ``bins=256`` (the value
       ratio is ~2^2100 and linear binning removes 8 bits per pass);
       the default ``max_iters=300`` covers the full double range, and
       overshooting costs nothing because the loop exits on
       convergence.

    Contrast with the sketch face: :func:`histogram_quantiles` is one
    pass with bin-width error; this is a handful of passes with ZERO
    error.  Every pass is a scan + map-side-combined count (no shuffle
    of data rows, no ``orderBy``), so at 100 TB the cost is
    (iterations × pruned column scan) — the input is persisted as the
    two-column (group, value) projection for re-scan.  Multiple ``qs``
    replicate the scan per quantile inside one pass (rows join the
    range table on group and fan out per q).

    The driver holds per-(group, q) state: group cardinality must be
    aggregate-output-class (same contract as every ``.collect()`` of
    centroids/geometry in this repo), not data-scale."""
    import math as _math

    from pyspark.sql import Row

    spark = df.sparkSession
    groups = list(group_cols or [])
    if not qs:
        raise ValueError("exact_quantile needs at least one q")
    if any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in [0, 1], got {qs}")
    if bins < 2:
        # bins=1 cannot narrow a range: every iteration would re-bin
        # the whole range into one bucket and burn max_iters full
        # scans before dying with a misleading convergence error.
        raise ValueError(f"bins must be >= 2, got {bins}")
    x = F.col(col).cast("double")
    base = df.select(*groups, x.alias("__x")).where(F.col("__x").isNotNull())
    base = base.persist()
    try:
        stats = base.groupBy(*groups).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__x").alias("mn"),
            F.max("__x").alias("mx"),
        ).collect()
        # State per (group-key, q): remaining rank within [lo, hi].
        done: list[tuple] = []  # (*gvals, q, value)
        active: dict[tuple, dict] = {}
        for r in stats:
            gvals = tuple(r[g] for g in groups)
            for q in qs:
                rank = max(1, _math.ceil(q * r["n"]))
                if r["mn"] == r["mx"]:
                    done.append((*gvals, float(q), r["mn"]))
                else:
                    active[(gvals, float(q))] = {
                        "lo": r["mn"], "hi": r["mx"], "rank": rank,
                    }
        it = 0
        while active:
            it += 1
            if it > max_iters:
                raise RuntimeError(
                    f"exact_quantile failed to converge in {max_iters} "
                    f"iterations ({len(active)} ranges left)"
                )
            rows = [
                Row(**dict(zip(groups, gvals)),
                    __q=q, __lo=s["lo"], __hi=s["hi"])
                for (gvals, q), s in active.items()
            ]
            schema = ", ".join(
                [f"`{g}` {dict(base.dtypes)[g]}" for g in groups]
                + ["__q double", "__lo double", "__hi double"]
            )
            ranges = spark.createDataFrame(rows, schema)
            if groups:
                # NULL-safe equality: a NULL group key is a real group
                # (it came out of the stats groupBy), and a plain
                # equi-join would silently drop its rows — the walk
                # below would then KeyError on the vanished key.
                cond = None
                for g in groups:
                    c = base[g].eqNullSafe(ranges[g])
                    cond = c if cond is None else (cond & c)
                j = base.join(F.broadcast(ranges), cond).drop(
                    *[ranges[g] for g in groups]
                )
            else:
                j = base.crossJoin(F.broadcast(ranges))
            # hi is INCLUSIVE (it starts as the true max); the last bin
            # absorbs x == hi via the least() clamp.
            in_range = j.where((F.col("__x") >= F.col("__lo")) & (F.col("__x") <= F.col("__hi")))
            b = F.least(
                F.lit(bins - 1),
                F.floor(
                    (F.col("__x") - F.col("__lo")) * F.lit(float(bins))
                    / (F.col("__hi") - F.col("__lo"))
                ),
            )
            counts = (
                in_range.groupBy(*groups, "__q", b.alias("__b"))
                .agg(
                    F.count(F.lit(1)).alias("__n"),
                    F.min("__x").alias("__mn"),
                    F.max("__x").alias("__mx"),
                )
                .collect()
            )
            by_key: dict[tuple, list] = {}
            for r in counts:
                key = (tuple(r[g] for g in groups), r["__q"])
                by_key.setdefault(key, []).append(r)
            nxt: dict[tuple, dict] = {}
            for key, s in active.items():
                rank = s["rank"]
                hit = None
                for r in sorted(by_key[key], key=lambda r: r["__b"]):
                    if rank <= r["__n"]:
                        hit = r
                        break
                    rank -= r["__n"]
                assert hit is not None, "rank fell off the histogram"
                if hit["__mn"] == hit["__mx"]:
                    done.append((*key[0], key[1], hit["__mn"]))
                else:
                    # min/max of the WINNING bin: progress in value
                    # space is guaranteed because mn < mx strictly
                    # shrinks below the previous [lo, hi].
                    nxt[key] = {"lo": hit["__mn"], "hi": hit["__mx"], "rank": rank}
            active = nxt
        out_schema = ", ".join(
            [f"`{g}` {dict(base.dtypes)[g]}" for g in groups]
            + ["q double", "value double"]
        )
        return spark.createDataFrame(
            [Row(**dict(zip(groups, t[:-2])), q=t[-2], value=t[-1]) for t in done],
            out_schema,
        ).orderBy(*groups, "q")
    finally:
        base.unpersist()


def count_min_heavy_hitters(
    df: DataFrame,
    col: str,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
    hash: str = "md5",
    probe: str = "auto",
) -> DataFrame:
    """EXACT heavy hitters — every value of ``col`` occurring at least
    ``threshold`` times, with its exact count — without ever running a
    full-cardinality aggregation: the count-min sketch's production
    use.

    1. one sketch pass (``count_min_sketch``: depth × width counters,
       map-side combined);
    2. the counters COLLECT to the driver (depth × width BIGINTs —
       metadata-scale) and become ARRAY LITERALS in the plan, so every
       row's estimate is a codegen ``least(element_at(...))`` probe —
       no join, no second shuffle for candidate generation;
    3. rows whose estimate clears ``threshold`` — a SUPERSET of the
       true heavy rows by the sketch's one-sided error — proceed to an
       exact groupBy whose key cardinality is at most
       ``n/threshold + collision leakage``, not the full vocabulary;
       the final ``HAVING count >= threshold`` discards the leakage.

    No false negatives (estimates never undercount) and the exact pass
    removes the false positives, so the result is EXACT while the only
    wide operation runs on the candidate sliver.  Size ``width`` so
    ``n/width ≪ threshold`` or the collision leakage erodes the
    filtering (the classic CM sizing rule).

    ``probe`` picks how counters reach the rows: ``"literal"`` inlines
    them as codegen array literals (zero joins, but Catalyst pays a
    plan-compile floor that grows with ``depth*width`` — ~2 s at
    4x1024); ``"broadcast"`` leaves the counters as a DataFrame and
    runs one BROADCAST left join per depth row (map-side, no shuffle;
    plan size constant in ``width``); ``"auto"`` (default) switches to
    broadcast when ``depth * width > 2048``.  The cutoff was 16384
    through r16; the r17 interleaved A/B measured the literal path's
    analysis/codegen floor dominating already at 4x1024 (the catalog
    row: see OPTIMIZATION_r17.md), and the floor is pure driver time —
    at 100 TB it is noise, locally it is most of the row — while the
    broadcast probe's per-row cost is the same map-side hash lookup at
    any scale, so broadcast is the safe default everywhere above a few
    hundred counters.  Both forms are output-identical (pinned by
    test)."""
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    if probe not in ("auto", "literal", "broadcast"):
        raise ValueError(
            f"probe must be 'auto', 'literal' or 'broadcast', got {probe!r}"
        )
    # NULLs hash to a NULL bucket (md5(NULL) is NULL), which would both
    # crash the counter fill below (list index None) and be meaningless
    # under the groupBy contract — a NULL key can never be a heavy
    # hitter.  Exclude them from the sketch AND the probe.
    df = df.where(F.col(col).isNotNull())
    sketch = count_min_sketch(df, col, depth=depth, width=width, hash=hash)
    _, rows = _cm_bucket_structs(col, depth, width, hash)
    if probe == "broadcast" or (probe == "auto" and depth * width > 2048):
        # One broadcast LEFT join per depth row on the row's bucket
        # expression (absent counter = true zero — no item ever hashed
        # there).  Map-side only; the plan carries depth joins, not
        # depth*width literals.  The counters COLLECT once (depth*width
        # BIGINTs — metadata-scale, same as the literal path) and each
        # depth slice becomes a local DataFrame: slicing the live
        # sketch lineage per depth would re-run the full input
        # aggregation depth times (r14 advice).
        spark = df.sparkSession
        slices: list[list] = [[] for _ in range(depth)]
        for r in sketch.collect():  # depth*width rows
            slices[r["row"]].append((int(r["bucket"]), int(r["c"])))
        probed = df
        ests = []
        for j in range(depth):
            cj = spark.createDataFrame(
                slices[j], schema=f"__b{j} long, __c{j} long"
            )
            probed = probed.join(
                F.broadcast(cj),
                rows[j]["bucket"] == F.col(f"__b{j}"),
                "left",
            )
            ests.append(F.coalesce(F.col(f"__c{j}"), F.lit(0)))
        est = F.least(*ests) if depth > 1 else ests[0]
        return (
            probed.where(est >= F.lit(threshold))
            .groupBy(F.col(col))
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") >= threshold)
        )
    counters = [[0] * width for _ in range(depth)]
    for r in sketch.collect():  # depth*width rows — metadata-scale
        counters[r["row"]][r["bucket"]] = r["c"]
    # element_at is 1-based; bucket is 0-based.
    probes = [
        F.element_at(
            F.array(*[F.lit(int(c)) for c in counters[j]]),
            (rows[j]["bucket"] + 1).cast("int"),
        )
        for j in range(depth)
    ]
    est = F.least(*probes) if depth > 1 else probes[0]
    return (
        df.where(est >= F.lit(threshold))
        .groupBy(F.col(col))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= threshold)
    )
