"""Multimodal catalog query: the decode step's Arrow/mapInPandas
plumbing oracle-checked end-to-end.

The container ships no image codec, so ``decode_media``'s codec is a
DETERMINISTIC FAKE (md5-derived dimensions, sha256 content hash —
operators/multimodal.py).  That fake is deliberately SQL-expressible, so
the full distributed path — binary column in, Arrow batches through
Python, typed metadata out — gets a real CORRECTNESS row: the binary
fixture is the ``documents`` table's text as UTF-8 bytes, identical on
both engines (DuckDB ``encode()`` == Spark ``CAST(string AS BINARY)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metalpipe_spark.catalog import register
from metalpipe_spark.operators.dedup import hamming_neardup_pairs
from metalpipe_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    frame_sample,
    image_dhash,
)
from metalpipe_spark.sources.readers import load_table


def _media(spark, sf_dir):
    """Binary media fixture: the documents table's text as UTF-8 bytes —
    identical bytes in DuckDB (``encode(text)``) and Spark
    (``CAST(text AS BINARY)``)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("id"),
        F.lit("image").alias("media_type"),
        F.col("text").cast("binary").alias("content"),
    )


@register(
    "q_multimodal_decode",
    """
    SELECT doc_id AS id,
           'image' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           16 + (('0x' || substr(md5(text), 1, 2))::INT % 240) AS width,
           16 + (('0x' || substr(md5(text), 3, 2))::INT % 240) AS height,
           sha256(text) AS sha
    FROM documents
    ORDER BY id
    """,
    doc=(
        "Multimodal decode over Arrow batches (mapInPandas): binary "
        "content -> typed metadata; fake codec is md5/sha-derived so the "
        "oracle can replay it in SQL."
    ),
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_media(_media(spark, sf_dir)).orderBy("id")


def _features_oracle(dim: int = FEATURE_DIM) -> str:
    # Fake embedding: byte i of sha256 → (b - 128) / 128.  Halves of
    # 1/128 are exact binary fractions, so float32 == the oracle DOUBLE.
    cols = ",\n           ".join(
        f"CAST((('0x' || substr(sha256(text), {2 * i + 1}, 2))::INT - 128)"
        f" / 128.0 AS DOUBLE) AS f{i}"
        for i in range(dim)
    )
    return f"""
    SELECT doc_id AS id,
           {cols}
    FROM documents
    ORDER BY id
    """


@register(
    "q_multimodal_features",
    _features_oracle(),
    doc=(
        "Multimodal feature extraction (mapInPandas -> array<float>, "
        "ANN-compatible FEATURE_DIM vector), flattened to scalar columns "
        "for the hash compare; fake embedding is sha256-derived so the "
        "oracle replays it."
    ),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(_media(spark, sf_dir))
    return feats.select(
        "id",
        *[
            F.col("feature")[i].cast("double").alias(f"f{i}")
            for i in range(FEATURE_DIM)
        ],
    ).orderBy("id")


@register(
    "q_frame_sample",
    # DuckDB cannot slice BLOBs, so the oracle slices the VARCHAR and
    # encodes the slice: identical bytes because the corpus is pure ASCII
    # (verified at every SF; 1 char == 1 byte).
    """
    WITH f AS (
      SELECT doc_id AS id, i - 1 AS frame_id,
             substring(text, 1 + (i - 1) * 64, 64) AS frame
      FROM documents, range(1, 5) r(i)
    )
    SELECT id, frame_id, md5(frame) AS frame_md5,
           octet_length(encode(frame)) AS frame_bytes
    FROM f
    WHERE octet_length(encode(frame)) > 0
    ORDER BY id, frame_id
    """,
    doc=(
        "Frame sampling (JVM byte slicing on BINARY, no Python): 4 fixed "
        "64-byte windows; frames surfaced as md5 + length (raw bytes "
        "arrive as unhashable bytearray in pandas)."
    ),
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = frame_sample(_media(spark, sf_dir), n_frames=4, frame_size=64)
    return frames.select(
        "id",
        "frame_id",
        F.md5("frame").alias("frame_md5"),
        F.length("frame").alias("frame_bytes"),
    ).orderBy("id", "frame_id")


# --- image perceptual-hash near-dup ---------------------------------------
#
# Deterministic synthetic RAW-RGB fixture: each document's text is cycled
# and space-padded to exactly 864 bytes = an 18x16 RGB tensor, identical
# bytes in both engines (pure-ASCII corpus; Spark CAST(string AS BINARY)
# == DuckDB per-char ascii()).  Every 5th document ALSO emits an "edited"
# variant with two pixels overwritten — the real near-dup shape (same
# image, small edit): the edit touches grid cells (0,0)/(0,1) only, so
# base and variant sit within hamming 2 of each other while unrelated
# corpus images measure >= 7 apart (checked at sf0.01).  image_dhash's
# REAL numpy kernel (nearest-neighbor 9x8 downsample -> grayscale ->
# gradient bits) is exactly replayable in SQL because every grid cell
# maps to three fixed byte offsets — so the full distributed path (Arrow
# batches through Python, Manku block banding, bucket join, bit_count
# verify) gets a value-hashed CORRECTNESS row, the same contract as
# q_multimodal_decode.

_IMG_W, _IMG_H = 18, 16
_IMG_BYTES = _IMG_W * _IMG_H * 3
_IMG_SQL = (
    f"rpad(substring(repeat(text, CAST(ceil({_IMG_BYTES}.0 / "
    f"greatest(length(text), 1)) AS INT)), 1, {_IMG_BYTES}), "
    f"{_IMG_BYTES}, ' ')"
)
# overwrite pixel (0,0) (bytes 1-3) and pixel (0,2) (bytes 7-9): those
# are grid cells (0,0) and (0,1), so only dhash bits 0-1 can flip.
_VARIANT_SQL = "'~~~' || substr(img, 4, 3) || '!!!' || substr(img, 10)"
_VARIANT_MOD = 5
_DHASH_MAX_HAMMING = 3
_DHASH_BLOCKS = 4


def _dhash_expr_sql() -> str:
    """The dHash kernel replayed in SQL over an ``img`` column: grid
    cell grays from fixed byte offsets, gradient bits OR'd together."""
    grid_w, grid_h = 9, 8

    def gray(r: int, c: int) -> str:
        # grid cell (r, c) samples pixel (2r, 2c) of the 18x16 image:
        # sy = (r * 16) // 8 = 2r, sx = (c * 18) // 9 = 2c.
        o = ((2 * r) * _IMG_W + 2 * c) * 3
        return (
            "("
            + " + ".join(f"ascii(substr(img, {o + k}, 1))" for k in (1, 2, 3))
            + ")"
        )

    terms = []
    for r in range(grid_h):
        for c in range(grid_w - 1):
            i = r * (grid_w - 1) + c
            # 1::BIGINT << 63 overflows DuckDB's checked shift; the sign
            # bit ORs in as the min-int64 literal instead.
            val = "(-9223372036854775807 - 1)" if i == 63 else f"({1 << i}::BIGINT)"
            terms.append(
                f"(CASE WHEN {gray(r, c + 1)} > {gray(r, c)} "
                f"THEN {val} ELSE 0::BIGINT END)"
            )
    return " | ".join(terms)


def _dhash_keys_sql() -> str:
    """The banding keys for the catalog's 64-bit/4-block/combo-1
    geometry, identical to hamming_neardup_pairs' key construction."""
    width = 64 // _DHASH_BLOCKS
    mask = (1 << width) - 1
    return ", ".join(
        f"((dhash >> {i * width}) & {mask}) + {i * (mask + 1)}"
        for i in range(_DHASH_BLOCKS)
    )


def _image_neardup_oracle() -> str:
    dhash = _dhash_expr_sql()
    keys = _dhash_keys_sql()
    return f"""
    WITH base AS (SELECT doc_id, {_IMG_SQL} AS img FROM documents),
    m AS (
      SELECT doc_id * 2 AS id, img FROM base
      UNION ALL
      SELECT doc_id * 2 + 1 AS id, {_VARIANT_SQL} AS img
      FROM base WHERE doc_id % {_VARIANT_MOD} = 0
    ),
    s AS (SELECT id, ({dhash}) AS dhash FROM m),
    banded AS (SELECT id, dhash, unnest([{keys}]) AS bk FROM s),
    cand AS (
      SELECT DISTINCT a.id AS d1, b.id AS d2,
             a.dhash AS s1, b.dhash AS s2
      FROM banded a JOIN banded b ON a.bk = b.bk AND a.id < b.id
    )
    SELECT d1, d2, bit_count(xor(s1, s2))::BIGINT AS hamming
    FROM cand WHERE bit_count(xor(s1, s2)) <= {_DHASH_MAX_HAMMING}
    ORDER BY d1, d2
    """


def _shared_image_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dHash code table ``(id, dhash)`` for the image fixture —
    materialized once per session (catalog/dedup.shared_stage) and
    served to the near-dup, incremental and composed-pipeline rows: 8
    bytes of state per image, so the checkpoint never holds payloads."""
    from metalpipe_spark.catalog.dedup import shared_stage

    return shared_stage(
        spark,
        ("image_dhash", sf_dir),
        lambda: image_dhash(_image_fixture(spark, sf_dir)),
    )


def _image_fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.expr(_IMG_SQL).alias("img"))
    w, h = F.lit(_IMG_W).alias("width"), F.lit(_IMG_H).alias("height")
    originals = base.select(
        (F.col("doc_id") * 2).alias("id"),
        F.col("img").cast("binary").alias("content"),
        w, h,
    )
    variants = base.where(F.col("doc_id") % _VARIANT_MOD == 0).select(
        (F.col("doc_id") * 2 + 1).alias("id"),
        F.expr(_VARIANT_SQL).cast("binary").alias("content"),
        w, h,
    )
    return originals.unionByName(variants)


@register(
    "q_image_neardup",
    _image_neardup_oracle(),
    doc=(
        "Image perceptual-hash near-dup: REAL dHash kernel over raw RGB "
        "tensors (numpy nearest-neighbor downsample + gradient bits, no "
        "image lib needed) -> 64-bit code -> Manku block banding "
        "(hamming_neardup_pairs, the SimHash machinery reused) -> exact "
        "bit_count(xor) verify.  Candidates meet through block buckets, "
        "never all pairs; per-image dedup state is 8 bytes."
    ),
)
def q_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = _shared_image_codes(spark, sf_dir)
    return hamming_neardup_pairs(
        codes, code_col="dhash", id_col="id",
        bits=64, max_hamming=_DHASH_MAX_HAMMING, blocks=_DHASH_BLOCKS,
    ).orderBy("d1", "d2")


def _incremental_imagedup_oracle() -> str:
    """Incremental image dedup replayed in SQL: store = base images of
    EVEN doc_ids (fixture id % 4 = 0), batch = everything else.  The
    batch first resolves in-batch near-dups by transitive closure over
    the banded hamming pairs (odd-doc_id variants collapse onto their
    in-batch base, minimum id survives), then band-joins the store and
    drops on hamming <= k (even-doc_id variants match their stored
    base)."""
    dhash = _dhash_expr_sql()
    keys = _dhash_keys_sql()
    k = _DHASH_MAX_HAMMING
    return f"""
    WITH RECURSIVE base AS (SELECT doc_id, {_IMG_SQL} AS img FROM documents),
    m AS (
      SELECT doc_id * 2 AS id, img FROM base
      UNION ALL
      SELECT doc_id * 2 + 1 AS id, {_VARIANT_SQL} AS img
      FROM base WHERE doc_id % {_VARIANT_MOD} = 0
    ),
    s AS (SELECT id, ({dhash}) AS dhash FROM m),
    store AS (SELECT * FROM s WHERE id % 4 = 0),
    batch AS (SELECT * FROM s WHERE id % 4 <> 0),
    bb AS (SELECT id, dhash, unnest([{keys}]) AS bk FROM batch),
    p AS (
      SELECT DISTINCT a.id AS d1, b.id AS d2
      FROM bb a JOIN bb b ON a.bk = b.bk AND a.id < b.id
      WHERE bit_count(xor(a.dhash, b.dhash)) <= {k}
    ),
    e AS (SELECT d1 AS u, d2 AS v FROM p UNION SELECT d2, d1 FROM p),
    reach(u, v) AS (
      SELECT u, v FROM e
      UNION
      SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
    ),
    comp AS (
      SELECT u AS id, LEAST(u, MIN(v)) AS cid FROM reach GROUP BY u
    ),
    surv AS (
      SELECT id, dhash FROM batch
      WHERE id NOT IN (SELECT id FROM comp WHERE id <> cid)
    ),
    sb AS (SELECT id, dhash, unnest([{keys}]) AS bk FROM surv),
    stb AS (SELECT id, dhash, unnest([{keys}]) AS bk FROM store),
    hits AS (
      SELECT DISTINCT a.id FROM sb a JOIN stb b ON a.bk = b.bk
      WHERE bit_count(xor(a.dhash, b.dhash)) <= {k}
    )
    SELECT id FROM surv WHERE id NOT IN (SELECT id FROM hits) ORDER BY id
    """


@register(
    "q_incremental_imagedup",
    _incremental_imagedup_oracle(),
    doc=(
        "Incremental IMAGE near-dup dedup: a new batch of dHash codes "
        "resolves in-batch dups by connected components, then band-joins "
        "the persisted code store (8 bytes of state per image) and drops "
        "on hamming <= 3 - the continuously-ingesting multimodal "
        "pipeline shape, mirroring the MinHash incremental twin."
    ),
)
def q_incremental_imagedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metalpipe_spark.operators.dedup import incremental_hamming_dedup

    codes = _shared_image_codes(spark, sf_dir)
    store = codes.where(F.col("id") % 4 == 0)
    batch = codes.where(F.col("id") % 4 != 0)
    fresh, _ = incremental_hamming_dedup(
        batch, store, code_col="dhash", id_col="id",
        bits=64, max_hamming=_DHASH_MAX_HAMMING, blocks=_DHASH_BLOCKS,
    )
    return fresh.select("id").orderBy("id")


def _multimodal_pipeline_oracle(dim: int = 4) -> str:
    """Pipeline oracle: dHash near-dup pairs over the image fixture →
    transitive closure → minimum-id survivor per cluster → features of
    the surviving images (sha256-derived, the decode fake's contract)."""
    dhash = _dhash_expr_sql()
    keys = _dhash_keys_sql()
    k = _DHASH_MAX_HAMMING
    feats = ",\n           ".join(
        f"CAST((('0x' || substr(sha256(img), {2 * i + 1}, 2))::INT - 128)"
        f" / 128.0 AS DOUBLE) AS f{i}"
        for i in range(dim)
    )
    return f"""
    WITH RECURSIVE base AS (SELECT doc_id, {_IMG_SQL} AS img FROM documents),
    m AS (
      SELECT doc_id * 2 AS id, img FROM base
      UNION ALL
      SELECT doc_id * 2 + 1 AS id, {_VARIANT_SQL} AS img
      FROM base WHERE doc_id % {_VARIANT_MOD} = 0
    ),
    s AS (SELECT id, img, ({dhash}) AS dhash FROM m),
    banded AS (SELECT id, dhash, unnest([{keys}]) AS bk FROM s),
    p AS (
      SELECT DISTINCT a.id AS d1, b.id AS d2
      FROM banded a JOIN banded b ON a.bk = b.bk AND a.id < b.id
      WHERE bit_count(xor(a.dhash, b.dhash)) <= {k}
    ),
    e AS (SELECT d1 AS u, d2 AS v FROM p UNION SELECT d2, d1 FROM p),
    reach(u, v) AS (
      SELECT u, v FROM e
      UNION
      SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
    ),
    comp AS (SELECT u AS id, LEAST(u, MIN(v)) AS cid FROM reach GROUP BY u)
    SELECT id, dhash,
           {feats}
    FROM s
    WHERE id NOT IN (SELECT id FROM comp WHERE id <> cid)
    ORDER BY id
    """


_PIPE_FEAT_DIM = 4


@register(
    "q_multimodal_pipeline",
    _multimodal_pipeline_oracle(_PIPE_FEAT_DIM),
    doc=(
        "Composed multimodal pipeline: decode fixture -> dHash -> "
        "banded near-dup pairs -> connected components -> minimum-id "
        "survivors -> feature extraction on the survivors only (the "
        "dedup-before-expensive-model ordering a real pipeline uses). "
        "Every stage is the oracle-checked operator; the composition "
        "itself is what this row pins."
    ),
)
def q_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metalpipe_spark.operators.dedup import dedup_corpus

    fixture = _image_fixture(spark, sf_dir)
    codes = _shared_image_codes(spark, sf_dir)
    pairs = hamming_neardup_pairs(
        codes, code_col="dhash", id_col="id",
        bits=64, max_hamming=_DHASH_MAX_HAMMING, blocks=_DHASH_BLOCKS,
    )
    survivors = dedup_corpus(codes, pairs, id_col="id")
    surviving_media = fixture.join(survivors.select("id"), "id", "left_semi")
    feats = extract_features(surviving_media)
    return (
        survivors.select("id", "dhash")
        .join(feats, "id")
        .select(
            "id", "dhash",
            *[
                F.col("feature")[i].cast("double").alias(f"f{i}")
                for i in range(_PIPE_FEAT_DIM)
            ],
        )
        .orderBy("id")
    )


_VID_FRAMES = 4
_VID_MIN_MATCH = 2
_VID_SHIFT = 17  # frame f windows the repeated text at offset 1 + 17f


def _frame_sql(src: str, f: int) -> str:
    """Frame ``f`` of the synthetic video: a shifted window into the
    repeated document text, padded to one raw-RGB image buffer."""
    need = _IMG_BYTES + _VID_SHIFT * f
    return (
        f"rpad(substring(repeat({src}, CAST(ceil({need}.0 / "
        f"greatest(length({src}), 1)) AS INT)), {1 + _VID_SHIFT * f}, "
        f"{_IMG_BYTES}), {_IMG_BYTES}, ' ')"
    )


# Frame 0 IS the image fixture's buffer — pinned at import so the two
# expressions can never drift apart (an edit to either padding/cycling
# rule trips this immediately, not at the next oracle sweep).
assert _frame_sql("text", 0) == _IMG_SQL

_VID_SQL = " || ".join(_frame_sql("text", f) for f in range(_VID_FRAMES))
# Variant: frame 0 replaced wholesale (reverse-text window) — a
# re-edited opening; frames 1..3 identical to the original.
_VID_VARIANT_SQL = " || ".join(
    [_frame_sql("reverse(text)", 0)]
    + [_frame_sql("text", f) for f in range(1, _VID_FRAMES)]
)


def _video_fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents", rebalance=True)  # per-frame dHash is scan-stage CPU
    originals = docs.select(
        (F.col("doc_id") * 2).alias("id"),
        F.expr(_VID_SQL).cast("binary").alias("content"),
    )
    variants = docs.where(F.col("doc_id") % _VARIANT_MOD == 0).select(
        (F.col("doc_id") * 2 + 1).alias("id"),
        F.expr(_VID_VARIANT_SQL).cast("binary").alias("content"),
    )
    return originals.unionByName(variants)


def _video_neardup_oracle() -> str:
    dhash = _dhash_expr_sql()
    keys = _dhash_keys_sql()
    fs = ", ".join(str(f) for f in range(_VID_FRAMES))
    return f"""
    WITH m AS (
      SELECT doc_id * 2 AS id, ({_VID_SQL}) AS vid FROM documents
      UNION ALL
      SELECT doc_id * 2 + 1 AS id, ({_VID_VARIANT_SQL}) AS vid
      FROM documents WHERE doc_id % {_VARIANT_MOD} = 0
    ),
    frames AS (
      SELECT id * {_VID_FRAMES} + f AS fid,
             substring(vid, 1 + f * {_IMG_BYTES}, {_IMG_BYTES}) AS img
      FROM m CROSS JOIN (SELECT unnest([{fs}]) AS f)
    ),
    s AS (SELECT fid, ({dhash}) AS dhash FROM frames),
    banded AS (SELECT fid, dhash, unnest([{keys}]) AS bk FROM s),
    cand AS (
      SELECT DISTINCT a.fid AS f1, b.fid AS f2, a.dhash AS s1, b.dhash AS s2
      FROM banded a JOIN banded b ON a.bk = b.bk AND a.fid < b.fid
    ),
    fp AS (
      SELECT f1 // {_VID_FRAMES} AS v1, f2 // {_VID_FRAMES} AS v2
      FROM cand WHERE bit_count(xor(s1, s2)) <= {_DHASH_MAX_HAMMING}
    )
    SELECT v1, v2, count(*)::BIGINT AS matching_frames
    FROM fp WHERE v1 <> v2
    GROUP BY v1, v2 HAVING count(*) >= {_VID_MIN_MATCH}
    ORDER BY v1, v2
    """


@register(
    "q_video_neardup",
    _video_neardup_oracle(),
    doc=(
        "Video near-dup by frame-signature agreement: JVM byte-sliced "
        "frame sampling -> per-frame raw-RGB dHash (8 bytes/frame) -> "
        "Manku block banding at FRAME level -> one aggregate counting "
        "matching frame pairs per video pair (>= 2 survives).  The "
        "variant fixture re-edits frame 0 (reverse-text window), so "
        "original/variant pairs match on the 3 untouched frames.  "
        "Payload bytes never shuffle; the banding join and pair count "
        "are sized by frames and matches, not video bytes."
    ),
)
def q_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metalpipe_spark.operators.multimodal import video_neardup_pairs

    vids = _video_fixture(spark, sf_dir)
    return video_neardup_pairs(
        vids, _VID_FRAMES, _IMG_W, _IMG_H,
        max_hamming=_DHASH_MAX_HAMMING, blocks=_DHASH_BLOCKS,
        min_matching_frames=_VID_MIN_MATCH,
    ).orderBy("v1", "v2")


# ---- audio near-dup fixture (VERDICT r10 task 4) --------------------
# Synthetic PCM built from 65 constant-amplitude frames so the RMS
# envelope is the amplitude sequence itself (sqrt(mean(a^2)) == |a| to
# <1 ulp) — the fingerprint becomes SQL-replayable as 64 amplitude
# comparisons, the same deterministic-synthesis trick as _IMG_SQL.
# Amplitude levels sit on a 0.05 grid and the variant's edit offset
# (0.513) is never a multiple of a level gap, so no comparison ever
# rides within float error of a tie.  The level index is a QUADRATIC
# hash of the combined key x = doc_id*65 + j + 1 (fold mod the prime
# 8191, square, fold, Knuth-multiply, fold again, mod 13): any formula LINEAR
# in j makes every doc's level sequence an arithmetic progression with
# the same step, so the comparison bits collapse into a handful of
# (start-level, wrap-phase) classes — verified: a linear fixture
# produced 65 distinct fingerprints over 500 docs and 13.5k accidental
# pairs at sf0.01, quadratic blowup at scale.  The square makes the
# j-step (2x+1) vary per doc AND per frame, so fingerprints are
# per-doc unique and the output is the planted variant pairs plus
# rare hash coincidences.  The variant is gain-scaled 2x
# (RMS envelope hashing is gain-invariant — zero flips) plus one
# amplitude edit at frame 40, flipping at most the two adjacent
# comparison bits (39, 40) — both inside Manku block 2 of 4, so
# blocks 0/1/3 stay exact matches and recall is guaranteed.
_AFP_FRAME = 32
_AFP_MAX_HAMMING = 3
# x is folded mod 8191 BEFORE squaring ((x mod m)^2 mod m == x^2 mod m,
# so fixture values are unchanged): the residue square tops out at
# 8190^2 * 2654435761 < 1.8e17 << 2^63, overflow-free at ANY id range.
# Squaring x directly would wrap past 2^63 at doc_id ~ 4.7e7
# (x = doc_id*65 + j + 1 < ~3.04e9) — silently under Spark non-ANSI,
# as an error in the DuckDB oracle, diverging the two engines.
_AFP_X = "((doc_id * 65 + j + 1) % 8191)"
_AFP_AMP = (
    f"(1 + (((({_AFP_X} * {_AFP_X}) % 8191) * 2654435761) % 8191) % 13)"
    " * 0.05D"
)
_AFP_AMP_VAR = (
    f"{_AFP_AMP} * 2.0D + (CASE WHEN j = 40 THEN 0.513D ELSE 0.0D END)"
)


def _afp_wave_sql(amp: str) -> str:
    """65 frames x _AFP_FRAME constant samples as one array<double> —
    codegen sequence/transform/flatten, no UDF in the fixture."""
    return (
        f"flatten(transform(transform(sequence(0, 64), j -> {amp}), "
        f"a -> array_repeat(a, {_AFP_FRAME})))"
    )


def _afp_expr_sql(doc: str, gain: float, bump: bool) -> str:
    """The 64-bit fingerprint as pure SQL: bit i = amp(i+1) > amp(i)
    (the envelope IS the amplitude sequence by construction)."""

    def amp(j: int) -> str:
        x = f"(({doc} * 65 + {j + 1}) % 8191)"
        base = (
            f"((1 + (((({x} * {x}) % 8191) * 2654435761) % 8191) % 13)"
            f" * 0.05"
        )
        if gain != 1.0:
            base += f" * {gain!r}"
        base += ")"
        if bump and j == 40:
            base = f"({base} + 0.513)"
        return base

    terms = []
    for i in range(64):
        val = "(-9223372036854775807 - 1)" if i == 63 else f"({1 << i}::BIGINT)"
        terms.append(
            f"(CASE WHEN {amp(i + 1)} > {amp(i)} THEN {val} ELSE 0::BIGINT END)"
        )
    return " | ".join(terms)


def _afp_keys_sql() -> str:
    width = 64 // _DHASH_BLOCKS
    mask = (1 << width) - 1
    return ", ".join(
        f"((afp >> {i * width}) & {mask}) + {i * (mask + 1)}"
        for i in range(_DHASH_BLOCKS)
    )


def _audio_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    originals = docs.select(
        (F.col("doc_id") * 2).alias("id"),
        F.expr(_afp_wave_sql(_AFP_AMP)).alias("waveform"),
    )
    variants = docs.where(F.col("doc_id") % _VARIANT_MOD == 0).select(
        (F.col("doc_id") * 2 + 1).alias("id"),
        F.expr(_afp_wave_sql(_AFP_AMP_VAR)).alias("waveform"),
    )
    return originals.unionByName(variants)


def _audio_neardup_oracle() -> str:
    keys = _afp_keys_sql()
    return f"""
    WITH s AS (
      SELECT doc_id * 2 AS id, ({_afp_expr_sql('doc_id', 1.0, False)}) AS afp
      FROM documents
      UNION ALL
      SELECT doc_id * 2 + 1, ({_afp_expr_sql('doc_id', 2.0, True)})
      FROM documents WHERE doc_id % {_VARIANT_MOD} = 0
    ),
    banded AS (SELECT id, afp, unnest([{keys}]) AS bk FROM s),
    cand AS (
      SELECT DISTINCT a.id AS d1, b.id AS d2, a.afp AS s1, b.afp AS s2
      FROM banded a JOIN banded b ON a.bk = b.bk AND a.id < b.id
    )
    SELECT d1, d2, bit_count(xor(s1, s2))::BIGINT AS hamming
    FROM cand WHERE bit_count(xor(s1, s2)) <= {_AFP_MAX_HAMMING}
    ORDER BY d1, d2
    """


@register(
    "q_audio_neardup",
    _audio_neardup_oracle(),
    doc=(
        "Audio fingerprint near-dup: REAL RMS-envelope kernel "
        "(multimodal.audio_fingerprint — windowed RMS, 65-point "
        "resample, rising-energy bits, Arrow-batched numpy) over "
        "deterministic synthetic PCM -> 64-bit code -> the SAME Manku "
        "banding engine as text/image/video (hamming_neardup_pairs) -> "
        "exact bit_count(xor) verify.  Variants are gain-scaled 2x "
        "(envelope hashing is gain-invariant) with one amplitude edit; "
        "waveform samples never shuffle — 8 bytes of dedup state per "
        "clip cross the wire."
    ),
)
def q_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metalpipe_spark.operators.multimodal import audio_fingerprint

    codes = audio_fingerprint(
        _audio_fixture(spark, sf_dir),
        frame=_AFP_FRAME,
        hop=_AFP_FRAME,
    )
    return hamming_neardup_pairs(
        codes, code_col="afp", id_col="id",
        bits=64, max_hamming=_AFP_MAX_HAMMING, blocks=_DHASH_BLOCKS,
        # The RMS-envelope numpy kernel is the row's cost; without the
        # cache it runs once per self-join side (r17, guide §5).
        cache_codes=True,
    ).orderBy("d1", "d2")


_VAD_WAVE_SPARK = (
    "transform(sequence(0, 399), i -> CAST("
    "CASE WHEN ((i div 100) + doc_id) % 3 = 0 THEN (i*7 + doc_id) % 13 + 5 "
    "ELSE i % 2 END AS DOUBLE))"
)

_VAD_ORACLE = """
    WITH w AS (
      SELECT doc_id AS id,
             list_transform(range(0, 400), i -> (CASE
               WHEN ((i // 100) + doc_id) % 3 = 0 THEN (i*7 + doc_id) % 13 + 5
               ELSE i % 2 END)::DOUBLE) AS wave
      FROM documents
    ),
    f AS (
      SELECT id, unnest(range(0, 8)) AS k, wave FROM w
    ),
    e AS (
      SELECT id, k,
             list_sum(list_transform(list_slice(wave, k*50 + 1, k*50 + 50),
                                     x -> x * x)) / 50.0 AS energy
      FROM f
    ),
    g AS (
      SELECT id, k,
             k - row_number() OVER (PARTITION BY id ORDER BY k) AS grp
      FROM e WHERE energy >= 2.0
    )
    SELECT id, min(k)::INT AS start_frame, max(k)::INT AS end_frame,
           count(*)::INT AS n_active_frames,
           (min(k) * 50)::BIGINT AS start_sample
    FROM g GROUP BY id, grp ORDER BY id, start_frame
    """


@register(
    "q_audio_vad_segments",
    _VAD_ORACLE,
    doc=(
        "audio_energy_segments (operators/multimodal.py): energy-based "
        "activity segmentation — the VAD primitive — over deterministic "
        "integer-valued synthetic PCM (sums of integer squares are "
        "exact in doubles, so the threshold compare is cross-engine "
        "exact).  Frame energies are one transform+aggregate HOF pass; "
        "islands come from aligned start/end boundary arrays zipped "
        "1:1 — zero Python, zero shuffle, waveform samples never leave "
        "their partition.  The oracle replays energies via list ops "
        "and islands via the row_number gaps-and-islands."
    ),
)
def q_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metalpipe_spark.operators.multimodal import audio_energy_segments

    docs = load_table(spark, sf_dir, "documents")
    clips = docs.select(
        F.col("doc_id").alias("id"), F.expr(_VAD_WAVE_SPARK).alias("waveform")
    )
    return audio_energy_segments(
        clips, frame=50, hop=50, threshold=2.0
    ).orderBy("id", "start_frame")
