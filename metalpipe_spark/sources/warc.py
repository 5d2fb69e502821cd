"""WARC / WET ingestion and export — Common Crawl's on-disk formats.

A 100 TB training-data pipeline usually STARTS from Common Crawl, whose
unit of storage is the WARC family (ISO 28500): raw ``*.warc.gz``
response captures and the text-extracted ``*.wet.gz`` "conversion"
records.  The reference ingests web data row-by-row over HTTP
(reference network_nodes.py:172-241, ``HttpGetRequest``) and ships no
archive-format reader, so this module is brief-driven: it gives the
engine a native, distributed entry point into the format the web-scale
corpus actually lives in, feeding the existing chain
(``html_extract_text`` -> langid -> quality -> dedup -> curation).

Two parse strategies, same output schema, chosen per workload:

* ``mode="delimiter"`` (default, the scan-shaped fast path): the file
  is split into records JVM-SIDE by ``spark.read.text`` with a
  multi-byte ``lineSep`` of ``"\\r\\n\\r\\nWARC/1.0\\r\\n"`` — the
  inter-record framing bytes the WARC spec mandates (each record is
  followed by exactly two CRLFs).  Header fields then parse with
  codegen ``regexp_extract``; no Python executes anywhere.  Hadoop's
  codec layer decompresses ``.gz`` transparently; a gzip member is not
  splittable, so parallelism is per FILE — exactly Common Crawl's
  layout (a crawl is ~70k ~1 GB segment files; 100 TB = tens of
  thousands of independent tasks).  Caveat: a payload that itself
  contains the framing bytes splits early.  The HOST record surfaces
  with ``length_ok = false`` (its ``Content-Length`` no longer matches
  the payload's ``octet_length``), so accidental damage is detectable
  row-by-row and the affected files can be re-read under
  ``mode="exact"``.  The split-off TAIL is weaker: an adversarial
  payload embedding a complete well-formed record yields a forged row
  whose own fields are self-consistent (``length_ok = true``) — only
  the flagged host record betrays it.  Web text is attacker-controlled,
  so integrity-sensitive corpus builds should run ``mode="exact"``
  (Content-Length framing cannot be payload-spoofed) or treat any file
  containing a ``length_ok = false`` record as suspect wholesale.

* ``mode="exact"``: ``binaryFile`` scan + a ``Content-Length``-driven
  record walk inside ``mapInPandas`` (Arrow-batched, one file per
  row).  Byte-exact per the spec — payloads may contain anything,
  including the framing bytes or binary data.  Costs a Python hop and
  holds one decompressed file per task (~400 MB for a standard
  Common Crawl WET segment; size ``spark.sql.files.maxPartitionBytes``
  accordingly), which is why it is the repair path, not the default.

``write_wet`` is the inverse — it exports a corpus DataFrame as
spec-framed ``.wet.gz`` shards (one gzip member per task, the same
layout Common Crawl ships), which also makes the reader pair
round-trip-testable without network fixtures.
"""

from __future__ import annotations

import gzip
import re
import zlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Output schema shared by both modes (and by read_warc, which appends
# the HTTP-response columns).  ``length_ok`` is the delimiter-mode
# corruption flag; exact mode emits literal true (the walk is
# Content-Length-driven, a mismatch is impossible by construction).
WET_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("length_ok", T.BooleanType()),
    ]
)

WARC_SCHEMA = T.StructType(
    list(WET_SCHEMA.fields[:6])
    + [
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        # Revisit/metadata linkage (RFC WARC/1.1 §6.7): real Common
        # Crawl segments interleave request/metadata/revisit records
        # with responses; a `revisit` + WARC-Refers-To is the crawler's
        # own dedup assertion — resolve_revisits() consumes these.
        T.StructField("refers_to", T.StringType()),
        T.StructField("profile", T.StringType()),
        T.StructField("payload_digest", T.StringType()),
        T.StructField("length_ok", T.BooleanType()),
    ]
)


def _header(headers: Column, name: str) -> Column:
    """Value of one WARC/HTTP header out of a CRLF-joined header block.

    WARC headers are case-insensitive per ISO 28500 §5.1; ``(?im)``
    anchors each line and folds case in Java regex, RE2, and Python
    identically (no lookaround, no backreferences).
    """
    return F.regexp_extract(headers, rf"(?im)^{name}:[ \t]*([^\r\n]*?)[ \t]*$", 1)


def read_wet(
    spark: SparkSession,
    path: str,
    mode: str = "delimiter",
    warc_version: str = "1.0",
    record_types: tuple[str, ...] | None = ("conversion",),
    on_error: str = "fail",
) -> DataFrame:
    """Read WET (WARC conversion) files into (url, date, record_id,
    warc_type, content_type, content_length, text, length_ok).

    ``record_types`` filters on ``WARC-Type`` (default keeps the text
    ``conversion`` records and drops the per-file ``warcinfo``
    preamble); pass ``None`` to keep every record.  See the module
    docstring for the delimiter/exact trade-off.

    ``on_error`` (exact mode): a structurally-broken file — truncated
    gzip member, Content-Length overrunning the bytes, no header block
    — raises by default; ``"skip"`` keeps the file's records up to the
    corruption point and drops the rest, because at crawl scale a
    handful of damaged segments must not kill a 100 TB job (the same
    degrade-don't-die posture as the multimodal decoders,
    operators/multimodal.py).  The delimiter path needs no knob: it has
    no structural expectations to violate — damage surfaces per-record
    as ``length_ok = false``.
    """
    if mode == "delimiter":
        out = _read_wet_delimiter(spark, path, warc_version)
    elif mode == "exact":
        out = _read_records_exact(spark, path, WET_SCHEMA, http=False, on_error=on_error)
    else:
        raise ValueError(f"read_wet mode must be 'delimiter' or 'exact', got {mode!r}")
    if record_types is not None:
        out = out.where(F.col("warc_type").isin(*record_types))
    return out


def _read_wet_delimiter(spark: SparkSession, path: str, version: str) -> DataFrame:
    # One row per record: the framing bytes between records are exactly
    # CRLF CRLF "WARC/<v>" CRLF (record block, two CRLFs, next header).
    raw = spark.read.option("lineSep", _record_delim(version)).text(path)
    return _wet_columns(raw)


def _record_delim(version: str) -> str:
    return f"\r\n\r\nWARC/{version}\r\n"


def _wet_columns(raw: DataFrame) -> DataFrame:
    """Delimiter-split records (one per ``value`` row) -> WET_SCHEMA
    columns; shared by the batch reader and :func:`stream_wet`."""
    # First record of each file keeps its version line; later records
    # lost it to the delimiter.
    rec = F.regexp_replace(F.col("value"), r"^WARC/[0-9.]+\r\n", "")
    # Header block / payload split on the FIRST blank line (limit=2
    # keeps any further blank lines inside the payload).
    parts = F.split(rec, r"\r\n\r\n", 2)
    headers = parts.getItem(0)
    text = F.coalesce(parts.getItem(1), F.lit(""))
    clen = F.nullif(_header(headers, "Content-Length"), F.lit("")).cast("long")
    # The LAST record of a file keeps the file's trailing two CRLFs
    # (earlier records lost theirs to the delimiter).  Strip them only
    # when Content-Length says they are framing (+4 octets) — an
    # unconditional strip would truncate a NON-final payload that
    # legitimately ends with CRLF CRLF (legal: Content-Length governs).
    # Without a Content-Length there is nothing to check, so fall back
    # to stripping (the common final-record shape).
    stripped = F.regexp_replace(text, r"\r\n\r\n$", "")
    text = (
        F.when(clen.isNull(), stripped)
        .when(F.octet_length(text) == clen + 4, stripped)
        .otherwise(text)
    )
    return (
        raw.select(headers.alias("_h"), clen.alias("content_length"), text.alias("text"))
        .select(
            _header(F.col("_h"), "WARC-Target-URI").alias("url"),
            _header(F.col("_h"), "WARC-Date").alias("date"),
            _header(F.col("_h"), "WARC-Record-ID").alias("record_id"),
            _header(F.col("_h"), "WARC-Type").alias("warc_type"),
            _header(F.col("_h"), "Content-Type").alias("content_type"),
            F.col("content_length"),
            F.col("text"),
        )
        .withColumn(
            "length_ok",
            F.col("content_length").isNotNull()
            & (F.octet_length("text") == F.col("content_length")),
        )
    )


# -- exact (Content-Length walk) mode ---------------------------------------

# \r? before $: Python MULTILINE $ matches only before \n, and a
# Content-Length that is NOT the last header line (the normal layout in
# real crawl records) is followed by \r\n.  Same pitfall as _hval below.
_CLEN_RE = re.compile(rb"(?im)^Content-Length:[ \t]*([0-9]+)[ \t]*\r?$")
_STATUS_RE = re.compile(rb"^HTTP/[0-9.]+[ \t]+([0-9]{3})")


def _hval(headers: str, name: str) -> str:
    # The explicit \r? matters: Python's MULTILINE $ matches only
    # before \n, while the header block's lines end \r\n (Java regex,
    # which serves the delimiter path, treats \r\n as a terminator).
    m = re.search(rf"(?im)^{name}:[ \t]*([^\r\n]*?)[ \t]*\r?$", headers)
    return m.group(1) if m else ""


def _iter_records(blob: bytes) -> Iterator[tuple[str, bytes]]:
    """Yield (header_block, payload_bytes) per the spec's framing:
    header block, blank line, exactly Content-Length payload bytes,
    two CRLFs.  Tolerates extra inter-record CRLFs and a missing final
    terminator; raises on a record without Content-Length (the walk
    cannot continue safely past it)."""
    i, n = 0, len(blob)
    while i < n:
        while blob.startswith(b"\r\n", i):
            i += 2
        if i >= n:
            return
        end = blob.find(b"\r\n\r\n", i)
        if end < 0:
            raise ValueError("WARC record without a header/payload blank line")
        head = blob[i:end]
        m = _CLEN_RE.search(head)
        if m is None:
            raise ValueError("WARC record without Content-Length")
        clen = int(m.group(1))
        start = end + 4
        if start + clen > n:
            raise ValueError("WARC Content-Length overruns the file")
        yield head.decode("utf-8", "replace"), blob[start : start + clen]
        i = start + clen


def _gunzip_all(blob: bytes, partial: bool = False) -> bytes:
    """Decompress a possibly multi-member gzip stream (Common Crawl
    writes ONE MEMBER PER RECORD so readers can range-seek); plain
    bytes pass through.  ``partial=True`` returns the members that
    decompressed cleanly BEFORE a truncated/corrupt one instead of
    raising — per-record members mean a damaged segment still yields
    every record up to the damage."""
    if not blob.startswith(b"\x1f\x8b"):
        return blob
    if not partial:
        return gzip.decompress(blob)
    # Chunked decompressobj walk: each input byte is fed exactly once
    # (a per-member re-slice of the remaining blob would be quadratic at
    # Common Crawl's ~50k members per segment, and GzipFile.read drops
    # the entire chunk containing the damage), unused_data copies are
    # bounded by the chunk size, and a TRUNCATED final member still
    # yields the bytes it decompressed before breaking off — the record
    # walk then salvages every complete record inside them.
    chunk_size = 1 << 20
    mv = memoryview(blob)
    out = bytearray()
    i, n = 0, len(blob)
    d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
    try:
        while i < n:
            end = min(i + chunk_size, n)
            out += d.decompress(mv[i:end])
            if d.eof:
                # member boundary inside the chunk: reposition to the
                # unconsumed tail and start the next member (or stop at
                # trailing padding/garbage).
                i = end - len(d.unused_data)
                if blob[i : i + 2] != b"\x1f\x8b":
                    break
                d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
            else:
                i = end
    except zlib.error:
        pass
    return bytes(out)


def _read_records_exact(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    http: bool,
    on_error: str = "fail",
) -> DataFrame:
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")
    bin_df = spark.read.format("binaryFile").load(path).select("content")
    names = [f.name for f in schema.fields]

    def records(blob: bytes):
        # Generator-wrapping matters: the corruption may surface on ANY
        # next() (mid-file), and skip mode must keep the records already
        # yielded before it; partial gunzip likewise salvages the gzip
        # members preceding a truncated one.
        skip = on_error == "skip"
        it = _iter_records(_gunzip_all(bytes(blob), partial=skip))
        while True:
            try:
                yield next(it)
            except StopIteration:
                return
            except (ValueError, EOFError, OSError, zlib.error):
                if not skip:
                    raise
                return

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for head, payload in records(blob):
                    base = [
                        _hval(head, "WARC-Target-URI"),
                        _hval(head, "WARC-Date"),
                        _hval(head, "WARC-Record-ID"),
                        _hval(head, "WARC-Type"),
                        _hval(head, "Content-Type"),
                        len(payload),
                    ]
                    if http:
                        status, ctype, body = _split_http(payload)
                        rows.append(
                            base
                            + [status, ctype, body]
                            + [
                                _hval(head, "WARC-Refers-To"),
                                _hval(head, "WARC-Profile"),
                                _hval(head, "WARC-Payload-Digest"),
                                True,
                            ]
                        )
                    else:
                        rows.append(base + [payload.decode("utf-8", "replace"), True])
            yield pd.DataFrame(rows, columns=names)

    return bin_df.mapInPandas(parse, schema)


def _split_http(payload: bytes) -> tuple[int | None, str, bytes]:
    """(status, content-type, body) of an HTTP response payload; a
    payload that is not HTTP-shaped comes back (None, '', payload)."""
    m = _STATUS_RE.match(payload)
    if m is None:
        return None, "", payload
    end = payload.find(b"\r\n\r\n")
    if end < 0:
        head, body = payload, b""
    else:
        head, body = payload[:end], payload[end + 4 :]
    ctype = _hval(head.decode("utf-8", "replace"), "Content-Type")
    return int(m.group(1)), ctype, body


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] | None = ("response",),
    on_error: str = "fail",
) -> DataFrame:
    """Read raw WARC files into WET_SCHEMA's header columns plus
    (http_status, http_content_type, payload binary).

    Always the exact walk: response payloads are binary (images, pdfs,
    gzip bodies) and may legally contain the inter-record framing
    bytes, so the delimiter fast path is WET-only by design.
    ``on_error`` as in :func:`read_wet`.
    """
    out = _read_records_exact(spark, path, WARC_SCHEMA, http=True, on_error=on_error)
    if record_types is not None:
        out = out.where(F.col("warc_type").isin(*record_types))
    return out


def stream_wet(
    spark: SparkSession,
    directory: str,
    warc_version: str = "1.0",
    record_types: tuple[str, ...] | None = ("conversion",),
    glob: str = "*.gz",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """WET archives as a STREAM: the file source discovers new segment
    files (checkpointed, exactly-once per file) and the same multi-byte
    ``lineSep`` delimiter split + codegen header parse run per
    micro-batch — a continuously-arriving crawl flows straight into the
    streaming corpus pipeline (streaming/streams.py:
    stream_corpus_pipeline) with no batch/stream code fork.

    The default glob matches both Common Crawl's ``*.warc.wet.gz``
    and :func:`write_wet`'s own ``part-*.txt.gz`` shards, so an
    exported corpus can be re-streamed without configuration.

    Delimiter mode only: the exact Content-Length walk needs whole-file
    bytes (binaryFile has no streaming source), and streams are where
    the scan-shaped fast path matters most; poisoned payloads still
    surface as ``length_ok = false`` for a batch repair pass.
    """
    reader = (
        spark.readStream.format("text")
        .schema("value string")
        .option("lineSep", _record_delim(warc_version))
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    out = _wet_columns(reader.load(directory))
    if record_types is not None:
        out = out.where(F.col("warc_type").isin(*record_types))
    return out


def write_wet(
    df: DataFrame,
    path: str,
    url: Column | str = "url",
    text: Column | str = "text",
    date: str = "2026-01-01T00:00:00Z",
    warc_version: str = "1.0",
    compression: str | None = "gzip",
) -> None:
    """Export (url, text) rows as spec-framed WET shards — one file per
    task, the Common Crawl layout.

    Each row renders as a full conversion record (version line, header
    block, ``Content-Length`` = payload OCTET length, payload); the
    text sink's row separator is set to CRLF so consecutive records are
    joined by exactly the framing bytes ``read_wet`` splits on, and the
    final record keeps its two trailing CRLFs.  ``WARC-Record-ID`` is a
    deterministic function of the URL (sha2), so export is
    bit-reproducible run-to-run.
    """
    url_c = F.col(url) if isinstance(url, str) else url
    text_c = F.col(text) if isinstance(text, str) else text
    record = F.concat(
        F.lit(f"WARC/{warc_version}\r\n"),
        F.lit("WARC-Type: conversion\r\n"),
        F.lit("WARC-Target-URI: "), url_c, F.lit("\r\n"),
        F.lit(f"WARC-Date: {date}\r\n"),
        F.lit("WARC-Record-ID: <urn:sha2:"), F.sha2(url_c, 256), F.lit(">\r\n"),
        F.lit("Content-Type: text/plain\r\n"),
        F.lit("Content-Length: "), F.octet_length(text_c).cast("string"),
        F.lit("\r\n\r\n"),
        text_c,
        F.lit("\r\n"),
    )
    writer = df.select(record.alias("value")).write.option("lineSep", "\r\n")
    if compression:
        writer = writer.option("compression", compression)
    writer.mode("overwrite").text(path)


def write_warc(
    df: DataFrame,
    path: str,
    warc_version: str = "1.0",
    compression: str | None = "gzip",
) -> None:
    """Export arbitrary WARC records — the general-record sibling of
    :func:`write_wet` (which is fixed to ``conversion``): one
    spec-framed record per row, any ``WARC-Type``, optional linkage
    headers — so request/response/metadata/revisit interleavings (what
    a real Common Crawl segment looks like) can be produced, tested,
    and replayed without network fixtures.

    Expected columns: ``warc_type``, ``url``, ``record_id`` (bare URN;
    written in angle brackets), ``payload`` (string; HTTP framing, if
    any, is the caller's payload content), and optional ``date``,
    ``refers_to``, ``profile``, ``payload_digest`` (empty/missing ->
    header omitted).  ``Content-Length`` is the payload's OCTET length,
    per the exact-walk contract."""
    cols = set(df.columns)

    def opt(header: str, col: str) -> Column:
        if col not in cols:
            return F.lit("")
        v = F.coalesce(F.col(col), F.lit(""))
        return F.when(
            v == "", F.lit("")
        ).otherwise(F.concat(F.lit(f"{header}: "), v, F.lit("\r\n")))

    date_c = (
        F.coalesce(F.col("date"), F.lit("2026-01-01T00:00:00Z"))
        if "date" in cols
        else F.lit("2026-01-01T00:00:00Z")
    )
    payload = F.coalesce(F.col("payload"), F.lit(""))
    record = F.concat(
        F.lit(f"WARC/{warc_version}\r\n"),
        F.lit("WARC-Type: "), F.col("warc_type"), F.lit("\r\n"),
        F.lit("WARC-Target-URI: "), F.col("url"), F.lit("\r\n"),
        F.lit("WARC-Date: "), date_c, F.lit("\r\n"),
        F.lit("WARC-Record-ID: <"), F.col("record_id"), F.lit(">\r\n"),
        opt("WARC-Refers-To", "refers_to"),
        opt("WARC-Profile", "profile"),
        opt("WARC-Payload-Digest", "payload_digest"),
        F.lit("Content-Length: "), F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"),
        payload,
        F.lit("\r\n"),
    )
    writer = df.select(record.alias("value")).write.option("lineSep", "\r\n")
    if compression:
        writer = writer.option("compression", compression)
    writer.mode("overwrite").text(path)


def resolve_revisits(warc: DataFrame) -> DataFrame:
    """Resolve ``revisit`` records against the ``response`` records they
    refer to — the crawler's own dedup assertions turned into a usable
    fetch table.

    A revisit record (WARC/1.1 §6.7, identical-payload-digest profile)
    says "this URL was fetched again and the payload was byte-identical
    to an earlier capture" — it carries NO payload of its own, only
    ``WARC-Refers-To`` (the original's record id).  Output: one row per
    revisit with the original's content joined in —
    ``(record_id, url, date, refers_to, orig_url, orig_date,
    http_status, payload, digest_ok)`` where ``digest_ok`` is true when
    the revisit's declared ``WARC-Payload-Digest`` matches the
    original's (NULL digest on either side -> false, never silently
    trusted).

    Plan shape: one equi-join on the referred record id (unique per
    response, evenly distributed — no skew by construction); both sides
    are pre-filtered by ``warc_type``, so the join input is revisit
    volume x response volume, never the full record stream.  At crawl
    scale this is THE payload-free dedup join: revisits are typically
    the majority of fetches and never ship a body."""
    revs = warc.where(F.col("warc_type") == "revisit").select(
        "record_id",
        "url",
        "date",
        # Stored with angle brackets (raw header value); the join key
        # is the bare URN, matching the response side's record_id.
        F.regexp_replace("refers_to", r"^<|>$", "").alias("__ref"),
        F.col("refers_to").alias("refers_to"),
        F.col("payload_digest").alias("__rev_digest"),
    )
    orig = warc.where(F.col("warc_type") == "response").select(
        F.regexp_replace("record_id", r"^<|>$", "").alias("__ref"),
        F.col("url").alias("orig_url"),
        F.col("date").alias("orig_date"),
        "http_status",
        "payload",
        F.col("payload_digest").alias("__orig_digest"),
    )
    return revs.join(orig, "__ref").select(
        "record_id",
        "url",
        "date",
        "refers_to",
        "orig_url",
        "orig_date",
        "http_status",
        "payload",
        # coalesce(False): a NULL digest on EITHER side must read as
        # false (per the docstring contract), never as three-valued
        # NULL that both where(digest_ok) and where(~digest_ok) drop.
        F.coalesce(
            F.col("__rev_digest").isNotNull()
            & (F.col("__rev_digest") != "")
            & F.col("__rev_digest").eqNullSafe(F.col("__orig_digest")),
            F.lit(False),
        ).alias("digest_ok"),
    )
