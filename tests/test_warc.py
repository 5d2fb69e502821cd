"""WARC / WET ingestion tests (sources/warc.py) and the HTML extractor
(operators/web.py:html_extract_text).

Fixtures are hand-framed per ISO 28500 (version line, CRLF header
block, blank line, Content-Length payload bytes, two CRLFs) so the
readers are tested against the SPEC, not against write_wet; a separate
round-trip test then closes the write_wet <-> read_wet loop."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from metalpipe_spark.operators.web import html_extract_text
from metalpipe_spark.sources.warc import (
    _iter_records,
    read_warc,
    read_wet,
    write_wet,
)


def _record(warc_type: str, uri: str, payload: bytes, version="1.0") -> bytes:
    head = (
        f"WARC/{version}\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "WARC-Date: 2026-01-01T00:00:00Z\r\n"
        f"WARC-Record-ID: <urn:test:{uri}>\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


MULTIBYTE = "héllo wörld — ünïcode ✓"
# A payload that CONTAINS the inter-record framing bytes: legal per the
# spec (Content-Length governs), poison for the delimiter fast path.
ADVERSARIAL = b"evil\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\npayload continues"


def _wet_fixture(tmp_path, name="f0.wet.gz", per_record_gzip=False) -> str:
    recs = [
        _record("warcinfo", "", b"software: test-harness"),
        _record("conversion", "http://ex.com/1", MULTIBYTE.encode()),
        _record("conversion", "http://ex.com/2", b"plain ascii text"),
    ]
    path = str(tmp_path / name)
    if per_record_gzip:
        # Common Crawl's actual layout: one gzip MEMBER per record.
        blob = b"".join(gzip.compress(r) for r in recs)
        with open(path, "wb") as f:
            f.write(blob)
    else:
        with gzip.open(path, "wb") as f:
            f.write(b"".join(recs))
    return path


@pytest.mark.parametrize("mode", ["delimiter", "exact"])
def test_read_wet_modes_agree_on_wellformed(spark, tmp_path, mode):
    path = _wet_fixture(tmp_path)
    rows = {r.url: r for r in read_wet(spark, path, mode=mode).collect()}
    assert set(rows) == {"http://ex.com/1", "http://ex.com/2"}  # warcinfo dropped
    r1 = rows["http://ex.com/1"]
    assert r1.text == MULTIBYTE
    assert r1.content_length == len(MULTIBYTE.encode())  # octets, not chars
    assert r1.length_ok is True
    assert r1.warc_type == "conversion"
    assert r1.content_type == "text/plain"
    assert r1.date == "2026-01-01T00:00:00Z"
    assert r1.record_id == "<urn:test:http://ex.com/1>"


def test_read_wet_keeps_warcinfo_when_unfiltered(spark, tmp_path):
    path = _wet_fixture(tmp_path)
    types = {
        r.warc_type
        for r in read_wet(spark, path, record_types=None).collect()
        if r.warc_type
    }
    assert "warcinfo" in types


def test_exact_mode_handles_per_record_gzip_members(spark, tmp_path):
    path = _wet_fixture(tmp_path, per_record_gzip=True)
    out = read_wet(spark, path, mode="exact").orderBy("url").collect()
    assert [r.text for r in out] == [MULTIBYTE, "plain ascii text"]


def test_adversarial_payload_exact_parses_delimiter_flags(spark, tmp_path):
    data = _record("conversion", "http://ex.com/a", ADVERSARIAL) + _record(
        "conversion", "http://ex.com/b", b"after"
    )
    path = str(tmp_path / "adv.wet.gz")
    with gzip.open(path, "wb") as f:
        f.write(data)
    exact = {r.url: r for r in read_wet(spark, path, mode="exact").collect()}
    assert exact["http://ex.com/a"].text == ADVERSARIAL.decode()
    assert exact["http://ex.com/a"].length_ok is True
    # Delimiter mode splits inside the poisoned payload: the record
    # surfaces with length_ok=false (the repair signal), and the
    # well-formed neighbor is unaffected.
    delim = {r.url: r for r in read_wet(spark, path).collect()}
    assert delim["http://ex.com/a"].length_ok is False
    assert delim["http://ex.com/b"].text == "after"
    assert delim["http://ex.com/b"].length_ok is True


def test_wet_roundtrip_write_then_both_modes(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"https://x.example/{i}", f"body {i} — ünïcode") for i in range(25)],
        "doc_id long, url string, text string",
    )
    out_dir = str(tmp_path / "wet_out")
    write_wet(docs, out_dir)
    a = read_wet(spark, out_dir).orderBy("url").collect()
    b = read_wet(spark, out_dir, mode="exact").orderBy("url").collect()
    assert len(a) == len(b) == 25
    assert all(r.length_ok for r in a)
    for ra, rb in zip(a, b):
        assert (ra.url, ra.text, ra.content_length) == (
            rb.url,
            rb.text,
            rb.content_length,
        )
    # export is deterministic: record ids derive from the URL (sha2)
    assert a[0].record_id.startswith("<urn:sha2:")


def test_write_wet_uncompressed(spark, tmp_path):
    docs = spark.createDataFrame(
        [(f"https://x/{i}", "t") for i in range(3)], "url string, text string"
    )
    out_dir = str(tmp_path / "plain")
    write_wet(docs, out_dir, compression=None)
    assert read_wet(spark, out_dir, mode="exact").count() == 3


def test_read_warc_response_with_binary_body(spark, tmp_path):
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        b"<html><body><p>Hi &amp; bye</p>\x00\xff\r\n\r\nWARC/1.0\r\n</body></html>"
    )
    data = _record("warcinfo", "", b"x: y") + _record(
        "response", "http://b.example/1", http
    )
    path = str(tmp_path / "f.warc.gz")
    with gzip.open(path, "wb") as f:
        f.write(data)
    rows = read_warc(spark, path).collect()
    assert len(rows) == 1  # warcinfo filtered by default
    r = rows[0]
    assert r.http_status == 200
    assert r.http_content_type == "text/html; charset=utf-8"
    assert bytes(r.payload).startswith(b"<html>")
    assert b"\x00\xff" in bytes(r.payload)
    # the chained extraction a WARC pipeline runs (binary -> utf8 -> text)
    df = spark.createDataFrame([(bytes(r.payload),)], "payload binary")
    text = df.select(
        html_extract_text(F.col("payload").cast("string")).alias("t")
    ).first()[0]
    assert text.startswith("Hi & bye")


def test_read_wet_bad_mode_raises(spark):
    with pytest.raises(ValueError, match="mode"):
        read_wet(spark, "/nonexistent", mode="stream")


def test_iter_records_rejects_missing_content_length():
    blob = b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\npayload\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        list(_iter_records(blob))


def test_iter_records_rejects_overrun():
    blob = b"WARC/1.0\r\nContent-Length: 999\r\n\r\nshort"
    with pytest.raises(ValueError, match="overruns"):
        list(_iter_records(blob))


def test_iter_records_tolerates_missing_final_terminator():
    blob = b"WARC/1.0\r\nContent-Length: 4\r\n\r\nbody"
    assert list(_iter_records(blob)) == [("WARC/1.0\r\nContent-Length: 4", b"body")]


# -- html_extract_text -------------------------------------------------------


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(html_extract_text("html").alias("t")).first().t


def test_html_extract_drops_script_style_comments(spark):
    html = (
        "<html><head><style>p{color:red}</style></head><body>"
        "<!-- secret --><script type='text/javascript'>var a = '<p>no</p>';"
        "</script><p>keep me</p></body></html>"
    )
    assert _extract(spark, html) == "keep me"


def test_html_extract_block_boundaries_become_newlines(spark):
    html = "<h1>Title</h1><p>one two</p><div>three</div><ul><li>four</li></ul>"
    assert _extract(spark, html) == "Title\none two\nthree\nfour"


def test_html_extract_entities_and_whitespace(spark):
    html = "<p>a&nbsp;&lt;b&gt; &quot;c&quot; &#39;d&#39; e &amp;amp; f</p>"
    # &amp; decodes LAST: "&amp;amp;" -> "&amp;" literal, not "&"
    assert _extract(spark, html) == 'a <b> "c" \'d\' e &amp; f'


def test_html_extract_malformed_degrades_not_errors(spark):
    assert _extract(spark, "<p unclosed <b>bold</p> trailing >") == "bold\ntrailing >"
    assert _extract(spark, "no tags at all") == "no tags at all"
    assert _extract(spark, "") == ""


# -- pipeline-surface nodes ---------------------------------------------------


def test_wet_pipeline_nodes_roundtrip(spark, tmp_path):
    """WETWriter exports, WETReader ingests, HtmlExtract chains — the
    Common Crawl loop from the YAML config surface."""
    from metalpipe_spark.plans.pipeline import compile_pipeline

    src = spark.createDataFrame(
        [(i, f"https://x/{i}", f"<p>doc {i} &amp; more</p>") for i in range(6)],
        "doc_id long, url string, text string",
    )
    src.write.mode("overwrite").parquet(str(tmp_path / "docs"))
    out_wet = str(tmp_path / "wet")
    config = {
        "nodes": {
            "read": {"class": "ParquetReader", "options": {"path": str(tmp_path / "docs")}},
            "export": {"class": "WETWriter", "options": {"path": out_wet}},
        },
        "paths": [["read", "export"]],
    }
    compile_pipeline(spark, config)
    config2 = {
        "nodes": {
            "wet": {"class": "WETReader", "options": {"path": out_wet, "mode": "exact"}},
            "extract": {
                "class": "HtmlExtract",
                "options": {"column": "text", "output_key": "clean"},
            },
        },
        "paths": [["wet", "extract"]],
    }
    p = compile_pipeline(spark, config2)
    rows = p.dataframes["extract"].orderBy("url").collect()
    assert len(rows) == 6
    assert rows[0].clean == "doc 0 & more"


def test_stream_wet_ingests_new_segments(spark, tmp_path):
    """stream_wet: the delimiter parse as a streaming source — two
    'crawl segments' land in a watched directory, every record flows
    through with the same schema/flags as the batch reader."""
    from metalpipe_spark.sources.warc import stream_wet
    from metalpipe_spark.streaming.streams import run_to_memory

    watch = tmp_path / "crawl"
    watch.mkdir()
    for seg in range(2):
        recs = b"".join(
            _record("conversion", f"http://s{seg}.ex/{i}", f"seg {seg} doc {i}".encode())
            for i in range(4)
        )
        with gzip.open(str(watch / f"seg{seg}.wet.gz"), "wb") as f:
            f.write(_record("warcinfo", "", b"crawler: test") + recs)
    stream = stream_wet(spark, str(watch))
    assert stream.isStreaming
    out = run_to_memory(stream, "wet_stream_test", spark)
    rows = out.orderBy("url").collect()
    assert len(rows) == 8  # warcinfo records filtered
    assert rows[0].url == "http://s0.ex/0"
    assert rows[0].text == "seg 0 doc 0"
    assert all(r.length_ok for r in rows)


def test_exact_mode_on_error_skip_salvages_good_members(spark, tmp_path):
    """A truncated gzip member (mid-transfer segment damage) kills the
    job under the default, but on_error='skip' keeps every record from
    the members before the damage — per-record members are exactly why
    Common Crawl writes them."""
    good = [
        gzip.compress(_record("conversion", f"http://ok/{i}", f"doc {i}".encode()))
        for i in range(3)
    ]
    # Cut into the deflate stream itself (not just the 8-byte trailer —
    # trailer-only damage still salvages the member's full payload).
    whole = gzip.compress(_record("conversion", "http://bad/x", b"lost"))
    broken = whole[: len(whole) // 2]
    path = str(tmp_path / "damaged.wet.gz")
    with open(path, "wb") as f:
        f.write(b"".join(good) + broken)
    with pytest.raises(Exception):
        read_wet(spark, path, mode="exact").count()
    out = read_wet(spark, path, mode="exact", on_error="skip").orderBy("url").collect()
    assert [r.url for r in out] == [f"http://ok/{i}" for i in range(3)]


def test_exact_mode_on_error_skip_framing_damage(spark, tmp_path):
    """Framing damage (Content-Length overrun) mid-file: skip mode
    keeps the records walked before it; other files are unaffected."""
    data = (
        _record("conversion", "http://a/1", b"fine")
        + b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://a/2\r\n"
        + b"Content-Length: 99999\r\n\r\nshort"
    )
    path = tmp_path / "frames"
    path.mkdir()
    with gzip.open(str(path / "bad.wet.gz"), "wb") as f:
        f.write(data)
    with gzip.open(str(path / "good.wet.gz"), "wb") as f:
        f.write(_record("conversion", "http://b/1", b"ok"))
    with pytest.raises(Exception):
        read_wet(spark, str(path), mode="exact").count()
    out = read_wet(spark, str(path), mode="exact", on_error="skip").orderBy("url")
    assert [r.url for r in out.collect()] == ["http://a/1", "http://b/1"]


def test_read_wet_on_error_validated(spark):
    with pytest.raises(ValueError, match="on_error"):
        read_wet(spark, "/nonexistent", mode="exact", on_error="ignore")


def test_exact_mode_content_length_mid_header_block(spark, tmp_path):
    """Real crawl records put Content-Length BEFORE other headers; the
    byte-level regex must match a CRLF-terminated (non-final) header
    line — Python's MULTILINE $ does not match before \\r\\n on its
    own (the _hval pitfall, byte flavor)."""
    payload = b"mid-block content length"
    rec = (
        b"WARC/1.0\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://mid/1\r\n"
        b"Content-Type: text/plain\r\n\r\n" + payload + b"\r\n\r\n"
    )
    path = str(tmp_path / "mid.wet.gz")
    with gzip.open(path, "wb") as f:
        f.write(rec)
    out = read_wet(spark, path, mode="exact").collect()
    assert len(out) == 1 and out[0].text == payload.decode()
    # delimiter mode parses the same layout identically
    out2 = read_wet(spark, path).collect()
    assert len(out2) == 1 and out2[0].text == payload.decode()
    assert out2[0].length_ok is True


def test_delimiter_keeps_payloads_legitimately_ending_in_crlfcrlf(spark, tmp_path):
    """A NON-final payload that genuinely ends with CRLF CRLF (legal —
    Content-Length governs) must not lose its last 4 bytes to the
    final-record framing strip; the FINAL record's real framing still
    strips."""
    tricky = b"para one\r\n\r\n"
    data = _record("conversion", "http://t/1", tricky) + _record(
        "conversion", "http://t/2", b"last"
    )
    path = str(tmp_path / "t.wet.gz")
    with gzip.open(path, "wb") as f:
        f.write(data)
    rows = {r.url: r for r in read_wet(spark, path).collect()}
    assert rows["http://t/1"].text == tricky.decode()
    assert rows["http://t/1"].length_ok is True
    assert rows["http://t/2"].text == "last"
    assert rows["http://t/2"].length_ok is True


def test_wet_exact_roundtrip_property(spark, tmp_path):
    """Property: for ANY byte payloads (including framing bytes, CRLF
    runs, NULs, non-UTF8), hand-framed records parse back EXACTLY under
    the Content-Length walk — and for payloads free of the framing
    bytes and trailing-CRLF ambiguity, the delimiter fast path agrees."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
        derandomize=True,
    )
    @given(
        payloads=st.lists(
            st.binary(min_size=0, max_size=200), min_size=1, max_size=8
        )
    )
    def run(payloads):
        import shutil
        import tempfile

        d = tempfile.mkdtemp(dir=str(tmp_path))
        try:
            data = b"".join(
                _record("conversion", f"http://p/{i}", p)
                for i, p in enumerate(payloads)
            )
            with gzip.open(f"{d}/p.wet.gz", "wb") as f:
                f.write(data)
            got = {
                r.url: r
                for r in read_wet(spark, f"{d}/p.wet.gz", mode="exact").collect()
            }
            assert len(got) == len(payloads)
            delim_ok = True
            for i, p in enumerate(payloads):
                r = got[f"http://p/{i}"]
                want = p.decode("utf-8", "replace")
                assert r.text == want
                assert r.content_length == len(p)
                if b"\r\n\r\nWARC/1.0\r\n" in p or p.endswith(b"\r\n\r\n"):
                    delim_ok = False
                # non-UTF8 payloads decode lossily: octet length shifts
                if want.encode() != p:
                    delim_ok = False
            if delim_ok:
                got_d = {
                    r.url: r.text
                    for r in read_wet(spark, f"{d}/p.wet.gz").collect()
                }
                assert got_d == {
                    f"http://p/{i}": p.decode() for i, p in enumerate(payloads)
                }
        finally:
            shutil.rmtree(d, ignore_errors=True)

    run()


def test_stream_wet_feeds_corpus_pipeline(spark, tmp_path):
    """Composition e2e: WET crawl segments -> stream_wet -> the full
    streaming curation pipeline (scrub -> quality -> decontaminate ->
    dedup) -> kept parquet.  The crawl format plugs into the existing
    streaming stages with one derived id column."""
    from pyspark.sql import functions as F

    from metalpipe_spark.sources.warc import stream_wet, write_wet
    from metalpipe_spark.streaming.streams import stream_corpus_pipeline

    # real fixture text (synthetic filler fails the Gopher-style
    # repetition/quality gate, correctly)
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(40)
        .select(
            "doc_id",
            F.concat(F.lit("https://w/"), F.col("doc_id").cast("string")).alias("url"),
            "text",
        )
    )
    crawl = str(tmp_path / "crawl")
    write_wet(docs, crawl)
    stream = stream_wet(spark, crawl).withColumn(
        "doc_id", F.xxhash64("url")
    )
    bench = spark.createDataFrame([(0, "held out benchmark sentence")], "doc_id long, text string")
    kept = str(tmp_path / "kept")
    stream_corpus_pipeline(
        stream,
        bench,
        kept,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        min_hits=5,
    ).awaitTermination()
    out = spark.read.parquet(kept)
    assert out.count() > 0
    assert {"doc_id", "text"} <= set(out.columns)


def test_warc_interleaved_record_types_and_revisit_resolution(spark, tmp_path):
    """A segment interleaving request/response/metadata/revisit records
    (the real Common Crawl layout) parses under the exact walk with the
    linkage headers surfaced, and resolve_revisits recovers the
    original payload for each payload-free revisit — flagging declared
    digests that do not match."""
    from pyspark.sql import functions as F

    from metalpipe_spark.sources.warc import (
        read_warc,
        resolve_revisits,
        write_warc,
    )

    body = "shared page body"
    rows = [
        # (warc_type, url, record_id, payload, refers_to, profile, digest)
        ("request", "https://h.example/a", "urn:req:1",
         "GET /a HTTP/1.1\r\nHost: h.example\r\n\r\n", "", "", ""),
        ("response", "https://h.example/a", "urn:doc:1",
         "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body,
         "", "", "md5:d1"),
        ("metadata", "https://h.example/a", "urn:meta:1",
         "via: seed\r\n", "<urn:doc:1>", "", ""),
        ("revisit", "https://h.example/a?r=1", "urn:rev:1",
         "HTTP/1.1 200 OK\r\n", "<urn:doc:1>",
         "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
         "md5:d1"),
        ("revisit", "https://h.example/a?r=2", "urn:rev:2",
         "HTTP/1.1 200 OK\r\n", "<urn:doc:1>",
         "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
         "md5:WRONG"),
    ]
    df = spark.createDataFrame(
        rows,
        "warc_type string, url string, record_id string, payload string,"
        " refers_to string, profile string, payload_digest string",
    )
    out = str(tmp_path / "seg")
    write_warc(df, out, compression=None)
    warc = read_warc(spark, out, record_types=None)
    by_type = {r["warc_type"]: r for r in warc.collect()}
    assert set(by_type) == {"request", "response", "metadata", "revisit"}
    # request payloads are not HTTP responses: status None, bytes kept
    assert by_type["request"]["http_status"] is None
    assert bytes(by_type["request"]["payload"]).startswith(b"GET /a")
    assert by_type["metadata"]["refers_to"] == "<urn:doc:1>"
    assert by_type["revisit"]["profile"].endswith("identical-payload-digest")
    assert by_type["response"]["payload_digest"] == "md5:d1"
    # default read_warc filter still keeps only responses
    assert read_warc(spark, out).count() == 1

    res = {
        r["record_id"]: r
        for r in resolve_revisits(warc)
        .withColumn(
            "record_id", F.regexp_replace("record_id", r"^<|>$", "")
        )
        .collect()
    }
    assert set(res) == {"urn:rev:1", "urn:rev:2"}
    for rid, ok in (("urn:rev:1", True), ("urn:rev:2", False)):
        r = res[rid]
        assert bytes(r["payload"]).decode() == body  # original body joined in
        assert r["orig_url"] == "https://h.example/a"
        assert r["http_status"] == 200
        assert r["digest_ok"] is ok


def test_resolve_revisits_null_digest_reads_false(spark):
    """digest_ok must be FALSE (not three-valued NULL) when either
    side's digest is missing — a bad-digest audit keeps the row."""
    from metalpipe_spark.sources.warc import resolve_revisits

    warc = spark.createDataFrame(
        [
            ("response", "u", "2026", "<urn:doc:1>", None, "", None, 200,
             bytearray(b"body")),
            ("revisit", "u?r=1", "2026", "<urn:rev:1>", "<urn:doc:1>",
             "profile", "md5:abc", 200, bytearray(b"")),
        ],
        "warc_type string, url string, date string, record_id string,"
        " refers_to string, profile string, payload_digest string,"
        " http_status int, payload binary",
    )
    rows = resolve_revisits(warc).collect()
    assert len(rows) == 1 and rows[0]["digest_ok"] is False
