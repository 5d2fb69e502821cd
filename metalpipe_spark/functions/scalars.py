"""Scalar function library — Column-level equivalents of the reference's
``utils/helpers.py`` conversion helpers (SURVEY.md §2.8).

Every function here takes and returns :class:`pyspark.sql.Column` so it
stays inside Catalyst / whole-stage codegen — no Python UDFs.  Reference
citations point at the behavior being reproduced, not code being copied.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's Redshift-friendly datetime format "%b %d,%Y  %H:%M:%S"
# (/root/reference/metalpipe/utils/helpers.py:48-51,205-206) — note the
# DOUBLE space before the time, present verbatim in the reference source
# (verified with cat -A); the reference's own string_to_redshift parser
# expects it, so a single-space rendition would not round-trip there.
REDSHIFT_FORMAT = "MMM dd,yyyy  HH:mm:ss"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def timestamp_to_redshift(ts: Column | str) -> Column:
    """helpers.py:221-222 — format a timestamp as ``Jan 05,2024  13:00:00``."""
    return F.date_format(_col(ts), REDSHIFT_FORMAT)


def now_redshift() -> Column:
    """helpers.py:205-206 — current time in the Redshift format."""
    return F.date_format(F.current_timestamp(), REDSHIFT_FORMAT)


def string_to_datetime(s: Column | str, fmt: str) -> Column:
    """helpers.py:54-66 — parse a string with an explicit format."""
    return F.to_timestamp(_col(s), _java_format(fmt))


def milliseconds_epoch_to_datetime(ms: Column | str) -> Column:
    """helpers.py:69-79 — epoch milliseconds → timestamp."""
    return F.timestamp_millis(_col(ms).cast("long"))


def seconds_epoch_to_datetime(sec: Column | str) -> Column:
    """helpers.py:82-87 — epoch seconds → timestamp."""
    return F.timestamp_seconds(_col(sec).cast("long"))


def datetime_to_milliseconds(ts: Column | str) -> Column:
    """helpers.py:225-226 — timestamp → epoch milliseconds.

    Casts through ``timestamp`` so TIMESTAMP_NTZ inputs (how newer Spark
    reads un-annotated parquet timestamps) work; the session timezone is
    pinned UTC, so the instant is unchanged.
    """
    return F.unix_millis(_col(ts).cast("timestamp"))


def now_milliseconds() -> Column:
    """helpers.py:194-195."""
    return F.unix_millis(F.current_timestamp())


def convert_date_format(s: Column | str, src: str, tgt: str) -> Column:
    """helpers.py:137-140 — reformat a date string from ``src`` to ``tgt``.

    Formats are given in strftime style (as the reference's configs use)
    and translated to Spark's java.time patterns.
    """
    return F.date_format(F.to_timestamp(_col(s), _java_format(src)), _java_format(tgt))


def to_bool(c: Column | str) -> Column:
    """helpers.py:90-100 — truthy coercion.

    Strings: true iff non-empty and first char (lowercased) is 't' or 'y'.
    Numerics: true iff > 0.  Booleans pass through.  Implemented as a pure
    SQL expression over the string form so it runs JVM-side.
    """
    col = _col(c)
    s = col.cast("string")
    numeric = s.try_cast("double")  # ANSI-safe: malformed -> null
    return (
        F.when(s.isin("true", "false"), s.try_cast("boolean"))
        .when(numeric.isNotNull(), numeric > 0)
        .otherwise(F.lower(F.substring(s, 1, 1)).isin("t", "y"))
    )


_STRFTIME_TO_JAVA = [
    ("%Y", "yyyy"),
    ("%y", "yy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%b", "MMM"),
    ("%B", "MMMM"),
    ("%f", "SSSSSS"),
    ("%%", "%"),
]


def two_weeks_ago() -> Column:
    """helpers.py:198-203 — date two weeks back (midnight-floored)."""
    return F.date_trunc("day", F.current_timestamp() - F.expr("INTERVAL 14 DAYS"))


def january_1_2016() -> Column:
    """helpers.py:213-218 — fixed epoch constant used in configs."""
    return F.lit("2016-01-01 00:00:00").cast("timestamp")


def list_to_dict(values: list[Column], names: list[str]) -> Column:
    """helpers.py:32-36 — zip a value list with names into a struct."""
    return F.struct(*[v.alias(n) for v, n in zip(values, names)])


def package(c: Column | str) -> Column:
    """helpers.py:24-29 — the reference base64-pickles payloads for
    transport.  Spark rows need no transport encoding; the surviving
    capability is base64 wrap/unwrap of binary columns."""
    return F.base64(_col(c).cast("binary"))


def unpackage(c: Column | str) -> Column:
    return F.unbase64(_col(c))


def identity(c: Column | str) -> Column:
    """treehorn_yaccer.py:494-503 — the default selection wrapper."""
    return _col(c)


# --- plain-Python callables loadable by dotted path -----------------------
# (the reference's config-referenced UDF convention, helpers.py:39-45;
# wrapped as Arrow-batched pandas UDFs by metalpipe_spark.udf_registry)


def lower_str(s: str | None) -> str | None:
    if s is None:
        return None
    return s.lower()


def is_building_segment(segment: str | None) -> bool:
    return segment == "BUILDING"


def _java_format(fmt: str) -> str:
    """Translate a strftime-style format (the reference's convention) to a
    java.time pattern.  Formats already in java style pass through
    unchanged (they contain no '%').

    Tokenized, not sequential-replace: replacing specifiers in order
    corrupts escapes ('%%Y' must mean a literal '%Y', but '%Y'→'yyyy'
    would fire inside it first), and an unmapped specifier must fail
    loudly — leaking a raw '%X' into a java.time pattern produces
    silently wrong output or a runtime parse error far from the cause.
    """
    if "%" not in fmt:
        return fmt
    mapping = dict(_STRFTIME_TO_JAVA)
    out: list[str] = []
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch != "%":
            out.append(ch)
            i += 1
            continue
        tok = fmt[i : i + 2]
        if tok == "%%":
            out.append("%")
        elif tok in mapping:
            out.append(mapping[tok])
        else:
            raise ValueError(
                f"unsupported strftime specifier {tok!r} in format {fmt!r}"
            )
        i += 2
    return "".join(out)
