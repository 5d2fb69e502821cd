"""HTTP sources (SURVEY.md §2.1): templated GET, cursor pagination,
parallel fetch (/root/reference/metalpipe/node_classes/network_nodes.py).

Two execution shapes, matching the reference's two roles:

* **Sequential pagination** (follow-the-cursor) is inherently
  driver-side: each page's response decides the next request
  (network_nodes.py:22-169).  The paginator is a plain generator whose
  accumulated pages become one ``createDataFrame`` — at scale this is a
  metadata-sized control stream, not the data path.
* **Parallel fetch** — N independent requests (one per row of a params
  DataFrame) — distributes as an Arrow-batched ``mapInPandas``: each
  executor fetches its partition's URLs (network_nodes.py:172-241's
  templated GET, made concurrent).

The HTTP transport is injectable (``fetch=``) so tests run hermetically
and production swaps in requests/urllib with retry/backoff (the
reference's retry loop, network_nodes.py:64-115).
"""

from __future__ import annotations

import json
import time
import urllib.request
from collections.abc import Callable, Iterator, Mapping
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SafeMap(dict):
    """network_nodes.py:14-19 — format_map that leaves unknown template
    keys intact (so config and message params can fill a URL in stages)."""

    def __missing__(self, key):  # pragma: no cover - trivial
        return "{" + key + "}"


def default_fetch(url: str, retries: int = 5, backoff: float = 1.0) -> str:
    """GET with exponential backoff (network_nodes.py:64-115)."""
    err: Exception | None = None
    for attempt in range(retries):
        try:
            with urllib.request.urlopen(url) as resp:  # noqa: S310 - by design
                return resp.read().decode("utf-8")
        except Exception as e:  # pragma: no cover - needs a network
            err = e
            if attempt + 1 < retries:  # no pointless sleep after the last try
                time.sleep(backoff * (2**attempt))
    raise RuntimeError(f"GET {url} failed after {retries} tries") from err


def http_get_request(
    spark: SparkSession,
    endpoint_template: str,
    endpoint_dict: Mapping[str, Any] | None = None,
    fetch: Callable[[str], str] = default_fetch,
    as_json: bool = True,
) -> DataFrame:
    """HttpGetRequest (network_nodes.py:172-241) — one templated GET; the
    JSON result becomes a (single-row or exploded-list) DataFrame."""
    url = endpoint_template.format_map(SafeMap(endpoint_dict or {}))
    body = fetch(url)
    if not as_json:
        return spark.createDataFrame([(url, body)], ["url", "body"])
    data = json.loads(body)
    rows = data if isinstance(data, list) else [data]
    return spark.createDataFrame(rows)


def paginated_get(
    spark: SparkSession,
    endpoint_template: str,
    additional_data_key: str,
    pagination_key: str,
    pagination_get_request_key: str,
    endpoint_dict: Mapping[str, Any] | None = None,
    default_offset_value: str = "",
    max_pages: int | None = None,
    fetch: Callable[[str], str] = default_fetch,
) -> DataFrame:
    """PaginatedHttpGetRequest (network_nodes.py:22-169) — follow the
    cursor: probe ``additional_data_key`` to decide whether more pages
    exist, feed ``pagination_key``'s value back as URL param
    ``pagination_get_request_key``.  Pages accumulate driver-side, then
    parallelize into one DataFrame."""
    params = dict(endpoint_dict or {})
    params[pagination_get_request_key] = default_offset_value
    pages: list[dict] = []
    n = 0
    while True:
        url = endpoint_template.format_map(SafeMap(params))
        page = json.loads(fetch(url))
        pages.append(page)
        n += 1
        if max_pages is not None and n >= max_pages:
            break
        if not _get_keypath(page, additional_data_key):
            break
        cursor = _get_keypath(page, pagination_key)
        if cursor is None:
            break
        params[pagination_get_request_key] = cursor
    return spark.createDataFrame(pages)


def parallel_fetch(
    params_df: DataFrame,
    endpoint_template: str,
    url_cols: list[str],
    fetch: Callable[[str], str] = default_fetch,
) -> DataFrame:
    """Distributed fetch: one GET per row of ``params_df``, executed on
    the executors over Arrow batches.  The scale path for bulk API
    enrichment — N requests spread across the cluster, no driver
    bottleneck."""
    import pandas as pd

    template = endpoint_template
    cols = list(url_cols)
    clashes = {"url", "body"} & set(params_df.columns)
    if clashes:
        # pandas assignment would OVERWRITE the existing column while the
        # declared schema appends a duplicate field — an Arrow
        # column-count mismatch at runtime; fail at plan time instead.
        raise ValueError(
            f"parallel_fetch appends 'url' and 'body' columns; rename the "
            f"input column(s) {sorted(clashes)} first"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = [
                template.format_map(SafeMap({c: row[c] for c in cols}))
                for _, row in pdf.iterrows()
            ]
            out = pdf.copy()
            out["url"] = urls
            out["body"] = [fetch(u) for u in urls]
            yield out

    from pyspark.sql import types as T

    # NB: StructType.add mutates in place — mutating params_df.schema
    # would corrupt the input plan's resolved schema; build a fresh one.
    schema = T.StructType(
        list(params_df.schema.fields)
        + [T.StructField("url", T.StringType()), T.StructField("body", T.StringType())]
    )
    return params_df.mapInPandas(run, schema=schema)


def _get_keypath(obj: Any, path: str) -> Any:
    cur = obj
    for k in path.split("."):
        if isinstance(cur, Mapping) and k in cur:
            cur = cur[k]
        else:
            return None
    return cur
