"""Rate-limited HTTP sources (S4/S5, SURVEY.md §2.1) as Arrow-batched
``mapInPandas`` over a small work-item DataFrame.

The reference fetches per-row inside Python task loops:

- typeahead JSON API, 1 req/s (dags/rightmove_outcodes.py:71-79,122)
- paginated HTML search scrape, 0.5 s/page, ≤200 pages, offset += 24
  (dags/pull_new_sales_list.py:105-208)

Engine realization: the (tiny) work-item dimension is repartitioned so each
partition owns its keys' HTTP sessions; the fetch callable is INJECTED so
tests run offline against fixture payloads (SURVEY.md §7 Phase 4) and
production injects a requests-backed callable with timeout/User-Agent
rotation. Rate limiting is a per-partition sleep — capping the partition
count caps global concurrency (SURVEY.md §4.2), which at 1000 executors is
the polite-scrape throttle: ``num_partitions`` IS the max concurrent request
streams, independent of cluster size.

Only the fetch boundary is imperative Python; everything downstream
(JSON parse, explode, regex extraction, dedup, merge) is JVM-side DataFrame
ops — see jobs/outcodes.py and jobs/sales.py.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from airflow_dags_spark.functions.json_extract import extract_balanced_json

# fetch(query) -> response body text, or None on error (errors are
# per-key-isolated like the reference's try/except per area/outcode:
# dags/pull_new_sales_list.py:275-281).
FetchFn = Callable[[str], str | None]
# fetch_page(area_id, offset) -> HTML text or None.
FetchPageFn = Callable[[int, int], str | None]

LOOKUP_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("response", T.StringType(), True),
    ]
)

PAGE_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("area_id", T.LongType(), False),
        T.StructField("page_index", T.IntegerType(), False),
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("html", T.StringType(), True),
    ]
)


def keyed_lookup(
    keys_df: DataFrame,
    key_col: str,
    fetch: FetchFn,
    *,
    rate_limit_s: float = 1.0,
    num_partitions: int = 1,
) -> DataFrame:
    """S4 — one GET per key (typeahead API, dags/rightmove_outcodes.py:71-79).

    Returns ``(key, response)`` with ``response`` null on fetch error so the
    caller can emit the no-match sentinel (P18) instead of retrying forever.

    ``mapInPandas`` keeps the boundary on the Arrow path (no Python-RDD
    detour); the sequential fetch loop inside each Arrow batch is the point
    — it IS the rate limiter.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        first = True
        for pdf in batches:
            keys, bodies = [], []
            for key in pdf[key_col]:
                if not first and rate_limit_s:
                    time.sleep(rate_limit_s)  # dags/rightmove_outcodes.py:122
                first = False
                try:
                    body = fetch(key)
                except Exception:
                    body = None
                keys.append(key)
                bodies.append(body)
            yield pd.DataFrame({"key": keys, "response": bodies})

    work = keys_df.select(key_col).repartition(num_partitions)
    return work.mapInPandas(run, LOOKUP_RESULT_SCHEMA)


def paginated_scrape(
    areas_df: DataFrame,
    area_id_col: str,
    fetch_page: FetchPageFn,
    *,
    page_size: int = 24,
    max_pages: int = 200,
    rate_limit_s: float = 0.5,
    num_partitions: int = 1,
) -> DataFrame:
    """S5 — per-area pagination driver (dags/pull_new_sales_list.py:161-208).

    Each partition walks its areas' pages sequentially: fetch page, read the
    embedded ``window.jsonModel`` pagination cursor to decide whether a next
    page exists, advance ``offset += page_size``, stop at ``max_pages`` (the
    reference's 200-page safety cap, dags/pull_new_sales_list.py:203-206).
    Yields one row per fetched page; property-id extraction happens after, in
    DataFrame ops (jobs/sales.py), so only the inherently-sequential fetch
    loop is Python. ``mapInPandas`` (Arrow path) emits one frame per area —
    memory is bounded by one area's page set, never the partition's.
    """

    def pages_of(area_id: int) -> Iterator[tuple[int, int, int, str | None]]:
        offset = 0
        for page_index in range(max_pages):
            if page_index and rate_limit_s:
                time.sleep(rate_limit_s)  # dags/pull_new_sales_list.py:201
            try:
                html = fetch_page(area_id, offset)
            except Exception:
                html = None
            yield (area_id, page_index, offset, html)
            if html is None:
                break
            # pagination cursor from embedded JSON (P12+P13;
            # dags/pull_new_sales_list.py:139-157,196)
            model = extract_balanced_json(html)
            next_offset = None
            if model is not None:
                try:
                    next_offset = (
                        json.loads(model).get("pagination", {}).get("next")
                    )
                except (ValueError, AttributeError):
                    next_offset = None
            if next_offset is None or int(next_offset) <= offset:
                break
            offset += page_size  # dags/pull_new_sales_list.py:199-200

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for area_id in pdf[area_id_col]:
                rows = list(pages_of(int(area_id)))
                yield pd.DataFrame(
                    rows, columns=["area_id", "page_index", "offset", "html"]
                )

    work = areas_df.select(area_id_col).repartition(num_partitions)
    return work.mapInPandas(run, PAGE_RESULT_SCHEMA)
