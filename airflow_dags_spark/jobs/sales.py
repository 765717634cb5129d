"""Daily sales-scrape job (SURVEY.md §3.2; reference entry point
``dags/pull_new_sales_list.py``).

Pipeline: stale-area selection (P9 + L1, dags/pull_new_sales_list.py:87-103)
→ injected paginated scrape (S5) → property-id extraction from listing HTML
(P11 regex capture, dags/pull_new_sales_list.py:123-137) → first-wins dedup
(A1, dags/pull_new_sales_list.py:183-193) → audit columns (P17,
dags/pull_new_sales_list.py:244-249) → merge upsert updating only
``updated_date`` (K4, dags/pull_new_sales_list.py:252-261) → watermark
advance for EVERY selected area, including those that yielded zero rows
(K6, dags/pull_new_sales_list.py:236-239,267-271).

The reference walks the DOM with BeautifulSoup then regexes the href; the
ids it keeps are exactly the ``/properties/<digits>`` matches, so the engine
extracts them JVM-side with ``regexp_extract_all`` over the raw HTML — no
Python, no DOM dependency, and the absolute/relative URL distinction (P14)
is irrelevant to the captured group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_dags_spark.functions.cleaning import null_or_stale
from airflow_dags_spark.functions.sampling import deterministic_sample
from airflow_dags_spark.operators.upsert import ParquetTable
from airflow_dags_spark.sources.http import FetchPageFn, paginated_scrape

BATCH_AREAS = 5  # dags/pull_new_sales_list.py:19
PROPERTY_ID_PATTERN = r"/properties/(\d+)"  # dags/pull_new_sales_list.py:132


def select_stale_areas(
    areas: DataFrame, yesterday_int: int, batch_areas: int = BATCH_AREAS
) -> DataFrame:
    """Work selection: resolved areas never/staleley scraped
    (dags/pull_new_sales_list.py:87-103): ``area_id IS NOT NULL AND
    area_id > 0 AND (last_updated_sale IS NULL OR <= yesterday)``."""
    eligible = areas.where(
        F.col("area_id").isNotNull()
        & (F.col("area_id") > 0)
        & null_or_stale("last_updated_sale", yesterday_int)
    ).select("area_id", "outcode")
    return deterministic_sample(eligible, "area_id", batch_areas)


def extract_property_ids(pages: DataFrame) -> DataFrame:
    """P11 + A1 over scraped pages → one row per distinct property id, with
    first-occurrence page/position (deterministic survivor)."""
    ids = pages.select(
        "area_id",
        "page_index",
        F.posexplode_outer(
            F.regexp_extract_all(F.col("html"), F.lit(PROPERTY_ID_PATTERN), 1)
        ).alias("pos", "property_id"),
    ).where(F.col("property_id").isNotNull() & (F.col("property_id") != ""))
    # first-wins across pages within this run (A1; seen-set at
    # dags/pull_new_sales_list.py:183-193)
    w = Window.partitionBy("property_id").orderBy("page_index", "pos")
    return (
        ids.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("area_id", "property_id")
    )


def pull_new_sales(
    spark: SparkSession,
    areas_path: str,
    sales_path: str,
    fetch_page: FetchPageFn,
    today_int: int,
    yesterday_int: int,
    *,
    batch_areas: int = BATCH_AREAS,
    page_size: int = 24,
    max_pages: int = 200,
    rate_limit_s: float = 0.5,
) -> DataFrame:
    """Full job; returns the upserted property batch (for logging/tests)."""
    areas = ParquetTable(spark, areas_path, "outcode", case_insensitive=True)
    sales = ParquetTable(spark, sales_path, "property_id")

    selected = select_stale_areas(areas.read(), yesterday_int, batch_areas)
    pages = paginated_scrape(
        selected,
        "area_id",
        fetch_page,
        page_size=page_size,
        max_pages=max_pages,
        rate_limit_s=rate_limit_s,
    )
    props = extract_property_ids(pages)

    # P17 audit columns (dags/pull_new_sales_list.py:244-249); K4 merge
    # updates only updated_date on conflict (dags/pull_new_sales_list.py:255-257)
    # materialized: the watermark advance below atomically rewrites the
    # areas table this plan reads (and a lazy plan would re-run the
    # rate-limited scrape on any later action over the returned frame)
    batch = props.select(
        "property_id",
        F.lit(False).alias("is_processed"),
        F.lit(today_int).cast("int").alias("created_date"),
        F.lit(today_int).cast("int").alias("updated_date"),
    ).localCheckpoint(eager=True)
    sales.merge_upsert(
        batch, order_by=["property_id"], update_cols=["updated_date"]
    )

    # K6: advance watermark for every SELECTED area — zero-yield areas too
    # (dags/pull_new_sales_list.py:236-239,267-271)
    areas.advance_watermark(
        selected.select("outcode"), "last_updated_sale", today_int
    )
    return batch
