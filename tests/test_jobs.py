"""Offline end-to-end tests for the four DAG-equivalent jobs (SURVEY.md §7
Phase 4). HTTP is injected with fixture payloads (FIXTURES.md §C); CSV input
is synthesized per FIXTURES.md §B1 — braces in ids, bad dates, garbage
prices, null/non-OX postcodes, duplicate ids across files."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from airflow_dags_spark.jobs import (
    enrich_outcodes,
    initial_load,
    json_to_csv,
    monthly_update,
    pull_new_sales,
)
from airflow_dags_spark.operators.upsert import ParquetTable

# --- price_paid fixtures (FIXTURES.md B1) ------------------------------------

GOOD = '"{TX1}","250000","2024-07-01 00:00","OX1 2AB",D,N,F,1,,"High St",,Oxford,Oxford,Oxfordshire,A,A'
GOOD2 = '"{TX2}","99000","2024-07-02 00:00","OX14 3YS",S,Y,L,2,,"Low St",,Abingdon,Vale,Oxfordshire,A,A'
BAD_DATE = '"{TX3}","100000","not-a-date","OX1 1AA",D,N,F,3,,,,Oxford,Oxford,Oxfordshire,A,A'
BAD_PRICE = '"{TX4}","lots","2024-07-03 00:00","OX2 6NN",T,N,F,4,,,,Oxford,Oxford,Oxfordshire,A,A'
NULL_POSTCODE = '"{TX5}","50000","2024-07-04 00:00",,D,N,F,5,,,,Oxford,Oxford,Oxfordshire,A,A'
NON_OX = '"{TX6}","75000","2024-07-05 00:00","SW1A 1AA",F,N,L,6,,,,London,Westminster,Greater London,A,A'
DUP_TX1_CHANGED = '"{TX1}","999999","2024-08-01 00:00","OX1 2AB",D,N,F,1,,"High St",,Oxford,Oxford,Oxfordshire,A,A'
NEW_TX7 = '"{TX7}","310000","2024-08-02 00:00","OX3 7LF",D,N,F,7,,,,Oxford,Oxford,Oxfordshire,A,A'


def write_csv(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n", encoding="utf-8-sig")
    return str(p)


def test_initial_load_cleans_and_filters(spark, tmp_path):
    csv = write_csv(
        tmp_path, "bulk.csv", [GOOD, GOOD2, BAD_DATE, BAD_PRICE, NULL_POSTCODE, NON_OX]
    )
    table = initial_load(spark, csv, str(tmp_path / "price_paid"))
    rows = {r["transaction_unique_identifier"]: r for r in table.read().collect()}
    # P4 brace-strip; P5/P6/P7 drop bad date/price/null postcode; P8 drops non-OX
    assert set(rows) == {"TX1", "TX2"}
    assert rows["TX1"]["price"] == 250000.0
    assert rows["TX1"]["date_of_transfer"] == 20240701


def test_initial_load_rerun_idempotent(spark, tmp_path):
    csv = write_csv(tmp_path, "bulk.csv", [GOOD, GOOD2])
    path = str(tmp_path / "price_paid")
    initial_load(spark, csv, path)
    before = set(map(tuple, spark.read.parquet(path).collect()))
    initial_load(spark, csv, path)
    assert set(map(tuple, spark.read.parquet(path).collect())) == before


def test_monthly_update_on_conflict_do_nothing(spark, tmp_path):
    path = str(tmp_path / "price_paid")
    initial_load(spark, write_csv(tmp_path, "bulk.csv", [GOOD, GOOD2]), path)
    # re-delivery of TX1 with CHANGED payload must not touch it (K3/T3)
    monthly_update(
        spark, write_csv(tmp_path, "monthly.csv", [DUP_TX1_CHANGED, NEW_TX7]), path
    )
    rows = {r["transaction_unique_identifier"]: r for r in spark.read.parquet(path).collect()}
    assert set(rows) == {"TX1", "TX2", "TX7"}
    assert rows["TX1"]["price"] == 250000.0  # original kept


# --- outcodes fixtures (FIXTURES.md C1) ---------------------------------------

TYPEAHEAD = {
    "OX1": {
        "matches": [
            {"type": "REGION", "id": "904", "displayName": "Oxford"},
            {"type": "OUTCODE", "id": "1942", "displayName": "OX1"},
            {"type": "OUTCODE", "id": "1943", "displayName": "OX1-alt"},
        ]
    },
    "ox2": {"matches": [{"type": "REGION", "id": "905", "displayName": "Oxon"}]},
    "OX3": {"matches": [{"type": "OUTCODE", "id": "not-a-number", "displayName": "OX3"}]},
}


def fake_typeahead(outcode: str) -> str | None:
    if outcode == "OX4":
        raise ConnectionError("boom")  # per-key error isolation
    return json.dumps(TYPEAHEAD.get(outcode, {"matches": []}))


def seed_areas(spark, path, rows):
    df = spark.createDataFrame(
        rows,
        "outcode string, area_id bigint, display_name string, last_updated_sale bigint",
    )
    ParquetTable(spark, path, "outcode").create_if_not_exists(df)


def test_enrich_outcodes_end_to_end(spark, tmp_path):
    path = str(tmp_path / "areas")
    seed_areas(
        spark,
        path,
        [
            ("OX1", None, None, None),   # resolves to first OUTCODE match (A2)
            ("ox2", 0, None, None),      # no OUTCODE match → sentinel -1 (P18)
            ("OX3", None, None, None),   # non-numeric id → sentinel (P15)
            ("OX4", None, None, None),   # fetch error → sentinel, not retry-loop
            ("OX9", 77, "resolved", 20250101),  # already resolved: untouched
        ],
    )
    enrich_outcodes(spark, path, fake_typeahead, rate_limit_s=0)
    rows = {r["outcode"]: r for r in spark.read.parquet(path).collect()}
    assert rows["OX1"]["area_id"] == 1942  # first match wins, not 1943
    assert rows["OX1"]["display_name"] == "OX1"
    assert rows["ox2"]["area_id"] == -1
    assert rows["OX3"]["area_id"] == -1
    assert rows["OX4"]["area_id"] == -1
    assert rows["OX9"]["area_id"] == 77
    assert rows["OX9"]["last_updated_sale"] == 20250101  # watermark col untouched


def test_enrich_outcodes_respects_batch_size(spark, tmp_path):
    path = str(tmp_path / "areas")
    seed_areas(spark, path, [(f"AB{i}", None, None, None) for i in range(10)])
    updates = enrich_outcodes(
        spark, path, lambda o: json.dumps({"matches": []}), batch_size=3, rate_limit_s=0
    )
    assert updates.count() == 3
    resolved = spark.read.parquet(path).where(F.col("area_id") == -1).count()
    assert resolved == 3  # only the batch was touched


# --- sales fixtures (FIXTURES.md C2/C3) ---------------------------------------


def listing_html(ids, next_offset, total):
    cards = "".join(
        f'<div class="l-searchResult"><a class="propertyCard-link" '
        f'href="/properties/{i}#/?channel=RES_BUY">P{i}</a></div>'
        for i in ids
    )
    model = json.dumps({"pagination": {"next": next_offset, "total": total}})
    return (
        f"<html><body>{cards}"
        f"<script>window.jsonModel = {model};</script></body></html>"
    )


# area 1: two pages (24-id pages, with id 100 repeated across pages → A1 dedup);
# area 2: zero results (watermark must still advance, K6)
PAGES = {
    (1, 0): listing_html([100, 101, 102], 24, 5),
    (1, 24): listing_html([100, 103], None, 5),
    (2, 0): listing_html([], None, 0),
}


def fake_fetch_page(area_id: int, offset: int) -> str | None:
    return PAGES.get((area_id, offset))


def test_pull_new_sales_end_to_end(spark, tmp_path):
    areas_path = str(tmp_path / "areas")
    sales_path = str(tmp_path / "sales")
    seed_areas(
        spark,
        areas_path,
        [
            ("OX1", 1, "Oxford OX1", None),        # stale (never scraped)
            ("OX2", 2, "Oxford OX2", 20200101),    # stale (old watermark)
            ("OX5", 5, "Oxford OX5", 20990101),    # fresh: not selected
            ("OXU", None, None, None),             # unresolved: not eligible
        ],
    )
    # seed an existing property: K4 must update only updated_date
    ParquetTable(spark, sales_path, "property_id").create_if_not_exists(
        spark.createDataFrame(
            [("100", True, 20240101, 20240101)],
            "property_id string, is_processed boolean, created_date int, updated_date int",
        )
    )
    pull_new_sales(
        spark,
        areas_path,
        sales_path,
        fake_fetch_page,
        today_int=20260813,
        yesterday_int=20260812,
        rate_limit_s=0,
    )
    sales = {r["property_id"]: r for r in spark.read.parquet(sales_path).collect()}
    assert set(sales) == {"100", "101", "102", "103"}  # dedup across pages (A1)
    # matched key: is_processed/created_date kept, updated_date advanced (K4)
    assert sales["100"]["is_processed"] is True
    assert sales["100"]["created_date"] == 20240101
    assert sales["100"]["updated_date"] == 20260813
    assert sales["101"]["created_date"] == 20260813

    areas = {r["outcode"]: r for r in spark.read.parquet(areas_path).collect()}
    assert areas["OX1"]["last_updated_sale"] == 20260813
    assert areas["OX2"]["last_updated_sale"] == 20260813  # zero-yield area too (K6)
    assert areas["OX5"]["last_updated_sale"] == 20990101  # untouched
    assert areas["OXU"]["last_updated_sale"] is None


def test_pull_new_sales_pagination_cap(spark, tmp_path):
    """The 200-page safety cap (L2, dags/pull_new_sales_list.py:203-206):
    a page that always advertises a next page must stop at max_pages."""
    areas_path = str(tmp_path / "areas")
    sales_path = str(tmp_path / "sales")
    seed_areas(spark, areas_path, [("OX1", 1, "Oxford OX1", None)])
    calls = []

    def endless(area_id, offset):
        calls.append(offset)
        return listing_html([offset], offset + 24, 10**9)

    pull_new_sales(
        spark, areas_path, sales_path, endless,
        today_int=20260813, yesterday_int=20260812,
        max_pages=7, rate_limit_s=0,
    )
    assert spark.read.parquet(sales_path).count() == 7


# --- U1 json_to_csv ------------------------------------------------------------


def test_json_to_csv_flattens_nested(spark, tmp_path):
    src = tmp_path / "in.jsonl"
    src.write_text(
        '{"id": 1, "pagination": {"next": 24, "total": 3}, "tags": ["a","b"]}\n'
        '{"id": 2, "pagination": {"next": null, "total": 0}, "tags": []}\n'
    )
    out = str(tmp_path / "out_csv")
    flat = json_to_csv(spark, str(src), out)
    assert set(flat.columns) == {"id", "pagination.next", "pagination.total", "tags"}
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 2
    row = back.where(F.col("id") == "1").collect()[0]
    assert row["`pagination.next`" if "`pagination.next`" in back.columns else "pagination.next"] == "24"
    assert row["tags"] == '["a","b"]'


def test_quarantined_csv_isolates_corrupt_rows(spark, tmp_path):
    """Typed CSV parse: bad rows land whole in _corrupt_record, good rows
    load — the declarative form of the reference's per-batch
    rollback-and-continue (dags/monthly_price_paid_data.py:158-160)."""
    from pyspark.sql import types as T

    from airflow_dags_spark.sources.csv import read_headerless_csv_quarantined

    p = tmp_path / "typed.csv"
    p.write_text('1,100\n2,not-a-number\n3,300\n')
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("amount", T.IntegerType()),
        ]
    )
    df = read_headerless_csv_quarantined(spark, str(p), schema).cache()
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert {r["id"] for r in good.collect()} == {1, 3}
    assert [r["_corrupt_record"] for r in bad.collect()] == ["2,not-a-number"]
    df.unpersist()


def test_price_paid_partition_layout_prunes(spark, tmp_path):
    """K7 as layout policy: the table partitions on postcode_area, so the
    reference's indexed predicate (postcode LIKE 'OX%') becomes partition
    pruning — the scan lists only the OX directory."""
    csv = write_csv(tmp_path, "bulk.csv", [GOOD, GOOD2])
    table = initial_load(spark, csv, str(tmp_path / "pp"))
    assert (tmp_path / "pp" / "postcode_area=OX").exists()
    pruned = table.read().where(F.col("postcode_area") == "OX")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "postcode_area" in plan
    assert pruned.count() == 2


def test_monthly_update_empty_delta_short_circuits(spark, tmp_path):
    """A4: a delta whose rows all fail the clean filters leaves the table
    untouched (no merge join, no rewrite)."""
    path = str(tmp_path / "price_paid")
    initial_load(spark, write_csv(tmp_path, "bulk.csv", [GOOD]), path)
    before = set(map(tuple, spark.read.parquet(path).collect()))
    monthly_update(
        spark, write_csv(tmp_path, "empty.csv", [NON_OX, NULL_POSTCODE]), path
    )
    assert set(map(tuple, spark.read.parquet(path).collect())) == before


def test_enrich_outcodes_nothing_unresolved(spark, tmp_path):
    """A4: fully-resolved dimension → no lookups, no merge, empty result."""
    path = str(tmp_path / "areas")
    seed_areas(spark, path, [("OX1", 1, "done", 20250101)])
    calls = []

    def fetch(o):
        calls.append(o)
        return "{}"

    updates = enrich_outcodes(spark, path, fetch, rate_limit_s=0)
    assert updates.count() == 0
    assert calls == []
    assert spark.read.parquet(path).collect()[0]["area_id"] == 1
