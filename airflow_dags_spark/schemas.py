"""Explicit schemas — the engine never relies on inference (SURVEY.md §1.3).

The reference imposes 16 canonical column names on headerless CSV
(``dags/monthly_price_paid_data.py:19-23,117``) and declares full DDL for
every table; we mirror that with StructTypes.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Column order of the HM Land Registry price-paid CSV
# (dags/monthly_price_paid_data.py:19-23, dags/initial_price_paid_data.py:17-21).
PRICE_PAID_COLUMNS: list[str] = [
    "transaction_unique_identifier",
    "price",
    "date_of_transfer",
    "postcode",
    "property_type",
    "old_new",
    "duration",
    "paon",
    "saon",
    "street",
    "locality",
    "town_city",
    "district",
    "county",
    "ppd_category_type",
    "record_status",
]

# Raw CSV: everything lands as string; typed coercions are explicit operators
# (functions.cleaning), matching the reference's errors='coerce' pipeline.
PRICE_PAID_RAW_SCHEMA = T.StructType(
    [T.StructField(name, T.StringType(), True) for name in PRICE_PAID_COLUMNS]
)

# Cleaned target table (dags/monthly_price_paid_data.py:74-94): id key,
# double price (driver parquet convention), yyyymmdd bigint date.
PRICE_PAID_SCHEMA = T.StructType(
    [
        T.StructField("transaction_unique_identifier", T.StringType(), False),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("date_of_transfer", T.LongType(), True),
        T.StructField("postcode", T.StringType(), True),
        T.StructField("property_type", T.StringType(), True),
        T.StructField("old_new", T.StringType(), True),
        T.StructField("duration", T.StringType(), True),
        T.StructField("paon", T.StringType(), True),
        T.StructField("saon", T.StringType(), True),
        T.StructField("street", T.StringType(), True),
        T.StructField("locality", T.StringType(), True),
        T.StructField("town_city", T.StringType(), True),
        T.StructField("district", T.StringType(), True),
        T.StructField("county", T.StringType(), True),
        T.StructField("ppd_category_type", T.StringType(), True),
        T.StructField("record_status", T.StringType(), True),
    ]
)

# Dimension with per-key watermark (dags/rightmove_outcodes.py:36-43);
# area_id: null = unresolved, -1 = no-match sentinel
# (dags/rightmove_outcodes.py:13,117-120).
RIGHTMOVE_AREAS_SCHEMA = T.StructType(
    [
        T.StructField("outcode", T.StringType(), False),
        T.StructField("area_id", T.LongType(), True),
        T.StructField("display_name", T.StringType(), True),
        T.StructField("last_updated_sale", T.LongType(), True),
    ]
)

# Upsert target (dags/pull_new_sales_list.py:73-81). The reference's SERIAL
# surrogate key is dropped — the natural key property_id suffices (SURVEY §1.2).
SALES_PROPERTIES_SCHEMA = T.StructType(
    [
        T.StructField("property_id", T.StringType(), False),
        T.StructField("is_processed", T.BooleanType(), True),
        T.StructField("created_date", T.IntegerType(), True),
        T.StructField("updated_date", T.IntegerType(), True),
    ]
)

# Typeahead API response (dags/rightmove_outcodes.py:76,103-107).
TYPEAHEAD_MATCH_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("displayName", T.StringType(), True),
    ]
)
TYPEAHEAD_RESPONSE_SCHEMA = T.StructType(
    [T.StructField("matches", T.ArrayType(TYPEAHEAD_MATCH_SCHEMA), True)]
)

# Embedded window.jsonModel pagination payload
# (dags/pull_new_sales_list.py:152-155).
JSON_MODEL_PAGINATION_SCHEMA = T.StructType(
    [
        T.StructField(
            "pagination",
            T.StructType(
                [
                    T.StructField("next", T.LongType(), True),
                    T.StructField("total", T.LongType(), True),
                ]
            ),
            True,
        )
    ]
)

# Driver synthetic test tables (FIXTURES.md §A) — names only; parquet carries
# its own schema, these document the contract.
TESTDATA_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
