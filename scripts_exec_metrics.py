"""Record rows/shuffle-bytes/spill per query for the most expensive headline
queries (VERDICT r4 item 5): turns the SCALE.md 100 TB narrative into numbers
a later session can re-measure with one command.

Usage: python scripts_exec_metrics.py [sf_dir]  (default /root/testdata/sf0.1)
Prints a markdown table ready to paste into SCALE.md §shuffle-budgets.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airflow_dags_spark.functions.metrics import scan_summary
from airflow_dags_spark.plans import registry
from airflow_dags_spark.session import get_spark

# the 10 most expensive headline queries by the r4 judge's idle median-of-5
EXPENSIVE = [
    "graph_adamic_adar",
    "agg_weighted_median",
    "q21_waiting_supplier",
    "regr_linear_functions",
    "sketch_bloom_membership",
    "dedup_sorted_neighborhood",
    "stats_gini_revenue",
    "agg_bitmap_distinct",
    "stats_mann_whitney",
    "text_bm25_search",
]


def fmt_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if n < 1024 or unit == "GiB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024.0
    return f"{n} B"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry.load_all()
    spark = get_spark(app_name="exec-metrics", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    print(f"| query | sec | rows scanned | rows out | shuffle written | shuffle records | spill |")
    print(f"|---|---|---|---|---|---|---|")
    for name in EXPENSIVE:
        df = registry.QUERIES[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.collect()  # action on the SAME DataFrame so SQLMetrics attach
        sec = time.perf_counter() - t0
        s = scan_summary(df)
        print(
            f"| {name} | {sec:.2f} | {s['rows_scanned']:,} | {s['rows_out']:,} "
            f"| {fmt_bytes(s['shuffle_bytes_written'])} "
            f"| {s['shuffle_records_written']:,} "
            f"| {fmt_bytes(s['spill_bytes'])} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
