"""Price-paid CSV as a first-class Spark data source (Python DataSource API).

The reference ingests the HM Land Registry feed two ways:

- bulk: stream the ~5 GB ``pp-complete.csv`` over HTTP and parse it in
  100k-row buffers (``dags/initial_price_paid_data.py:103-117``);
- monthly: download the delta file and parse it whole
  (``dags/monthly_price_paid_data.py:104-117``).

SURVEY.md §2.1 (S2/S5) maps these to Spark scans and notes a DataSourceV2
Python source as the first-class realization — this module is that source,
built on the Spark 4 Python DataSource API (``pyspark.sql.datasource``):

- ``spark.read.format("pricepaid").load(path)`` — batch scan that splits the
  file into byte-range partitions (Hadoop ``TextInputFormat`` discipline:
  a partition owns every line that *starts* inside its range), so one big
  CSV parses on all executors in parallel instead of a single driver-side
  ``iter_lines`` loop. Rows are emitted as Arrow ``RecordBatch``es (the
  vectorized fast path — no per-row Python object churn).
- ``spark.readStream.format("pricepaid").load(path)`` — incremental tail
  scan. Offsets are byte positions aligned to line boundaries, so a feed
  file that grows between triggers yields exactly the new complete lines:
  the reference's hand-rolled micro-batch loop becomes a real Structured
  Streaming source with checkpointed offsets and exactly-once replay.

Scale notes (SCALE.md): split size defaults to 128 MiB, matching
``spark.sql.files.maxPartitionBytes``; a 5 GB file → ~40 parallel tasks.
Like TextInputFormat, byte-splitting assumes no embedded newlines inside
quoted fields (true for the upstream feed). Schema is the fixed 16-column
raw-string layout (schemas.PRICE_PAID_RAW_SCHEMA); typed coercions stay
explicit downstream operators (functions/cleaning.py).
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from airflow_dags_spark.schemas import PRICE_PAID_COLUMNS

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

DEFAULT_SPLIT_BYTES = 128 * 1024 * 1024
_ARROW_BATCH_ROWS = 16_384
N_COLS = len(PRICE_PAID_COLUMNS)


@dataclass
class _Range(InputPartition):
    path: str
    start: int
    end: int


def _list_csv_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".csv") and not f.startswith((".", "_"))
        )
    return [path]


def _parse_lines(lines: Iterator[str]) -> Iterator[list]:
    """CSV-parse text lines into fixed-width 16-column rows (pad/trim).

    Empty fields become null, matching spark.read.csv's default
    ``nullValue=""`` (and pandas NaN): downstream ``na.drop`` cleaning
    (functions/cleaning.py, SURVEY P7) relies on real nulls.
    """
    for record in csv.reader(lines):
        if not record:
            continue
        row = [f if f != "" else None for f in record]
        if len(row) < N_COLS:
            row = row + [None] * (N_COLS - len(row))
        yield row[:N_COLS]


def _rows_to_arrow(rows: list[list]) -> "pa.RecordBatch":
    import pyarrow as pa

    cols = [pa.array([r[i] for r in rows], type=pa.string()) for i in range(N_COLS)]
    return pa.RecordBatch.from_arrays(cols, names=PRICE_PAID_COLUMNS)


def _read_range(path: str, start: int, end: int, exact: bool) -> Iterator[list]:
    """Lines of ``path`` whose start offset lies in [start, end).

    exact=False (batch): ranges are arbitrary byte splits — skip the first
    partial line unless at offset 0, and finish the line straddling ``end``
    (TextInputFormat semantics). exact=True (streaming): offsets are already
    line-aligned, so read precisely [start, end).
    """
    with open(path, "rb") as f:
        f.seek(start)
        if start > 0 and not exact:
            f.readline()  # owned by the previous split
        while True:
            pos = f.tell()
            if pos >= end:
                break
            raw = f.readline()
            if not raw:
                break
            if exact and pos + len(raw) > end:
                break  # partial trailing line: next micro-batch's work
            text = raw.decode("utf-8-sig" if pos == 0 else "utf-8", errors="replace")
            text = text.rstrip("\r\n")
            if text:
                yield from _parse_lines(iter([text]))


class PricePaidBatchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("pricepaid source requires a load(path)")
        self.files = _list_csv_files(path)
        self.split_bytes = int(options.get("split_bytes", DEFAULT_SPLIT_BYTES))

    def partitions(self) -> list[InputPartition]:
        parts: list[InputPartition] = []
        for path in self.files:
            size = os.path.getsize(path)
            for start in range(0, max(size, 1), self.split_bytes):
                parts.append(_Range(path, start, min(start + self.split_bytes, size)))
        return parts

    def read(self, partition: _Range) -> Iterator["pa.RecordBatch"]:
        buf: list[list] = []
        for row in _read_range(partition.path, partition.start, partition.end, exact=False):
            buf.append(row)
            if len(buf) >= _ARROW_BATCH_ROWS:
                yield _rows_to_arrow(buf)
                buf = []
        if buf:
            yield _rows_to_arrow(buf)


class PricePaidStreamReader(DataSourceStreamReader):
    """Byte-offset micro-batches over a growing feed file.

    Offset json: ``{"offset": n}`` — n is always at a line boundary because
    ``latestOffset`` only advances past the last complete line. Replaying a
    committed (start, end) range re-reads exactly the same bytes, giving the
    idempotent redelivery the reference got from ``ON CONFLICT DO NOTHING``
    (``dags/monthly_price_paid_data.py:153``) at the source layer instead.
    """

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("pricepaid source requires a load(path)")
        self.path = path
        self.split_bytes = int(options.get("split_bytes", DEFAULT_SPLIT_BYTES))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _complete_size(self) -> int:
        """Byte length of the file up to and including the last newline."""
        try:
            size = os.path.getsize(self.path)
        except OSError:
            return 0
        if size == 0:
            return 0
        with open(self.path, "rb") as f:
            pos = size
            while pos > 0:
                step = min(64 * 1024, pos)
                f.seek(pos - step)
                chunk = f.read(step)
                nl = chunk.rfind(b"\n")
                if nl != -1:
                    return pos - step + nl + 1
                pos -= step
        return 0

    def latestOffset(self) -> dict:
        return {"offset": self._complete_size()}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = start["offset"], end["offset"]
        if hi <= lo:
            return []
        return [
            _Range(self.path, s, min(s + self.split_bytes, hi))
            for s in range(lo, hi, self.split_bytes)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for row in _read_range(partition.path, partition.start, partition.end, exact=True):
            yield tuple(row)

    def commit(self, end: dict) -> None:  # offsets live in the stream checkpoint
        return None


class PricePaidDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pricepaid"

    def schema(self) -> str:
        return ", ".join(f"{c} string" for c in PRICE_PAID_COLUMNS)

    def reader(self, schema: StructType) -> DataSourceReader:
        return PricePaidBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return PricePaidStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source: ``spark.read.format('pricepaid')``."""
    spark.dataSource.register(PricePaidDataSource)


__all__ = [
    "PricePaidDataSource",
    "PricePaidBatchReader",
    "PricePaidStreamReader",
    "register",
]
