"""Bloom-filtered join: semi-join reduction for big shuffle joins.

When a selective dimension joins a huge fact, the shuffle moves EVERY fact
row — then the join drops most of them. The classic fix (sideways
information passing; Spark's own runtime row-level filtering does a form
of it when stats cooperate) is to ship a Bloom filter of the build side's
keys to the probe side and drop definitely-non-matching rows BEFORE the
exchange:

- build: one pass over the dim keys → ≤ m/32 bit-words (KBs), collected
  and folded into a numpy bit array on the driver — the same bounded
  driver-side build Spark's InjectRuntimeFilter performs;
- probe: an Arrow-batched pandas UDF tests membership per fact row with
  the bit array captured in the closure (broadcast once per executor) —
  a narrow scan-stage filter, NO extra shuffle, no join;
- join: the surviving rows join exactly as before — Bloom false positives
  are eliminated by the join itself, so the result is bit-identical to
  the plain join at any FP rate.

The hash family is the engine's portable md5 recipe
(functions/probabilistic._h): salt|str(key), first 8 hex chars — the UDF
reproduces it byte-for-byte driver-side, which is also what makes the
operator oracle-checkable.

Spark-native alternative: `spark.sql.optimizer.runtime.bloomFilter
.enabled` lets Catalyst inject the same structure automatically when
column stats exist; this operator is the explicit form for when they
don't (fresh files, exotic sources) and for bounding the FP rate by hand.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_dags_spark.functions.probabilistic import bloom_build


def bloom_filtered_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    how: str = "inner",
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """``fact ⋈ dim`` with the fact side pre-filtered by a Bloom of dim's
    keys. Join semantics restricted to forms where dropping non-matching
    FACT rows is sound: inner / left_semi (and right outer of the dim).

    Returns exactly ``fact.join(dim, key, how)`` — verified by oracle —
    with the exchange carrying only maybe-matching rows."""
    if how not in ("inner", "left_semi"):
        raise ValueError(
            "bloom pre-filter drops fact rows: only inner/left_semi are "
            f"sound, got {how!r} (an outer fact side must keep non-matches)"
        )
    # null dim keys never equi-join; hashing them would also put a null
    # bit position into the filter table
    build_keys = dim.select(key).where(F.col(key).isNotNull())
    words = {
        int(r["word_idx"]): int(r["word"])
        for r in bloom_build(build_keys, key, m_bits, k).collect()
    }
    arr = np.zeros(m_bits // 32 + 1, dtype=np.int64)
    for idx, w in words.items():
        arr[idx] = w

    @F.pandas_udf("boolean")
    def might_contain(v: pd.Series) -> pd.Series:
        out = np.ones(len(v), dtype=bool)
        vals = v.astype(object)
        for i, x in enumerate(vals):
            if x is None:
                out[i] = False  # null keys never equi-join
                continue
            s = str(x)
            for salt in range(k):
                h = (
                    int(
                        hashlib.md5(f"{salt}|{s}".encode()).hexdigest()[:8], 16
                    )
                    % m_bits
                )
                if not (arr[h // 32] >> (h % 32)) & 1:
                    out[i] = False
                    break
        return pd.Series(out)

    filtered = fact.where(might_contain(F.col(key)))
    return filtered.join(dim, key, how)
