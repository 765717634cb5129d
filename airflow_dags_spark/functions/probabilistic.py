"""Portable probabilistic membership/frequency structures (Bloom, Count-Min).

Spark ships DataSketches HLL/KLL/Theta (plans/sketches.py) but its Bloom
(``DataFrameStatFunctions.bloomFilter``) and CMS (``countMinSketch``) are
DRIVER-SIDE objects built with engine-private hashing — not mergeable as
table rows and not reproducible by another engine. These versions keep the
sketch itself a DataFrame:

- **Bloom filter** = rows ``(word_idx, word)`` — 32-bit words of the bit
  array, built by one hash-exchange + ``bit_or`` partial agg. Merge two
  filters = union + ``bit_or`` regroup. Probe = broadcast-join the (tiny,
  ≤ m/32 rows) filter to the probe side's positions.
- **Count-Min sketch** = rows ``(r, b, cnt)`` — depth×width counters built
  by one hash-exchange + count partial agg. Merge = union + sum. Estimate =
  min over the key's depth counters (classic CMS upper bound).

Hashing is the engine's portable idiom — ``conv(substr(md5(salt||'|'||key),
1, 8), 16, 10)`` — so any engine with md5 reproduces the sketch
bit-for-bit and the driver can oracle-check membership/estimates exactly
(unlike HLL/KLL/Theta whose bytes are engine-private).

At 100 TB: both sketches shuffle k (or depth) short rows per input row and
collapse map-side to a FIXED-size table (≤ m/32 / depth·width rows)
regardless of input size; probing broadcasts the sketch. The Bloom table is
the scale answer to "does this key exist in that 100 TB corpus" without a
shuffle join against the corpus — e.g. incremental-crawl URL seen-lists or
doc-fingerprint membership during ingest.

Reference parity: the reference's only membership check is the Postgres
``ON CONFLICT DO NOTHING`` probe (dags/monthly_price_paid_data.py) — a
per-row unique-index lookup. These sketches are the lake-native form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M_BITS = 65536
BLOOM_K = 4
CMS_DEPTH = 4
CMS_WIDTH = 2048


def _h(key: Column, salt: int, mod: int) -> Column:
    """Portable salted 32-bit hash in [0, mod): first 8 md5 hex chars."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(str(salt)), F.lit("|"), key.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % mod
    )


def _word_mask(h: Column):
    """Split a bit position into (word_idx, 32-bit word mask).

    32-bit words (not 64): ``1 << 31`` stays positive in a signed BIGINT in
    every engine, while ``1 << 63`` wraps negative with engine-specific
    semantics — 32-bit words keep the table oracle-portable."""
    word_idx = F.floor(h / 32).cast("bigint").alias("word_idx")
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__h % 32 AS INT))").alias("mask")
    return word_idx, mask


def bloom_build(
    df: DataFrame, key, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> DataFrame:
    """Build a Bloom filter table ``(word_idx, word)`` over ``key``.

    One exchange: k positions per row explode map-side, ``bit_or`` partial
    agg collapses them before the shuffle, so the wire carries at most
    m/32 rows per map task."""
    c = F.col(key) if isinstance(key, str) else key
    pos = df.select(
        F.explode(F.array(*[_h(c, i, m_bits) for i in range(k)])).alias("__h")
    )
    word_idx, mask = _word_mask(F.col("__h"))
    return (
        pos.select(word_idx, mask)
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Union of the underlying sets = bit_or of the word tables."""
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_might_contain(
    bloom: DataFrame,
    probes: DataFrame,
    key,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Probe: ``might_contain`` per probe row (false ⇒ definitely absent).

    The filter table is ≤ m/32 rows → broadcast; the probe side streams.
    A missing word_idx means those 32 bits are all zero → miss."""
    c = F.col(key) if isinstance(key, str) else key
    p = probes.select(
        c.alias("__k"),
        F.explode(F.array(*[_h(c, i, m_bits) for i in range(k)])).alias("__h"),
    )
    word_idx, mask = _word_mask(F.col("__h"))
    hits = (
        p.select("__k", word_idx, mask)
        .join(F.broadcast(bloom), "word_idx", "left")
        .groupBy("__k")
        .agg(
            F.bool_and(
                F.coalesce(F.col("word").bitwiseAND(F.col("mask")) != 0, F.lit(False))
            ).alias("might_contain")
        )
    )
    return hits.withColumnRenamed("__k", key if isinstance(key, str) else "key")


def cms_build(
    df: DataFrame, key, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Build a Count-Min sketch table ``(r, b, cnt)`` over ``key``.

    One exchange on (r, b) with map-side count partial agg; the result is at
    most depth·width rows no matter the input size."""
    c = F.col(key) if isinstance(key, str) else key
    rb = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("r"),
                        _h(c, r, width).alias("b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("__rb")
    )
    return (
        rb.select("__rb.r", "__rb.b")
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Concatenation of the underlying streams = per-counter sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    keys_df: DataFrame,
    key,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimate per key: min over its depth counters (≥ true count).

    The sketch (≤ depth·width rows) broadcasts; a counter row absent from
    the sketch means zero hits → estimate 0."""
    c = F.col(key) if isinstance(key, str) else key
    p = keys_df.select(
        keys_df["*"],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("r"),
                        _h(c, r, width).alias("b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("__rb"),
    ).select(keys_df["*"], F.col("__rb.r").alias("r"), F.col("__rb.b").alias("b"))
    key_cols = [f for f in keys_df.columns]
    return (
        p.join(F.broadcast(cms), ["r", "b"], "left")
        .groupBy(*key_cols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def cms_join_size_estimate(
    cms_a: DataFrame, cms_b: DataFrame, depth: int = CMS_DEPTH
) -> DataFrame:
    """Inner-equi-join CARDINALITY estimate from two Count-Min sketches.

    |A ⋈ B| = Σ_v fA(v)·fB(v), and each CMS row r estimates that sum as
    Σ_b cntA[r,b]·cntB[r,b] (an over-estimate: colliding values add cross
    terms); min over the depth rows is the standard AMS/CMS inner-product
    estimator — always ≥ the true join size, tighter as width grows.

    Why it matters: join-size estimation drives strategy choice (broadcast
    vs shuffle, reorder) and a wrong guess is how 100 TB joins explode. Two
    fixed-size counter tables answer it WITHOUT scanning either input again
    — sketches persist alongside tables and merge under appends, so the
    estimate is always current at planning cost ≈ depth·width row joins.

    Returns one row: ``(est_join_size,)``; both sketches must share
    depth/width/hash family (they do by construction here)."""
    a = cms_a.select("r", "b", F.col("cnt").alias("cnt_a"))
    b = cms_b.select("r", "b", F.col("cnt").alias("cnt_b"))
    per_row = (
        a.join(b, ["r", "b"])  # inner: a missing (r,b) counter is zero
        .groupBy("r")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("dot"))
    )
    return per_row.agg(F.min("dot").alias("est_join_size"))


def heavy_hitters_exact(
    df: DataFrame, col: str, min_share: float
) -> DataFrame:
    """EXACT heavy hitters in two passes (Misra-Gries candidates → exact
    recount): every non-null value whose count exceeds ``min_share · n``
    (n = non-null rows), with its exact count. Unlike
    ``sketch_cms_heavy_hitters`` (bounded-memory ESTIMATES), the output
    here is exact — the classic mergeable-summaries result (Misra & Gries
    1982; Agarwal et al. PODS'12 mergeability).

    Pass 1: each task folds its whole partition into ≤ k counters
    (k = ⌈1/min_share⌉) with the batched MG decrement — when the table
    exceeds k entries, the (k+1)-th largest count is subtracted from all
    (one decrement of d absorbs ≥ d·(k+1) mass, so total decremented mass
    per partition ≤ n_p/(k+1)). Any value with global count
    > n/(k+1) ≤ min_share·n therefore survives in ≥ 1 partition summary
    (pigeonhole over partitions) — the candidate set is a guaranteed
    superset. Wire cost: ≤ partitions × (k+1) rows, never data rows.

    Pass 2: exact counts of candidates only — broadcast semi-join +
    hash aggregate; n rides along from pass 1 (a NULL-valued tally row
    per partition), so the input is scanned exactly twice and counted
    exhaustively never."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    if not (0.0 < min_share < 1.0):
        raise ValueError(f"min_share must be in (0, 1), got {min_share}")
    k = int(np.ceil(1.0 / min_share))
    val_type = df.schema[col].dataType
    # private column names: the probed frame may itself have a "value"
    # column (events does) — ambiguity would break the recount join
    schema = StructType(
        [StructField("__hh_value", val_type), StructField("__hh_cnt", LongType())]
    )

    def mg(batches):
        acc = pd.Series(dtype="int64")
        n_part = 0
        for pdf in batches:
            s = pdf[col].dropna()
            n_part += len(s)
            if not len(s):
                continue
            acc = acc.add(s.value_counts(), fill_value=0)
            if len(acc) > k:
                d = acc.nlargest(k + 1).iloc[-1]
                acc = acc - d
                acc = acc[acc > 0]
        out = pd.DataFrame(
            {"__hh_value": acc.index, "__hh_cnt": acc.to_numpy("int64")}
        )
        tally = pd.DataFrame({"__hh_value": [None], "__hh_cnt": [n_part]})
        yield pd.concat([out, tally], ignore_index=True)

    summaries = df.select(col).mapInPandas(mg, schema).persist()
    try:
        n = summaries.where(F.col("__hh_value").isNull()).agg(
            F.sum("__hh_cnt").alias("n")
        ).first()["n"] or 0
        cand = (
            summaries.where(F.col("__hh_value").isNotNull())
            .select("__hh_value")
            .distinct()
        )
        exact = (
            df.where(F.col(col).isNotNull())
            .join(
                F.broadcast(cand),
                F.col(col) == F.col("__hh_value"),
                "left_semi",
            )
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") > min_share * n)
        )
        # materialize before unpersist so the candidate broadcast is built
        # off the live summaries (DISK-cheap: ≤ |candidates| rows)
        exact = exact.localCheckpoint(eager=True)
    finally:
        summaries.unpersist()
    return exact
