"""Round-12 registry additions — the surfaces the r8 verdict ranked
(§Next-round #2, #3 and #5), all fully oracle-checked:

- **dedup_substring_spans** — the SUBSTRING-grain dedup tier
  (``operators.dedup.duplicated_spans``): maximal per-document token spans
  whose n-token shingles all occur in ≥2 documents — the distributed
  shingle-inverted-index stand-in for suffix-array exact-substring dedup
  (Lee et al. 2022). Completes the grain ladder document → chunk → span.
- **dedup_advisory_reconcile** — the CONSUMER of the r8 re-delivery
  advisory flags (``operators.ingest.reconcile_advisories``): the banded
  advisory estimate is exact-verified with shingle Jaccard, and only
  confirmed pairs become quarantine candidates. This query is the
  SQL-expressible single step: store + re-delivered-batch simulation from
  ``documents`` (md5-deterministic splits, the ``dedup_minhash_incr_screen``
  convention), advisory pass, exact verify, verdict column. The persistent
  form (advisory parquet table → deletion-vector quarantine with audit
  trail) is ``reconcile_advisories`` — pytest-verified end-to-end
  (tests/test_ingest.py).
- **dedup_span_removal** — the actionable form of the substring tier:
  rewrite documents minus non-owned exactly-duplicated spans (one copy
  kept corpus-wide, partial-overlap spans preserved everywhere).
- **sim_pq_recenter_step** — one deterministic PQ codebook re-centering
  step, the SQL-expressible core of ``operators/ann_store.py:
  PqCodebookStore`` (whose persistent/streaming forms are pytest-verified
  in tests/test_ann_store.py).

Scale notes (100 TB): substring spans shuffle (a) (hash, key) pairs for
ONE count-distinct hash aggregation, (b) the duplicated-hash semi-join
(distinct hashes only on the build side), (c) per-document windows bounded
by document length — document text never crosses an exchange. The
reconcile query signs each side once (staged shingle projections), the
advisory join is bounded by the batch's key count BEFORE the band join
(semi-join pruning in minhash_redelivery_advisory), and the exact verify
touches flagged pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_dags_spark.operators.dedup import (
    duplicated_spans,
    minhash_bands,
    minhash_redelivery_advisory,
    ngram_jaccard,
    remove_duplicated_spans,
)
from airflow_dags_spark.plans.registry import register
from airflow_dags_spark.plans.shared import scan_spread
from airflow_dags_spark.sources.tables import read_table

_WS = "REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g')"
_NORM = f"LOWER({_WS})"


# --------------------------------------------------------------------------
# dedup_substring_spans — cross-document duplicated token spans
# --------------------------------------------------------------------------

SUBSTRING_SPANS_ORACLE = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 8
),
sh AS MATERIALIZED (
  -- 8-token shingle hash per POSITION (no distinct: runs are positional)
  SELECT doc_id, i - 1 AS pos, md5(array_to_string(t[i:i+7], ' ')) AS sh
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) g
),
dup AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT s.doc_id, s.pos FROM sh s WHERE s.sh IN (SELECT sh FROM dup)),
isl AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits
)
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
       CAST(COUNT(*) AS BIGINT) AS n_shingles
FROM isl GROUP BY doc_id, grp HAVING COUNT(*) >= 2
"""


@register("dedup_substring_spans", SUBSTRING_SPANS_ORACLE)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-grain dedup: maximal token spans whose 8-token shingles
    all occur in at least one OTHER document (min_run=2 → duplicated
    substrings of ≥9 tokens) — the boilerplate-inside-unique-documents
    tier that whole-doc and chunk fingerprints miss.

    Scale shape: see ``operators.dedup.duplicated_spans`` — one narrow
    position-preserving hash map, one count-distinct hash agg on the
    shingle hash, one semi-join (distinct duplicated hashes build side),
    one per-document window. The md5-per-position map stage dominates at
    test SF, so the scan is spread first (same note as
    dedup_minhash_incr_screen)."""
    d = scan_spread(read_table(spark, sf_dir, "documents"), "doc_id")
    return duplicated_spans(d, "text", "doc_id", n_shingle=8, min_run=2)


# --------------------------------------------------------------------------
# dedup_advisory_reconcile — exact-verify the re-delivery advisory flags
# --------------------------------------------------------------------------

def _sh3(norm: str) -> str:
    """DuckDB 3-token shingle list over a normalized-text expression (the
    engine's shingles_from_tokens mirror, parameterized on the column)."""
    split = f"string_split({norm}, ' ')"
    return f"""list_distinct(list_transform(
      generate_series(1, GREATEST(len({split}) - 2, 0)),
      i -> {split}[i] || ' ' || {split}[i+1] || ' ' || {split}[i+2]))"""


def _bands4(sh_col: str) -> str:
    return ",\n    ".join(
        f"CASE WHEN len({sh_col}) > 0 THEN "
        f"list_min(list_transform({sh_col}, s -> md5('b{i}:' || s))) END "
        f"AS band_{i}"
        for i in range(4)
    )


ADVISORY_RECONCILE_ORACLE = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, text,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd' AS is_store,
         substr(md5(CAST(doc_id AS VARCHAR)), 2, 1) < '4' AS redeliv
  FROM documents
),
batch AS MATERIALIZED (
  SELECT doc_id, text FROM base WHERE NOT is_store
  UNION ALL
  -- re-delivered old keys arrive with DRIFTED content (an identical
  -- re-delivery is excluded by full-signature identity on both engines)
  SELECT doc_id, text || ' redelivered revision' AS text
  FROM base WHERE is_store AND redeliv
),
store_sh AS MATERIALIZED (
  SELECT doc_id, {_sh3(_NORM)} AS sh FROM base WHERE is_store
),
batch_sh AS MATERIALIZED (SELECT doc_id, {_sh3(_NORM)} AS sh FROM batch),
store_bands AS MATERIALIZED (SELECT doc_id, {_bands4('sh')} FROM store_sh),
batch_bands AS MATERIALIZED (SELECT doc_id, {_bands4('sh')} FROM batch_sh),
preexist AS (
  -- store rows keyed by batch members, minus rows byte-identical to the
  -- batch's own signatures (replay purity — minhash_redelivery_advisory)
  SELECT s.* FROM store_bands s
  WHERE NOT EXISTS (
    SELECT 1 FROM batch_bands b WHERE b.doc_id = s.doc_id
      AND b.band_0 = s.band_0 AND b.band_1 = s.band_1
      AND b.band_2 = s.band_2 AND b.band_3 = s.band_3)
    AND EXISTS (SELECT 1 FROM batch_bands b2 WHERE b2.doc_id = s.doc_id)
),
st AS (
  SELECT doc_id, 0 AS band_idx, band_0 AS band_val FROM preexist
  UNION ALL SELECT doc_id, 1, band_1 FROM preexist
  UNION ALL SELECT doc_id, 2, band_2 FROM preexist
  UNION ALL SELECT doc_id, 3, band_3 FROM preexist
),
nw AS (
  SELECT doc_id, 0 AS band_idx, band_0 AS band_val FROM batch_bands
  UNION ALL SELECT doc_id, 1, band_1 FROM batch_bands
  UNION ALL SELECT doc_id, 2, band_2 FROM batch_bands
  UNION ALL SELECT doc_id, 3, band_3 FROM batch_bands
),
hits AS (
  SELECT n.doc_id, MIN(s.doc_id) AS advisory_matched_store_doc,
         CAST(COUNT(DISTINCT n.band_idx) AS BIGINT) AS n_matching_bands
  FROM nw n JOIN st s ON n.band_idx = s.band_idx AND n.band_val = s.band_val
  WHERE n.doc_id <> s.doc_id
  GROUP BY n.doc_id
),
jx AS (
  SELECT h.doc_id, h.advisory_matched_store_doc, h.n_matching_bands,
         len(list_intersect(bn.sh, ss.sh)) AS inter,
         len(list_distinct(list_concat(bn.sh, ss.sh))) AS uni
  FROM hits h
  JOIN batch_sh bn ON bn.doc_id = h.doc_id
  JOIN store_sh ss ON ss.doc_id = h.advisory_matched_store_doc
)
SELECT doc_id, advisory_matched_store_doc, n_matching_bands,
  ROUND(CASE WHEN uni > 0 THEN CAST(inter AS DOUBLE) / uni ELSE 0.0 END, 6)
    AS jaccard,
  ROUND(CASE WHEN uni > 0 THEN CAST(inter AS DOUBLE) / uni ELSE 0.0 END, 6)
    >= 0.5 AS verified
FROM jx
"""


@register("dedup_advisory_reconcile", ADVISORY_RECONCILE_ORACLE)
def dedup_advisory_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-verification of re-delivery advisory flags — the single
    deterministic step of ``operators.ingest.reconcile_advisories``
    (VERDICT r8 item 2), simulated from ``documents``: the store is the
    md5 < 'd' split, the batch is everything else PLUS ~25% of store keys
    re-delivered with drifted content; the advisory pass flags batch docs
    matching the re-delivered keys' PREEXISTING stored signatures, and
    exact shingle Jaccard against the stored text decides ``verified`` —
    banding false positives (1-band accidental collisions) are rejected
    here, which is the whole point of the verification tier.

    Scale shape: each side is signed once (staged projections inside
    minhash_bands); minhash_redelivery_advisory prunes the store to at
    most the batch's key count BEFORE the band join; the verify joins
    texts for FLAGGED pairs only. Nothing is all-pairs."""
    d = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .transform(scan_spread, "doc_id")
    )
    is_store = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "d"
    redeliv = F.substring(F.md5(F.col("doc_id").cast("string")), 2, 1) < "4"
    store_docs = d.where(is_store)
    batch = d.where(~is_store).unionByName(
        store_docs.where(redeliv).select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" redelivered revision")).alias("text"),
        )
    )
    store_bands = minhash_bands(store_docs, "text", "doc_id")
    new_bands = minhash_bands(batch, "text", "doc_id")
    # Materialize each side's signatures ONCE (lazy DISK_ONLY local
    # checkpoint): the advisory pass consumes both frames through an
    # anti-join keyed on the band columns, a stacked semi-join and the
    # final band join, and Catalyst inlines the staged signing projection
    # into every consumer — the executed plan evaluated the min-hash
    # trees 12× (48 array_min(transform...) sites, 16 file scans).
    # Checkpointing the signatures (bounded: key + 4 hex bands per doc,
    # never text) signs each side once: measured 11.4 → 1.6 s at sf0.1,
    # rows identical (r10). Per-invocation state — every run re-signs
    # from the parquet inputs; DISK_ONLY keeps it off the driver-session
    # heap (the ingest.py:reconcile_advisories barrier discipline).
    from pyspark import StorageLevel

    store_bands = store_bands.localCheckpoint(
        eager=False, storageLevel=StorageLevel.DISK_ONLY
    )
    new_bands = new_bands.localCheckpoint(
        eager=False, storageLevel=StorageLevel.DISK_ONLY
    )
    adv = minhash_redelivery_advisory(store_bands, new_bands, "doc_id", 4)
    pairs = adv.join(
        batch.select("doc_id", F.col("text").alias("__text_new")), "doc_id"
    ).join(
        store_docs.select(
            F.col("doc_id").alias("advisory_matched_store_doc"),
            F.col("text").alias("__text_store"),
        ),
        "advisory_matched_store_doc",
    )
    return ngram_jaccard(pairs, "__text_new", "__text_store", 3).select(
        "doc_id",
        "advisory_matched_store_doc",
        "n_matching_bands",
        "jaccard",
        (F.col("jaccard") >= 0.5).alias("verified"),
    )


# --------------------------------------------------------------------------
# dedup_span_removal — rewrite documents minus non-owned duplicated spans
# --------------------------------------------------------------------------

SPAN_REMOVAL_ORACLE = f"""
WITH toks AS MATERIALIZED (
  -- t: lowercased tokens (span DETECTION); tc: case-preserving tokens
  -- (the REBUILD) — positionally aligned, LOWER never changes whitespace
  SELECT doc_id, string_split({_NORM}, ' ') AS t,
         string_split({_WS}, ' ') AS tc
  FROM documents
),
sh AS MATERIALIZED (
  SELECT doc_id, i - 1 AS pos, md5(array_to_string(t[i:i+7], ' ')) AS sh
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) g
  WHERE len(t) >= 8
),
dup AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT s.doc_id, s.pos FROM sh s WHERE s.sh IN (SELECT sh FROM dup)),
isl AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits
),
spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e
  FROM isl GROUP BY doc_id, grp HAVING COUNT(*) >= 2
),
content AS (
  SELECT sp.doc_id, sp.s, sp.e,
         md5(array_to_string(t[sp.s + 1 : sp.e + 1], ' ')) AS c
  FROM spans sp JOIN toks USING (doc_id)
),
ranked AS (
  SELECT doc_id, s, e,
         ROW_NUMBER() OVER (PARTITION BY c ORDER BY doc_id, s) AS rn,
         COUNT(*) OVER (PARTITION BY c) AS n_occ
  FROM content
),
losers AS (SELECT doc_id, s, e FROM ranked WHERE n_occ >= 2 AND rn > 1),
pt AS (
  SELECT doc_id, unnest(tc) AS tok,
         unnest(generate_series(0, len(tc) - 1)) AS pos
  FROM toks
),
kept AS (
  SELECT p.* FROM pt p
  WHERE NOT EXISTS (
    SELECT 1 FROM losers l
    WHERE l.doc_id = p.doc_id AND p.pos BETWEEN l.s AND l.e)
),
final AS (
  SELECT doc_id, COUNT(tok) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT tk.doc_id,
       CAST(COALESCE(len(tk.t), 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(len(tk.t), 0) - COALESCE(f.n_kept, 0) AS BIGINT)
         AS n_tokens_removed,
       CASE WHEN COALESCE(f.n_kept, 0) > 0 THEN md5(f.clean_text) END
         AS clean_fp
FROM toks tk LEFT JOIN final f USING (doc_id)
"""


@register("dedup_span_removal", SPAN_REMOVAL_ORACLE)
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable form of the substring tier
    (``operators.dedup.remove_duplicated_spans``): rewrite every document
    with its non-owned duplicated spans removed — exact-content span
    groups keep ONE copy corpus-wide (min-key/min-start owner), spans
    with no exact twin are kept everywhere (removal never destroys
    content that exists nowhere else). Emits per doc the token counts and
    an md5 fingerprint of the cleaned text — which is CASE-PRESERVING
    (detection runs on lowercased tokens, the rebuild re-assembles the
    original-case ones), so the fingerprint check also proves the rewrite
    does not lowercase surviving documents (full text stays
    executor-side; only the fingerprint crosses to the result).

    Scale shape: duplicated_spans' bounded shuffles, plus a spans-count
    groupBy on content hash, an interval anti-join whose build side is
    spans only, and one per-document reassembly aggregation (partitions
    bounded by document length)."""
    d = scan_spread(read_table(spark, sf_dir, "documents"), "doc_id")
    out = remove_duplicated_spans(d, "text", "doc_id", n_shingle=8, min_run=2)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_tokens_removed",
        F.md5("clean_text").alias("clean_fp"),
    )


# --------------------------------------------------------------------------
# sim_pq_recenter_step — one oracle-checked PQ codebook re-centering step
# --------------------------------------------------------------------------

_M_SUB = 4       # subspaces over the dim-64 embeddings
_SUB_DIM = 16    # 64 / 4
_PQ_CODES = 8    # seed codes per subspace

PQ_RECENTER_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
u AS (
  SELECT vec_id,
         CASE WHEN sqrt(list_dot_product(v, v)) > 0
              THEN list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
              ELSE v END AS uv
  FROM e
),
subs AS (
  SELECT vec_id, j AS subspace,
         uv[j * {_SUB_DIM} + 1 : j * {_SUB_DIM} + {_SUB_DIM}] AS x
  FROM u, LATERAL (SELECT unnest(generate_series(0, {_M_SUB} - 1)) AS j)
),
codes AS (
  SELECT subspace, CAST(vec_id AS INTEGER) AS code, x AS c
  FROM subs WHERE vec_id < {_PQ_CODES}
),
sims AS (
  SELECT s.vec_id, s.subspace, cd.code,
         ROUND(list_dot_product(s.x, s.x)
               - 2 * list_dot_product(s.x, cd.c)
               + list_dot_product(cd.c, cd.c), 6) + 0.0 AS d
  FROM subs s JOIN codes cd ON cd.subspace = s.subspace
),
best AS (
  SELECT vec_id, subspace, code FROM (
    SELECT vec_id, subspace, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                              ORDER BY d ASC, code ASC) AS rn
    FROM sims
  ) WHERE rn = 1
),
memb AS (
  SELECT b.subspace, b.code,
         unnest(s.x) AS val,
         unnest(generate_series(0, len(s.x) - 1)) AS dim
  FROM best b JOIN subs s USING (vec_id, subspace)
),
perdim AS (
  SELECT subspace, code, dim,
         CAST(COUNT(*) AS BIGINT) AS n_members, AVG(val) AS mval
  FROM memb GROUP BY subspace, code, dim
),
old AS (
  SELECT subspace, code, unnest(c) AS old_v,
         unnest(generate_series(0, len(c) - 1)) AS dim
  FROM codes
)
SELECT p.subspace, p.code, p.dim, p.n_members,
       ROUND(p.mval, 6) + 0.0 AS new_c,
       ROUND(p.mval - o.old_v, 6) + 0.0 AS shift
FROM perdim p JOIN old o USING (subspace, code, dim)
"""


@register("sim_pq_recenter_step", PQ_RECENTER_ORACLE)
def sim_pq_recenter_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic PQ codebook re-centering step — the
    SQL-expressible core of ``operators/ann_store.py:PqCodebookStore``
    and the product-quantization sibling of ``sim_ivf_recenter_step``:
    unit-normalize, split into 4 subspaces of 16 dims,
    seed codes = the 8 lowest vec_ids' sub-vectors, assign each
    sub-vector by ROUNDED squared distance (6 dp, lowest code on ties —
    argmin via struct-min, no ranking window), and emit per
    (subspace, code, dim) the member count, re-centered component and its
    shift.

    Plan: the codebook frame is broadcast per subspace; the
    (vec × codes) distance rows collapse map-side (partial struct-min per
    (vec, subspace)) before one narrow exchange; the member join touches
    sub-vectors once; the final shuffle is bounded at m × n_codes × sub
    groups."""
    from airflow_dags_spark.functions.vectors import as_double, dot

    emb = read_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    v = F.col("v")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    unit = F.when(norm > 0, F.transform(v, lambda x: x / norm)).otherwise(v)
    base = emb.select("vec_id", as_double("embedding").alias("v")).select(
        "vec_id", unit.alias("u")
    )
    subs = base.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice("u", j * _SUB_DIM + 1, _SUB_DIM)
                    for j in range(_M_SUB)
                ]
            )
        ).alias("subspace", "x"),
    )
    # squared norms staged once per sub-vector row — the inline form
    # recomputed dot(x,x) per CODE (32×) and dot(c,c) per probe row;
    # identical doubles, same (xx - 2·xc) + cc association (guide §2.3)
    subs = subs.withColumn("xx", dot(F.col("x"), F.col("x")))
    codes = subs.where(F.col("vec_id") < _PQ_CODES).select(
        "subspace",
        F.col("vec_id").cast("int").alias("code"),
        F.col("x").alias("c"),
        F.col("xx").alias("cc"),
    )
    d = (
        F.round(
            F.col("xx")
            - F.lit(2.0) * dot(F.col("x"), F.col("c"))
            + F.col("cc"),
            6,
        )
        + F.lit(0.0)
    )
    sims = subs.join(F.broadcast(codes), "subspace").select(
        "vec_id", "subspace", "code", d.alias("d")
    )
    best = (
        sims.groupBy("vec_id", "subspace")
        .agg(
            F.min(
                F.struct(F.col("d").alias("d"), F.col("code").alias("code"))
            ).alias("b")
        )
        .select("vec_id", "subspace", F.col("b.code").alias("code"))
    )
    memb = subs.join(best, ["vec_id", "subspace"]).select(
        "subspace", "code", F.posexplode("x").alias("dim", "val")
    )
    perdim = memb.groupBy("subspace", "code", "dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.avg("val").alias("mval"),
    )
    old = codes.select(
        "subspace", "code", F.posexplode("c").alias("dim", "old_v")
    )
    return perdim.join(F.broadcast(old), ["subspace", "code", "dim"]).select(
        "subspace",
        "code",
        "dim",
        "n_members",
        (F.round(F.col("mval"), 6) + F.lit(0.0)).alias("new_c"),
        (F.round(F.col("mval") - F.col("old_v"), 6) + F.lit(0.0)).alias("shift"),
    )


__all__ = [
    "dedup_substring_spans",
    "dedup_advisory_reconcile",
    "dedup_span_removal",
    "sim_pq_recenter_step",
]
