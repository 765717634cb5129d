"""Verification for the rows-only (non-oracle-able) operators: approximate
methods are checked against their exact counterparts (recall), stubbed
multimodal stages against deterministic expectations. This is the pytest
side of the 'seeded-ML variants register rows-only' contract in plans/llm.py."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from airflow_dags_spark.operators.dedup import (
    minhash_candidate_pairs,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash,
)
from airflow_dags_spark.operators.multimodal import (
    attach_payload_metadata,
    decode_payload,
    extract_features,
    fake_decoder,
    resize_decoded,
    sample_frames,
)
from airflow_dags_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup,
    ivf_ann_topk,
    lsh_ann_topk,
    pq_ann_topk,
)
from airflow_dags_spark.sources.tables import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF_DIR, "embeddings").cache()


def topk_map(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["qid"], []).append(r["cid"])
    return out


def test_ivf_recall_vs_brute_force(emb):
    exact = topk_map(brute_force_topk(emb, 10, query_filter=F.col("vec_id") < 5))
    approx = topk_map(
        ivf_ann_topk(emb, 10, query_filter=F.col("vec_id") < 5, n_cells=8, nprobe=4)
    )
    recalls = [
        len(set(exact[q]) & set(approx.get(q, []))) / len(exact[q]) for q in exact
    ]
    assert len(recalls) == 5
    assert sum(recalls) / len(recalls) >= 0.5  # nprobe/n_cells = 1/2 of corpus


def test_ivf_probing_all_cells_is_exact(emb):
    """nprobe = n_cells degenerates to brute force — recall must be 1.0."""
    exact = topk_map(brute_force_topk(emb, 5, query_filter=F.col("vec_id") < 3))
    full = topk_map(
        ivf_ann_topk(emb, 5, query_filter=F.col("vec_id") < 3, n_cells=4, nprobe=4)
    )
    assert full == exact


def test_lsh_ann_recall_vs_brute_force(emb):
    exact = topk_map(brute_force_topk(emb, 10, query_filter=F.col("vec_id") < 5))
    approx = topk_map(lsh_ann_topk(emb, 10, query_filter=F.col("vec_id") < 5))
    recalls = [
        len(set(exact[q]) & set(approx.get(q, []))) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.5


def test_embedding_near_dup_symmetric_bound(emb):
    pairs = embedding_near_dup(emb, 0.15, scope_filter=F.col("vec_id") < 50)
    rows = pairs.collect()
    for r in rows:
        assert r["key_a"] < r["key_b"]
        assert r["sim"] >= 0.15
    # every vector is a near-dup of itself at threshold 1.0 → self-pairs are
    # excluded by a<b, so threshold 1.01 yields nothing
    assert embedding_near_dup(emb, 1.01, scope_filter=F.col("vec_id") < 50).count() == 0


def test_pq_recall_vs_brute_force(emb):
    """PQ codes + ADC scan with exact re-rank: recall@10 against brute
    force must clear the bar; pure-PQ (no refine) is strictly coarser."""
    qf = F.col("vec_id") < 5
    exact = topk_map(brute_force_topk(emb, 10, query_filter=qf))
    refined = topk_map(
        pq_ann_topk(emb, 10, query_filter=qf, m=8, n_codes=32, refine=50)
    )
    recalls = [
        len(set(exact[q]) & set(refined.get(q, []))) / len(exact[q]) for q in exact
    ]
    assert len(recalls) == 5
    assert sum(recalls) / len(recalls) >= 0.6


def test_pq_refine_full_corpus_is_exact(emb):
    """refine = corpus size degenerates to brute force: PQ only selects
    candidates, the exact re-rank does the ranking — must match exactly."""
    qf = F.col("vec_id") < 3
    n = emb.count()
    exact = topk_map(brute_force_topk(emb, 5, query_filter=qf))
    full = topk_map(
        pq_ann_topk(emb, 5, query_filter=qf, m=8, n_codes=32, refine=n)
    )
    assert full == exact


def test_pq_small_refine_still_reranks_exactly(emb):
    """refine ≤ k must still trigger the exact re-rank (regression: it was
    silently ignored): the returned sims are exact cosines, not ADC
    approximations — identical values to brute force for shared cids."""
    qf = F.col("vec_id") < 3
    exact = {
        (r["qid"], r["cid"]): r["sim"]
        for r in brute_force_topk(emb, 50, query_filter=qf).collect()
    }
    got = pq_ann_topk(emb, 5, query_filter=qf, refine=1).collect()
    assert len({r["qid"] for r in got}) == 3
    for r in got:
        assert r["sim"] == pytest.approx(exact[(r["qid"], r["cid"])], abs=1e-6)


def test_pq_deterministic(emb):
    qf = F.col("vec_id") < 3
    a = sorted(map(tuple, pq_ann_topk(emb, 5, query_filter=qf).collect()))
    b = sorted(map(tuple, pq_ann_topk(emb, 5, query_filter=qf).collect()))
    assert a == b


def test_pq_indivisible_dim_raises(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_ann_topk(emb, 5, query_filter=F.col("vec_id") < 2, m=7)


def test_embedding_near_dup_unbounded_raises(emb):
    """No scope = O(n²) all-pairs over the corpus — must be loud, not
    silent: raises unless the caller owns it with allow_full_scan."""
    with pytest.raises(ValueError, match="all-pairs"):
        embedding_near_dup(emb, 0.5)
    # explicit opt-in still works (known-small inputs)
    small = emb.where(F.col("vec_id") < 20)
    n = embedding_near_dup(small, -1.1, allow_full_scan=True).count()
    assert n == 20 * 19 // 2  # every a<b pair at an always-true threshold


def test_lsh_max_distance_prunes_candidates(emb):
    """max_distance is a post-bucket recall/cost dial: a tighter radius
    returns a subset of the wide-radius candidates, and d=2.0 (the whole
    unit sphere) keeps every bucket collision."""
    qf = F.col("vec_id") < 5
    wide = topk_map(lsh_ann_topk(emb, 10, query_filter=qf, max_distance=2.0))
    mid = topk_map(lsh_ann_topk(emb, 10, query_filter=qf, max_distance=1.0))
    tight = topk_map(lsh_ann_topk(emb, 10, query_filter=qf, max_distance=0.05))
    for q in wide:
        # pruning only removes candidates: each tighter list ⊆ the wider one
        assert set(mid.get(q, [])) <= set(wide[q])
        assert set(tight.get(q, [])) <= set(mid.get(q, []))
    # d=1.0 ⇔ cosine ≥ 0.5 — on random-ish embeddings that prunes hard
    n_wide = sum(len(v) for v in wide.values())
    n_tight = sum(len(v) for v in tight.values())
    assert n_tight <= n_wide
    # self-match survives any radius: distance 0 to itself
    for q in wide:
        assert q in tight.get(q, []) or q in mid.get(q, []) or q in wide[q]


def test_minhash_lsh_pairs_find_known_duplicates(spark):
    """Exact duplicates share every shingle → Jaccard 1.0; LSH at 0.5 must
    surface them, and the exact ngram_jaccard verify must score them 1.0."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "an entirely different document about spark query engines"),
        (4, "an entirely different document about spark query engines today"),
        (5, "unrelated short text"),
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["key_a"], r["key_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(d, "text", "doc_id", jaccard_threshold=0.3).collect()
    }
    assert (1, 2) in got
    assert got[(1, 2)] == pytest.approx(1.0)

    cands = minhash_candidate_pairs(d, "text", "doc_id")
    cand_pairs = {(r["key_a"], r["key_b"]) for r in cands.collect()}
    assert (1, 2) in cand_pairs
    joined = cands.join(d.selectExpr("doc_id key_a", "text text_a"), "key_a").join(
        d.selectExpr("doc_id key_b", "text text_b"), "key_b"
    )
    verified = {
        (r["key_a"], r["key_b"]): r["jaccard"]
        for r in ngram_jaccard(joined, "text_a", "text_b").collect()
    }
    assert verified[(1, 2)] == pytest.approx(1.0)


def test_simhash_near_dup_hamming(spark):
    """Near-identical docs → small Hamming distance; unrelated → large."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river banks"),
        (3, "completely unrelated text about distributed columnar execution"),
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    fp = {r["doc_id"]: r["simhash"] for r in simhash(d, "text", "doc_id").collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(fp[1], fp[2]) < ham(fp[1], fp[3])
    assert ham(fp[1], fp[2]) <= 12


def test_simhash_batch_matches_scalar_reference():
    """The numpy-vectorized batch path must agree BIT-FOR-BIT with the
    scalar reference on every edge: nulls, empty/whitespace-only text,
    mixed case, repeated tokens, unicode, multi-chunk batches."""
    import random
    import string

    import pandas as pd

    from airflow_dags_spark.operators.dedup import (
        _SIMHASH_CHUNK_TOKENS,
        _simhash_batch,
        _simhash_one,
    )

    rng = random.Random(7)
    vocab = [
        "".join(rng.choices(string.ascii_lowercase, k=rng.randint(1, 12)))
        for _ in range(300)
    ] + ["naïve", "héllo", "日本語", "a-b.c"]
    texts = [None, "", "   \t  ", "Hello WORLD hello", "x"] + [
        " ".join(rng.choices(vocab, k=rng.randint(0, 60))) for _ in range(200)
    ]
    got = list(_simhash_batch(pd.Series(texts, dtype=object)))
    assert got == [_simhash_one(t) for t in texts]

    # a single doc larger than the chunk bound exercises the oversized-doc
    # branch of the chunker
    big = " ".join(rng.choices(vocab, k=_SIMHASH_CHUNK_TOKENS + 5))
    got2 = list(_simhash_batch(pd.Series([big, "tiny"], dtype=object)))
    assert got2 == [_simhash_one(big), _simhash_one("tiny")]


# --- multimodal plumbing ------------------------------------------------------


@pytest.fixture()
def mm(spark):
    rows = [
        (1, "image", bytearray(b"payload-one"), "image/fake", None),
        (2, "image", bytearray(b"payload-two-longer"), "image/fake", None),
        (3, "image", None, None, None),  # null payload must flow through
    ]
    return spark.createDataFrame(
        rows, "item_id bigint, modality string, payload binary, mime string, n_bytes bigint"
    )


def test_decode_requires_injected_decoder(mm):
    with pytest.raises(NotImplementedError):
        decode_payload(mm)  # no codecs in container — stub contract


def test_decode_and_resize_shapes(mm, spark):
    decoded = decode_payload(mm, fake_decoder)
    rows = {r["item_id"]: r for r in decoded.collect()}
    assert (rows[1]["height"], rows[1]["width"], rows[1]["channels"]) == (8, 8, 3)
    assert len(rows[1]["decoded"]) == 8 * 8 * 3
    assert rows[3]["decoded"] is None
    # decode is deterministic: same payload → same bytes
    again = {r["item_id"]: r for r in decode_payload(mm, fake_decoder).collect()}
    assert bytes(again[1]["decoded"]) == bytes(rows[1]["decoded"])

    small = {r["item_id"]: r for r in resize_decoded(decoded, 4, 4).collect()}
    assert len(small[1]["decoded"]) == 4 * 4 * 3
    # nearest-neighbor: resized pixel (0,0) == original pixel (0,0)
    orig = np.frombuffer(bytes(rows[1]["decoded"]), dtype=np.uint8).reshape(8, 8, 3)
    res = np.frombuffer(bytes(small[1]["decoded"]), dtype=np.uint8).reshape(4, 4, 3)
    assert (res[0, 0] == orig[0, 0]).all()


def test_extract_features_deterministic_and_typed(mm):
    feats = {r["item_id"]: r["feature"] for r in extract_features(mm, dim=16).collect()}
    assert feats[3] is None
    assert len(feats[1]) == 16
    assert all(0.0 <= x <= 1.0 for x in feats[1])
    expected_seed = hashlib.md5(b"payload-one").digest()
    raw = (expected_seed * 5)[:64]
    vec = np.frombuffer(raw, dtype=np.uint8).astype(np.float32).reshape(16, 4)
    assert feats[1][0] == pytest.approx(float(vec.mean(axis=1)[0] / 255.0))


def test_sample_frames_fanout(mm):
    frames = sample_frames(mm, 4).collect()
    by_item = {}
    for r in frames:
        by_item.setdefault(r["item_id"], []).append(r)
    assert len(by_item[1]) == 4  # 11 bytes → 4 windows of step 2
    assert sorted(r["frame_index"] for r in by_item[2]) == [0, 1, 2, 3]
    assert 3 not in by_item  # null payload emits no frames
    whole = b"".join(bytes(r["frame"]) for r in sorted(by_item[2], key=lambda r: r["frame_index"]))
    assert b"payload-two-longer".startswith(whole[:4])


def test_attach_payload_metadata_jvm_side(mm):
    got = {r["item_id"]: r for r in attach_payload_metadata(mm).collect()}
    assert got[1]["n_bytes"] == len(b"payload-one")
    assert got[1]["payload_hash"] == hashlib.md5(b"payload-one").hexdigest()
    assert got[3]["n_bytes"] is None


def test_cosine_topk_salted_row_identical_to_window_form(emb):
    """The salted rank rewrite must be a pure plan change: row-identical
    output (same rounded sims, same tie resolution) for a wide query set
    where ties and cutoff boundaries actually occur."""
    from pyspark.sql import functions as F2

    from airflow_dags_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_salted,
    )

    corpus = emb.select(F2.col("vec_id").alias("cid"), F2.col("embedding").alias("cv"))
    queries = emb.where(F2.col("vec_id") < 50).select(
        F2.col("vec_id").alias("qid"), F2.col("embedding").alias("qv")
    )
    plain = cosine_topk(queries, corpus, 10)
    salted = cosine_topk_salted(queries, corpus, 10, n_salts=7)
    key = lambda r: (r["qid"], r["cid"], r["sim"])
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))


def test_cosine_topk_salted_no_per_query_full_sort(emb):
    """The whole point: no window may partition by qid ALONE before the
    survivor stage — phase 1 must carry the salt in its partition key."""
    from pyspark.sql import functions as F2

    from airflow_dags_spark.operators.similarity import cosine_topk_salted

    corpus = emb.select(F2.col("vec_id").alias("cid"), F2.col("embedding").alias("cv"))
    queries = emb.where(F2.col("vec_id") < 5).select(
        F2.col("vec_id").alias("qid"), F2.col("embedding").alias("qv")
    )
    df = cosine_topk_salted(queries, corpus, 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    # two window nodes: (qid, salt) local top-k, then the survivor re-rank
    assert plan.count("Window [") == 2


def test_candidate_pairs_bucket_cap_bounds_pairs_keeps_witnesses(spark):
    """bucket_cap restricts each bucket's self-join LEFT side to the cap
    smallest keys: a near-dup cluster of width n emits ≤ cap·n pairs
    (linear) instead of C(n, 2), every non-representative doc still gets
    its witness pair (some smaller key), and capped output is a SUBSET of
    the exact pair set with identical semantics for cap >= cluster width."""
    base = ("the quick brown fox jumps over the lazy dog and keeps on "
            "running through the quiet english countryside all day")
    # one 20-wide near-identical cluster + two unrelated docs
    rows = [(i, f"{base} variant {i}") for i in range(20)]
    rows += [(100, "completely different text about query engine internals here"),
             (101, "another unrelated document on streaming state stores today")]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")

    exact = {(r["key_a"], r["key_b"])
             for r in minhash_candidate_pairs(d, "text", "doc_id").collect()}
    capped = {(r["key_a"], r["key_b"])
              for r in minhash_candidate_pairs(
                  d, "text", "doc_id", bucket_cap=2).collect()}
    assert capped <= exact
    # linear bound: left side is ≤2 reps per bucket (4 bands)
    assert len(capped) <= 2 * 4 * 22
    assert len(capped) < len(exact)
    # every cluster member except the global min still has a witness
    losers_with_witness = {b for _a, b in capped}
    assert set(range(1, 20)) <= losers_with_witness
    # cap wider than every bucket degenerates to the exact pair set
    wide = {(r["key_a"], r["key_b"])
            for r in minhash_candidate_pairs(
                d, "text", "doc_id", bucket_cap=50).collect()}
    assert wide == exact
