"""Round-12 operators: substring-grain dedup (duplicated_spans) semantics
against hand-built corpora — cross-document requirement, run assembly,
min_run threshold, short/null-doc guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_dags_spark.operators.dedup import duplicated_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _spans(df, **kw):
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_shingles)
        for r in duplicated_spans(df, "text", "doc_id", **kw).collect()
    )


def test_shared_span_recovered_in_both_docs(spark):
    """A 6-token boilerplate block shared by two otherwise-unique docs is
    recovered as one maximal span per doc, at the right token offsets."""
    boiler = "all rights reserved contact us today"
    d = _docs(
        spark,
        [
            (1, f"alpha beta gamma {boiler} delta epsilon"),
            (2, f"one two three four five six {boiler}"),
        ],
    )
    # n=3, min_run=1: the shared 6 tokens give 4 consecutive 3-shingles
    got = _spans(d, n_shingle=3, min_run=1)
    # doc 1: boiler at tokens 3..8 -> shingle positions 3..6
    # doc 2: boiler at tokens 6..11 -> shingle positions 6..9
    assert got == [(1, 3, 8, 4), (2, 6, 11, 4)]


def test_within_doc_repeat_is_not_cross_document(spark):
    """A phrase repeated twice inside ONE doc (and nowhere else) is not a
    duplicated span — the contract is cross-document (count of DISTINCT
    docs per shingle >= 2)."""
    d = _docs(
        spark,
        [
            (1, "red green blue red green blue"),
            (2, "totally different words here entirely"),
        ],
    )
    assert _spans(d, n_shingle=3, min_run=1) == []


def test_min_run_threshold_filters_short_runs(spark):
    boiler = "all rights reserved contact"  # 4 tokens -> 2 shingles at n=3
    d = _docs(
        spark,
        [(1, f"aa bb cc {boiler} dd"), (2, f"xx yy {boiler} zz ww")],
    )
    assert len(_spans(d, n_shingle=3, min_run=2)) == 2
    assert _spans(d, n_shingle=3, min_run=3) == []


def test_two_disjoint_runs_stay_separate_spans(spark):
    b1 = "first shared boilerplate block"
    b2 = "second common footer text"
    d = _docs(
        spark,
        [
            (1, f"{b1} unique middle words go here {b2}"),
            (2, f"{b2} other filler tokens between {b1}"),
        ],
    )
    got = _spans(d, n_shingle=3, min_run=2)
    assert [g for g in got if g[0] == 1] == [(1, 0, 3, 2), (1, 9, 12, 2)]
    # doc 2: 4 boiler + 4 filler tokens -> b1 starts at token 8
    assert [g for g in got if g[0] == 2] == [(2, 0, 3, 2), (2, 8, 11, 2)]


def test_short_and_null_docs_are_skipped(spark):
    d = _docs(
        spark,
        [(1, "too short"), (2, None), (3, "also quite short text"),
         (4, "shared run of exactly eight tokens here yes"),
         (5, "shared run of exactly eight tokens here yes")],
    )
    got = _spans(d, n_shingle=8, min_run=1)
    assert got == [(4, 0, 7, 1), (5, 0, 7, 1)]


def test_identical_docs_span_everything(spark):
    text = "ten tokens of fully duplicated content appear in this document"
    d = _docs(spark, [(1, text), (2, text)])
    n_tok = len(text.split())
    got = _spans(d, n_shingle=8, min_run=1)
    assert got == [
        (1, 0, n_tok - 1, n_tok - 7),
        (2, 0, n_tok - 1, n_tok - 7),
    ]


def test_invalid_params_raise(spark):
    d = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        duplicated_spans(d, "text", "doc_id", n_shingle=0)
    with pytest.raises(ValueError):
        duplicated_spans(d, "text", "doc_id", min_run=0)
