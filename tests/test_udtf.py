"""Python-UDTF surface: the lateral sentence splitter must agree with the
pure-python reference on the real documents table."""

from __future__ import annotations

from airflow_dags_spark.functions.udtf import split_sentences
from airflow_dags_spark.plans import registry
from airflow_dags_spark.sources.tables import read_table

registry.load_all()

SF_DIR = "/root/testdata/sf0.001"


def test_split_sentences_reference():
    assert split_sentences("One. Two!  Three?") == [(0, "One."), (1, "Two!"), (2, "Three?")]
    assert split_sentences("No terminal") == [(0, "No terminal")]
    assert split_sentences(None) == []
    assert split_sentences("   ") == []


def test_udtf_matches_reference_on_documents(spark):
    got = {}
    for r in registry.QUERIES["text_sentence_split_udtf"](spark, SF_DIR).collect():
        got.setdefault(r["doc_id"], []).append((r["sentence_no"], r["sentence"], r["n_chars"]))
    docs = {r["doc_id"]: r["text"] for r in read_table(spark, SF_DIR, "documents").collect()}
    assert set(got) <= set(docs)
    for doc_id, text in docs.items():
        expected = [(i, s, len(s)) for i, s in split_sentences(text)]
        assert sorted(got.get(doc_id, [])) == expected, doc_id
