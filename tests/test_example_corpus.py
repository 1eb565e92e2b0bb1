"""Golden test for the corpus-cleaning example — the task lifecycle
(declared schema, DQ shadow table, batch-idempotent overwrite)
driving the corpus operators on a deliberately dirty static corpus.
See ``examples/corpus.py`` for the rule set."""

from __future__ import annotations

from sqltask_spark.examples.corpus import run_corpus_example

GOLDEN_DQ = {
    # (doc_id, source, priority, category, column_name)
    (1, "source", "medium", "duplicate", "fingerprint"),
    (4, "source", "medium", "missing", "text"),
    (5, "source", "high", "incorrect", "text"),
    (6, "transform", "medium", "incorrect", "quality"),
}


def test_corpus_example_goldens(spark, tmp_path):
    paths = run_corpus_example(spark, str(tmp_path))

    fact = spark.read.parquet(paths["clean_documents"])
    rows = {r["doc_id"]: r for r in fact.collect()}
    # 8 raw docs, 3 exact copies (1, 3, 8) collapse into doc 1
    assert sorted(rows) == [1, 2, 4, 5, 6, 7]
    assert rows[1]["n_copies"] == 3
    assert rows[2]["n_copies"] == 1
    assert all(r["batch_id"] == "b0" for r in rows.values())
    assert all(r["etl_timestamp"] is not None for r in rows.values())

    dq = spark.read.parquet(paths["clean_documents_dq"])
    got = {
        (r["doc_id"], r["source"], r["priority"], r["category"],
         r["column_name"])
        for r in dq.collect()
    }
    assert got == GOLDEN_DQ
    msgs = {r["doc_id"]: r["message"] for r in dq.collect()}
    assert msgs[1] == "3 exact copies collapsed"

    # batch idempotency: re-running the same batch must not duplicate
    run_corpus_example(spark, str(tmp_path))
    assert spark.read.parquet(paths["clean_documents"]).count() == 6
    assert spark.read.parquet(paths["clean_documents_dq"]).count() == 4
