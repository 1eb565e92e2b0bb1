"""Corpus-cleaning example task — the reference's task lifecycle
driving the training-data operators.

The customer example (``examples/customer.py``) proves parity with
``reference example/run_example.py``; this example proves the same
lifecycle surface (declared ``TableContext`` schema, in-memory row
source, vectorized DQ side-channel, batch-idempotent overwrite,
validate-before-write) composes with the corpus operators — quality
scoring, language id, fingerprint dedup — that the reference never
had. A user of the reference keeps their mental model (add_table /
add_row_source / transform / log DQ / execute) and gains the
LLM-pipeline toolbox.

Rules applied to a deliberately dirty static corpus:

- empty document            → DQ INCORRECT/HIGH  (kept, flagged)
- short document (<40 ch)   → DQ MISSING/MEDIUM  (kept, flagged)
- low quality (<0.45)       → DQ INCORRECT/MEDIUM (kept, flagged)
- exact duplicates          → first-wins collapse; the SURVIVOR is
  flagged DUPLICATE/MEDIUM with the collapsed copy count (dropped
  rows are never written, so their issues ride the survivor — same
  single-write discipline as the reference's shadow table)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqltask_spark.dq import Category, Priority, Source, dq_issue, with_dq
from sqltask_spark.operators import text as tx
from sqltask_spark.sources.memory import list_source
from sqltask_spark.table import TableContext, column
from sqltask_spark.task import SparkTask

#: static corpus with planted problems (ids are stable goldens)
RAW_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog and runs far away"),
    (2, "a completely ordinary document describing spark query engines"),
    (3, "the quick brown fox jumps over the lazy dog and runs far away"),
    (4, "short text"),
    (5, ""),
    (6, "spam spam spam spam spam spam spam spam spam spam spam spam"),
    (7, "another normal piece of text with enough distinct words inside"),
    (8, "the quick brown fox jumps over the lazy dog and runs far away"),
]

_MIN_CHARS = 40
_MIN_QUALITY = 0.45


class CorpusCleaningTask(SparkTask):
    """Clean a document batch into ``clean_documents`` (+ DQ shadow)."""

    min_row_count = 1

    def __init__(
        self, spark: SparkSession, base_dir: str, batch_id: str = "b0"
    ) -> None:
        super().__init__(spark, batch_id=batch_id)
        self.add_table(
            TableContext(
                name="clean_documents",
                schema=T.StructType(
                    [
                        column("batch_id", T.StringType(), primary_key=True,
                               comment="Ingest batch (idempotent re-run key)"),
                        column("doc_id", T.LongType(), primary_key=True,
                               comment="Document id"),
                        column("etl_timestamp", T.TimestampType(),
                               nullable=False,
                               comment="Timestamp when row was created"),
                        column("text", T.StringType(),
                               comment="Raw document text"),
                        column("quality", T.DoubleType(),
                               comment="Heuristic quality score [0, 1]"),
                        column("lang", T.StringType(),
                               comment="n-gram language id"),
                        column("n_copies", T.IntegerType(),
                               comment="Exact copies collapsed into this row"),
                        column("fingerprint", T.StringType(),
                               comment="md5 of normalized text (dedup key)"),
                    ]
                ),
                batch_params={"batch_id": batch_id},
                timestamp_column_name="etl_timestamp",
                path=os.path.join(base_dir, "clean_documents"),
                comment="Cleaned, deduplicated document batch",
            )
        )
        self.add_row_source(
            "raw_docs", list_source(spark, ["doc_id", "text"], RAW_DOCS)
        )

    def transform(self) -> None:
        df = self.get_row_source("raw_docs")
        t = F.col("text")
        df = df.withColumn("quality", F.round(tx.quality_score(t), 9))
        df = df.withColumn("lang", tx.lang_id(t))
        df = df.withColumn("fingerprint", tx.fingerprint_md5(t))
        # first-wins collapse of exact duplicates; survivors carry the
        # copy count so the DUPLICATE rule can flag them
        w = Window.partitionBy("fingerprint")
        df = df.withColumn(
            "n_copies", F.count(F.lit(1)).over(w).cast("int")
        ).withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("fingerprint").orderBy("doc_id")
            ),
        ).filter(F.col("rn") == 1).drop("rn")

        empty = t.isNull() | (F.trim(t) == "")
        short = ~empty & (F.length(t) < _MIN_CHARS)
        low_q = ~empty & (F.col("quality") < _MIN_QUALITY)
        issues = [
            dq_issue(
                empty,
                "text", Category.INCORRECT, Priority.HIGH, Source.SOURCE,
                "Empty document",
            ),
            dq_issue(
                short,
                "text", Category.MISSING, Priority.MEDIUM, Source.SOURCE,
                F.concat(F.lit("Document shorter than "),
                         F.lit(str(_MIN_CHARS)), F.lit(" chars")),
            ),
            dq_issue(
                low_q,
                "quality", Category.INCORRECT, Priority.MEDIUM,
                Source.TRANSFORM,
                F.concat(F.lit("Quality below floor: "),
                         F.col("quality").cast("string")),
            ),
            dq_issue(
                F.col("n_copies") > 1,
                "fingerprint", Category.DUPLICATE, Priority.MEDIUM,
                Source.SOURCE,
                F.concat(F.col("n_copies").cast("string"),
                         F.lit(" exact copies collapsed")),
            ),
        ]
        self.set_output("clean_documents", with_dq(df, issues))


def run_corpus_example(
    spark: SparkSession, base_dir: str, batch_id: str = "b0"
) -> dict[str, str]:
    """Run the corpus-cleaning pipeline; returns output table paths."""
    CorpusCleaningTask(spark, base_dir, batch_id).execute()
    return {
        "clean_documents": os.path.join(base_dir, "clean_documents"),
        "clean_documents_dq": os.path.join(base_dir, "clean_documents_dq"),
    }
