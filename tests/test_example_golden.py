"""Golden test for the customer example — the reference's documented
end-to-end outputs (``reference example/README.md`` "Viewing results"):
**5 fact rows, 11 DQ rows**, with the exact issue set below.

John Connor's blood group is pinned to ``O-`` (first of his two lookup
rows): the reference's lookup is first-occurrence-wins
(``sqltask/base/lookup_source.py:28-31``); the README's ``A-`` predates
that code. See the divergence note in ``examples/customer.py``.
"""

from __future__ import annotations

import datetime as dt

from sqltask_spark.examples.customer import REPORT_DATE, run_example

GOLDEN_FACTS = {
    # customer_name: (birthdate, age, blood_group)
    "Sarah Connor": (dt.date(1956, 9, 26), 62, "A+"),
    "John Connor": (None, None, "O-"),
    "Peter Impossible": (None, None, None),
    "Mary Null": (None, None, None),
    "Terminator": (None, None, None),
}

GOLDEN_DQ = {
    # (customer_name, source, priority, category, column_name, message)
    ("Terminator", "source", "high", "incorrect", "blood_group",
     "Invalid blood group: Liquid Metal"),
    ("Terminator", "transform", "medium", "missing", "age",
     "Age is undefined due to undefined birthdate"),
    ("Terminator", "source", "high", "incorrect", "birthdate",
     "Birthdate in future: 2095-01-01"),
    ("Peter Impossible", "source", "high", "incorrect", "blood_group",
     "Invalid blood group: X+"),
    ("Peter Impossible", "transform", "medium", "missing", "age",
     "Age is undefined due to undefined birthdate"),
    ("Peter Impossible", "source", "high", "incorrect", "birthdate",
     "Cannot parse birthdate: 1980-13-01"),
    ("Mary Null", "source", "medium", "missing", "blood_group",
     "Blood group undefined in customer blood group table"),
    ("Mary Null", "transform", "medium", "missing", "age",
     "Age is undefined due to undefined birthdate"),
    ("Mary Null", "source", "medium", "missing", "birthdate",
     "Missing birthdate"),
    ("John Connor", "transform", "medium", "missing", "age",
     "Age is undefined due to undefined birthdate"),
    ("John Connor", "source", "high", "incorrect", "birthdate",
     "Birthdate in future: 2080-01-01"),
}


def test_customer_example_goldens(spark, tmp_path):
    paths = run_example(spark, str(tmp_path))

    fact = spark.read.parquet(paths["fact_customer"])
    rows = fact.collect()
    assert len(rows) == 5  # README golden: 5 fact rows
    assert set(fact.columns) == {
        "report_date", "etl_timestamp", "customer_name", "birthdate",
        "age", "blood_group",
    }
    got = {
        r["customer_name"]: (r["birthdate"], r["age"], r["blood_group"])
        for r in rows
    }
    assert got == GOLDEN_FACTS
    assert all(r["report_date"] == REPORT_DATE for r in rows)
    assert all(r["etl_timestamp"] is not None for r in rows)

    dq = spark.read.parquet(paths["fact_customer_dq"])
    dq_rows = dq.collect()
    assert len(dq_rows) == 11  # README golden: 11 DQ rows
    got_dq = {
        (r["customer_name"], r["source"], r["priority"], r["category"],
         r["column_name"], r["message"])
        for r in dq_rows
    }
    assert got_dq == GOLDEN_DQ
    assert all(r["report_date"] == REPORT_DATE for r in dq_rows)


def test_customer_example_rerun_idempotent(spark, tmp_path):
    # re-running the same batch must not duplicate rows (batch-scoped
    # overwrite parity with the reference's DELETE+INSERT)
    run_example(spark, str(tmp_path))
    paths = run_example(spark, str(tmp_path))
    assert spark.read.parquet(paths["fact_customer"]).count() == 5
    assert spark.read.parquet(paths["fact_customer_dq"]).count() == 11
