"""User-defined function surface: UDTF + grouped-UDAF examples.

The reference has no UDAF/UDTF machinery — its UDF surface is
"arbitrary Python per row" inside ``transform()`` (SURVEY.md §2.8,
``reference README.md:18-19``). Spark gives three typed extension
points, each demonstrated in this package or the query catalog:

- scalar vectorized: ``pandas_udf`` (LSH signatures,
  :mod:`sqltask_spark.operators.similarity`);
- grouped aggregate: ``applyInPandas``
  (exact median, :func:`sqltask_spark.queries.events.user_value_median`);
- table function: :class:`ParseKeyValues` below (``@udtf`` — one input
  row → many output rows, lateral-joinable).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="key: string, value: string")
class ParseKeyValues:
    """UDTF: explode a ``k=v;k2=v2`` string into (key, value) rows.

    Usage::

        from pyspark.sql.functions import lit
        parse_kv = ParseKeyValues  # registered via @udtf
        spark.udtf.register("parse_kv", parse_kv)
        spark.sql("SELECT s.id, kv.* FROM src s, "
                  "LATERAL parse_kv(s.attrs) kv")

    Malformed segments (no ``=``) are skipped, not errors — ETL
    inputs are dirty by assumption (the reference logs DQ issues for
    them rather than failing the load).
    """

    def eval(self, attrs: str):  # noqa: D102 — UDTF contract
        if not attrs:
            return
        for segment in attrs.split(";"):
            segment = segment.strip()
            if not segment or "=" not in segment:
                continue
            key, _, value = segment.partition("=")
            if not key.strip():
                continue  # '=x' has no key — junk, skip like no-'='
            yield (key.strip(), value.strip())
