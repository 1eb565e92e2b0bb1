#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf dir, then compares row count, column names,
and an order-insensitive value hash (rows sorted, columns sorted by
name, values stringified with stable float formatting).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
       python scripts/check_oracle.py sf_dir -x q1 -x q2   # run all BUT

Per-entry wall seconds print with each verdict (flush immediately, so
a piped log shows live progress and a killed run keeps its prefix).
"""

from __future__ import annotations

import hashlib
import math
import sys
from datetime import date, datetime

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from sqltask_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def result_hash(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(_norm_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def _spark_canon_problems(sdf):
    """Driver-canonicalizer emulation for ORACLE-LESS entries: the
    driver still converts the Spark result to pandas and sorts every
    column, so an unsortable cell type (list/dict columns) crashes its
    gate even when no oracle comparison runs."""
    problems = []
    try:
        pdf = sdf.toPandas()
        canon = pdf.reindex(sorted(pdf.columns), axis=1)
        try:
            canon.sort_values(by=list(canon.columns))
        except TypeError as e:
            problems.append(f"spark pandas-canon unsortable: {e}")
    except Exception as e:
        problems.append(f"pandas-canon error: {str(e)[:200]}")
    return problems


def _driver_emulation_problems(con, oracle_sql, sdf):
    """Emulate the driver's pandas canonicalizer, which differs from the
    fetchall path above in two known ways: DuckDB ``fetchdf`` renders
    HUGEINT (e.g. integer SUM) as float64 ("123.0" vs Spark's "123"),
    and ``sort_values`` raises TypeError on unhashable cells (list
    columns). Returns a list of problem strings (empty = clean)."""
    problems = []
    try:
        pdf_o = con.execute(oracle_sql).fetchdf()
        pdf_s = sdf.toPandas()
        for frame, side in ((pdf_o, "duckdb"), (pdf_s, "spark")):
            canon = frame.reindex(sorted(frame.columns), axis=1)
            try:
                canon = canon.sort_values(by=list(canon.columns))
            except TypeError as e:
                problems.append(f"{side} pandas-canon unsortable: {e}")
                continue
            frame_str = canon.reset_index(drop=True).astype(str)
            if side == "duckdb":
                o_str = frame_str
            else:
                s_str = frame_str
        if not problems and not o_str.equals(s_str):
            diff_cols = [
                c for c in o_str.columns if not o_str[c].equals(s_str[c])
            ]
            problems.append(
                f"pandas-canon string mismatch in columns {diff_cols} "
                "(dtype rendering: driver would hash-fail)"
            )
    except Exception as e:  # emulation itself must never mask a PASS
        problems.append(f"pandas-canon error: {str(e)[:200]}")
    return problems


def main() -> int:
    args = sys.argv[1:]
    skip: set[str] = set()
    rest: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "-x":
            if i + 1 >= len(args):
                print("usage: check_oracle.py [sf_dir] [q ...] [-x q]")
                return 2
            skip.add(args[i + 1])
            i += 2
        else:
            rest.append(args[i])
            i += 1
    sf_dir = rest[0] if rest else "/root/testdata/sf0.001"
    only = set(rest[1:])

    con = duckdb.connect()
    import os as _os

    for t in TABLES:
        # driver testdata ships single-file parquet; self-generated
        # datasets (scripts/gen_scale.py) are Spark directory-style
        path = f"{sf_dir}/{t}.parquet"
        if _os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    # overridable layout knobs: running the WHOLE gate under an odd
    # core/partition count is the cheap proof that every hash is
    # partition-layout-invariant (decimal/fixed-point aggregates,
    # deterministic tie-breaks) — not just correct on one layout
    import os

    cpus = os.environ.get("SPARK_GRAFT_ORACLE_CPUS", "8")
    parts = os.environ.get("SPARK_GRAFT_ORACLE_PARTITIONS", "8")
    spark = get_spark(app_name="oracle_check", master=f"local[{cpus}]",
                      conf={"spark.ui.enabled": "false",
                            "spark.sql.shuffle.partitions": parts})

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    import time as _time

    for name, fn in queries.items():
        if (only and name not in only) or name in skip:
            continue
        # entries may persist small result relations (the documented
        # materialize_and_release pattern); drop them between entries
        # so a 144-entry session doesn't accumulate cache
        spark.catalog.clearCache()
        t0 = _time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}", flush=True)
            failures.append(name)
            continue
        if name not in oracles:
            # rows-only entries still pass through the driver's pandas
            # canonicalizer (which sorts every column) — r5 shipped an
            # array-celled entry that crashed it because this path
            # skipped the emulation. Sortability is checked here too.
            problems = _spark_canon_problems(sdf)
            if problems:
                print(
                    f"FAIL  {name}: {'; '.join(problems)}", flush=True
                )
                failures.append(name)
            else:
                print(
                    f"ok    {name}: rows-only ({len(srows)} rows, "
                    f"no oracle) [{_time.perf_counter() - t0:.1f}s]",
                    flush=True,
                )
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}", flush=True)
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh = result_hash(scols, [tuple(r) for r in srows])
            oh = result_hash(ocols, orows)
            if sh != oh:
                problems.append("value hash mismatch")
                # show first differing row for debugging
                sset = {
                    "\x1f".join(
                        _norm_value(r[i])
                        for i in sorted(
                            range(len(scols)), key=lambda i: scols[i]
                        )
                    )
                    for r in srows
                }
                oset = {
                    "\x1f".join(
                        _norm_value(r[i])
                        for i in sorted(
                            range(len(ocols)), key=lambda i: ocols[i]
                        )
                    )
                    for r in orows
                }
                for x in sorted(sset - oset)[:2]:
                    print(f"      spark-only: {x[:200]}")
                for x in sorted(oset - sset)[:2]:
                    print(f"      duck-only:  {x[:200]}")
        if not problems:
            problems.extend(_driver_emulation_problems(con, oracles[name], sdf))
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}", flush=True)
            failures.append(name)
        else:
            print(
                f"PASS  {name} ({len(srows)} rows) "
                f"[{_time.perf_counter() - t0:.1f}s]",
                flush=True,
            )
    print()
    if failures:
        print(f"{len(failures)} failing: {failures}")
        return 1
    print("all queries pass")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
