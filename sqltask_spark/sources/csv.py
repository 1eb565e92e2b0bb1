"""CSV source.

Parity with ``CsvRowSource``
(``reference sqltask/sources/csv.py:12-76``): header row supplies
column names, configurable delimiter and encoding, and malformed /
wrong-width rows fail the read (the reference raises on row-width
mismatch at ``csv.py:66-70`` → Spark ``FAILFAST`` mode). The
reference auto-detects encoding with chardet (``utils/file.py:6-22``);
at scale sniffing every file on the driver is a non-starter, so
encoding is an explicit option defaulting to UTF-8, with opt-in
``encoding="auto"`` sniffing a bounded prefix of ONE sample file
driver-side (local paths only — object-store datasets should state
their encoding, which is also the only way to keep the read
plan-side-effect-free).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def detect_encoding(path: str, sample_bytes: int = 1 << 20) -> str:
    """Bounded, dependency-free encoding sniff (reference parity:
    ``utils/file.py:6-22`` feeds the whole file to chardet; here a
    1 MiB prefix of the first matching file is enough for the BOM /
    UTF-8-validity / latin-1 decision tree, and the cost is fixed
    regardless of dataset size).

    Returns a Java charset name Spark's CSV reader accepts. UTF-16
    BOMs map to plain ``UTF-16`` (Java's decoder consumes the BOM);
    valid UTF-8 stays ``UTF-8``; anything else falls back to
    ``ISO-8859-1``, which decodes any byte sequence — the same
    "never fail the read over encoding" posture as chardet with a
    low-confidence guess.
    """
    if "://" in path and not path.startswith("file:"):
        raise ValueError(
            f"encoding='auto' requires a local path, got {path!r}; "
            "pass an explicit encoding for object-store files"
        )
    local = path[len("file:"):] if path.startswith("file:") else path
    if os.path.isdir(local):
        candidates = sorted(glob.glob(os.path.join(local, "*")))
    else:
        candidates = sorted(glob.glob(local)) or [local]
    with open(candidates[0], "rb") as fh:
        head = fh.read(sample_bytes)
    if head.startswith(b"\xff\xfe") or head.startswith(b"\xfe\xff"):
        return "UTF-16"
    try:
        head.decode("utf-8")
        return "UTF-8"
    except UnicodeDecodeError:
        return "ISO-8859-1"


def csv_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    delimiter: str = ",",
    encoding: str = "UTF-8",
    header: bool = True,
    mode: str = "FAILFAST",
    **options: str,
) -> DataFrame:
    if encoding == "auto":
        encoding = detect_encoding(path)
    reader = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("encoding", encoding)
        .option("mode", mode)
    )
    if encoding.upper().replace("_", "-").startswith(("UTF-16", "UTF-32")):
        # the default record splitter scans raw bytes for '\n' and is
        # only correct for ASCII-compatible charsets; multiLine routes
        # the whole file through the charset-aware parser (at the cost
        # of per-file rather than per-split parallelism — acceptable,
        # since multi-byte-charset CSVs are interchange files, not
        # lake-resident big data)
        reader = reader.option("multiLine", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    # no inferSchema: like the reference (all-string values,
    # sqltask/sources/csv.py:72), untyped CSV reads are strings and the
    # caller casts via map_columns / conform — inference would need an
    # extra full scan of the data.
    return reader.csv(path)
