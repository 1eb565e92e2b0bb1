"""Multimodal-column queries over the ``documents`` table.

No media files ship with the testdata, so payloads derive
deterministically from document text (UTF-8 bytes as the opaque
``binary`` column + typed metadata) — the exact schema/partitioning
contract real media would use, with the codec boundary stubbed
(:mod:`sqltask_spark.operators.multimodal`).

``multimodal_payload_stats`` is fully oracle-matched (byte length +
sha256 reproduce in DuckDB). ``multimodal_features`` additionally
runs the mapInPandas decode/featurize stage whose fake-codec features
aren't SQL-expressible → rows-only check + exact-value pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqltask_spark.data import load_table
from sqltask_spark.operators.multimodal import MEDIA_META_TYPE, extract_features


def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.concat(F.lit("synthetic://doc/"), F.col("doc_id")).alias("uri"),
        ).alias("meta"),
    )


def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_from_documents(spark, sf_dir)
    return media.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256"),
    ).orderBy("media_id")


_PAYLOAD_SQL = """
SELECT
  doc_id AS media_id,
  'text/plain' AS mime,
  octet_length(encode(text)) AS n_bytes,
  sha256(text) AS sha256
FROM documents
ORDER BY media_id
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_from_documents(spark, sf_dir)
    feats = extract_features(media, fake_codec=True)
    return feats.select(
        "media_id",
        "mime",
        "n_bytes",
        "sha256",
        F.round(
            F.aggregate(
                "feature", F.lit(0.0), lambda a, x: a + x.cast("double")
            )
            / F.size("feature"),
            6,
        ).alias("feature_mean"),
    ).orderBy("media_id")


def _video_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic videos: every 5th document, duration derived
    deterministically from n_chars so the frame plan is oracle-able."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.pmod("doc_id", F.lit(5)) == 0
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("video/mp4").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            ((F.pmod("n_chars", F.lit(50)) + 1) * 1000)
            .cast("long")
            .alias("duration_ms"),
            F.concat(F.lit("synthetic://vid/"), F.col("doc_id")).alias("uri"),
        ).alias("meta"),
    )


def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JVM half of frame sampling — metadata mime filter + per-
    frame timestamp explode (``frame_timestamps``) — which is exactly
    the part that must be right at 100 TB (decode parallelism comes
    from this explosion). SQL-expressible, so it carries an oracle;
    the per-frame fake decode is pytest-verified in
    ``tests/test_multimodal.py``."""
    from sqltask_spark.operators.multimodal import frame_timestamps

    media = _video_media(spark, sf_dir)
    return (
        media.select(
            "media_id",
            F.col("meta.duration_ms").alias("duration_ms"),
            F.posexplode(
                frame_timestamps(F.col("meta.duration_ms"), 1000, 8)
            ).alias("frame_idx", "ts_ms"),
        )
        .orderBy("media_id", "frame_idx")
    )


_FRAME_PLAN_SQL = """
SELECT
  doc_id AS media_id,
  (n_chars % 50 + 1) * 1000 AS duration_ms,
  CAST(i AS INTEGER) AS frame_idx,
  CAST(i * 1000 AS BIGINT) AS ts_ms
FROM documents,
     LATERAL UNNEST(generate_series(
       0, LEAST((n_chars % 50 + 1) + 1, 8) - 1)) AS t(i)
WHERE doc_id % 5 = 0
ORDER BY media_id, frame_idx
"""


def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable media dedup — the first pass every image/
    audio corpus runs: group raw payloads by sha256, keep the lowest
    media id per digest. The digest is computed AT the scan
    projection, so the groupBy shuffle carries (64-char digest, id,
    length) — never the payload bytes — and the digest key is
    uniformly distributed (no skew). Near-dup detection (resized/
    re-encoded images) is where perceptual hashes would slot in, at
    the same isolated codec boundary as ``extract_features``."""
    media = _media_from_documents(spark, sf_dir)
    return (
        media.select(
            F.sha2("payload", 256).alias("sha256"),
            F.col("media_id"),
            F.octet_length("payload").alias("n_bytes"),
        )
        .groupBy("sha256")
        .agg(
            F.min("media_id").alias("kept_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("n_bytes").alias("n_bytes"),
        )
        .orderBy("kept_id")
    )


_MM_DEDUP_SQL = """
SELECT sha256(text) AS sha256,
       MIN(doc_id) AS kept_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       MIN(octet_length(encode(text))) AS n_bytes
FROM documents
GROUP BY sha256(text)
ORDER BY kept_id
"""


# --------------------------------------------------------------------------
# multimodal_features_fixed — ORACLED certificate twin of the
# decode/featurize pipeline. The production fake codec chains sha256
# over raw digest BYTES, which DuckDB cannot replay (its sha256 takes
# VARCHAR only) — so the twin chains over HEX STRINGS instead:
# d0 = sha256(payload), d1 = sha256(d0), d2 = sha256(d1) (128 hex
# chars of deterministic "decoded stream"), and each of the 16
# features is the u16 parsed from the leading 4 hex chars of every
# 8-char group — mirroring the production codec's "2 bytes of every
# 4-byte window" shape. Spark runs it as pure JVM expressions (no
# Python at all — codegen the whole row), DuckDB replays every hash
# and hex-parse bit-for-bit, so the driver hash-checks the entire
# decode→featurize→digest plumbing. The mapInPandas production entry
# (multimodal_features) remains the real-codec seam.
# --------------------------------------------------------------------------

_FEAT_DIM = 16
_HEX = "0123456789abcdef"


def multimodal_features_fixed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    media = _media_from_documents(spark, sf_dir)
    d0 = F.sha2(F.col("payload"), 256)
    base = media.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.octet_length("payload").alias("n_bytes"),
        d0.alias("sha256"),
    ).withColumn(
        "_cc",
        F.concat(
            F.sha2(F.col("sha256"), 256),
            F.sha2(F.sha2(F.col("sha256"), 256), 256),
        ),
    )
    u16s = [
        F.conv(F.substring("_cc", 8 * i + 1, 4), 16, 10).cast("bigint")
        for i in range(_FEAT_DIM)
    ]
    feat_l1 = u16s[0]
    for c in u16s[1:]:
        feat_l1 = feat_l1 + c
    return base.select(
        "media_id",
        "mime",
        "n_bytes",
        "sha256",
        feat_l1.alias("feat_l1"),
        F.md5(
            F.concat_ws(",", *[c.cast("string") for c in u16s])
        ).alias("feat_md5"),
    ).orderBy("media_id")


def _features_fixed_sql() -> str:
    def u16(i: int) -> str:
        chars = [
            f"(strpos('{_HEX}', substr(cc, {8 * i + 1 + j}, 1)) - 1)"
            for j in range(4)
        ]
        expr = chars[0]
        for c in chars[1:]:
            expr = f"({expr} * 16 + {c})"
        return f"CAST({expr} AS BIGINT)"

    cols = [u16(i) for i in range(_FEAT_DIM)]
    l1 = " + ".join(cols)
    md5_args = ", ".join(
        f"CAST({c} AS VARCHAR)" for c in cols
    )
    return f"""
WITH base AS (
  SELECT doc_id AS media_id,
         'text/plain' AS mime,
         octet_length(encode(text)) AS n_bytes,
         sha256(text) AS d0
  FROM documents),
chain AS (
  SELECT media_id, mime, n_bytes, d0,
         sha256(d0) || sha256(sha256(d0)) AS cc
  FROM base)
SELECT media_id, mime, n_bytes, d0 AS sha256,
       {l1} AS feat_l1,
       md5(concat_ws(',', {md5_args})) AS feat_md5
FROM chain
ORDER BY media_id
"""


QUERIES = {
    "multimodal_payload_stats": multimodal_payload_stats,
    "multimodal_features": multimodal_features,
    "multimodal_features_fixed": multimodal_features_fixed,
    "multimodal_frame_plan": multimodal_frame_plan,
    "multimodal_dedup": multimodal_dedup,
}

ORACLES = {
    "multimodal_payload_stats": _PAYLOAD_SQL,
    # multimodal_features: rows-only (the fake codec chains sha256
    # over raw digest BYTES — no BLOB sha256 in DuckDB; exact values
    # pytest-verified). multimodal_features_fixed is its oracled
    # certificate twin over hex-string chains.
    "multimodal_features_fixed": _features_fixed_sql(),
    "multimodal_frame_plan": _FRAME_PLAN_SQL,
    "multimodal_dedup": _MM_DEDUP_SQL,
}
