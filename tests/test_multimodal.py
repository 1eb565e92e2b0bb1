"""Multimodal plumbing tests: binary payload columns, metadata
pushdown before decode, Arrow-batched feature extraction."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sqltask_spark.operators.multimodal import (
    decode_payload,
    extract_features,
    make_media_table,
)


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_payload(b"xx", "image/png", fake=False)


def test_extract_features_schema_and_determinism(spark):
    media = make_media_table(spark, n=16)
    feats = extract_features(media, fake_codec=True)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 16
    src = {r["media_id"]: r for r in media.collect()}
    # sha256 matches payload, features deterministic in [0,1]
    for mid, r in rows.items():
        assert r["sha256"] == hashlib.sha256(bytes(src[mid]["payload"])).hexdigest()
        assert r["n_bytes"] == len(bytes(src[mid]["payload"]))
        assert len(r["feature"]) == 16
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
    # run twice → identical
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert all(again[m]["feature"] == rows[m]["feature"] for m in rows)


def test_metadata_filter_prunes_before_decode(spark):
    media = make_media_table(spark, n=16)
    images = media.filter(F.col("meta.mime").startswith("image/"))
    feats = extract_features(images, fake_codec=True)
    assert feats.count() == images.count() < 16
    assert set(r["mime"] for r in feats.collect()) == {
        "image/png", "image/jpeg"
    }
