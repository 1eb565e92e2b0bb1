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

from sqltask_spark.queries import events as _events
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

# LLM-pipeline modules FIRST: the driver's correctness gate checks the
# first 50 entries in dict order, and the dedup / similarity / text /
# multimodal / pipeline operators are the engine's north-star surface —
# they must sit inside that window. Relational/events flagships fill
# the remaining slots via _FLAGSHIP below; the rest (all with green
# driver history from rounds 1-2 and plan tests) follow.
for mod in (_textops, _retrieval, _vector, _multimodal, _pipeline,
            _relational, _relational2, _events):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

#: relational/events flagships ordered right after the LLM-pipeline
#: modules (which now fill the driver's entire 50-row window — the
#: north-star surface gets every driver CORRECTNESS row; this list,
#: all with green driver rows from rounds 1-2 plus plan tests,
#: follows immediately after).
_FLAGSHIP = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "lookup_enrich_customer",
    "asof_click_purchase",
    "map_all_staging",
    "dq_customer_issues",
    "q21_returns_blame",
    "user_value_median",
    "q2_min_cost_supplier",
    "topk_orders_per_segment",
    "window_functions_showcase",
    "grouping_sets_priority_status",
]

#: Round-5 rotation INTO the driver's 50-row window: every catalog
#: entry that has NEVER had a driver CORRECTNESS row. After round 4
#: only these remain unproven — gopher_quality_flags and
#: dedup_ngram_jaccard carry DuckDB oracles (hash check); the other
#: seven are rows-only by design (variants / float-centroid /
#: layout-introspection ops), so the driver records the weaker
#: rows-only check and pytest carries their semantics. Promoting all
#: nine means every entry in the catalog will have been through the
#: driver's own gate at least once across rounds 1-5.
_PROMOTED = [
    # new this round (all oracled):
    "search_hybrid_rrf",
    "embedding_random_projection",
    "dedup_clusters_capped",
    "source_quality_cap",
    "gopher_quality_flags",
    "dedup_ngram_jaccard",
    "sketch_event_stats",
    "topic_cluster_documents",
    "bpe_encode_documents",
    "dedup_embedding_pairs_lsh",
    "ann_topk_ivf_sq8",
    "zorder_layout_stats",
    "dedup_index_screen",
]

#: Rotated OUT of the window to make room for _PROMOTED: every entry
#: here has two+ rounds of green driver history, a DuckDB oracle that
#: the local gate (scripts/check_oracle.py) still checks every
#: session, and pytest coverage — they lose nothing but a redundant
#: extra verification. (The round-4 rotation list is folded in; those
#: eight keep their green r1-r3 rows.)
_ROTATED_OUT = [
    "text_stats",
    "doc_fingerprint",
    "lang_id_documents",
    "quality_score_documents",
    "chunk_documents",
    "repetition_stats",
    "redact_documents",
    "doc_salient_terms",
    "token_count_bpe",
    "lm_perplexity",
    "doc_tfidf_vectors",
    "embedding_quantize_int8",
    "multimodal_payload_stats",
    "length_histogram",
    "split_train_eval",
    "vocab_top_tokens",
    "pack_sequences",
]

#: Entries ordered PAST the 50-row window: oracle-hashed ops with
#: green r2 driver rows (rolling_fingerprint, vector_norms) that the
#: local gate still checks every session.
_OVERFLOW = [
    "rolling_fingerprint",
    "vector_norms",
]

_EXCLUDED = set(_OVERFLOW) | set(_ROTATED_OUT) | set(_PROMOTED)
_LLM_FIRST = [
    k
    for mod in (_textops, _retrieval, _vector, _multimodal, _pipeline)
    for k in mod.QUERIES
    if k not in _EXCLUDED
]
_ORDER = _PROMOTED + _LLM_FIRST + _FLAGSHIP + _ROTATED_OUT + _OVERFLOW
QUERIES = {
    **{k: QUERIES[k] for k in _ORDER},
    **{k: v for k, v in QUERIES.items() if k not in set(_ORDER)},
}
