"""Named query registry — the judged operator inventory.

Importing this package registers every query module; ``QUERIES`` maps
name → Callable[(SparkSession, sf_dir), DataFrame] and ``ORACLES`` maps
name → equivalent ANSI SQL for the DuckDB oracle.
"""

from .registry import ORACLES, QUERIES, register  # noqa: F401

# Import for side effect: each module registers its queries.
from . import core  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import cdc_scd2  # noqa: E402,F401
from . import config_driven  # noqa: E402,F401
from . import subqueries  # noqa: E402,F401
from . import tpch_shapes  # noqa: E402,F401
from . import tpch_full  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import dedup_advanced  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import llm_extras  # noqa: E402,F401
from . import intervals  # noqa: E402,F401
from . import funnel  # noqa: E402,F401
from . import quality  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import udtf_text  # noqa: E402,F401
from . import basket  # noqa: E402,F401
from . import timetravel_demo  # noqa: E402,F401
from . import streaming_demo  # noqa: E402,F401
from . import layout_demo  # noqa: E402,F401
from . import pq  # noqa: E402,F401
from . import hybrid_search  # noqa: E402,F401
from . import sketches  # noqa: E402,F401
from . import stats  # noqa: E402,F401
from . import data_selection  # noqa: E402,F401

# The driver's correctness gate checks the FIRST 50 registered queries.
# Pin that window explicitly: the SURVEY §2 core anchors (every S/P/J/A/W/
# D/O/U/F operator row cites one of these), then the LLM-pipeline
# flagships (dedup, curation, similarity, text, multimodal), then the
# hardest TPC-H plan shapes. Everything else keeps registration order
# after the pinned prefix and is still verified by tools/check_oracle.py.
_PRIORITY = [
    # --- SURVEY §2 core (CDC / SCD2 / analytics anchors) ---
    "q1_pricing_summary",
    "revenue_rollup",
    "count_sum_by_group",
    "group_count_ops",
    "global_max_checkpoint",
    "json_extract_typed",
    "malformed_and_whitelist_filter",
    "op_split_union",
    "incremental_filter",
    "point_lookup_history",
    "broadcast_dim_join",
    "lead_window",
    "latest_per_key",
    "distinct_projection",
    "top_orders_preview",
    "scalar_functions",
    "op_decode_5arm",
    "scd2_build",
    "current_state_upsert",
    "history_audit",
    "retention_window",
    "scd2_point_in_time",
    "scd2_temporal_enrich",
    "envelope_flatten_roundtrip",
    "config_current_state_view",
    # --- end-to-end machinery round-trips (sinks / time travel / streams) ---
    "timetravel_versions_demo",
    "streaming_bronze_roundtrip",
    "streaming_upsert_roundtrip",
    # --- LLM training-data pipeline flagships ---
    "dedup_exact",
    "dedup_near_pairs_lsh",
    "dedup_duplicate_ngram_fraction",
    "dedup_simhash_near_pairs",
    "dedup_embedding_near_pairs",
    "dedup_ngram_jaccard",
    "dedup_cluster_assignments",
    "corpus_curation_pipeline",
    "similarity_cosine_topk",
    "similarity_cosine_topk_pandas",
    "text_tfidf_top_terms",
    "text_lang_id",
    "text_quality_score",
    "text_pii_scrub",
    "corpus_pack_sequences",
    "corpus_contamination_check",
    "multimodal_metadata",
    "parts_pagerank",
    # --- hardest TPC-H plan shapes ---
    "q6_forecast_revenue",
    "q9_product_type_profit",
    "q18_large_volume_customers",
    "q21_single_return_supplier",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:  # fail loudly at import: a renamed query must update the pin
        raise KeyError(f"_PRIORITY names not registered: {missing}")
    rest = [n for n in QUERIES if n not in set(_PRIORITY)]
    for mapping in (QUERIES, ORACLES):
        ordered = {n: mapping[n] for n in (*_PRIORITY, *rest) if n in mapping}
        mapping.clear()
        mapping.update(ordered)


_reorder()
