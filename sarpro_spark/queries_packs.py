"""Union-certificate pack queries.

The driver's correctness gate checks the FIRST 50 entries of ``queries()``;
the registry has ~90. A *pack* merges several registered member queries into
ONE driver row by unpivoting every member result to a common long schema

    (part, key_id, k, v_str, v_num)

and unioning — every value of every member lands in the driver's value hash,
so a green pack row certifies each member exactly as a dedicated row would
(same pattern as the round-2 ``autoscale_advanced_u16`` union certificate,
generalized). Members stay individually registered in the tail for targeted
debugging.

Construction is symmetric by design: the Spark side unpivots with one
``stack()`` projection per member (single pass — the member plan is NOT
re-executed per column), the DuckDB side with one ``UNNEST(list-of-structs)``
per member CTE. The numeric/string/boolean split is derived from DuckDB's own
``DESCRIBE`` of the member oracle (memoized, binding only — no scan), so the
two sides can't disagree about which bucket a column hashes in.
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sarpro_spark.frames import TABLES
from sarpro_spark.queries import REGISTRY, query

#: sf dir used ONLY for schema binding (DESCRIBE — reads parquet footers, not
#: data); the smallest generated scale keeps import cheap.
_SCHEMA_SF = os.environ.get("SPARK_GRAFT_SCHEMA_SF", "/root/testdata/sf0.001")

_NUM_TYPES = ("INT", "DOUBLE", "FLOAT", "DECIMAL", "REAL")

_type_cache: dict[str, list[tuple[str, str]]] = {}
_duck = None
#: one DuckDB connection shared by every pack's schema binding — NOT
#: thread-safe, and tools/explain_audit.py builds pack plans on a thread
#: pool (r10): serialize both the lazy init and the DESCRIBE (an unlocked
#: race surfaced as an intermittent empty ParseException in the audit)
_duck_lock = threading.Lock()


def _member_schema(name: str) -> list[tuple[str, str]]:
    """(column, category) for a member's oracle, category in num/str/bool."""
    if name in _type_cache:
        return _type_cache[name]
    global _duck
    import duckdb

    with _duck_lock:
        if name in _type_cache:  # raced: another thread bound it meanwhile
            return _type_cache[name]
        if _duck is None:
            _duck = duckdb.connect()
            for t in TABLES:
                _duck.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{_SCHEMA_SF}/{t}.parquet')"
                )
        rows = _duck.execute(f"DESCRIBE {REGISTRY[name].resolve_sql()}").fetchall()
    out = []
    for col, dtype, *_ in rows:
        up = str(dtype).upper()
        if up == "BOOLEAN":
            cat = "bool"
        elif any(t in up for t in _NUM_TYPES):
            cat = "num"
        elif "TIMESTAMP" in up or "DATE" in up:
            raise TypeError(
                f"pack member {name} column {col} is {dtype}: timestamp text "
                "formatting differs across engines — emit epoch integers instead"
            )
        else:
            cat = "str"
        out.append((col, cat))
    _type_cache[name] = out
    return out


@dataclass(frozen=True)
class Member:
    name: str
    id_cols: tuple[str, ...]


def _sql_key(id_cols: tuple[str, ...]) -> str:
    if not id_cols:
        return "''"
    return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in id_cols)


def _spark_key(id_cols: tuple[str, ...]) -> F.Column:
    if not id_cols:
        return F.lit("")
    parts: list[F.Column] = []
    for i, c in enumerate(id_cols):
        if i:
            parts.append(F.lit("|"))
        parts.append(F.col(c).cast("string"))
    return F.concat(*parts)


def _member_sql(m: Member, alias: str) -> tuple[str, str]:
    """(cte, select) fragments for one member."""
    schema = _member_schema(m.name)
    structs = []
    for col, cat in schema:
        if col in m.id_cols:
            continue
        if cat == "num":
            v_str, v_num = "CAST(NULL AS VARCHAR)", f"CAST({col} AS DOUBLE)"
        else:  # str + bool both stringify ('true'/'false' in both engines)
            v_str, v_num = f"CAST({col} AS VARCHAR)", "CAST(NULL AS DOUBLE)"
        structs.append(f"{{'k': '{col}', 'v_str': {v_str}, 'v_num': {v_num}}}")
    cte = f"{alias} AS ({REGISTRY[m.name].resolve_sql()})"
    sel = (
        f"SELECT '{m.name}' AS part, key_id, u.k AS k, u.v_str AS v_str, u.v_num AS v_num\n"
        f"FROM (SELECT {_sql_key(m.id_cols)} AS key_id, UNNEST([\n  "
        + ",\n  ".join(structs)
        + f"\n]) AS u FROM {alias}) z"
    )
    return cte, sel


def pack_sql(members: tuple[Member, ...]) -> str:
    ctes, sels = [], []
    for i, m in enumerate(members):
        cte, sel = _member_sql(m, f"pm{i}")
        ctes.append(cte)
        sels.append(sel)
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sels)


def _unpivot_spark(df: DataFrame, m: Member) -> DataFrame:
    schema = _member_schema(m.name)
    pieces = []
    n = 0
    for col, cat in schema:
        if col in m.id_cols:
            continue
        n += 1
        if cat == "num":
            pieces.append(
                f"'{col}', CAST(NULL AS STRING), CAST(`{col}` AS DOUBLE)"
            )
        else:
            pieces.append(
                f"'{col}', CAST(`{col}` AS STRING), CAST(NULL AS DOUBLE)"
            )
    stack = f"stack({n}, " + ", ".join(pieces) + ") AS (k, v_str, v_num)"
    return df.select(
        F.lit(m.name).alias("part"),
        _spark_key(m.id_cols).alias("key_id"),
        F.expr(stack),
    ).select("part", "key_id", "k", "v_str", "v_num")


def pack_fn(members: tuple[Member, ...]):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        out = None
        for m in members:
            part = _unpivot_spark(REGISTRY[m.name].fn(spark, sf_dir), m)
            out = part if out is None else out.unionByName(part)
        return out

    return fn


#: pack name -> member query names (certification-completeness accounting)
PACK_MEMBERS: dict[str, tuple[str, ...]] = {}


def register_pack(pack_name: str, members: tuple[Member, ...], doc: str, tags: tuple[str, ...]):
    # sql is a thunk: DESCRIBE-based construction runs on first resolve_sql(),
    # NOT at import — a missing testdata path or absent duckdb then fails only
    # the pack queries, never the registry import (bench/driver keep working).
    PACK_MEMBERS[pack_name] = tuple(m.name for m in members)
    query(pack_name, sql=lambda m=members: pack_sql(m), doc=doc, tags=tags)(pack_fn(members))


# --- the packs ---------------------------------------------------------------
# Member queries must be registered before this module loads (queries.py
# imports it last). id_cols are association labels carried into key_id; they
# need not be unique — the driver compares row multisets.

register_pack(
    "llm_dedup_pack",
    (
        Member("dedup_exact", ("h",)),
        Member("dedup_exact_normalized", ("h",)),
        Member("dedup_ngram_jaccard", ("doc_a", "doc_b")),
        Member("dedup_simhash", ("doc_id",)),
        Member("dedup_simhash_pairs", ("doc_a", "doc_b")),
        Member("dedup_incremental", ("doc_id",)),
        Member("dedup_incremental_clusters", ("doc_id",)),
        Member("dedup_streaming_neardup", ("doc_id",)),
        Member("dedup_stream_stream_neardup", ("a_id", "b_id")),
        Member("dedup_semantic_prune", ("vec_id",)),
        Member("dedup_exact_substring", ("doc_a", "doc_b")),
        Member("dedup_substring_removal", ("doc_id",)),
        Member("dedup_exact_substring_winnowed", ("doc_a", "doc_b")),
        Member("substring_winnow_recall", ()),
        Member("dedup_image_phash", ("doc_a", "doc_b")),
        Member("dedup_audio_fingerprint", ("doc_a", "doc_b")),
        Member("dedup_video_phash", ("doc_a", "doc_b")),
        Member("dedup_allpairs_jaccard", ("doc_a", "doc_b")),
        Member("dedup_allpairs_prefix_stats", ()),
        Member("corpus_leakage_safe_split", ("split",)),
    ),
    doc="Union certificate: exact dedup (+normalized), n-gram Jaccard pairs, "
    "SimHash fingerprints + banded near-dup pairs, SemDeDup-style "
    "semantic cluster pruning (r9: bounded recursive re-cluster of "
    "oversized clusters), incremental "
    "batch-vs-index dedup, the streaming incremental near-dup batch twin "
    "(r7), the stream-STREAM cross near-dup twin (r9 — the dedup temporal "
    "matrix's last cell), perceptual-hash image near-dup with planted "
    "resized duplicates (r12 — the pixel cell of the matrix), frame-vote "
    "video near-dup with planted rescaled + frame-shifted clips (r13 — "
    "the video cell), and the "
    "cluster-granular leakage-safe train/val/test split — every value of "
    "each member in one driver hash row.",
    tags=("llm", "dedup", "pack"),
)

register_pack(
    "llm_text_pack",
    (
        Member("text_lang_id", ("doc_id",)),
        Member("text_lang_confusion", ("labeled", "predicted")),
        Member("quality_threshold_sweep", ("threshold",)),
        Member("text_token_stats", ("doc_id",)),
        Member("text_quality", ("doc_id",)),
        Member("text_fingerprint", ("doc_id",)),
        Member("text_feature_hashing", ("doc_id", "dim")),
        Member("text_winnowing", ("doc_id",)),
        Member("bpe_vocab_train", ("step",)),
        Member("bpe_encode_corpus", ("doc_id",)),
        Member("quality_classifier_train", ("step",)),
        Member("quality_classifier_scores", ("doc_id",)),
        Member("events_ols_fit", ()),
        Member("text_bm25_topk", ("query_id", "rnk")),
    ),
    doc="Union certificate: language ID, token stats, quality features, "
    "signed feature-hashing vectors, "
    "whole-doc fingerprint, winnowing fingerprints, BPE vocabulary "
    "training merges + corpus tokenization stats, the trained "
    "logistic-regression quality classifier (training log + scores), "
    "and Okapi BM25 per-query top-k retrieval (r12).",
    tags=("llm", "text", "pack"),
)

register_pack(
    "llm_hygiene_pack",
    (
        Member("text_pii_redaction", ("doc_id",)),
        Member("privacy_k_anonymity", ("lang", "source", "len_bucket")),
        Member("text_contamination", ("doc_id",)),
        Member("text_repetition", ("doc_id",)),
        Member("text_unigram_logprob", ("doc_id",)),
        Member("text_url_domains", ("domain",)),
        Member("text_dup_passages", ("doc_id",)),
        Member("text_encoding_hygiene", ("doc_id",)),
        Member("fuzzy_match_partnames", ("lid",)),
        Member("entity_resolution_parts", ("entity_id",)),
        Member("text_bigram_logprob", ("doc_id",)),
        Member("domain_pagerank", ("domain",)),
        Member("domain_triangle_census", ("vertex",)),
        Member("corpus_curation_funnel", ("stage",)),
        Member("corpus_export_roundtrip", ("lang",)),
    ),
    doc="Union certificate: PII redaction (typed counts + full redacted "
    "text), train/eval contamination scores, C4/Gopher repetition filters, "
    "CCNet-style unigram + interpolated-bigram LM log-probability scores, "
    "duplicated-passage fractions with longest shared-run lengths, and "
    "host co-citation PageRank, the end-to-end curation funnel, and the "
    "lang-partitioned export roundtrip.",
    tags=("llm", "text", "hygiene", "pack"),
)

register_pack(
    "llm_sampling_pack",
    (
        Member("sample_stratified", ("lang",)),
        Member("sample_topk_per_stratum", ("doc_id",)),
        Member("sample_weighted_topk", ("doc_id",)),
        Member("dsir_resample_en", ("doc_id",)),
        Member("dsir_logweight_by_lang", ("lang",)),
        Member("corpus_pack_assignments", ("doc_id",)),
        Member("corpus_length_bucketed_batches", ("mode", "length_bin")),
        Member("corpus_pack_sequences", ("bucket", "seq")),
        Member("corpus_chunk_windows", ("doc_id", "chunk_idx")),
        Member("corpus_mixture_plan", ("source",)),
        Member("corpus_cardinality_sketch", ("source",)),
        Member("terms_heavy_hitters_cms", ("term",)),
    ),
    doc="Union certificate: deterministic stratified Bernoulli sampling, "
    "exact-k-per-stratum seeded reservoir, concat-and-chunk sequence "
    "packing (per-doc + per-sequence legs), retrieval chunk windows, the "
    "domain mixture plan, and "
    "per-source cardinality sketches (exact + HLL-bounded), count-min "
    "heavy hitters, and the r13 DSIR importance resample (integer-exact "
    "hashed-ngram log-weights + Gumbel-top-k, with the per-language "
    "weight ordering certified as data).",
    tags=("llm", "sampling", "packing", "pack"),
)

register_pack(
    "similarity_topk_pack",
    (
        Member("similarity_topk_bruteforce", ("query_id", "vec_id")),
        Member("similarity_topk_lsh", ("query_id", "vec_id")),
        Member("similarity_topk_ivf", ("query_id", "vec_id")),
        Member("similarity_topk_int8", ("query_id", "vec_id")),
        Member("similarity_topk_binary", ("query_id", "vec_id")),
        Member("embedding_quantize_int8", ("vec_id", "pos")),
        Member("tfidf_topk_similar", ("doc_id", "nbr_id")),
        Member("tfidf_top_terms", ("doc_id", "term")),
        Member("embedding_pca", ("component", "pos")),
        Member("embedding_pca_project", ("vec_id",)),
        Member("ann_recall_at_k", ("query_id",)),
        Member("ann_recall_multiprobe", ("query_id",)),
        Member("ann_recall_binary", ("query_id", "mult")),
        Member("similarity_topk_pq", ("query_id", "vec_id")),
        Member("ann_recall_pq", ("query_id", "mult")),
        Member("similarity_topk_ivfpq", ("query_id", "vec_id")),
        Member("ann_recall_ivfpq", ("query_id", "nprobe", "mult")),
        Member("similarity_topk_maxsim", ("query_id", "vec_id")),
        Member("contrastive_hard_negatives", ("query_id", "vec_id")),
        Member("ann_recall_maxsim", ("query_id", "nprobe")),
    ),
    doc="Union certificate: ANN top-k via brute force, banded-hyperplane "
    "LSH, IVF inverted lists, int8-quantized scan, the int8 quantization "
    "codes themselves, lexical tf-idf top-k + top-terms, the PCA fit "
    "+ projection, the per-query recall@5 of IVF/LSH against the "
    "exact ground truth (r7 — index quality as data), and the r9 recall "
    "SWEEP (LSH probe 0 vs Hamming-1, IVF nprobe 1/2/4 — hit counts "
    "provably non-decreasing in both knobs, the accuracy/cost frontier "
    "hashed per query), the r12 PQ-ADC rung + frontier, and the r13 "
    "IVF-PQ combined rung + frontier and IVF-gated late-interaction "
    "MaxSim rerank.",
    tags=("llm", "similarity", "pack"),
)

register_pack(
    "events_windows_pack",
    (
        Member("events_tumbling_hourly", ("hour_bucket", "event_type")),
        Member("events_sliding_windows", ("window_start", "event_type")),
    ),
    doc="Union certificate: tumbling 1h and sliding 1h/15min window "
    "aggregations over events (batch twins of the streaming pipelines).",
    tags=("relational", "events", "streaming", "pack"),
)

register_pack(
    "sink_sidecar_pack",
    (
        Member("metadata_polarization_label", ("product_id",)),
        Member("worldfile_sidecar", ("product_id",)),
        Member("sidecar_outputs", ("product_id", "kind")),
        Member("batch_report", ("outcome",)),
        Member("pipeline_plan_flags", ("case_id",)),
        Member("pipeline_op_ratio_u8", ("product_id", "row", "col")),
    ),
    doc="Union certificate: W6 operation-aware labels, W4 world-file "
    "content, W5/W7/W8 sidecar + embed plans, A9 batch report, P1/P4/C3 "
    "dispatch decision table, and the full OP route (band zip -> E3 ratio "
    "-> dB -> A2 -> U8) composition.",
    tags=("sink", "plan", "pack"),
)

register_pack(
    "multimodal_pack",
    (
        Member("multimodal_metadata", ("doc_id",)),
        Member("multimodal_byte_features", ("doc_id",)),
        Member("multimodal_progressive_fallback", ("doc_id",)),
        Member("multimodal_frame_sample", ("doc_id", "frame_idx")),
        Member("multimodal_audio_features", ("doc_id",)),
        Member("multimodal_audio_frames", ("doc_id", "frame_idx")),
        Member("multimodal_thumbnails", ("doc_id", "ty", "tx", "chan")),
    ),
    doc="Union certificate: typed media metadata struct, format-agnostic "
    "byte features, and MJPEG frame sampling with real JPEG decode.",
    tags=("llm", "multimodal", "pack"),
)

register_pack(
    "relational_pack",
    (
        Member("rollup_sales", ("l_returnflag", "l_linestatus")),
        Member("cube_orders", ("o_orderpriority", "o_orderstatus")),
        Member("orders_above_cust_avg", ("o_custkey",)),
        Member("events_asof_cogrouped", ("event_id",)),
        Member("events_props_json", ("event_type",)),
        Member("events_attribution_outer", ("purchase_id",)),
        Member("events_attribution_full", ("purchase_id", "click_id")),
        Member("events_kmv_distinct_sketch", ("shard", "pos")),
        Member("pivot_order_priority", ("order_year",)),
        Member("lineitem_percentiles", ("l_returnflag",)),
        Member("skewed_agg_salted", ("event_type",)),
        Member("skewed_join_salted", ("event_type",)),
        Member("events_stream_dedup", ("event_id",)),
        Member("band_zip_ndiff", ("product_id", "row", "col")),
        Member("shipping_priority", ("o_orderkey",)),
        Member("nations_trade_volume", ("supp_nation", "cust_nation", "l_year")),
        Member("local_supplier_volume", ("n_name",)),
        Member("returned_items_report", ("c_custkey",)),
        Member("events_incremental_rollup", ("event_type", "hod")),
        Member("events_funnel_steps", ("reached",)),
        Member("events_cohort_retention", ("cohort_day", "day_offset")),
        Member("cdc_apply_changelog", ("o_orderkey",)),
        Member("cdc_scd2_history", ("o_orderkey", "valid_from")),
        Member("cdc_snapshot_diff", ("o_orderkey",)),
        Member("zorder_layout_locality", ()),
        Member("hilbert_vs_morton_locality", ()),
        Member("bloom_semijoin_reduction", ()),
        Member("events_resample_gapfill", ("key", "bucket_us")),
        Member("events_interval_overlap", ("user_id", "event_id", "r_event_id")),
        Member("events_ab_test", ()),
        Member("events_ab_cuped", ()),
        Member("events_path_transitions", ("prev_type", "next_type")),
        Member("events_heavy_hitters_mg", ("key",)),
        Member("lineitem_quantile_sketch", ("q_pct",)),
        Member("lineitem_ddsketch_quantiles", ("q_pct",)),
        Member("orders_incremental_agg_maintenance", ("grp",)),
        Member("suppart_kcore", ("v",)),
        Member("suppart_densest", ("v",)),
        Member("orders_overlap_kmv", ()),
        Member("suppliers_sole_problem", ("s_name",)),
        Member("nation_market_share", ("o_year",)),
        Member("dormant_rich_customers", ("c_nationkey",)),
        Member("semi_anti_join", ("kind",)),
        Member("window_analytics_orders", ("o_custkey", "o_orderkey")),
        Member("bucketed_colocated_join", ("orderkey",)),
        # r11 head rotation: these four moved from the driver head into
        # this pack (window_range_frames moved the other way)
        Member("set_operations", ("op",)),
        Member("window_rank_orders", ("o_custkey", "o_orderkey")),
        Member("user_running_totals", ("user_id",)),
        Member("grouping_sets_sales", ("l_returnflag", "l_linestatus")),
    ),
    doc="Union certificate: rollup/cube hierarchies, correlated-subquery "
    "decorrelation, as-of via cogrouped applyInPandas, JSON property "
    "aggregation, pivot, exact percentiles, salted skew aggregation + join, the "
    "streaming-dedup batch twin, the band-zip equi-join path, and the "
    "TPC-H-style Q3/Q7/Q10 multi-join analytics, the Q21-style EXISTS/"
    "NOT-EXISTS sole-problem-supplier decorrelation, the Q8-style 8-relation "
    "market share, the Q22-style scalar-subquery + anti-join shape, "
    "and incremental rollup "
    "maintenance (partial-state merge == full recompute), ordered "
    "funnel-step analytics, cohort retention, A/B Welch-t analysis, "
    "path-transition mining, and the r13 densest-subgraph parallel peel "
    "(integer-exact threshold, best snapshot + density in the hash).",
    tags=("relational", "pack"),
)

register_pack(
    "tpch_shapes_pack",
    (
        Member("tpch_min_cost_supplier", ("s_name", "p_partkey")),
        Member("tpch_order_priority_exists", ("o_orderpriority",)),
        Member("tpch_forecast_revenue", ()),
        Member("tpch_product_profit", ("nation", "o_year")),
        Member("tpch_important_stock", ("l_partkey",)),
        Member("tpch_priority_shipclass", ("ship_class",)),
        Member("tpch_customer_distribution", ("c_count",)),
        Member("tpch_promo_revenue", ()),
        Member("tpch_top_supplier", ("s_suppkey",)),
        Member("tpch_supplier_cnt_distribution", ("p_brand", "p_type", "p_size")),
        Member("tpch_small_qty_revenue", ()),
        Member("tpch_large_orders", ("o_orderkey",)),
        Member("tpch_disjunctive_filter", ()),
        Member("tpch_excess_supply", ("s_name",)),
        Member("tpcds_margin_rank", ("p_type", "p_brand")),
        Member("tpcds_rollup_topk", ("p_type", "p_brand", "ship_month")),
        Member("tpcds_cumulative_crossover", ("pri", "m")),
        Member("tpcds_cross_channel_items", ("p_brand", "p_type")),
        Member("tpcds_frequent_buyers", ("branch", "o_custkey")),
    ),
    doc="Union certificate: the fourteen TPC-H shapes not already covered "
    "by queries_relational.py (r7 — Q2 Q4 Q6 Q9 Q11 Q12 Q13 Q14 Q15 Q16 "
    "Q17 Q18 Q19 Q20, adapted to the reduced star schema; with rounds 1-6's "
    "Q1/Q3/Q5/Q7/Q8/Q10/Q21/Q22 this completes the full 22-query suite of "
    "shapes): correlated-MIN and correlated-AVG decorrelation, EXISTS with "
    "non-equi residual, scalar-subquery thresholds, disjunctive pushdown, "
    "outer-join distribution, NOT-IN anti-join, nested-IN chains, and "
    "HAVING-fed top-k. r9 adds the TPC-DS Q36 shape (tpcds_margin_rank): "
    "GROUPING()-flag hierarchy level over a ROLLUP margin ratio with "
    "RANK() partitioned by a conditional grouping-flag expression — the "
    "lochierarchy / rank-within-parent pattern — and the Q67 shape "
    "(tpcds_rollup_topk): top-k per category over a three-level rollup, "
    "detail rows competing with their own subtotals in one rank — and "
    "the Q51 shape (tpcds_cumulative_crossover): FULL OUTER-joined "
    "cumulative series with a running-MAX crossover flag (window over "
    "window). r10 adds the Q14 shape (tpcds_cross_channel_items): "
    "multi-column INTERSECT as a join driver — items common to all three "
    "channels gate a revenue aggregate that must also beat the all-items "
    "average.",
    tags=("relational", "tpch", "pack"),
)

register_pack(
    "warp_gcp_pack",
    (
        Member("warp_gcp_grid", ("product_id", "row", "col")),
        Member("warp_gcp_tps", ("product_id", "row", "col")),
        Member("warp_params_tps", ("product_id", "row", "col")),
        Member("tps_gcp_residuals", ("product_id", "scol_i", "srow_i")),
        Member("warp_ntv2_from_lonlat", ("product_id", "row", "col")),
    ),
    doc="Union certificate: both G5 GCP-warp interpolants — the exact "
    "piecewise-bilinear GCP grid (warp_gcp_grid) and the true thin-plate-"
    "spline warp (warp_gcp_tps, r7 — the interpolant of the reference's "
    "gdalwarp -tps fallback, sentinel1.rs:1016-1029): distributed (n+3)^2 "
    "solve per product (r8: ONE applyInPandas task per product, no driver "
    "collect), ONE broadcast coefficient row, column-expression bend fold, "
    "shared bilinear gather. Every warped cell of both rasters in one "
    "driver hash row. r9 adds the params-routed chain "
    "(warp_params_tps: from_dict -> warp_route -> gcp_warp dispatch must "
    "hash bit-identically to the direct operator) and the per-GCP residual "
    "certificate (tps_gcp_residuals: the fitted spline is exactly 0 at its "
    "GCPs through the production solve+fold — the distributed solve's "
    "standing determinism guard).",
    tags=("raster", "warp", "pack"),
)

register_pack(
    "datum_roundtrip_pack",
    (
        Member("ups_roundtrip_points", ("product_id", "gi", "gj")),
        Member("laea_roundtrip_points", ("product_id", "gi", "gj")),
        Member("webmerc_roundtrip_points", ("product_id", "gi", "gj")),
        Member("lcc_roundtrip_points", ("product_id", "gi", "gj")),
        Member("osgb_roundtrip_points", ("product_id", "gi", "gj")),
        Member("bd72_roundtrip_points", ("product_id", "gi", "gj")),
        Member("albers_roundtrip_points", ("product_id", "gi", "gj")),
        Member("mga_roundtrip_points", ("product_id", "gi", "gj")),
        Member("gtg_roundtrip_points", ("product_id", "gi", "gj")),
    ),
    doc="Bench-consolidation union certificate (r12, verdict item 5): the "
    "nine tail projection/datum round-trip families in ONE union row — "
    "each family previously paid its own ~0.5-4s Spark per-job floor on "
    "the bench while certifying near-identical plan shapes. The union "
    "runs every member's full plan in one job (same hashed values, one "
    "floor). ntv2/nad27 keep dedicated head seats (the two grid-shift "
    "binary-format paths); members stay individually registered.",
    tags=("raster", "geometry", "crs", "datum", "pack"),
)

register_pack(
    "sources_pack",
    (
        Member("safe_discovery", ("product",)),
        Member("safe_annotations", ()),
        Member("generic_reader_roundtrip", ("fmt", "n_nationkey")),
        Member("utm_forward_gcps", ("product_id", "gi", "gj")),
        Member("ups_forward_points", ("product_id", "gi", "gj")),
        Member("ups_roundtrip_points", ("product_id", "gi", "gj")),
        Member("laea_roundtrip_points", ("product_id", "gi", "gj")),
        Member("webmerc_roundtrip_points", ("product_id", "gi", "gj")),
        Member("lcc_roundtrip_points", ("product_id", "gi", "gj")),
        Member("osgb_roundtrip_points", ("product_id", "gi", "gj")),
        Member("bd72_roundtrip_points", ("product_id", "gi", "gj")),
        Member("albers_roundtrip_points", ("product_id", "gi", "gj")),
        # ntv2_roundtrip_points / nad27_roundtrip_points hold their own
        # driver-head seats since the r11 rotation
        Member("ntv2_multigrid_points", ("product_id", "gi", "gj")),
        Member("mga_roundtrip_points", ("product_id", "gi", "gj")),
        Member("ingest_sink_roundtrip", ("product",)),
    ),
    doc="Union certificate: S1-S3/S10/S11 SAFE discovery over the fixture "
    "tree, S8/S9 manifest+annotation parse, S6 generic reader roundtrip, "
    "and the in-engine Krüger UTM forward projection at GCP grain (the CRS "
    "math behind S10's zone pick, operators/tmerc.py), plus the UPS "
    "forward+inverse polar round-trip (<= 1e-9 deg on both sheets), the "
    "EPSG:3035 LAEA round-trip (r7, <= 1e-7 deg), the EPSG:3857 "
    "pseudo-Mercator round-trip (r7, exact inverse), the EPSG:27700 "
    "datum-shift round-trip (r8: 7-param Helmert + Airy TM, <= 1e-7 deg), "
    "the EPSG:31370 Belgian Lambert 72 round-trip (r9: second Helmert "
    "family — exact inverse of the published BD72->WGS84 set + pole-origin "
    "LCC-2SP on International 1924, <= 1e-7 deg), and the EPSG:5070 Conus "
    "Albers equal-area round-trip (r9: Snyder authalic-latitude form "
    "anchored to the published Clarke 1866 worked example, <= 1e-7 deg), "
    "the NTv2/NADCON grid-shift round-trips with the REAL binary files in "
    "the loop (r10/r11: .gsb incl. NUM_FILE=2 nesting, .las/.los pair — "
    "write -> file -> read_gsb_df/read_loslas_df -> warp, f32-exact), and "
    "the drained streaming-ingest sink hashed against the batch opener.",
    tags=("source", "pack"),
)
