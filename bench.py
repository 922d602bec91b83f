#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...}

Protocol: warm measurement — one untimed warmup pass (codegen + JIT +
file-footer caches), then the timed pass. This mirrors the reference's own
benchmark discipline: its warm-performance harness excludes the cold first
request from the mean (test_warm_performance.sh:72-76). Aggregate-shaped
queries collect(); row-expanding ones count() (fetching millions of rows
would time the driver pipe, not the engine).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_cloudrun_demo_spark.operators import registry
from cdc_cloudrun_demo_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# name -> action ("collect" for small outputs, "count" for row-expanding)
HEADLINE: dict[str, str] = {
    "agg_pricing_summary": "collect",     # flagship scan→filter→group
    "join_star_revenue": "collect",       # multiway fact⨝fact + dims
    "join_asof": "count",                 # union+window as-of join
    "cdc_materialize": "count",           # the CDC fold
    "win_running_total": "count",         # partitioned window frame
    "agg_top_customers": "collect",       # top-k (TakeOrderedAndProject)
    "stream_session_windows": "count",    # gap sessionization
    "stream_tumbling_daily": "collect",   # event-time windows
    "b8_json_extract": "collect",         # JSON path extraction
    "dedup_exact": "count",               # normalize+hash groupBy
    "dedup_ngram_jaccard": "count",       # shingle similarity join
    "dedup_embedding_cosine": "count",    # blocked pairwise cosine dedup
    "qx_custdist": "collect",             # outer-join distribution (Q13)
    "agg_stats_moments": "collect",       # exact power-sum moments
    "sim_cosine_topk": "collect",         # brute-force ANN baseline
    "sim_ann_ivf_topk": "collect",        # IVF probing (broadcast-only)
    "win_topn_salted": "count",           # skew-resistant two-phase top-k
    "text_quality_score": "count",        # regex-heavy text scoring
    "multimodal_features": "count",       # mapInPandas Arrow pipeline
    "multimodal_frame_sample": "count",   # row-expanding Arrow UDF
    # round-6 additions (round-5 advice): the newest, most iterative /
    # Python-adjacent paths, so regressions there surface per-round
    "graph_pagerank": "collect",          # iterative fixed-point joins
    "sim_ann_pq_topk": "collect",         # PQ codes + ADC + exact re-rank
    "agg_quantile_sketch_merge": "collect",  # KMV segment-then-merge
    # round-7: the at-scale rank-join path (co-partitioned shuffle-hash,
    # nothing broadcast) timed against the broadcast path above so the
    # strategy gate's cost at dimension scale is a measured number
    "graph_pagerank_copart": "collect",
    # round-7: the graph-ANN pair — the k-NN graph build (two blocking
    # joins + per-src top-k) and the iterative beam search (bounded
    # per-hop joins over the pinned edge list, FULL_TIMED because the
    # edge pin executes during construction)
    "sim_knn_graph": "count",
    "sim_ann_graph_topk": "collect",
    # round-8: the vector store's ingest path — new vectors get edges
    # against the standing corpus via the same bounded blocking, no
    # graph rebuild (the batch-vs-corpus shape of dedup_incremental)
    "sim_knn_graph_incremental": "count",
    # round-8: exact-substring dedup (rolling-gram posting pass + span
    # merge — the corpus-token-scaled LLM-pipeline heavyweight) and the
    # PSI drift gate (one scan + 10-row output)
    "dedup_substring_spans": "count",
    "dq_drift_psi": "collect",
    # round-8: hierarchical (two-layer) graph search — coarse-layer
    # routing + base-layer refinement, zero per-query index probes;
    # FULL_TIMED because both walks' eager pins run at construction
    "sim_ann_hnsw_topk": "collect",
    # round-9: the delete half of index maintenance — tombstone a
    # vector batch, drop its lists, repair only the affected survivors
    # from the memoized blocking (never a rebuild) — and span excision,
    # the Lee et al. cleaned remainder (spans joined back to the token
    # arrays, kept text emitted by one JVM higher-order filter)
    "sim_knn_graph_delete": "count",
    "dedup_substring_excised": "count",
    # round-10: metadata-filtered ANN search — the production retrieval
    # query (top-k among quality-kept English docs), filter pushed into
    # the inverted lists before the probe join. The live streaming
    # sinks (sim_knn_graph_*_live, stream_*_gate_live) stay out of the
    # bench: their wall time is dominated by deliberately-serialized
    # micro-batch harness setup, not engine throughput.
    "sim_ann_filtered_topk": "collect",
    # round-10: binary-quantized ANN (two-BIGINT sign sketches, Hamming
    # scan + bounded exact rerank — the 32x-compression scan path) and
    # the recall@k evaluation operator (IVF vs exact truth on the query
    # sample — the monitoring query a retrieval pipeline runs after
    # every index maintenance cycle)
    "sim_ann_binary_topk": "collect",
    "sim_ann_recall_eval": "collect",
    # round-10: the DiskANN serving shape - the beam walk steered by PQ
    # codes (full vectors touched only at the final exact rerank);
    # FULL_TIMED because the walk's eager hop pins run at construction
    # (round-11 retuned the default beam 8 -> 16, the measured
    # recall/cost knee — the ~+0.4 s step vs the r10 series is priced,
    # not drift)
    "sim_ann_graph_adc_topk": "collect",
    # round-11: filtered search on the GRAPH index — the quality∧lang
    # predicate pushed into the beam walk (allowed entry/seeds,
    # dst-filtered expansions with the two-hop closure through blocked
    # waypoints). FULL_TIMED like the other walks: its eager hop pins
    # run at construction. The reindex/funnel live entries stay out of
    # the bench with the other micro-batch harnesses.
    "sim_ann_graph_filtered_topk": "collect",
    # round-12: the SECOND predicate family (source-domain) through the
    # same parameterized closure machinery — timed so the
    # predicate-generalization path's memo discipline (per-family
    # allowed/closure artifacts) has its own measured number. The PQ
    # reindex and live-export entries stay out of the bench with the
    # other micro-batch harnesses.
    "sim_ann_graph_filtered_domain_topk": "collect",
    # round-13: the served-shape recall monitor (beam walk ∩ exact
    # integer-L2 truth over the bounded sample — the recall-SLO query a
    # production store runs after every maintenance cycle) and the
    # maintenance advisor (drift TVD + recall + posting skew folded to
    # per-family verdicts — the monitoring→action decision itself,
    # priced). The CRUD×filtered live entry stays out with the other
    # micro-batch harnesses.
    "sim_ann_recall_eval_graph": "collect",
    "sim_ann_maintenance_advisor": "collect",
}

# Queries timed from CONSTRUCTION start, not just the action: operators
# that materialize state while the DataFrame is being built (AQE resolves
# query stages at toRdd, so an iterative op's localCheckpoint runs real
# jobs before any action fires). Action-only timing would silently
# exclude that work — graph_pagerank derives + pins its annotated edge
# list there (~1/3 of its cost), and sim_ann_pq_topk builds its ADC
# lookup tables and collects its bounded query set. Plan-only queries
# keep the r1–r5 action-only protocol so the series stays comparable
# (their construction is milliseconds of analysis, not engine work).
FULL_TIMED = {
    "sim_ann_graph_adc_topk",
    "sim_ann_graph_filtered_topk",
    "sim_ann_graph_filtered_domain_topk",
    "graph_pagerank",
    "graph_pagerank_copart",
    "sim_ann_pq_topk",
    "sim_ann_graph_topk",
    "sim_ann_hnsw_topk",
    # both compose eagerly-built walk/index state at construction
    "sim_ann_recall_eval_graph",
    "sim_ann_maintenance_advisor",
}

# Like-for-like series: the suite GROWS each round (new entries join the
# bench), so the headline wall is not round-over-round comparable on its
# own. These named subsets pin each round's membership; the emitted
# `legacy_suites` sums let a reader decompose "suite got bigger" from
# "queries got slower" without diffing query lists.
LEGACY_SUITES = {
    # r1–r5 membership (20 queries)
    "r5_20q": [
        "agg_pricing_summary", "join_star_revenue", "join_asof",
        "cdc_materialize", "win_running_total", "agg_top_customers",
        "stream_session_windows", "stream_tumbling_daily", "b8_json_extract",
        "dedup_exact", "dedup_ngram_jaccard", "dedup_embedding_cosine",
        "qx_custdist", "agg_stats_moments", "sim_cosine_topk",
        "sim_ann_ivf_topk", "win_topn_salted", "text_quality_score",
        "multimodal_features", "multimodal_frame_sample",
    ],
    # r6 membership = r5 + the three FULL_TIMED heavy additions
    "r6_23q": [
        "agg_pricing_summary", "join_star_revenue", "join_asof",
        "cdc_materialize", "win_running_total", "agg_top_customers",
        "stream_session_windows", "stream_tumbling_daily", "b8_json_extract",
        "dedup_exact", "dedup_ngram_jaccard", "dedup_embedding_cosine",
        "qx_custdist", "agg_stats_moments", "sim_cosine_topk",
        "sim_ann_ivf_topk", "win_topn_salted", "text_quality_score",
        "multimodal_features", "multimodal_frame_sample",
        "graph_pagerank", "sim_ann_pq_topk", "agg_quantile_sketch_merge",
    ],
    # r7 membership = r6 + the rank-join gate's at-scale path and the
    # graph-ANN pair
    "r7_26q": [
        "agg_pricing_summary", "join_star_revenue", "join_asof",
        "cdc_materialize", "win_running_total", "agg_top_customers",
        "stream_session_windows", "stream_tumbling_daily", "b8_json_extract",
        "dedup_exact", "dedup_ngram_jaccard", "dedup_embedding_cosine",
        "qx_custdist", "agg_stats_moments", "sim_cosine_topk",
        "sim_ann_ivf_topk", "win_topn_salted", "text_quality_score",
        "multimodal_features", "multimodal_frame_sample",
        "graph_pagerank", "sim_ann_pq_topk", "agg_quantile_sketch_merge",
        "graph_pagerank_copart", "sim_knn_graph", "sim_ann_graph_topk",
    ],
    # r8 membership = r7 + the incremental-ingest / substring-span /
    # drift-gate / hierarchical-walk additions
    "r8_30q": [
        "agg_pricing_summary", "join_star_revenue", "join_asof",
        "cdc_materialize", "win_running_total", "agg_top_customers",
        "stream_session_windows", "stream_tumbling_daily", "b8_json_extract",
        "dedup_exact", "dedup_ngram_jaccard", "dedup_embedding_cosine",
        "qx_custdist", "agg_stats_moments", "sim_cosine_topk",
        "sim_ann_ivf_topk", "win_topn_salted", "text_quality_score",
        "multimodal_features", "multimodal_frame_sample",
        "graph_pagerank", "sim_ann_pq_topk", "agg_quantile_sketch_merge",
        "graph_pagerank_copart", "sim_knn_graph", "sim_ann_graph_topk",
        "sim_knn_graph_incremental", "dedup_substring_spans",
        "dq_drift_psi", "sim_ann_hnsw_topk",
    ],
    # r9 membership = r8 + the delete-repair and span-excision entries
    "r9_32q": [
        "agg_pricing_summary", "join_star_revenue", "join_asof",
        "cdc_materialize", "win_running_total", "agg_top_customers",
        "stream_session_windows", "stream_tumbling_daily", "b8_json_extract",
        "dedup_exact", "dedup_ngram_jaccard", "dedup_embedding_cosine",
        "qx_custdist", "agg_stats_moments", "sim_cosine_topk",
        "sim_ann_ivf_topk", "win_topn_salted", "text_quality_score",
        "multimodal_features", "multimodal_frame_sample",
        "graph_pagerank", "sim_ann_pq_topk", "agg_quantile_sketch_merge",
        "graph_pagerank_copart", "sim_knn_graph", "sim_ann_graph_topk",
        "sim_knn_graph_incremental", "dedup_substring_spans",
        "dq_drift_psi", "sim_ann_hnsw_topk",
        "sim_knn_graph_delete", "dedup_substring_excised",
    ],
    # r10 first-half membership = r9 + the metadata-filtered ANN entry
    # (pinned before the round's binary/recall additions joined)
    "r10_33q": [
        "agg_pricing_summary", "join_star_revenue", "join_asof",
        "cdc_materialize", "win_running_total", "agg_top_customers",
        "stream_session_windows", "stream_tumbling_daily", "b8_json_extract",
        "dedup_exact", "dedup_ngram_jaccard", "dedup_embedding_cosine",
        "qx_custdist", "agg_stats_moments", "sim_cosine_topk",
        "sim_ann_ivf_topk", "win_topn_salted", "text_quality_score",
        "multimodal_features", "multimodal_frame_sample",
        "graph_pagerank", "sim_ann_pq_topk", "agg_quantile_sketch_merge",
        "graph_pagerank_copart", "sim_knn_graph", "sim_ann_graph_topk",
        "sim_knn_graph_incremental", "dedup_substring_spans",
        "dq_drift_psi", "sim_ann_hnsw_topk",
        "sim_knn_graph_delete", "dedup_substring_excised",
        "sim_ann_filtered_topk",
    ],
    # full r10 membership (the binary/recall/ADC additions included) —
    # pinned before round 11's filtered-graph entry joined. NOTE: the
    # ADC walk inside this subset runs at the CURRENT default beam
    # (16 from r11 on), so this sum carries the priced ~+0.4 s step.
    "r10_36q": [
        "agg_pricing_summary", "join_star_revenue", "join_asof",
        "cdc_materialize", "win_running_total", "agg_top_customers",
        "stream_session_windows", "stream_tumbling_daily", "b8_json_extract",
        "dedup_exact", "dedup_ngram_jaccard", "dedup_embedding_cosine",
        "qx_custdist", "agg_stats_moments", "sim_cosine_topk",
        "sim_ann_ivf_topk", "win_topn_salted", "text_quality_score",
        "multimodal_features", "multimodal_frame_sample",
        "graph_pagerank", "sim_ann_pq_topk", "agg_quantile_sketch_merge",
        "graph_pagerank_copart", "sim_knn_graph", "sim_ann_graph_topk",
        "sim_knn_graph_incremental", "dedup_substring_spans",
        "dq_drift_psi", "sim_ann_hnsw_topk",
        "sim_knn_graph_delete", "dedup_substring_excised",
        "sim_ann_filtered_topk",
        "sim_ann_binary_topk", "sim_ann_recall_eval",
        "sim_ann_graph_adc_topk",
    ],
    # full r11 membership = r10_36q + the filtered graph walk — pinned
    # before round 12's domain-filtered entry joined
    "r11_37q": [
        "agg_pricing_summary", "join_star_revenue", "join_asof",
        "cdc_materialize", "win_running_total", "agg_top_customers",
        "stream_session_windows", "stream_tumbling_daily", "b8_json_extract",
        "dedup_exact", "dedup_ngram_jaccard", "dedup_embedding_cosine",
        "qx_custdist", "agg_stats_moments", "sim_cosine_topk",
        "sim_ann_ivf_topk", "win_topn_salted", "text_quality_score",
        "multimodal_features", "multimodal_frame_sample",
        "graph_pagerank", "sim_ann_pq_topk", "agg_quantile_sketch_merge",
        "graph_pagerank_copart", "sim_knn_graph", "sim_ann_graph_topk",
        "sim_knn_graph_incremental", "dedup_substring_spans",
        "dq_drift_psi", "sim_ann_hnsw_topk",
        "sim_knn_graph_delete", "dedup_substring_excised",
        "sim_ann_filtered_topk",
        "sim_ann_binary_topk", "sim_ann_recall_eval",
        "sim_ann_graph_adc_topk",
        "sim_ann_graph_filtered_topk",
    ],
    # full r12 membership = r11_37q + the domain-filtered graph walk —
    # pinned before round 13's recall-monitor/advisor entries joined
    "r12_38q": [
        "agg_pricing_summary", "join_star_revenue", "join_asof",
        "cdc_materialize", "win_running_total", "agg_top_customers",
        "stream_session_windows", "stream_tumbling_daily", "b8_json_extract",
        "dedup_exact", "dedup_ngram_jaccard", "dedup_embedding_cosine",
        "qx_custdist", "agg_stats_moments", "sim_cosine_topk",
        "sim_ann_ivf_topk", "win_topn_salted", "text_quality_score",
        "multimodal_features", "multimodal_frame_sample",
        "graph_pagerank", "sim_ann_pq_topk", "agg_quantile_sketch_merge",
        "graph_pagerank_copart", "sim_knn_graph", "sim_ann_graph_topk",
        "sim_knn_graph_incremental", "dedup_substring_spans",
        "dq_drift_psi", "sim_ann_hnsw_topk",
        "sim_knn_graph_delete", "dedup_substring_excised",
        "sim_ann_filtered_topk",
        "sim_ann_binary_topk", "sim_ann_recall_eval",
        "sim_ann_graph_adc_topk",
        "sim_ann_graph_filtered_topk",
        "sim_ann_graph_filtered_domain_topk",
    ],
}


def main() -> None:
    queries, _ = registry()
    # Engine bootstrap — the analog of the reference's ONLY published
    # numbers (BASELINE.md: app startup 5.2 s JVM / 0.09 s native).
    # session_s = SparkSession up; first_query_s = cold first result
    # (plan + codegen + scan), the reference's "cold start" row.
    # One-time install step first: the AppCDS archive (session.py) is
    # part of the engine as deployed — generated once per environment
    # like a deployment image bake, it roughly halves JVM classloading;
    # measuring startup without it would measure the installer, not the
    # engine. Prints nothing; a no-op when the archive exists.
    from cdc_cloudrun_demo_spark.session import ensure_cds_archive

    cds_ready = ensure_cds_archive()
    t0 = time.perf_counter()
    spark = get_spark(app_name="bench")
    session_s = round(time.perf_counter() - t0, 4)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    first_query_s = round(time.perf_counter() - t0, 4)

    # For FULL_TIMED queries the per-run construction/action split is kept
    # (round-6 verdict item 6) so round-over-round drift decomposes into
    # "state build got slower" vs "the action got slower" without reading
    # docs/PLANS.md. The reported split belongs to the best (min-total)
    # run, so construction_s + action_s == the query's reported total.
    splits: dict[str, dict[str, float]] = {}

    def run(name: str) -> float:
        full = name in FULL_TIMED
        if full:
            # measurement hygiene (untimed): the long FULL_TIMED queries
            # otherwise pay the suite's accumulated JVM garbage (dead
            # checkpoint blocks from earlier passes) — measured ~0.25 s
            # of cross-query interference on graph_pagerank
            spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter() if full else None
        df = queries[name](spark, SF_DIR)
        if not full:
            t0 = time.perf_counter()
        t_act = time.perf_counter()
        df.collect() if HEADLINE[name] == "collect" else df.count()
        t1 = time.perf_counter()
        total = round(t1 - t0, 4)
        if full and total < splits.get(name, {}).get("total", float("inf")):
            splits[name] = {
                "total": total,
                "construction_s": round(t_act - t0, 4),
                "action_s": round(t1 - t_act, 4),
            }
        return total

    for name in HEADLINE:  # cold pass, untimed (warm protocol, see docstring)
        run(name)
    splits.clear()  # drop cold-pass splits; keep best-of-timed only
    # best-of-3 timed passes: single-pass numbers swing ±30% with JVM/GC,
    # page-cache state and host noise; the min is the reproducible
    # engine cost (the whole suite is seconds, so extra passes are cheap)
    timings = {name: run(name) for name in HEADLINE}
    for _ in range(2):
        for name in HEADLINE:
            timings[name] = min(timings[name], run(name))

    # Concurrency envelope — the reference's core claim is concurrent
    # request throughput (80 req/container, pool of 5; BASELINE.md). Run
    # a 4-query mix serially, then 4-way concurrent in separate fair
    # pools (session.scoped_pool): speedup > 1 shows the engine
    # multiplexes one context across callers instead of queueing.
    from concurrent.futures import ThreadPoolExecutor

    from cdc_cloudrun_demo_spark.session import scoped_pool

    mix = ["agg_pricing_summary", "qx_custdist", "win_running_total", "dedup_exact"]

    def run_pooled(name: str, pool: str) -> None:
        with scoped_pool(spark, pool):
            run(name)

    t0 = time.perf_counter()
    for name in mix:
        run(name)
    serial_s = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=len(mix)) as pool:
        futs = [pool.submit(run_pooled, n, f"pool{i}") for i, n in enumerate(mix)]
        for f in futs:
            f.result()
    concurrent_s = round(time.perf_counter() - t0, 4)

    # Per-query amortization of the graph-ANN beam walk (round-7 verdict
    # item 2): |Q|=5 prices per-stage scheduling overhead, |Q|=500 the
    # batch-serving shape — all queries ride the SAME per-hop jobs, so
    # per-query cost must collapse. FULL_TIMED protocol (the eager hop
    # pins execute during construction), warm pass then best-of-2.
    def run_batch_ann() -> float:
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        queries["sim_ann_graph_batch"](spark, SF_DIR).collect()
        return round(time.perf_counter() - t0, 4)

    run_batch_ann()  # warm (index + codegen), untimed
    batch_total = min(run_batch_ann(), run_batch_ann())
    q5_total = timings["sim_ann_graph_topk"]
    batch_ann = {
        "n_queries": 500,
        "total_s": batch_total,
        "per_query_ms": round(batch_total / 500 * 1000, 2),
        "q5_total_s": q5_total,
        "q5_per_query_ms": round(q5_total / 5 * 1000, 2),
        "amortization_x": round((q5_total / 5) / (batch_total / 500), 1),
    }

    # same protocol for the binary-sketch scan: the Hamming pass is one
    # job regardless of |Q| (queries broadcast over the sketch scan), so
    # per-query cost must collapse the same way
    from cdc_cloudrun_demo_spark.functions.similarity import sim_ann_binary_topk

    def run_batch_binary() -> float:
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        sim_ann_binary_topk(spark, SF_DIR, n_queries=500).collect()
        return round(time.perf_counter() - t0, 4)

    run_batch_binary()  # warm, untimed
    bin_total = min(run_batch_binary(), run_batch_binary())
    bin_q5 = timings["sim_ann_binary_topk"]
    batch_binary = {
        "n_queries": 500,
        "total_s": bin_total,
        "per_query_ms": round(bin_total / 500 * 1000, 2),
        "q5_total_s": bin_q5,
        "q5_per_query_ms": round(bin_q5 / 5 * 1000, 2),
        "amortization_x": round((bin_q5 / 5) / (bin_total / 500), 1),
    }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Round-14 output-contract hardening (r13 verdict item 2): the
    # round-over-round comparison is parsed from a BOUNDED TAIL capture
    # of this process's stdout (~2.3 KB observed), and by round 12 the
    # single JSON line had grown past that window — the line arrived
    # front-truncated and the whole r12→r13 prev/now table was lost
    # (PERF_r13.json: prev_bench_ok=false). Same numbers, same
    # methodology, re-arranged output only:
    #   1. the CONTRACT line (metric/value/unit/queries/sf + the startup
    #      anchor) prints LAST and stays compact (~1.8 KB) so any tail
    #      window re-parses it;
    #   2. the diagnostic extras (legacy_suites, full_timed_split,
    #      batch_*, concurrency) print on their OWN earlier line;
    #   3. the FULL payload is also written to BENCH_LAST.json beside
    #      this script, immune to stream truncation entirely.
    contract = {
        "metric": "headline-suite wall time",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "startup": {
            "session_s": session_s,
            "first_query_s": first_query_s,
            "cds_archive": cds_ready,
        },
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    extras = {
        "legacy_suites": {
            k: round(sum(timings[n] for n in names), 4)
            for k, names in LEGACY_SUITES.items()
        },
        "full_timed_split": {
            n: {k: v for k, v in s.items() if k != "total"}
            for n, s in splits.items()
        },
        "batch_ann": batch_ann,
        "batch_binary": batch_binary,
        "concurrency": {
            "mix_serial_s": serial_s,
            "mix_concurrent_s": concurrent_s,
            "speedup": round(serial_s / concurrent_s, 2)
            if concurrent_s > 0
            else None,
        },
    }
    full = {**contract, **extras}
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST.json"),
            "w",
        ) as fh:
            json.dump(full, fh, indent=1)
    except OSError:
        pass  # read-only checkout: stdout still carries everything
    print(json.dumps({"bench_extras": extras}))
    print(json.dumps(contract))
    spark.stop()


if __name__ == "__main__":
    main()
