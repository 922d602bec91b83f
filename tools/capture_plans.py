"""Capture `.explain("formatted")` for the queries touched in the r13
optimization round. Usage:

    python tools/capture_plans.py before|after [query ...]

Writes plans/r13/<query>_<tag>.txt for each named query (default: the
full touched list). Plans are captured at sf0.1 — the bench scale — so
exchange counts and join strategies match what the bench times.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_cloudrun_demo_spark.operators import registry
from cdc_cloudrun_demo_spark.session import get_spark

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "sim_ann_graph_topk",
    "sim_ann_graph_adc_topk",
    "sim_ann_graph_filtered_topk",
    "sim_ann_graph_filtered_domain_topk",
    "sim_ann_hnsw_topk",
    "sim_ann_recall_eval_graph",
    "sim_ann_maintenance_advisor",
    "sim_knn_graph_delete",
    "sim_knn_graph_incremental",
    "graph_pagerank",
    "graph_pagerank_copart",
    "sim_ann_pq_topk",
    "dedup_substring_spans",
    "multimodal_frame_sample",
    "sim_ann_recall_eval",
    "dedup_ngram_jaccard",
    "win_topn_salted",
    "join_star_revenue",
    "agg_pricing_summary",
    "sim_ann_binary_topk",
]

names = sys.argv[2:] or DEFAULT
q, _ = registry()
spark = get_spark(app_name="plancap")
spark.sparkContext.setLogLevel("ERROR")
out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
os.makedirs(out_dir, exist_ok=True)

for name in names:
    df = q[name](spark, SF)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    path = os.path.join(out_dir, f"{name}_{TAG}.txt")
    with open(path, "w") as fh:
        fh.write(plan.strip() + "\n")
    n_exch = plan.count("Exchange")
    n_smj = plan.count("SortMergeJoin")
    n_bhj = plan.count("BroadcastHashJoin")
    n_py = plan.count("EvalPython")
    print(f"{name}: Exchange={n_exch} SMJ={n_smj} BHJ={n_bhj} PyEval={n_py} -> {path}")
spark.stop()
