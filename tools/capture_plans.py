"""Capture `.explain("formatted")` for the queries touched in an
optimization round. Usage:

    PLANS_DIR=r14 python tools/capture_plans.py before|after [query ...]

Writes plans/$PLANS_DIR/<query>_<tag>.txt for each named query (default:
the round's touched list). Plans are captured at sf0.1 — the bench
scale — so exchange counts and join strategies match what the bench
times. For BEFORE plans, check out the previous round's tree in a git
worktree and run this script from there with PLANS_OUT pointing at the
main checkout's plans dir.
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
    "graph_pagerank",
    "graph_pagerank_copart",
    "dedup_ngram_jaccard",
]

names = sys.argv[2:] or DEFAULT
q, _ = registry()
spark = get_spark(app_name="plancap")
spark.sparkContext.setLogLevel("ERROR")
out_dir = os.environ.get("PLANS_OUT") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_DIR", "r14"),
)
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
