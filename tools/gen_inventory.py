"""Regenerate the SURVEY.md §2.3 implemented-surface inventory from the
live registry. Usage: python tools/gen_inventory.py (prints markdown)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cdc_cloudrun_demo_spark.operators import registry
from cdc_cloudrun_demo_spark.functions import dedup, ml, pipeline, similarity, text
from cdc_cloudrun_demo_spark.sources import file_formats, jdbc_io, multimodal, postgres_io
from cdc_cloudrun_demo_spark.operators import (aggregates, analytics, bench_ops,
    cdc, graph, joins, layout, metrics, quality, relational, sampling,
    scalar_fns, schema_evolution, setops, sql_features, streaming_batch, windows)

q, o = registry()
groups = [
 ("Relational surface (S1-S9)", relational), ("Metrics (M1-M3)", metrics),
 ("Benchmark analytics (B1-B9)", bench_ops), ("CDC fold", cdc),
 ("Joins", joins), ("Aggregations", aggregates),
 ("Composite analytics (TPC-H-shaped)", analytics), ("Windows", windows),
 ("Set ops", setops), ("Scalar functions", scalar_fns),
 ("Sampling & reshape", sampling),
 ("SQL-surface features (recursive CTE / EXECUTE IMMEDIATE / scripting / observe / XML)", sql_features),
 ("ML on sufficient statistics", ml),
 ("Event-time windows (batch twins)", streaming_batch),
 ("Dedup", dedup), ("Similarity search", similarity), ("Text analysis", text),
 ("Export pipeline (PII/sharding/novelty/packing)", pipeline),
 ("Data layout (Z-order + Hilbert clustering)", layout),
 ("Graph analytics (PageRank, triangles, degree stats)", graph),
 ("Data quality (constraint suite)", quality),
 ("Multimodal", multimodal), ("JDBC ingestion", jdbc_io),
 ("File-format ingestion (CSV/JSONL)", file_formats),
 ("Schema evolution", schema_evolution),
]
from cdc_cloudrun_demo_spark import serving
groups.append(("Live serving (REST CRUD loop)", serving))
groups.append(("PostgreSQL integration (real server, COPY transport)", postgres_io))
print("### 2.3 Implemented surface (generated from the registry; regenerate via tools/gen_inventory.py)\n")
print(f"**{len(q)} `queries()` entries, {len(o)} with DuckDB oracles** (the rest are")
print("approximate/engine-specific → rows-only check + property tests, marked †).\n")
for title, mod in groups:
    names = sorted(mod.QUERIES)
    cells = [n + ("" if n in o else " †") for n in names]
    print(f"- **{title}** ({len(names)}): " + ", ".join(f"`{c}`" for c in cells))
