"""cdc_cloudrun_demo_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
repo hoquangnam45/cdc-cloudrun-demo (a Cloud Run CRUD/CDC demo over
PostgreSQL) as an idiomatic Spark engine:

* the CRUD surface (``message`` table, reference
  ``hello_cloud_run/.../MessageController.java:17-45``) becomes a CDC
  change-event fold materialized with window functions (batch) and
  Structured Streaming (streaming);
* the ``/metrics`` derived-scalar analytics
  (``MetricsController.java:34-118``) become computed-column projections;
* the bash benchmark aggregation pipelines
  (``unified_performance_test.sh:152-593``) become DataFrame group-bys,
  windows and pivots;
* on top, the LLM-data-pipeline operator set (dedup, similarity search,
  text analysis, multimodal columns) designed for 100 TB scale.

Everything is public PySpark DataFrame/SQL API; Catalyst does the
optimizing. No code is copied from the reference.
"""

__version__ = "0.1.0"
