"""Column-level function libraries: text analysis, dedup, similarity.

These are the training-data-pipeline operators (north star, BASELINE.json):
built-in `pyspark.sql.functions` compositions wherever possible (JVM-side,
whole-stage-codegen'd), pandas UDFs only where array math genuinely needs
them.
"""
