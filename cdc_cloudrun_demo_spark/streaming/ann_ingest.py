"""LIVE ANN-index ingest: a Structured Streaming sink that maintains the
on-disk k-NN graph index per micro-batch — the vector-store production
shape where embeddings arrive continuously and every search must see a
current index, with NO rebuild ever.

Per micro-batch the sink (1) hashes the arriving vectors with the SAME
frozen artifacts the standing corpus was indexed with (LSH planes are a
pure per-row function; the IVF quantizer is trained once at bootstrap
and frozen — production retrains on schedule, not per batch), (2)
appends the batch's posting/cell/vector shards to the on-disk index
(idempotent per-batch subdir overwrite, so a replayed batch rewrites its
own shard and nothing else), (3) scores exactly the NEW candidate pairs
— batch sources against everything seen, plus the back-edges existing
sources gain toward the arrivals — and (4) merges them into the standing
edge list by per-src top-k, which is lossless for fixed k
(topk(topk(A) ∪ B) = topk(A ∪ B); the `sim_knn_graph_upsert` algebra,
functions/similarity.py). Because every blocked pair (s, d) surfaces at
the batch max(batch(s), batch(d)) and the merge is order-independent,
the maintained state after the last batch EQUALS the one-shot rebuild —
`sim_knn_graph_live` hash-matches the rebuild's DuckDB oracle.

Commit protocol: each batch's edge list lands in a fresh versioned dir
and a `_latest` pointer file swaps in atomically (write-temp + rename),
with batch_id replay-skip — the manifest-pointer discipline of
streaming/tx_snapshot.py reduced to one pointer. A crash between shard
write and pointer swap leaves the previous index fully readable; the
replayed batch overwrites its own shards and re-merges.

Scale shape: per batch the candidate joins are |batch| × posting-mates
(never corpus²), the merge is one window over standing ∪ new edge rows,
and reads serve from the pointed-at snapshot while the next batch
builds. Reference anchor: the reference ingests rows one INSERT at a
time (MessageController.java:30-40); this is the index-maintaining
streaming analog."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

VEC_SCHEMA = "vec_id long, embedding array<float>"


def _pointer_path(state_dir: str) -> str:
    return os.path.join(state_dir, "_latest")


def _read_pointer(state_dir: str) -> dict | None:
    try:
        with open(_pointer_path(state_dir)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _swap_pointer(state_dir: str, meta: dict) -> None:
    tmp = _pointer_path(state_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, _pointer_path(state_dir))  # atomic publish


def ann_index_sink(
    vec_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    cent_rows: list[tuple[int, list[int]]],
    k_edges: int = 8,
    retain_edge_versions: int = 2,
):
    """foreachBatch sink maintaining the on-disk ANN graph (module
    docstring). State layout under ``state_dir``:

    - ``vecs/batch=<id>/``  quantized vectors (vec_id, qv)
    - ``post/batch=<id>/``  LSH postings (tbl, bucket, vec_id)
    - ``cell/batch=<id>/``  IVF top-2-cell postings (vec_id, cell)
    - ``edges/v<id>/``      the maintained edge list (src, dst, d2_units)
    - ``_latest``           atomic pointer {batch_id, edges}

    ``retain_edge_versions``: superseded edge snapshots are vacuumed
    AFTER each pointer swap, keeping the newest N (the pointed-at one
    plus grace for readers still holding an older pointer) — without
    this the per-batch versioned dirs grow without bound, the exact
    state-growth failure the tombstone-TTL work closed for the CDC
    sinks. The shard dirs (vecs/post/cell) are the standing index
    itself, not per-version state, and are never vacuumed."""
    from ..functions.similarity import (
        _int_dist2,
        ivf_ranked_cells,
        lsh_postings_for,
        quantized_vec,
    )

    spark = vec_stream.sparkSession
    ranked = ivf_ranked_cells(cent_rows)
    w = Window.partitionBy("src").orderBy(F.asc("d2_units"), F.asc("dst"))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        prev = _read_pointer(state_dir)
        if prev is not None and batch_id <= prev["batch_id"]:
            batch_df.count()  # drain the replayed batch (state-commit rule)
            return
        batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            shard = f"batch={batch_id}"
            bq = batch_df.select(
                "vec_id", quantized_vec(F.col("embedding")).alias("qv")
            )
            bpost = lsh_postings_for(batch_df).select("tbl", "bucket", "vec_id")
            bcell = batch_df.select(
                "vec_id",
                F.explode(F.slice(ranked(F.col("embedding")), 1, 2)).alias(
                    "cell"
                ),
            )
            for name, df in (("vecs", bq), ("post", bpost), ("cell", bcell)):
                df.write.mode("overwrite").parquet(
                    os.path.join(state_dir, name, shard)
                )
            # seen ∪ batch — the shard just written is included
            post = spark.read.parquet(os.path.join(state_dir, "post"))
            cell = spark.read.parquet(os.path.join(state_dir, "cell"))
            vecs = spark.read.parquet(os.path.join(state_dir, "vecs"))
            bp = spark.read.parquet(os.path.join(state_dir, "post", shard))
            bc = spark.read.parquet(os.path.join(state_dir, "cell", shard))

            def pairs(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
                return (
                    a.select(*keys, F.col("vec_id").alias("src"))
                    .join(b.select(*keys, F.col("vec_id").alias("dst")), keys)
                    .filter(F.col("src") != F.col("dst"))
                    .select("src", "dst")
                )

            pk, ck = ["tbl", "bucket"], ["cell"]
            # forward (batch src × seen∪batch) and back (seen src ×
            # batch dst) — every pair the arrivals create, nothing else
            cand = (
                pairs(bp, post, pk)
                .union(pairs(post, bp, pk))
                .union(pairs(bc, cell, ck))
                .union(pairs(cell, bc, ck))
                .dropDuplicates(["src", "dst"])
            )
            scored = (
                cand.join(
                    vecs.select(
                        F.col("vec_id").alias("src"), F.col("qv").alias("qa")
                    ),
                    "src",
                )
                .join(
                    vecs.select(
                        F.col("vec_id").alias("dst"), F.col("qv").alias("qb")
                    ),
                    "dst",
                )
                .select(
                    "src",
                    "dst",
                    _int_dist2(F.col("qa"), F.col("qb")).alias("d2_units"),
                )
            )
            merged = scored
            if prev is not None:
                old = spark.read.parquet(
                    os.path.join(state_dir, prev["edges"])
                )
                merged = old.unionByName(scored).dropDuplicates(["src", "dst"])
            edges_rel = os.path.join("edges", f"v{batch_id}")
            (
                merged.withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") <= k_edges)
                .select("src", "dst", "d2_units")
                .write.mode("overwrite")
                .parquet(os.path.join(state_dir, edges_rel))
            )
            _swap_pointer(state_dir, {"batch_id": batch_id, "edges": edges_rel})
            # vacuum superseded edge snapshots behind the retention
            # window (strictly after the publish: a crash here leaves
            # only extra old versions, never a missing current one)
            import re
            import shutil

            edir = os.path.join(state_dir, "edges")
            versions = sorted(
                int(m.group(1))
                for m in (
                    re.fullmatch(r"v(\d+)", d) for d in os.listdir(edir)
                )
                if m
            )
            for v in versions[: -max(1, retain_edge_versions)]:
                shutil.rmtree(os.path.join(edir, f"v{v}"), ignore_errors=True)
        finally:
            batch_df.unpersist()

    return (
        vec_stream.writeStream.foreachBatch(process_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_ann_index(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained edge list at the pointed-at snapshot — what every
    search (`sim_ann_graph_topk`'s walk) would read."""
    ptr = _read_pointer(state_dir)
    if ptr is None:
        return spark.createDataFrame(
            [], "src long, dst long, d2_units long"
        )
    return spark.read.parquet(os.path.join(state_dir, ptr["edges"]))
