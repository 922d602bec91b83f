"""Training-data export pipeline ops (`functions/pipeline.py`): PII
redaction semantics on a crafted fixture, shard/split determinism and
order-independence, novelty on a known duplicate, and the plan-shape
guarantees (narrow where claimed, bounded group state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_cloudrun_demo_spark.functions.pipeline import (
    N_SHARDS,
    pipeline_shard_manifest,
    pipeline_split_assign,
    text_novelty,
    text_pii_redact,
    text_word_bigrams,
)
from cdc_cloudrun_demo_spark.plans import (
    count_exchanges,
    formatted_plan,
    reads_columns,
)
from tests.test_llm_ops import _write_documents


def test_pii_redact_counts_and_redacts(spark, tmp_path):
    rows = [
        (1, "mail me at alice.smith+work@example.co.uk or bob@x.io today"),
        (2, "call 555-867-5309 or 555.123.4567, server at 10.0.0.1"),
        (3, "no pii here at all"),
    ]
    _write_documents(spark, str(tmp_path), rows)
    got = {r["doc_id"]: r for r in text_pii_redact(spark, str(tmp_path)).collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ipv4"]) == (2, 0, 0)
    assert (got[2]["n_emails"], got[2]["n_phones"], got[2]["n_ipv4"]) == (0, 2, 1)
    assert (got[3]["n_emails"], got[3]["n_phones"], got[3]["n_ipv4"]) == (0, 0, 0)
    # the redacted hash equals the hash of the placeholder text, and an
    # un-redacted doc hashes to its original text
    expected1 = spark.sql(
        "SELECT md5('mail me at <EMAIL> or <EMAIL> today') AS h"
    ).collect()[0]["h"]
    expected3 = spark.sql("SELECT md5('no pii here at all') AS h").collect()[0]["h"]
    assert got[1]["redacted_md5"] == expected1
    assert got[3]["redacted_md5"] == expected3


def test_pii_redact_is_narrow(spark, sf_smoke):
    """PII scrub is a projection: zero exchanges, 2-column scan."""
    df = text_pii_redact(spark, sf_smoke)
    assert count_exchanges(df) == 0, formatted_plan(df)
    assert set(reads_columns(df)) == {"doc_id", "text"}, reads_columns(df)


def test_word_bigrams_counts_multiplicity_and_docs(spark, tmp_path):
    rows = [
        (1, "red fox red fox"),  # 'red fox' x2, 'fox red' x1
        (2, "red fox jumps"),  # 'red fox' x1, 'fox jumps' x1
    ]
    _write_documents(spark, str(tmp_path), rows)
    got = {
        r["bigram"]: (r["n_occurrences"], r["n_docs"])
        for r in text_word_bigrams(spark, str(tmp_path)).collect()
    }
    assert got["red fox"] == (3, 2)
    assert got["fox red"] == (1, 1)
    assert got["fox jumps"] == (1, 1)


def test_novelty_zero_for_duplicate_doc(spark, tmp_path):
    """A verbatim duplicate of an earlier doc has novelty 0; the first
    occurrence (and a doc with all-fresh grams) has novelty 1."""
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),  # exact dup of 1
        (3, "one two three four"),  # all-new grams
    ]
    _write_documents(spark, str(tmp_path), rows)
    got = {r["doc_id"]: r for r in text_novelty(spark, str(tmp_path)).collect()}
    assert got[1]["novelty_frac"] == 1.0
    assert got[2]["novelty_frac"] == 0.0
    assert got[3]["novelty_frac"] == 1.0
    assert got[2]["n_grams"] == got[1]["n_grams"] == 3


def test_shard_manifest_deterministic_and_partitioning_invariant(spark, sf_smoke):
    """The manifest digest is an order-independent fold: any physical
    partitioning of the same membership yields identical rows — the
    property that lets a 100 TB export validate against a re-run."""
    base = pipeline_shard_manifest(spark, sf_smoke).collect()
    assert len(base) == N_SHARDS  # every shard populated at 500 docs
    # recompute over a violently repartitioned copy of the same table
    import cdc_cloudrun_demo_spark.functions.pipeline as pl

    d = spark.read.parquet(f"{sf_smoke}/documents.parquet").repartition(13, "lang")
    shard = (pl._knuth_hash(F.col("doc_id")) % F.lit(N_SHARDS)).alias("shard")
    v = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % F.lit(1000003)
    )
    again = (
        d.select(shard, "doc_id", "n_chars", v.alias("v"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("v").alias("manifest_digest"),
        )
        .collect()
    )
    assert sorted(map(tuple, base)) == sorted(map(tuple, again))


def test_shard_manifest_state_is_bounded(spark, sf_smoke):
    """No collect_list / sort_array in the plan: per-group state must be
    scalars, or the manifest would not survive a trillion-doc shard."""
    plan = formatted_plan(pipeline_shard_manifest(spark, sf_smoke))
    assert "collect_list" not in plan and "sort_array" not in plan, plan


def test_split_assign_fractions_and_stability(spark, sf_smoke):
    rows = pipeline_split_assign(spark, sf_smoke).collect()
    by_split: dict[str, int] = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    total = sum(by_split.values())
    assert by_split["train"] / total > 0.9
    assert 0 < by_split.get("val", 0) + by_split.get("test", 0) < 0.1 * total
    # pure function of doc_id: a second evaluation is row-identical
    again = pipeline_split_assign(spark, sf_smoke).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_zorder_layout_improves_two_column_pruning(spark, sf_smoke, tmp_path):
    """The point of the Morton key, proven against real parquet footers:
    range-partition lineitem into 16 files by (a) l_orderkey and (b) the
    z-order key, then for an l_partkey range predicate count the files
    whose row-group [min,max] stats overlap the range — what any
    stats-based reader (parquet filter pushdown, Delta/Iceberg file
    skipping) scans. Single-column order gives no l_partkey clustering
    (every file overlaps); Z-order must prune strictly more files, while
    still pruning on l_orderkey too."""
    import pyarrow.parquet as pq

    from cdc_cloudrun_demo_spark.operators.layout import layout_zorder_key

    keyed = layout_zorder_key(spark, sf_smoke)
    n_files = 16

    def write_sorted(col, path):
        keyed.repartitionByRange(n_files, F.col(col)).sortWithinPartitions(
            col
        ).write.mode("overwrite").parquet(path)

    by_order = str(tmp_path / "by_orderkey")
    by_z = str(tmp_path / "by_zkey")
    write_sorted("l_orderkey", by_order)
    write_sorted("zkey", by_z)

    def overlapping_files(path, col, lo, hi):
        import glob

        n = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            schema_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            fmin = min(
                md.row_group(g).column(schema_idx[col]).statistics.min
                for g in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(g).column(schema_idx[col]).statistics.max
                for g in range(md.num_row_groups)
            )
            if fmax >= lo and fmin <= hi:
                n += 1
        return n

    stats = keyed.agg(
        F.min("l_partkey").alias("mn"), F.max("l_partkey").alias("mx")
    ).collect()[0]
    # a ~10%-selectivity partkey range
    lo = stats["mn"]
    hi = stats["mn"] + (stats["mx"] - stats["mn"]) // 10
    naive = overlapping_files(by_order, "l_partkey", lo, hi)
    zord = overlapping_files(by_z, "l_partkey", lo, hi)
    assert zord < naive, (zord, naive)
    # and the z-layout still prunes the other dimension as well: an
    # orderkey range must not need every file either
    ostats = keyed.agg(
        F.min("l_orderkey").alias("mn"), F.max("l_orderkey").alias("mx")
    ).collect()[0]
    olo = ostats["mn"]
    ohi = ostats["mn"] + (ostats["mx"] - ostats["mn"]) // 10
    assert overlapping_files(by_z, "l_orderkey", olo, ohi) < n_files


def test_pii_redaction_is_idempotent(spark, tmp_path):
    """Redacting already-redacted text is a no-op: the placeholder tokens
    contain no match for any detector (the property that lets a pipeline
    re-run the scrub safely on partially-processed data)."""
    rows = [
        (1, "alice@example.com called 555-867-5309 from 10.0.0.1"),
        (2, "plain text"),
    ]
    _write_documents(spark, str(tmp_path), rows)
    once = {r["doc_id"]: r for r in text_pii_redact(spark, str(tmp_path)).collect()}
    # build a corpus whose text IS the redacted text, re-run the scrub
    from pyspark.sql import functions as _F

    from cdc_cloudrun_demo_spark.functions.pipeline import (
        _EMAIL_RE,
        _IPV4_RE,
        _PHONE_RE,
    )

    d = spark.read.parquet(f"{tmp_path}/documents.parquet")
    redacted_text = _F.regexp_replace(
        _F.regexp_replace(
            _F.regexp_replace(_F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IPV4_RE,
        "<IP>",
    )
    d.select(
        "doc_id", redacted_text.alias("text"), "lang", "source", "n_chars"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/round2/documents.parquet")
    twice = {
        r["doc_id"]: r
        for r in text_pii_redact(spark, f"{tmp_path}/round2").collect()
    }
    for i in (1, 2):
        assert (twice[i]["n_emails"], twice[i]["n_phones"], twice[i]["n_ipv4"]) == (
            0,
            0,
            0,
        )
        assert twice[i]["redacted_md5"] == once[i]["redacted_md5"]


def test_zorder_interleave_is_bijective_and_monotone():
    """Pure-math properties of the Morton interleave (mirrors the SQL
    expression bit for bit): (a) bijective on 16-bit pairs — deinterleave
    recovers the inputs; (b) monotone in each argument with the other
    fixed — the ordering property range-partition pruning relies on."""
    from hypothesis import given
    from hypothesis import strategies as st

    def interleave(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    def deinterleave(z: int) -> tuple[int, int]:
        a = b = 0
        for i in range(16):
            a |= ((z >> (2 * i)) & 1) << i
            b |= ((z >> (2 * i + 1)) & 1) << i
        return a, b

    u16 = st.integers(min_value=0, max_value=(1 << 16) - 1)

    @given(u16, u16, u16)
    def check(a, b, c):
        assert deinterleave(interleave(a, b)) == (a, b)
        if a < c:
            assert interleave(a, b) != interleave(c, b)
            # fixing b, the even-bit contribution is monotone in a
            assert interleave(a, 0) < interleave(c, 0)

    check()


def test_zorder_sql_matches_python_model(spark):
    """The generated Spark SQL interleave expression equals the Python
    reference model on a deterministic grid (so both engines' SQL — which
    hash-matched in parity — also equals the spec, not just each other)."""
    from cdc_cloudrun_demo_spark.operators.layout import _interleave_sql

    def interleave(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    pairs = [(a, b) for a in (0, 1, 2, 255, 65535, 43690) for b in (0, 1, 37, 65535)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.selectExpr(
            "a", "b", f"({_interleave_sql('a', 'b', 'fn')}) AS z"
        ).collect()
    }
    for (a, b), z in got.items():
        assert z == interleave(a, b), (a, b, z)


def test_pii_cards_luhn_discriminates(spark, tmp_path):
    """The checksum, not the regex, decides: a well-formed but
    Luhn-invalid 16-digit number is a candidate, never a detection.
    4532015112830366 is Luhn-valid; flipping its last digit is not;
    separators don't matter."""
    rows = [
        (1, "pay with 4532015112830366 today"),  # valid
        (2, "pay with 4532015112830367 today"),  # invalid (last digit)
        (3, "card 4532-0151-1283-0366 and 1234 5678 9012 3456"),  # 1 of 2
        (4, "no numbers at all"),
    ]
    _write_documents(spark, str(tmp_path), rows)
    from cdc_cloudrun_demo_spark.functions.pipeline import text_pii_cards

    got = {
        r["doc_id"]: (r["n_candidates"], r["n_luhn_valid"])
        for r in text_pii_cards(spark, str(tmp_path)).collect()
    }
    assert got[1] == (1, 1)
    assert got[2] == (1, 0)
    assert got[3] == (2, 1)
    assert got[4] == (0, 0)


def test_export_shards_files_match_claimed_manifest(spark, sf_smoke, tmp_path):
    """Write-side validation loop: export the corpus into its shard
    layout, recompute the manifest from the files on disk, and assert
    row-for-row equality with the source-side manifest — the check a
    training job runs before trusting an export. Also: every doc lands
    in exactly one shard directory (no loss, no duplication)."""
    from cdc_cloudrun_demo_spark.functions.pipeline import export_shards

    out = str(tmp_path / "shards")
    from_files = export_shards(spark, sf_smoke, out).collect()
    claimed = pipeline_shard_manifest(spark, sf_smoke).collect()
    assert sorted(map(tuple, from_files)) == sorted(map(tuple, claimed))
    total_written = spark.read.parquet(out).count()
    total_src = spark.read.parquet(f"{sf_smoke}/documents.parquet").count()
    assert total_written == total_src


def _hilbert_xy2d_py(n_side: int, x: int, y: int) -> int:
    """Independent reference: the public-domain Wikipedia xy2d walk."""
    d = 0
    s = n_side // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n_side - 1 - x
                y = n_side - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_sql_is_bijective_adjacent_and_matches_python(spark):
    """The unrolled SQL walk must (a) agree with an independent Python
    implementation of the standard algorithm on every cell of a 16x16
    subgrid plus boundary cells of the full 256x256 grid, (b) be a
    bijection on the subgrid's key range, and (c) have the defining
    Hilbert property on a full small grid: consecutive keys are always
    Manhattan-ADJACENT cells (no quadrant-seam teleports — the locality
    edge over Morton order)."""
    from pyspark.sql import functions as F

    from cdc_cloudrun_demo_spark.operators.layout import (
        _HBITS,
        _HSIDE,
        hilbert_step_exprs,
    )

    cells = [(x, y) for x in range(16) for y in range(16)]
    cells += [(x, y) for x in (0, 127, 128, 255) for y in (0, 127, 128, 255)]
    df = spark.createDataFrame(cells, "hx int, hy int").withColumn(
        "hd", F.lit(0).cast("long")
    ).withColumn("x0", F.col("hx")).withColumn("y0", F.col("hy"))
    for level in range(_HBITS - 1, -1, -1):
        x_new, y_new, d_new = hilbert_step_exprs(level, "hx", "hy", "hd")
        df = df.select(
            "x0", "y0",
            F.expr(x_new).alias("hx"),
            F.expr(y_new).alias("hy"),
            F.expr(d_new).alias("hd"),
        )
    got = {(r["x0"], r["y0"]): r["hd"] for r in df.collect()}
    for (x, y), d in got.items():
        assert d == _hilbert_xy2d_py(_HSIDE, x, y), (x, y, d)

    # (c) adjacency on a complete 16x16 Hilbert grid (n=16 reference walk)
    order = sorted(
        ((_hilbert_xy2d_py(16, x, y), x, y) for x in range(16) for y in range(16))
    )
    assert len({d for d, _, _ in order}) == 256  # bijection
    for (d1, x1, y1), (d2, x2, y2) in zip(order, order[1:]):
        assert d2 == d1 + 1 and abs(x1 - x2) + abs(y1 - y2) == 1, (d1, d2)


def test_zorder_key_survives_wide_int_spans(spark, tmp_path):
    """The z-key normalization must widen to BIGINT BEFORE multiplying
    by the 16-bit scale (round-9 advice): on a 32-bit INT column with a
    span above ~32k, (col - mn) * 65535 overflows INT silently under
    non-ANSI arithmetic and scrambles z-keys with no error. Corners pin
    the exact values: (mn, mn) -> 0 and (mx, mx) -> 2^32 - 1."""
    import os

    from cdc_cloudrun_demo_spark.operators.layout import layout_zorder_key

    sf = str(tmp_path)
    spark.createDataFrame(
        [(0, 0), (70000, 70000), (35000, 12345)],
        "l_orderkey int, l_partkey int",  # 32-bit on purpose
    ).coalesce(1).write.parquet(os.path.join(sf, "lineitem.parquet"))
    rows = {
        r["l_orderkey"]: r["zkey"]
        for r in layout_zorder_key(spark, sf).collect()
    }
    assert all(v >= 0 for v in rows.values()), rows
    assert rows[0] == 0
    assert rows[70000] == (1 << 32) - 1


def test_curation_funnel_is_monotone_and_matches_export(spark, sf_oracle):
    """The funnel must be monotone non-increasing across stages, start
    at the corpus size, and its final stage must equal the export
    composition's survivor count — the report can never drift from what
    the export ships."""
    from pyspark.sql import functions as F

    from cdc_cloudrun_demo_spark.catalog import load_table
    from cdc_cloudrun_demo_spark.functions.pipeline import (
        pipeline_curation_export,
        pipeline_curation_funnel,
    )

    rows = {
        r["stage_idx"]: r["n_docs"]
        for r in pipeline_curation_funnel(spark, sf_oracle).collect()
    }
    assert sorted(rows) == [0, 1, 2, 3]
    assert rows[0] == load_table(spark, sf_oracle, "documents").count()
    assert rows[0] >= rows[1] >= rows[2] >= rows[3] > 0
    shipped = (
        pipeline_curation_export(spark, sf_oracle)
        .agg(F.sum("n_docs"))
        .collect()[0][0]
    )
    assert rows[3] == shipped
