"""Scalar function coverage: string / date / math / conditional / regexp / JSON.

The reference's only scalar computation is formatting arithmetic in
``MetricsController.java:53-73`` (M1); SURVEY §2.2 plans the full scalar
surface. Cross-engine notes: transcendental fns (exp/log/pow) are not
correctly-rounded and may differ between JVM and libm in the last ulp, so
oracle-checked outputs stick to IEEE-exact ops (+,−,×,÷,sqrt, abs, floor,
ceil, mod) and scale≥1 rounding (whose decimal boundaries are non-dyadic,
hence rounding-mode-proof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def fn_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.lower(F.col("p_brand")).alias("brand_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.trim(F.col("p_name")).alias("name_trim"),
    )


def fn_date_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.month(d).cast("long").alias("order_month"),
        F.dayofmonth(d).cast("long").alias("order_day"),
        F.date_trunc("month", d).alias("month_start"),
        # date-typed outputs are cast to timestamp: pandas materializes
        # dates and midnight-timestamps identically, engines don't
        F.to_date(d).cast("timestamp").alias("order_date"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.datediff(F.to_date(F.lit("2025-01-01")), F.to_date(d)).cast("long").alias(
            "days_to_2025"
        ),
    )


def fn_math_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    x = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        F.abs(x - 1000.0).alias("abs_diff"),
        F.ceil(x).cast("long").alias("price_ceil"),
        F.floor(x).cast("long").alias("price_floor"),
        F.round(x / 7.0, 2).alias("price_div_round"),
        F.sqrt(x).alias("price_sqrt"),
        (F.col("l_orderkey") % 10).cast("long").alias("key_mod"),
        (x * x).alias("price_sq"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "overdrawn")
        .when(bal < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("CAR"))
        .alias("segment_renamed"),
        F.least(bal, F.lit(1000.0)).alias("capped_bal"),
        F.greatest(bal, F.lit(0.0)).alias("floored_bal"),
    )


def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract(F.col("text"), "([A-Za-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]+"), 0))
        .cast("long")
        .alias("n_words"),
        F.col("text").rlike("data").alias("mentions_data"),
        F.regexp_replace(F.col("text"), "[aeiou]", "").substr(1, 20).alias(
            "devoweled_prefix"
        ),
    )


def fn_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
        F.to_json(
            F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("type"))
        ).alias("event_json"),
    )


def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/collection functions over the embedding vectors: size,
    element access (both ends), extrema, and a slice-sum — raw floats come
    bit-identical from parquet in both engines, so double-cast results
    compare exactly (sum over a 4-element slice is one rounding chain,
    deterministic left fold in both engines)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_el"),
        F.element_at(emb, -1).cast("double").alias("last_el"),
        F.array_max(emb).cast("double").alias("max_el"),
        F.array_min(emb).cast("double").alias("min_el"),
        F.aggregate(
            F.slice(emb, 1, 4), F.lit(0.0), lambda acc, x: acc + x.cast("double")
        ).alias("head4_sum"),
    )


def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction and access (create_map / getItem /
    map_contains_key / size). The map is built and consumed JVM-side;
    outputs are scalars so the oracle compares plain columns (DuckDB's
    MAP ordering/rendering differs, values don't)."""
    n = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    return n.select(
        "n_nationkey",
        m.getItem("name").alias("map_name"),
        m.getItem("region").alias("map_region"),
        m.getItem("absent").alias("map_absent"),
        F.map_contains_key(m, "region").alias("has_region"),
        F.size(m).cast("long").alias("map_size"),
    )


def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar functions over integer keys (&, |, xor, shifts) —
    the bit-twiddling surface sketch/bitmap operators build on."""
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey").cast("long")
    r = F.col("n_regionkey").cast("long")
    return n.select(
        "n_nationkey",
        k.bitwiseAND(r).alias("k_and_r"),
        k.bitwiseOR(r).alias("k_or_r"),
        k.bitwiseXOR(r).alias("k_xor_r"),
        F.shiftleft(k, 3).cast("long").alias("k_shl3"),
        F.shiftright(k, 1).cast("long").alias("k_shr1"),
        F.bit_count(k).cast("long").alias("k_popcount"),
    )


def fn_url_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL construction + parsing (parse_url HOST/PATH/QUERY-key): the log
    analytics surface. The URL is synthesized from table columns, so the
    oracle can state each component directly — what parse_url must
    recover."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe functions: `try_divide` NULLs out the ~1-in-7
    zero-divisor rows instead of raising (or silently yielding ±inf),
    and `try_cast` NULLs the unparseable priority strings — the
    fail-soft contract an ingest pipeline needs so one malformed row
    can't kill a 100 TB job. The divisor is an exact small-int-derived
    double, so the surviving quotients are one identical IEEE division
    in both engines."""
    o = load_table(spark, sf_dir, "orders")
    div = (F.col("o_custkey") % 7).cast("double")
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), div).alias("safe_ratio"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("prio_bad_cast"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias("prio_num"),
    )


def fn_variant_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured ops (Spark 4): `parse_json` into the
    binary VARIANT encoding, typed path extraction with `variant_get`,
    and `schema_of_variant` introspection — how an ingest pipeline
    handles schemaless JSON columns at scale without re-parsing (VARIANT
    decodes once into a binary tree; repeated path extraction skips
    re-parsing the text, where `get_json_object` re-parses per call).
    The VARIANT value itself never reaches the output (binary, not
    driver-sortable): all outputs are typed scalars, which is also the
    contract (oracled against DuckDB's JSON extraction on the same
    `props` strings — the encodings differ, the VALUES cannot)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "long").alias("k_long"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(v, "$.absent", "long").alias("absent_long"),
        F.schema_of_variant(v).alias("vschema"),
        F.isnull(F.try_parse_json(F.lit("not json"))).alias("bad_parse_is_null"),
    )


def fn_generator_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator (table-valued) functions — the row-EXPANDING operator
    class: `sequence` materializes each region's integer range,
    `posexplode_outer` expands it keeping position, and the outer
    variant proves the empty-input row survives (the corner a plain
    explode silently drops). Generators run inside the projection
    (Spark's Generate node, still whole-stage-codegen adjacent) — the
    expansion factor, not a shuffle, is their scale cost, which is why
    the range here is bounded by construction (r_regionkey ≤ 4 → ≤ 5
    rows per input). Oracle: DuckDB unnest(generate_series) with
    ordinality."""
    r = load_table(spark, sf_dir, "region")
    seq = F.when(
        F.col("r_regionkey") > 0,
        F.sequence(F.lit(1), F.col("r_regionkey").cast("int")),
    )  # regionkey 0 -> NULL array: the outer-explode survival case
    return r.select(
        "r_regionkey", F.posexplode_outer(seq).alias("pos", "step")
    ).select(
        "r_regionkey",
        F.col("pos").cast("long").alias("pos"),
        F.col("step").cast("long").alias("step"),
    )


def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — lambda expressions executed
    JVM-side inside the projection (never Python): `transform` (map),
    `filter`, `aggregate` (fold), `exists`/`forall`, `zip_with`. The
    embedding column is the input; every output is a scalar so the
    oracle compares plain columns (DuckDB list_transform/list_filter/
    list_reduce et al. compute the same values over the same arrays).
    This is the family the PQ/ADC and cosine operators build on
    (`similarity.py`) — here certified in isolation. The fold keeps the
    exact-sum discipline: elements are scaled to integer micro-units
    INSIDE the lambda before summing, so the fold is order-exact
    cross-engine."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    head8 = F.slice(emb, 1, 8)
    scaled_sum = F.aggregate(
        head8,
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.floor(x.cast("double") * 1000000.0 + 0.5).cast("long"),
    )
    return e.select(
        "vec_id",
        F.size(F.filter(head8, lambda x: x > 0)).cast("long").alias("n_pos_head8"),
        scaled_sum.alias("sum_head8_unats"),
        F.exists(head8, lambda x: x > 0.9).alias("any_gt_09"),
        F.forall(head8, lambda x: x > -1.0).alias("all_gt_neg1"),
        F.aggregate(
            F.zip_with(
                F.slice(emb, 1, 4),
                F.slice(emb, 5, 4),
                lambda a, b: F.floor(
                    a.cast("double") * b.cast("double") * 1000000.0 + 0.5
                ).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot4_unats"),
        F.element_at(
            # ×2.0 is an exact IEEE op — no rounding tolerance needed
            F.transform(F.slice(emb, 1, 2), lambda x: x.cast("double") * 2.0),
            1,
        ).alias("first_doubled"),
    )


def fn_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (the Spark 4 UDTF API) applied
    laterally per row: each document explodes into (term, position,
    char_offset) rows computed by the UDTF's Python `eval`. The UDTF is
    Arrow-optimized (`useArrow=True` — plans as ArrowEvalPythonUDTF,
    batch transfer, never the row-pickling BatchEvalPython path the
    scale lint forbids). The logic is deliberately SQL-reproducible
    (split on single spaces, cumulative offsets), so the whole lateral
    expansion hash-matches a DuckDB oracle built from unnest WITH
    ORDINALITY + a window — proving the Python extension point computes
    exactly what the declarative twin does. At 100 TB this is the
    mapInPandas cost model: one Arrow pass, expansion inside the batch,
    output shuffles only if the consumer asks."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="term string, pos bigint, char_off bigint", useArrow=True)
    class SplitTerms:
        def eval(self, doc_id, text: str):
            if text is None:
                # NULL text explodes to zero rows — matches the DuckDB
                # oracle (string_split(NULL) unnests to nothing).
                return
            off = 0
            for i, w in enumerate(text.split(" ")):
                yield (w, i, off)
                off += len(w) + 1

    spark.udtf.register("split_terms", SplitTerms)
    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id", "text").createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        """
        SELECT d.doc_id, t.term, t.pos, t.char_off
        FROM udtf_docs d, LATERAL split_terms(d.doc_id, d.text) t
        WHERE t.pos < 8
        """
    )
    return out


def fn_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4's static ``analyze`` hook): the
    output schema is not declared — it is COMPUTED per call site from
    the literal argument (`tail_words(text, 3)` ⇒ columns w0,w1,w2;
    a different call site with n=5 would get five columns), which is the
    UDTF API surface `fn_python_udtf`'s fixed returnType doesn't cover.
    Arrow-optimized like its sibling (never the row-pickling path the
    scale lint forbids). Logic (last-n words, NULL-padded) is
    SQL-reproducible, so the dynamic schema AND the values hash-match
    the DuckDB oracle. Oracle care: DuckDB's list index is 1-based and
    a NEGATIVE index wraps to the tail (ws[-1] = last element, not
    NULL), so the short-document padding is expressed with explicit
    ``CASE WHEN L >= k`` guards rather than out-of-range indexing, and
    NULL text — which eval explodes to zero rows, dropping the doc via
    the inner LATERAL — is filtered symmetrically."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType

    N = 3

    @udtf(useArrow=True)
    class TailWords:
        @staticmethod
        def analyze(text, n):
            return __import__(
                "pyspark.sql.udtf", fromlist=["AnalyzeResult"]
            ).AnalyzeResult(
                schema=StructType(
                    [StructField(f"w{i}", StringType()) for i in range(n.value)]
                )
            )

        def eval(self, text, n):
            if text is None:
                return
            ws = text.split(" ")
            tail = ws[-n:] if len(ws) >= n else [None] * (n - len(ws)) + ws
            yield tuple(tail)

    spark.udtf.register("tail_words", TailWords)
    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id", "text").createOrReplaceTempView("udtfa_docs")
    return spark.sql(
        f"""
        SELECT d.doc_id, t.w0, t.w1, t.w2
        FROM udtfa_docs d, LATERAL tail_words(d.text, {N}) t
        WHERE d.doc_id % 5 = 0
        """
    )


FN_UDTF_ANALYZE_ORACLE = """
    WITH s AS (
        SELECT doc_id, string_split(text, ' ') AS ws,
               len(string_split(text, ' ')) AS L
        FROM documents WHERE doc_id % 5 = 0 AND text IS NOT NULL
    )
    SELECT doc_id,
           CASE WHEN L >= 3 THEN ws[L - 2] END AS w0,
           CASE WHEN L >= 2 THEN ws[L - 1] END AS w1,
           CASE WHEN L >= 1 THEN ws[L] END AS w2
    FROM s
"""


FN_UDTF_ORACLE = """
    WITH words AS (
        SELECT doc_id, w.term, CAST(w.pos - 1 AS BIGINT) AS pos
        FROM documents,
             LATERAL (SELECT UNNEST(string_split(text, ' ')) AS term,
                             generate_subscripts(string_split(text, ' '), 1) AS pos) w
    ), offs AS (
        SELECT doc_id, term, pos,
               CAST(COALESCE(SUM(LENGTH(term) + 1) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS char_off
        FROM words
    )
    SELECT doc_id, term, pos, char_off FROM offs WHERE pos < 8
"""


def fn_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (|>, SQL:2023-era pipeline composition, new in
    Spark 4): the pricing-summary shape written as a linear FROM |>
    WHERE |> AGGREGATE chain. Catalyst compiles the pipe form to the
    IDENTICAL logical plan as the nested SELECT, so this entry proves
    the surface parses AND optimizes the same — the oracle is the
    classic formulation. Same scaled-long sum discipline; same one
    partial-agg exchange at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("pipe_lineitem")
    return spark.sql(
        """
        FROM pipe_lineitem
        |> WHERE l_quantity <= 45
        |> AGGREGATE COUNT(*) AS n_rows,
                     SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                       AS price_cents
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_rows, price_cents
        """
    )


FN_PIPE_ORACLE = """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS price_cents
    FROM lineitem WHERE l_quantity <= 45
    GROUP BY l_returnflag, l_linestatus
"""


def fn_collation_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): grouping and equality under
    UTF8_LCASE — the engine-native path for case-insensitive semantics
    that otherwise force a lower() rewrite on every predicate (and
    break index/stats reuse in systems that have them). The corpus is
    made case-diverse deterministically (odd part keys upper-case their
    type), then grouped BOTH ways: binary collation sees 2x the groups,
    UTF8_LCASE folds them back — the oracle reproduces the fold with
    explicit lower(). Counts are exact integers."""
    p = load_table(spark, sf_dir, "part")
    mixed = p.select(
        F.when(F.col("p_partkey") % 2 == 1, F.upper("p_type"))
        .otherwise(F.lower("p_type"))
        .alias("t")
    )
    mixed.createOrReplaceTempView("coll_parts")
    return spark.sql(
        """
        SELECT COUNT(DISTINCT t) AS n_binary,
               COUNT(DISTINCT t COLLATE UTF8_LCASE) AS n_lcase,
               CAST(SUM(CASE WHEN t COLLATE UTF8_LCASE = 'economy'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_economy_ci
        FROM coll_parts
        """
    )


FN_COLLATION_ORACLE = """
    WITH mixed AS (
        SELECT CASE WHEN p_partkey % 2 = 1 THEN UPPER(p_type)
                    ELSE LOWER(p_type) END AS t
        FROM part
    )
    SELECT COUNT(DISTINCT t) AS n_binary,
           COUNT(DISTINCT LOWER(t)) AS n_lcase,
           CAST(SUM(CASE WHEN LOWER(t) = 'economy' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_economy_ci
    FROM mixed
"""


QUERIES = {
    "fn_python_udtf": fn_python_udtf,
    "fn_udtf_analyze": fn_udtf_analyze,
    "fn_pipe_syntax": fn_pipe_syntax,
    "fn_collation_ops": fn_collation_ops,
    "fn_generator_ops": fn_generator_ops,
    "fn_higher_order": fn_higher_order,
    "fn_variant_ops": fn_variant_ops,
    "fn_try_arith": fn_try_arith,
    "fn_map_ops": fn_map_ops,
    "fn_bitwise": fn_bitwise,
    "fn_url_ops": fn_url_ops,
    "fn_array_ops": fn_array_ops,
    "fn_string_ops": fn_string_ops,
    "fn_date_ops": fn_date_ops,
    "fn_math_ops": fn_math_ops,
    "fn_conditional": fn_conditional,
    "fn_regexp": fn_regexp,
    "fn_json_ops": fn_json_ops,
}

ORACLES = {
    "fn_python_udtf": FN_UDTF_ORACLE,
    "fn_udtf_analyze": FN_UDTF_ANALYZE_ORACLE,
    "fn_pipe_syntax": FN_PIPE_ORACLE,
    "fn_collation_ops": FN_COLLATION_ORACLE,
    "fn_generator_ops": """
        SELECT r_regionkey,
               CAST(step - 1 AS BIGINT) AS pos,
               CAST(step AS BIGINT) AS step
        FROM (
            SELECT r_regionkey, unnest(generate_series(1, r_regionkey)) AS step
            FROM region WHERE r_regionkey > 0
        )
        UNION ALL
        SELECT r_regionkey, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        FROM region WHERE NOT (r_regionkey > 0)
    """,
    "fn_higher_order": """
        SELECT vec_id,
               CAST(LENGTH(list_filter(embedding[1:8], x -> x > 0)) AS BIGINT)
                 AS n_pos_head8,
               CAST(list_sum(list_transform(embedding[1:8],
                    x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                              AS BIGINT))) AS BIGINT) AS sum_head8_unats,
               LENGTH(list_filter(embedding[1:8], x -> x > 0.9)) > 0
                 AS any_gt_09,
               LENGTH(list_filter(embedding[1:8], x -> NOT (x > -1.0))) = 0
                 AS all_gt_neg1,
               CAST(list_sum(list_transform([1, 2, 3, 4],
                    i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                                    * CAST(embedding[i + 4] AS DOUBLE)
                                    * 1000000.0 + 0.5) AS BIGINT)))
                    AS BIGINT) AS dot4_unats,
               CAST(embedding[1] AS DOUBLE) * 2.0 AS first_doubled
        FROM embeddings
    """,
    # vschema: the fixture's props are uniformly {"k": <int>}; the oracle
    # states the resulting VARIANT schema as the literal Spark renders.
    # A corpus with heterogeneous props would assert per-row schemas via
    # DuckDB json_structure instead.
    "fn_variant_ops": """
        SELECT event_id,
               CAST(props->>'$.k' AS BIGINT) AS k_long,
               props->>'$.k' AS k_str,
               CAST(NULL AS BIGINT) AS absent_long,
               'OBJECT<k: BIGINT>' AS vschema,
               TRUE AS bad_parse_is_null
        FROM events
    """,
    "fn_try_arith": """
        SELECT o_orderkey,
               CASE WHEN o_custkey % 7 = 0 THEN NULL
                    ELSE o_totalprice / CAST(o_custkey % 7 AS DOUBLE) END
                 AS safe_ratio,
               TRY_CAST(o_orderpriority AS INT) AS prio_bad_cast,
               TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num
        FROM orders
    """,
    "fn_url_ops": """
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
                 || '?lang=' || lang AS url,
               source || '.example.com' AS host,
               '/docs/' || CAST(doc_id AS VARCHAR) AS path,
               lang AS lang_param
        FROM documents
    """,
    "fn_bitwise": """
        SELECT n_nationkey,
               CAST(n_nationkey AS BIGINT) & CAST(n_regionkey AS BIGINT) AS k_and_r,
               CAST(n_nationkey AS BIGINT) | CAST(n_regionkey AS BIGINT) AS k_or_r,
               xor(CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT)) AS k_xor_r,
               CAST(n_nationkey AS BIGINT) << 3 AS k_shl3,
               CAST(n_nationkey AS BIGINT) >> 1 AS k_shr1,
               CAST(bit_count(CAST(n_nationkey AS BIGINT)) AS BIGINT) AS k_popcount
        FROM nation
    """,
    "fn_map_ops": """
        SELECT n_nationkey,
               MAP(['name', 'region'],
                   [n_name, CAST(n_regionkey AS VARCHAR)])['name'][1] AS map_name,
               MAP(['name', 'region'],
                   [n_name, CAST(n_regionkey AS VARCHAR)])['region'][1] AS map_region,
               CAST(NULL AS VARCHAR) AS map_absent,
               TRUE AS has_region,
               CAST(2 AS BIGINT) AS map_size
        FROM nation
    """,
    "fn_array_ops": """
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_el,
               CAST(embedding[-1] AS DOUBLE) AS last_el,
               CAST(list_max(embedding) AS DOUBLE) AS max_el,
               CAST(list_min(embedding) AS DOUBLE) AS min_el,
               CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
                 + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE)
                 AS head4_sum
        FROM embeddings
    """,
    "fn_string_ops": """
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               LOWER(p_brand) AS brand_lower,
               CAST(LENGTH(p_name) AS BIGINT) AS name_len,
               SUBSTRING(p_type, 1, 5) AS type_prefix,
               CONCAT_WS('|', p_brand, p_type) AS brand_type,
               LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
               REPLACE(p_name, ' ', '_') AS name_snake,
               TRIM(p_name) AS name_trim
        FROM part
    """,
    "fn_date_ops": """
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
               CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
               CAST(DAY(o_orderdate) AS BIGINT) AS order_day,
               DATE_TRUNC('month', o_orderdate) AS month_start,
               CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
               CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
               CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2025-01-01')
                    AS BIGINT) AS days_to_2025
        FROM orders
    """,
    "fn_math_ops": """
        SELECT l_orderkey,
               ABS(l_extendedprice - 1000.0) AS abs_diff,
               CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
               CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
               ROUND(l_extendedprice / 7.0, 2) AS price_div_round,
               SQRT(l_extendedprice) AS price_sqrt,
               CAST(l_orderkey % 10 AS BIGINT) AS key_mod,
               l_extendedprice * l_extendedprice AS price_sq,
               -- CAST: DuckDB SIGN returns TINYINT; Spark signum is DOUBLE
               CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign
        FROM lineitem WHERE l_linenumber = 1
    """,
    "fn_conditional": """
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                    WHEN c_acctbal < 5000 THEN 'standard'
                    ELSE 'premium' END AS tier,
               COALESCE(NULLIF(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS segment_renamed,
               LEAST(c_acctbal, 1000.0) AS capped_bal,
               GREATEST(c_acctbal, 0.0) AS floored_bal
        FROM customer
    """,
    "fn_regexp": """
        SELECT doc_id,
               COALESCE(regexp_extract(text, '([A-Za-z]+)', 1), '') AS first_word,
               CAST(LENGTH(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words,
               regexp_matches(text, 'data') AS mentions_data,
               SUBSTRING(regexp_replace(text, '[aeiou]', '', 'g'), 1, 20)
                 AS devoweled_prefix
        FROM documents
    """,
    "fn_json_ops": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
               json_extract_string(props, '$.missing') AS missing_field,
               '{"id":' || event_id || ',"type":"' || event_type || '"}' AS event_json
        FROM events
    """,
}
