"""Training-data export pipeline over `documents`: PII redaction,
tokenizer-support statistics, novelty scoring, deterministic sharding
and split assignment.

These are the steps BETWEEN curation (dedup/quality, `dedup.py`,
`text.py`) and the training job: scrub what must not be trained on,
measure what the tokenizer will see, score marginal value of each
document, and emit a reproducible shard/split layout. Reference parity:
the reference's pipeline ends at a JDBC row store (SURVEY §2.1); this
module is the engine-extension surface a 100 TB corpus needs instead.

Scale discipline (same rules as the rest of the repo):
* every hot-path expression is a built-in JVM function (regexp_*, md5,
  arithmetic) — zero Python in the row loop;
* per-group state is bounded: manifests use an order-independent
  modular digest, never collect_list of members;
* the shard/split hash is Knuth's multiplicative hash on doc_id —
  chosen because the ORACLE must reproduce it bit-for-bit in another
  engine; a production deployment swaps one expression for
  xxhash64(doc_id) and nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table

# Common-subset regexes (Java regex AND RE2 accept these identically —
# the Spark plan and the DuckDB oracle must match byte-for-byte).
_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"

N_SHARDS = 16

# Knuth multiplicative hash: h(id) = ((id mod 2^31) * 2654435761) mod 2^32.
# Engine-portable (pure BIGINT arithmetic) and well-mixed on dense ids;
# production swaps this one expression for xxhash64(id). The mod-2^31
# BEFORE the multiply is overflow discipline, not mixing: 2^31 · 2654435761
# < 2^63, so the product never exceeds BIGINT at ANY id — without it a
# trillion-scale doc_id would silently wrap in Spark (Java semantics) but
# RAISE in DuckDB, a cross-engine divergence waiting for big corpora.
_KNUTH = 2654435761
_M31 = 2147483648
_M32 = 4294967296


def _knuth_hash(col: Column) -> Column:
    return ((col.cast("long") % F.lit(_M31)) * F.lit(_KNUTH)) % F.lit(_M32)


_SQL_KNUTH = f"((CAST(doc_id AS BIGINT) % {_M31}) * {_KNUTH} % {_M32})"


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count emails / NANP phone numbers / IPv4 literals per
    document and emit the md5 of the REDACTED text (<EMAIL>/<PHONE>/<IP>
    placeholders). Hash parity with the oracle proves the actual
    redacted bytes match, not just the counts. One narrow projection —
    runs at scan speed at any corpus size; counts are over the original
    text, the replace chain is email → phone → ip in both engines
    (order matters: the classes are disjoint but the discipline makes
    that a non-assumption)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ),
        _IPV4_RE,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(t, F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(_IPV4_RE)).cast("long").alias("n_ipv4"),
        F.md5(redacted).alias("redacted_md5"),
    )


# 16-digit card shape, optional space/dash group separators. The REGEX
# only proposes candidates; the Luhn CHECKSUM decides (regex alone
# false-positives on any 16-digit number — the checksum is what makes
# card scrubbing precise enough to act on).
_CARD_RE = r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b"


def text_pii_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payment-card detection with Luhn validation: extract 16-digit
    candidates, strip separators, and verify the checksum — entirely in
    JVM higher-order array functions (transform/aggregate over digit
    positions), no UDF, so the validation runs at scan speed like the
    regex detectors in `text_pii_redact`. Reports candidate and
    Luhn-valid counts per document; the oracle reproduces the checksum
    with the same integer CASE arithmetic (no engine-specific digit
    helpers), so hash parity proves the checksum itself."""
    d = load_table(spark, sf_dir, "documents")
    cands = F.transform(
        F.regexp_extract_all(F.col("text"), F.lit(_CARD_RE), 0),
        lambda s: F.regexp_replace(s, "[ -]", ""),
    )
    # Luhn over a 16-digit string: from the right, double every 2nd
    # digit, subtract 9 when the double exceeds 9, sum ≡ 0 (mod 10).
    # Position i (1-based from the LEFT of a 16-digit string) is doubled
    # when i is odd (16 - i + 1 even ⇔ i odd).
    digit = lambda s, i: (F.ascii(F.substring(s, i, 1)) - F.lit(48)).cast("long")

    def luhn_ok(s):
        terms = F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda i: F.when(
                i % 2 == 1,
                F.when(digit(s, i) * 2 > 9, digit(s, i) * 2 - 9).otherwise(
                    digit(s, i) * 2
                ),
            ).otherwise(digit(s, i)),
        )
        total = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)
        return total % 10 == 0

    valid = F.filter(cands, luhn_ok)
    return d.select(
        "doc_id",
        F.size(cands).cast("long").alias("n_candidates"),
        F.size(valid).cast("long").alias("n_luhn_valid"),
    )


def text_word_bigrams(spark: SparkSession, sf_dir: str, top_k: int = 100) -> DataFrame:
    """Corpus-wide top-k adjacent word pairs — the statistic a
    tokenizer-training / collocation pass reads first. One explode +
    one groupBy(bigram) with map-side partial aggregation; the top-k is
    a total order on (count DESC, bigram ASC) so ties at the boundary
    are deterministic in both engines. At 100 TB the groupBy key is the
    bigram string — the heavy-hitter-sketch variant for unbounded key
    spaces is `text_heavy_hitters`; this exact version is for the
    bounded-vocab pass that follows candidate pruning."""
    d = load_table(spark, sf_dir, "documents")
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    w = F.col("__words")
    tok = d.select("doc_id", words.alias("__words")).filter(F.size(w) >= 2)
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(w) - 2),
        lambda i: F.concat_ws(" ", F.element_at(w, i + 1), F.element_at(w, i + 2)),
    )
    exploded = tok.select("doc_id", F.explode(bigrams).alias("bigram"))
    return (
        exploded.groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("bigram"))
        .limit(top_k)
    )


def text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct word
    3-grams whose FIRST occurrence (min doc_id across the corpus) is
    this document. Curation pipelines use this to rank marginal value —
    a doc whose grams all appeared earlier adds little. Plan: explode
    distinct grams, one shuffle keyed on the gram for the min-doc
    window, one groupBy(doc_id) to fold the fractions. The gram-keyed
    exchange carries the gram string here because the oracle must see
    identical group identities; the production variant groups by
    xxhash64(gram) — the same 8-byte posting discipline as
    `dedup.py:_token_trigram_keys` — and nothing downstream changes."""
    d = load_table(spark, sf_dir, "documents")
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    w = F.col("__words")
    tok = d.select("doc_id", words.alias("__words")).filter(F.size(w) >= 3)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(w, i + 1),
            F.element_at(w, i + 2),
            F.element_at(w, i + 3),
        ),
    )
    exploded = tok.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
    )
    first_doc = F.min("doc_id").over(Window.partitionBy("gram"))
    return (
        exploded.withColumn("first_doc", first_doc)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty_frac"),
        )
    )


def pipeline_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard layout + per-shard manifest: every
    document lands in shard knuth(doc_id) % 16, and each shard reports
    its row count, total characters, id range, and an ORDER-INDEPENDENT
    membership digest (sum over docs of a 60-bit md5-derived value mod
    1000003 — commutative, so the digest is partitioning- and
    order-stable, and the per-group state is one long, never a
    collect_list of members). Equal digests + equal counts make two
    independently-produced shard layouts byte-comparable without
    shipping the id lists — how a 100 TB export validates against a
    re-run. The md5→int path (conv/substr) is bit-identical in DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    shard = (_knuth_hash(F.col("doc_id")) % F.lit(N_SHARDS)).alias("shard")
    member_v = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % F.lit(1000003)
    )
    return (
        d.select(shard, "doc_id", "n_chars", member_v.alias("v"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("v").alias("manifest_digest"),
        )
    )


def export_shards(spark: SparkSession, sf_dir: str, out_dir: str) -> DataFrame:
    """The WRITE side of the shard layout: land every document in its
    deterministic shard directory (`shard=N/` partitions — at 100 TB
    each shard is further split into many files by the writer's task
    parallelism, which is fine: the shard is the unit of assignment,
    not of file count), then recompute the manifest FROM THE WRITTEN
    FILES and return it. A caller compares this against
    `pipeline_shard_manifest` (computed from the source): equal rows
    prove the export wrote exactly the claimed membership — the
    validation a training job runs before trusting a new export.
    One round trip, no collect; digests are the same order-independent
    modular sum, so file order within shards is irrelevant."""
    d = load_table(spark, sf_dir, "documents")
    shard = (_knuth_hash(F.col("doc_id")) % F.lit(N_SHARDS)).alias("shard")
    d.select(shard, *d.columns).write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(out_dir)
    back = spark.read.parquet(out_dir)
    member_v = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % F.lit(1000003)
    )
    return (
        back.select("shard", "doc_id", "n_chars", member_v.alias("v"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("v").alias("manifest_digest"),
        )
    )


def pipeline_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 98/1/1 train/val/test split: bucket = knuth(doc_id)
    % 100 → train (< 98), val (98), test (99). Per (split, lang) report
    doc counts and character volume. The assignment is a pure function
    of doc_id — stable across runs, partitionings, and engines — which
    is the property that keeps eval sets eval sets when the corpus is
    regenerated. One narrow projection + one small groupBy."""
    d = load_table(spark, sf_dir, "documents")
    bucket = _knuth_hash(F.col("doc_id")) % F.lit(100)
    split = (
        F.when(bucket < 98, F.lit("train"))
        .when(bucket == 98, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def pipeline_curation_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end corpus curation flagship, one oracled query: the
    documents that survive every gate a real training-data pipeline
    applies — the dedup kept-set (≥5-word gate → exact-dedup survivor →
    near-dup canonical, `dedup.pipeline_dedup_kept`), the C4/Gopher
    integer-exact quality filter (`text.pipeline_quality_kept`), and
    eval-split exclusion (the `text_contamination` split: eval docs
    never reach training shards) — landed into the deterministic
    16-shard layout with order-independent manifest digests
    (`pipeline_shard_manifest`). Every stage is individually oracled;
    this entry proves the COMPOSITION hash-exact, which is the artifact
    a training job actually consumes. Plan cost = the stages' own plans
    plus two doc-id semi-joins; nothing new shuffles."""
    from .dedup import pipeline_dedup_kept
    from .text import pipeline_quality_kept

    d = load_table(spark, sf_dir, "documents")
    dk = pipeline_dedup_kept(spark, sf_dir).select("doc_id")
    qk = pipeline_quality_kept(spark, sf_dir).filter("kept").select("doc_id")
    final = (
        d.filter(F.col("doc_id") % 50 != 0)  # eval split stays out of training
        .join(dk, "doc_id", "left_semi")
        .join(qk, "doc_id", "left_semi")
        .select("doc_id", "n_chars")
    )
    shard = (_knuth_hash(F.col("doc_id")) % F.lit(N_SHARDS)).alias("shard")
    member_v = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % F.lit(1000003)
    )
    return (
        final.select(shard, "doc_id", "n_chars", member_v.alias("v"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("v").alias("manifest_digest"),
        )
    )


def _curation_export_oracle() -> str:
    """Compose the stage oracles textually (DuckDB allows WITH — even
    WITH RECURSIVE — inside a subquery), then re-apply the shard math."""
    from .dedup import ORACLES as DEDUP_ORACLES
    from .text import ORACLES as TEXT_ORACLES

    dk = DEDUP_ORACLES["pipeline_dedup_kept"]
    qk = TEXT_ORACLES["pipeline_quality_kept"]
    return f"""
        WITH dk AS (SELECT doc_id FROM ({dk})),
        qk AS (SELECT doc_id FROM ({qk}) WHERE kept),
        final AS (
            SELECT d.doc_id, d.n_chars
            FROM documents d
            JOIN dk USING (doc_id)
            JOIN qk USING (doc_id)
            WHERE d.doc_id % 50 <> 0
        ), tagged AS (
            SELECT {_SQL_KNUTH} % {N_SHARDS} AS shard, doc_id, n_chars,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                     % 1000003 AS v
            FROM final
        )
        SELECT shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               MIN(doc_id) AS min_doc_id,
               MAX(doc_id) AS max_doc_id,
               CAST(SUM(v) AS BIGINT) AS manifest_digest
        FROM tagged GROUP BY shard
    """


def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation FUNNEL REPORT — per-stage survivor counts for the
    gate sequence `pipeline_curation_export` lands (total → eval-split
    exclusion → dedup kept-set → quality filter): the one-table
    accounting every training-data run publishes, answering "where did
    my corpus go" before anyone reads a shard. Each stage is a 1-row
    global aggregate over the cumulative semi-joined survivor set —
    four bounded rows out regardless of corpus size, and the stages
    reuse the export pipeline's own kept-sets so the report can never
    drift from what the export actually ships."""
    from .dedup import pipeline_dedup_kept
    from .text import pipeline_quality_kept

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    dk = pipeline_dedup_kept(spark, sf_dir).select("doc_id")
    qk = pipeline_quality_kept(spark, sf_dir).filter("kept").select("doc_id")
    s1 = d.filter(F.col("doc_id") % 50 != 0)
    s2 = s1.join(dk, "doc_id", "left_semi")
    s3 = s2.join(qk, "doc_id", "left_semi")

    def stage(i: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(i).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            "n_docs",
        )

    return (
        stage(0, "total", d)
        .unionByName(stage(1, "eval_split_excluded", s1))
        .unionByName(stage(2, "dedup_kept", s2))
        .unionByName(stage(3, "quality_kept", s3))
    )


def _curation_funnel_oracle() -> str:
    from .dedup import ORACLES as DEDUP_ORACLES
    from .text import ORACLES as TEXT_ORACLES

    dk = DEDUP_ORACLES["pipeline_dedup_kept"]
    qk = TEXT_ORACLES["pipeline_quality_kept"]
    return f"""
        WITH dk AS (SELECT doc_id FROM ({dk})),
        qk AS (SELECT doc_id FROM ({qk}) WHERE kept),
        s1 AS (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0),
        s2 AS (SELECT s1.doc_id FROM s1 JOIN dk USING (doc_id)),
        s3 AS (SELECT s2.doc_id FROM s2 JOIN qk USING (doc_id))
        SELECT CAST(0 AS INT) AS stage_idx, 'total' AS stage,
               COUNT(*) AS n_docs FROM documents
        UNION ALL SELECT CAST(1 AS INT), 'eval_split_excluded', COUNT(*) FROM s1
        UNION ALL SELECT CAST(2 AS INT), 'dedup_kept', COUNT(*) FROM s2
        UNION ALL SELECT CAST(3 AS INT), 'quality_kept', COUNT(*) FROM s3
    """


_PPL_THRESHOLD_UNATS = -7_000_000  # mean logp ≥ -7 nats ⇔ perplexity ≤ e^7


def pipeline_perplexity_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-perplexity quality gate — the CCNet-style filter that closes
    the loop on the bigram LM: score every document with the corpus's
    own interpolated bigram model (`text_bigram_logprob`) and keep those
    whose mean log-probability clears the threshold. The keep decision
    is EXACT INTEGER arithmetic: `sum_logp_unats ≥ threshold·n_bigrams`
    compares the micro-nat integer sum directly — never the float mean —
    so no document sitting on the perplexity boundary can flip between
    engines or partitionings (the same discipline as the quality-filter
    pass). Documents too short to score (< 2 tokens) are dropped, the
    conservative gate a quality filter applies to unscorable inputs.
    Plan: the LM machinery's bounded model builds + one integer filter —
    nothing new moves."""
    from .text import text_bigram_logprob

    scored = text_bigram_logprob(spark, sf_dir)
    return scored.filter(
        F.col("sum_logp_unats")
        >= F.lit(_PPL_THRESHOLD_UNATS) * F.col("n_bigrams")
    ).select("doc_id", "n_bigrams", "sum_logp_unats")


def pipeline_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled DOMAIN MIXTURE weights — the data-mixing step
    that decides how often each source is sampled during training:
    weight_s ∝ tokens_s^α with α = 0.5 (the square-root temperature that
    up-samples small domains, the standard multilingual/multi-source
    rebalancing). Cross-engine float discipline: ``sqrt(double(bigint))``
    is IEEE-correctly-rounded in both engines, but the SUM over sources
    is not order-safe — so each source's √tokens is snapped to an exact
    micro-unit integer (floor(√t·10⁶ + 0.5), the `_util.scaled_long`
    discipline) and the normalizer is an exact BIGINT sum; the final
    weight is one double/double division. Plan: one scan to per-source
    token totals (map-side combined, |sources| rows), one broadcast of
    the 1-row normalizer. The token count reuses `text_token_stats`'s
    whitespace tokenization verbatim so mixture weights and tokenizer
    stats can never disagree about what a token is."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    per_src = d.select("source", n_tokens.alias("t")).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("t").alias("n_tokens"),
    )
    sqrt_unats = F.floor(
        F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    scored = per_src.withColumn("sqrt_unats", sqrt_unats)
    total = scored.agg(F.sum("sqrt_unats").alias("total_unats"))
    return scored.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        "sqrt_unats",
        (
            F.col("sqrt_unats").cast("double") / F.col("total_unats").cast("double")
        ).alias("weight"),
    )


def pipeline_quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRICULUM binning — partition the corpus into quality quartiles
    (the ordering a curriculum/annealing schedule feeds from: train on
    Q3 first or last, drop Q0, oversample the top bin). A global
    `ntile` would rank the whole corpus through one reducer; instead the
    three quartile THRESHOLDS come from one `percentile_disc` aggregate
    (an actual corpus element, not an interpolation — Spark and DuckDB
    agree on disc semantics exactly, so no rounding tolerance is needed
    anywhere) broadcast as one row, and per-doc binning is a narrow CASE.
    At 100 TB the exact disc aggregate becomes approx_percentile with
    the same downstream shape. Scores reuse `text_quality_score`'s
    exact rational arithmetic, so both engines bin identical doubles
    against identical thresholds — boundary docs cannot flip."""
    from .text import text_quality_score

    scored = text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    th = scored.agg(
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY quality_score)"
        ).alias("t25"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY quality_score)"
        ).alias("t50"),
        F.expr(
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY quality_score)"
        ).alias("t75"),
    )
    binned = scored.crossJoin(F.broadcast(th)).select(
        "doc_id",
        "quality_score",
        F.when(F.col("quality_score") < F.col("t25"), 0)
        .when(F.col("quality_score") < F.col("t50"), 1)
        .when(F.col("quality_score") < F.col("t75"), 2)
        .otherwise(3)
        .cast("int")
        .alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("quality_score").alias("min_score"),
        F.max("quality_score").alias("max_score"),
    )


_EPOCH_DRAWS = 1_000_000


def pipeline_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPOCH SAMPLING PLAN — turn the domain-mixture weights into an
    exact integer allocation of N=1M draws per source via LARGEST
    REMAINDER apportionment: base_s = floor(N·w_s), and the leftover
    draws go to the sources with the largest fractional remainders
    (ties by source name — fully deterministic). Everything stays in
    integer arithmetic on the micro-unit weights (N·sqrt_unats div
    total, remainders are exact modular values), so the plan sums to
    exactly N on any engine and any partitioning — the property the
    training-job consumer depends on (a float-rounded plan drifts by
    ±|sources| draws). The "who gets +1" rank avoids any global window:
    it is a triangular broadcast self-join over the |sources|-row table
    (the `cdc_keygen` offsets discipline), counting strictly-larger
    remainders."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    per_src = d.select("source", n_tokens.alias("t")).groupBy("source").agg(
        F.sum("t").alias("n_tokens")
    )
    sqrt_unats = F.floor(
        F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    scored = per_src.select("source", sqrt_unats.alias("s"))
    total = scored.agg(F.sum("s").alias("tot"))
    q = scored.crossJoin(F.broadcast(total)).select(
        "source",
        "s",
        F.expr(f"({_EPOCH_DRAWS} * s) div tot").alias("base"),
        F.expr(f"({_EPOCH_DRAWS} * s) % tot").alias("rem"),
    )
    leftovers = q.agg(
        (F.lit(_EPOCH_DRAWS) - F.sum("base")).alias("l")
    )
    a, b = q.alias("a"), q.alias("b")
    ranked = (
        a.join(
            F.broadcast(b),
            (F.col("b.rem") > F.col("a.rem"))
            | ((F.col("b.rem") == F.col("a.rem")) & (F.col("b.source") < F.col("a.source"))),
            "left",
        )
        .groupBy(F.col("a.source").alias("source"), F.col("a.base").alias("base"),
                 F.col("a.rem").alias("rem"))
        .agg(F.count(F.col("b.source")).alias("n_larger"))
    )
    return ranked.crossJoin(F.broadcast(leftovers)).select(
        "source",
        (F.col("base") + F.when(F.col("n_larger") < F.col("l"), 1).otherwise(0))
        .cast("long")
        .alias("n_draws"),
        F.col("base").cast("long").alias("base_draws"),
        (F.col("n_larger") < F.col("l")).alias("got_leftover"),
    )


def text_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document CHARACTER-CLASS profile — the raw signal vector
    under every quality/code/noise heuristic: exact counts of alpha,
    digit, whitespace, punctuation and other characters (counted by
    regex deletion, one JVM pass per class over the same scan) plus the
    alpha ratio as one exact double division. The five counts sum to
    n_chars by construction — an invariant the oracle certifies row by
    row on both engines (a drifting char-class regex shows up as a
    broken sum before it silently poisons a downstream filter)."""
    d = load_table(spark, sf_dir, "documents")
    n = F.length("text").cast("long")

    def cnt(pat: str):
        return F.length(F.regexp_replace(F.col("text"), pat, "")).cast("long")

    alpha = cnt(r"[^A-Za-z]")
    digit = cnt(r"[^0-9]")
    space = cnt(r"[^ \t\n\r]")
    punct = cnt(r"[^.,;:!?'\"]")
    return d.select(
        "doc_id",
        n.alias("n_chars_total"),
        alpha.alias("n_alpha"),
        digit.alias("n_digit"),
        space.alias("n_space"),
        punct.alias("n_punct"),
        (n - alpha - digit - space - punct).alias("n_other"),
        (alpha.cast("double") / n.cast("double")).alias("alpha_ratio"),
    )


def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATASET CARD — the one-row datasheet a published training corpus
    ships with, assembled from the pipeline's own stages so the card can
    never disagree with the pipeline that produced it: corpus counts,
    token totals (the card's headline number), source/language breadth,
    the exact-dedup survivor rate, and PII incidence. Everything is a
    count or an exact integer sum — no entropy/float folklore — so the
    card is hash-matched cross-engine like any other entry. One scan of
    documents feeds all document-level stats (conditional aggregates);
    the dedup rate joins the exact-dedup survivor count (1 row) by
    broadcast."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    pii_hits = (
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), 0))
        + F.size(F.regexp_extract_all(F.col("text"), F.lit(_PHONE_RE), 0))
        + F.size(F.regexp_extract_all(F.col("text"), F.lit(_IPV4_RE), 0))
    ).cast("long")
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).alias("n_tokens"),
        F.sum(F.length("text").cast("long")).alias("n_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.when(pii_hits > 0, 1).otherwise(0)).cast("long").alias("n_docs_with_pii"),
    )
    from .dedup import normalize_text

    survivors = d.agg(
        F.countDistinct(F.md5(normalize_text(F.col("text")))).alias("n_unique_docs")
    )
    return stats.crossJoin(F.broadcast(survivors)).select(
        "n_docs",
        "n_unique_docs",
        (F.col("n_docs") - F.col("n_unique_docs")).alias("n_exact_dups"),
        "n_tokens",
        "n_chars",
        "n_sources",
        "n_langs",
        "n_docs_with_pii",
        (
            F.col("n_unique_docs").cast("double") / F.col("n_docs").cast("double")
        ).alias("unique_rate"),
    )


def pipeline_global_shuffle(
    spark: SparkSession, sf_dir: str, n_shards: int = 8, seed: int = 42
) -> DataFrame:
    """Deterministic global training shuffle: every document gets a
    pseudo-random sort key md5(doc_id ':' seed), a shard (first key
    byte mod ``n_shards``), and its exact position within the shard
    (rank by key). This is how a 100 TB corpus is shuffled for
    pre-training without a global sort: the permutation is a PURE
    FUNCTION of (doc_id, seed) — reproducible across runs, engines and
    partitionings (a new seed is a new epoch's permutation), every
    shard ranks in PARALLEL (the window partitions on shard — no
    single-reducer global ordering anywhere), and what shuffles is the
    16-byte key, never the document. The hash oracle proves the full
    assignment — shard AND position — byte-identical in DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{seed}")))
    shard = (F.conv(F.substring(key, 1, 2), 16, 10).cast("int") % n_shards).alias(
        "shard"
    )
    base = d.select("doc_id", key.alias("sort_key"), shard)
    w = Window.partitionBy("shard").orderBy("sort_key")
    return base.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


def pipeline_pack_sequences(
    spark: SparkSession, sf_dir: str, max_len: int = 512
) -> DataFrame:
    """CONCAT-AND-CHUNK sequence packing — how pre-training actually
    consumes a corpus: documents concatenate in a deterministic global
    order (doc_id asc) into one token stream that is cut into fixed
    ``max_len`` training sequences, documents crossing a boundary
    spanning multiple sequences (GPT-style packing; the alternative
    first-fit bin packing is inherently sequential and pads). Per
    document this emits its exact stream placement: starting token
    offset, first/last sequence id, and how many sequences it touches.

    The global offset is an EXCLUSIVE prefix sum over token counts —
    computed with the `cdc_keygen` two-phase shape, because a
    single-ordered window over 100 TB of docs is a one-reducer
    bottleneck: (1) value-range bucket on doc_id from a broadcast 1-row
    min/max (a pure function of the id — deterministic across the
    plan's evaluations, unlike range sampling), (2) per-bucket window
    prefix sums in parallel, plus a P-row bucket-total table offset via
    triangular broadcast join. Every quantity is exact integer
    arithmetic → fully hash-oracled against DuckDB's single-window
    closed form. Empty docs occupy no stream positions (NULL seq ids,
    n_seqs 0). Output: (doc_id, n_tokens, offset, first_seq, last_seq,
    n_seqs). (`text_pack_offsets` is the per-SOURCE sibling — one
    window keyed on source, parallel across shards, sequential within;
    this is the GLOBAL single-stream variant that needs no partition
    column at all, plus per-sequence occupancy in
    `pipeline_pack_stats` that neither emits.)"""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0))
        .cast("long")
        .alias("n_tokens"),
    )
    n_parts = max(spark.sparkContext.defaultParallelism // 2, 4)
    bounds = toks.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    span = F.col("hi") - F.col("lo") + 1
    pid = F.least(
        F.lit(n_parts - 1),
        F.floor(((F.col("doc_id") - F.col("lo")) * n_parts) / span),
    ).cast("int")
    ranged = toks.crossJoin(F.broadcast(bounds)).select(
        "doc_id", "n_tokens", pid.alias("pid")
    )
    w = Window.partitionBy("pid").orderBy("doc_id")
    local = ranged.withColumn(
        "local_off",
        F.coalesce(
            F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    totals = local.groupBy("pid").agg(F.sum("n_tokens").alias("cnt"))
    a, b = totals.alias("a"), totals.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b.pid") < F.col("a.pid"), "left")
        .groupBy(F.col("a.pid").alias("pid"))
        .agg(F.coalesce(F.sum("b.cnt"), F.lit(0)).alias("pid_off"))
    )
    off = (F.col("pid_off") + F.col("local_off")).cast("long")
    first_seq = F.when(
        F.col("n_tokens") > 0, F.floor(F.col("offset") / max_len)
    ).cast("long")
    last_seq = F.when(
        F.col("n_tokens") > 0,
        F.floor((F.col("offset") + F.col("n_tokens") - 1) / max_len),
    ).cast("long")
    return (
        local.join(F.broadcast(offsets), "pid")
        .select("doc_id", "n_tokens", off.alias("offset"))
        .select(
            "doc_id",
            "n_tokens",
            "offset",
            first_seq.alias("first_seq"),
            last_seq.alias("last_seq"),
            F.coalesce(
                last_seq - first_seq + 1, F.lit(0)
            ).cast("long").alias("n_seqs"),
        )
    )


def pipeline_pack_stats(
    spark: SparkSession, sf_dir: str, max_len: int = 512
) -> DataFrame:
    """Per-SEQUENCE occupancy of the packed stream — the other side of
    `pipeline_pack_sequences`: for every fixed-length training sequence,
    how many documents it contains, how many of those cross a sequence
    boundary (attention-masking / document-separator accounting), and
    its exact token fill. Derivation is one explode of each doc's
    [first_seq, last_seq] range (bounded: a doc adds ≤ n_tokens/max_len
    + 1 rows) and one groupBy(seq_id); the per-doc overlap with a
    sequence window is pure integer min/max arithmetic, so the entry is
    fully hash-oracled. Every sequence but the last fills to exactly
    ``max_len`` tokens by construction — property-tested, the packing
    guarantee training depends on."""
    per_doc = pipeline_pack_sequences(spark, sf_dir, max_len=max_len).filter(
        F.col("n_tokens") > 0
    )
    exp = per_doc.select(
        "doc_id",
        "offset",
        "n_tokens",
        "n_seqs",
        F.explode(F.sequence(F.col("first_seq"), F.col("last_seq"))).alias(
            "seq_id"
        ),
    )
    overlap = F.least(
        F.col("offset") + F.col("n_tokens"), (F.col("seq_id") + 1) * max_len
    ) - F.greatest(F.col("offset"), F.col("seq_id") * max_len)
    return exp.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_seqs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_crossing"),
        F.sum(overlap).cast("long").alias("fill_tokens"),
    )


def _pack_stats_oracle(max_len: int = 512) -> str:
    return f"""
        WITH pack AS ({_pack_sequences_oracle(max_len)}
        ), exp AS (
            SELECT doc_id, "offset", n_tokens, n_seqs,
                   UNNEST(range(first_seq, last_seq + 1)) AS seq_id
            FROM pack WHERE n_tokens > 0
        )
        SELECT seq_id, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN n_seqs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_crossing,
               CAST(SUM(LEAST("offset" + n_tokens, (seq_id + 1) * {max_len})
                        - GREATEST("offset", seq_id * {max_len})) AS BIGINT)
                   AS fill_tokens
        FROM exp GROUP BY seq_id
    """


def _pack_sequences_oracle(max_len: int = 512) -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   CAST(LENGTH(regexp_extract_all(LOWER(text), '[a-z]+'))
                        AS BIGINT) AS n_tokens
            FROM documents
        ), off AS (
            SELECT doc_id, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS o
            FROM toks
        )
        SELECT doc_id, n_tokens, CAST(o AS BIGINT) AS offset,
               CASE WHEN n_tokens > 0
                    THEN CAST(o // {max_len} AS BIGINT) END AS first_seq,
               CASE WHEN n_tokens > 0
                    THEN CAST((o + n_tokens - 1) // {max_len} AS BIGINT)
               END AS last_seq,
               CASE WHEN n_tokens > 0
                    THEN CAST((o + n_tokens - 1) // {max_len}
                              - o // {max_len} + 1 AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS n_seqs
        FROM off
    """


QUERIES = {
    "pipeline_pack_sequences": pipeline_pack_sequences,
    "pipeline_pack_stats": pipeline_pack_stats,
    "pipeline_global_shuffle": pipeline_global_shuffle,
    "pipeline_dataset_card": pipeline_dataset_card,
    "pipeline_epoch_plan": pipeline_epoch_plan,
    "text_charclass_profile": text_charclass_profile,
    "pipeline_quality_bins": pipeline_quality_bins,
    "pipeline_domain_mixture": pipeline_domain_mixture,
    "pipeline_perplexity_kept": pipeline_perplexity_kept,
    "text_pii_redact": text_pii_redact,
    "text_pii_cards": text_pii_cards,
    "text_word_bigrams": text_word_bigrams,
    "text_novelty": text_novelty,
    "pipeline_shard_manifest": pipeline_shard_manifest,
    "pipeline_split_assign": pipeline_split_assign,
    "pipeline_curation_export": pipeline_curation_export,
    "pipeline_curation_funnel": pipeline_curation_funnel,
}

ORACLES = {
    "pipeline_global_shuffle": """
        WITH keyed AS (
            SELECT doc_id,
                   md5(CAST(doc_id AS VARCHAR) || ':42') AS sort_key,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'),
                                        1, 2)) AS INTEGER) % 8 AS shard
            FROM documents
        )
        SELECT doc_id, shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY sort_key)
                    AS BIGINT) AS pos
        FROM keyed
    """,
    "text_pii_cards": rf"""
        WITH cands AS (
            SELECT doc_id,
                   list_transform(
                       regexp_extract_all(text, '{_CARD_RE}'),
                       s -> regexp_replace(s, '[ -]', '', 'g')) AS cc
            FROM documents
        ), checked AS (
            SELECT doc_id, cc,
                   list_filter(cc, s -> (
                       list_sum(list_transform(range(1, 17), i ->
                           CASE WHEN i % 2 = 1
                                THEN CASE WHEN (ascii(substring(s, i, 1)) - 48) * 2 > 9
                                          THEN (ascii(substring(s, i, 1)) - 48) * 2 - 9
                                          ELSE (ascii(substring(s, i, 1)) - 48) * 2 END
                                ELSE ascii(substring(s, i, 1)) - 48 END))
                       % 10 = 0)) AS ok
            FROM cands
        )
        SELECT doc_id,
               CAST(len(cc) AS BIGINT) AS n_candidates,
               CAST(len(ok) AS BIGINT) AS n_luhn_valid
        FROM checked
    """,
    "text_pii_redact": rf"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
                 AS n_emails,
               CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT)
                 AS n_phones,
               CAST(len(regexp_extract_all(text, '{_IPV4_RE}')) AS BIGINT)
                 AS n_ipv4,
               md5(regexp_replace(regexp_replace(regexp_replace(text,
                   '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g'),
                   '{_IPV4_RE}', '<IP>', 'g')) AS redacted_md5
        FROM documents
    """,
    "text_word_bigrams": """
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(LOWER(text), '[a-z]+') AS w
            FROM documents
        ), pairs AS (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, len(w)),
                                         i -> w[i] || ' ' || w[i+1])) AS bigram
            FROM toks WHERE len(w) >= 2
        )
        SELECT bigram,
               COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM pairs GROUP BY bigram
        ORDER BY n_occurrences DESC, bigram ASC LIMIT 100
    """,
    "text_novelty": """
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(LOWER(text), '[a-z]+') AS w
            FROM documents
        ), pos AS (
            SELECT doc_id, w, UNNEST(generate_series(1, len(w) - 2)) AS p
            FROM toks WHERE len(w) >= 3
        ), grams AS (
            SELECT DISTINCT doc_id,
                   w[p] || ' ' || w[p+1] || ' ' || w[p+2] AS gram
            FROM pos
        ), firsts AS (
            SELECT doc_id, gram,
                   MIN(doc_id) OVER (PARTITION BY gram) AS first_doc
            FROM grams
        )
        SELECT doc_id,
               COUNT(*) AS n_grams,
               CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               ROUND(CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6) AS novelty_frac
        FROM firsts GROUP BY doc_id
    """,
    "pipeline_shard_manifest": f"""
        WITH tagged AS (
            SELECT {_SQL_KNUTH} % {N_SHARDS} AS shard,
                   doc_id, n_chars,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                     % 1000003 AS v
            FROM documents
        )
        SELECT shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               MIN(doc_id) AS min_doc_id,
               MAX(doc_id) AS max_doc_id,
               CAST(SUM(v) AS BIGINT) AS manifest_digest
        FROM tagged GROUP BY shard
    """,
    "pipeline_split_assign": f"""
        WITH tagged AS (
            SELECT CASE WHEN {_SQL_KNUTH} % 100 < 98 THEN 'train'
                        WHEN {_SQL_KNUTH} % 100 = 98 THEN 'val'
                        ELSE 'test' END AS split,
                   lang, n_chars
            FROM documents
        )
        SELECT split, lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM tagged GROUP BY split, lang
    """,
}

# Composed lazily from the stage oracles at import (no cycles: dedup/text
# never import this module).
ORACLES["pipeline_curation_export"] = _curation_export_oracle()
ORACLES["pipeline_curation_funnel"] = _curation_funnel_oracle()


def _perplexity_kept_oracle() -> str:
    """Wrap the bigram-LM oracle (imported, not duplicated — the model
    SQL must stay in lockstep with the scorer) in the integer gate."""
    from .text import ORACLES as _TEXT_ORACLES

    return f"""
        SELECT doc_id, n_bigrams, sum_logp_unats
        FROM ({_TEXT_ORACLES["text_bigram_logprob"]})
        WHERE sum_logp_unats >= {_PPL_THRESHOLD_UNATS} * n_bigrams
    """


ORACLES["pipeline_perplexity_kept"] = _perplexity_kept_oracle()

def _quality_bins_oracle() -> str:
    """Wrap the quality-score oracle (imported, not duplicated) in the
    quartile-threshold binning."""
    from .text import ORACLES as _TEXT_ORACLES

    return f"""
        WITH scored AS (
            SELECT doc_id, quality_score
            FROM ({_TEXT_ORACLES["text_quality_score"]})
        ), th AS (
            SELECT quantile_disc(quality_score, 0.25) AS t25,
                   quantile_disc(quality_score, 0.5) AS t50,
                   quantile_disc(quality_score, 0.75) AS t75
            FROM scored
        ), binned AS (
            SELECT doc_id, quality_score,
                   CAST(CASE WHEN quality_score < t25 THEN 0
                             WHEN quality_score < t50 THEN 1
                             WHEN quality_score < t75 THEN 2
                             ELSE 3 END AS INT) AS bin
            FROM scored CROSS JOIN th
        )
        SELECT bin, COUNT(*) AS n_docs,
               MIN(quality_score) AS min_score,
               MAX(quality_score) AS max_score
        FROM binned GROUP BY bin
    """


ORACLES["pipeline_quality_bins"] = _quality_bins_oracle()

def _dataset_card_oracle() -> str:
    from .dedup import _SQL_NORM

    return rf"""
        WITH stats AS (
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(LENGTH(regexp_split_to_array(TRIM(text), '\s+')))
                        AS BIGINT) AS n_tokens,
                   CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
                   COUNT(DISTINCT source) AS n_sources,
                   COUNT(DISTINCT lang) AS n_langs,
                   CAST(SUM(CASE WHEN
                       len(regexp_extract_all(text, '{_EMAIL_RE}'))
                       + len(regexp_extract_all(text, '{_PHONE_RE}'))
                       + len(regexp_extract_all(text, '{_IPV4_RE}')) > 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii
            FROM documents
        ), uniq AS (
            SELECT COUNT(DISTINCT md5({_SQL_NORM})) AS n_unique_docs
            FROM documents
        )
        SELECT n_docs, n_unique_docs,
               n_docs - n_unique_docs AS n_exact_dups,
               n_tokens, n_chars, n_sources, n_langs, n_docs_with_pii,
               CAST(n_unique_docs AS DOUBLE) / CAST(n_docs AS DOUBLE)
                 AS unique_rate
        FROM stats CROSS JOIN uniq
    """


ORACLES["pipeline_dataset_card"] = _dataset_card_oracle()

ORACLES["pipeline_epoch_plan"] = f"""
    WITH per_src AS (
        SELECT source,
               CAST(SUM(LENGTH(regexp_split_to_array(TRIM(text), '\\s+')))
                    AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ), scored AS (
        SELECT source,
               CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5)
                    AS BIGINT) AS s
        FROM per_src
    ), total AS (
        SELECT CAST(SUM(s) AS BIGINT) AS tot FROM scored
    ), q AS (
        SELECT source, s,
               ({_EPOCH_DRAWS} * s) // tot AS base,
               ({_EPOCH_DRAWS} * s) % tot AS rem
        FROM scored CROSS JOIN total
    ), lo AS (
        SELECT CAST({_EPOCH_DRAWS} - SUM(base) AS BIGINT) AS l FROM q
    ), ranked AS (
        SELECT a.source, a.base, a.rem, COUNT(b.source) AS n_larger
        FROM q a
        LEFT JOIN q b
          ON b.rem > a.rem OR (b.rem = a.rem AND b.source < a.source)
        GROUP BY a.source, a.base, a.rem
    )
    SELECT source,
           CAST(base + CASE WHEN n_larger < l THEN 1 ELSE 0 END AS BIGINT)
             AS n_draws,
           CAST(base AS BIGINT) AS base_draws,
           n_larger < l AS got_leftover
    FROM ranked CROSS JOIN lo
"""

ORACLES["text_charclass_profile"] = """
    WITH c AS (
        SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT) AS n_chars_total,
               CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                    AS BIGINT) AS n_alpha,
               CAST(LENGTH(regexp_replace(text, '[^0-9]', '', 'g'))
                    AS BIGINT) AS n_digit,
               CAST(LENGTH(regexp_replace(text, '[^ \t\n\r]', '', 'g'))
                    AS BIGINT) AS n_space,
               CAST(LENGTH(regexp_replace(text, e'[^.,;:!?\\'"]', '', 'g'))
                    AS BIGINT) AS n_punct
        FROM documents
    )
    SELECT doc_id, n_chars_total, n_alpha, n_digit, n_space, n_punct,
           n_chars_total - n_alpha - n_digit - n_space - n_punct AS n_other,
           CAST(n_alpha AS DOUBLE) / CAST(n_chars_total AS DOUBLE) AS alpha_ratio
    FROM c
"""

ORACLES["pipeline_domain_mixture"] = """
    WITH per_src AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(LENGTH(regexp_split_to_array(TRIM(text), '\\s+')))
                    AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ), scored AS (
        SELECT *, CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5)
                       AS BIGINT) AS sqrt_unats
        FROM per_src
    ), total AS (
        SELECT CAST(SUM(sqrt_unats) AS BIGINT) AS total_unats FROM scored
    )
    SELECT source, n_docs, n_tokens, sqrt_unats,
           CAST(sqrt_unats AS DOUBLE) / CAST(total_unats AS DOUBLE) AS weight
    FROM scored CROSS JOIN total
"""

ORACLES["pipeline_pack_sequences"] = _pack_sequences_oracle()
ORACLES["pipeline_pack_stats"] = _pack_stats_oracle()
