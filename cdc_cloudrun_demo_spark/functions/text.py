"""Text analysis over the `documents` table: language-ID, quality scoring,
token statistics, fingerprinting.

All hot-path expressions are built-in string/regexp functions (JVM-side,
codegen'd) — no Python in the row loop, which is the difference between
"works on 500 docs" and "works on 100 TB of Common Crawl". Fingerprints
use md5 (identical bytes in every engine); the rolling-hash variant lives
in `simhash.py`-adjacent helpers with property tests (engine-specific hash
functions are not oracle-comparable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_for_compute, load_table
from ..operators._util import davg, sql_davg

_WORD_RE = "[A-Za-z]+"

# Marker stopwords per language for the n-gram/keyword heuristic.
# (Tiny on purpose: the heuristic must be cheap enough to run on every
# document of a web-scale corpus; accuracy is a tuning matter.)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "los", "que", "de"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "les", "des", "et", "une"],
    "zh": ["de", "shi", "bu", "le", "zai"],
}


def _marker_hits(col: Column, words: list[str]) -> Column:
    """Count occurrences of any marker word (word-bounded regex)."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pat), 0)).cast("long")


def _sql_marker_hits(expr: str, words: list[str]) -> str:
    pat = r"\b(" + "|".join(words) + r")\b"
    return f"CAST(LENGTH(regexp_extract_all(LOWER({expr}), '{pat}')) AS BIGINT)"


def word_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(_WORD_RE), 0)).cast("long")


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, word-regex tokens, char stats.
    The BPE-ish proxy `n_subtokens` counts 4-char chunks of word chars —
    a deterministic stand-in for tokenizer load estimation."""
    d = load_table(spark, sf_dir, "documents")
    alpha_chars = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", "")).cast("long")
    n_words = word_count(F.col("text"))
    return d.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_ws_tokens"),
        n_words.alias("n_words"),
        alpha_chars.alias("n_alpha_chars"),
        (alpha_chars.cast("double") / n_words).alias("avg_word_len"),
        F.ceil(alpha_chars / 4.0).cast("long").alias("n_subtokens"),
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: length, punctuation ratio, stopword ratio,
    mean word length — composed into a single [0,1]-ish score (pure
    rational arithmetic → engine-exact)."""
    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("double")
    punct = F.length(F.regexp_replace(F.col("text"), r"[^.,;:!?]", "")).cast("double")
    stop_hits = _marker_hits(F.col("text"), _LANG_MARKERS["en"]).cast("double")
    n_words = word_count(F.col("text")).cast("double")
    punct_ratio = punct / n_chars
    stop_ratio = stop_hits / n_words
    len_ok = F.when((n_words >= 5) & (n_words <= 100000), 1.0).otherwise(0.0)
    score = len_ok * (0.5 + 0.5 * stop_ratio) * (1.0 - punct_ratio)
    return d.select(
        "doc_id",
        n_chars.alias("n_chars_d"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-marker language ID with deterministic argmax (score desc,
    then language code asc) + agreement flag vs the labeled lang."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        *[
            _marker_hits(F.col("text"), words).alias(f"score_{lang}")
            for lang, words in _LANG_MARKERS.items()
        ],
    )
    langs = list(_LANG_MARKERS)
    # argmax via greatest + cascaded CASE (ties resolve to the first lang
    # in asc code order — identical logic in the oracle)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit(None).cast("string")
    for lang in sorted(langs, reverse=True):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return scored.select(
        "doc_id",
        "lang",
        best.alias("best_score"),
        pred.alias("lang_pred"),
        (pred == F.col("lang")).alias("agrees"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over normalized text (lowercase,
    punctuation stripped, whitespace collapsed) → duplicate-group stats."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return (
        d.select("doc_id", F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_id"))
    )


def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats (the aggregate a filtering pipeline reads)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars")).alias("total_chars"),
        davg(F.length("text").cast("double"), 2).alias("avg_len"),
        F.countDistinct("source").alias("n_sources"),
    )


def text_chunking(spark: SparkSession, sf_dir: str, size: int = 200, stride: int = 150) -> DataFrame:
    """Overlapping document chunking (size 200, stride 150) — the LLM
    context-window splitter. Pure built-ins (sequence → posexplode →
    substr): the row expansion happens JVM-side inside whole-stage
    codegen, no Python, and each document chunks independently, so the
    operator is embarrassingly parallel at corpus scale (narrow — the
    explode never shuffles)."""
    d = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(stride)
    )
    exploded = d.select(
        "doc_id", "text", F.posexplode(starts).alias("chunk_id", "start")
    )
    chunk = F.col("text").substr(F.col("start"), F.lit(size))
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start"),
        chunk.alias("chunk"),
        F.length(chunk).cast("long").alias("chunk_len"),
    )


def text_vocab_topk(spark: SparkSession, sf_dir: str, k: int = 50) -> DataFrame:
    """Corpus vocabulary: token frequencies + document frequencies, top-k
    by count (ties broken lexically) — the vocab-building pass of a
    tokenizer pipeline. Tokenize→explode→count is the canonical word-count:
    partial aggregation runs scan-side, the shuffle carries one row per
    distinct token per partition, and the top-k is a TakeOrdered on the
    already-aggregated (tiny) table."""
    d = load_for_compute(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )
    return (
        words.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("word"))
        .limit(k)
    )


_SQL_NORM = (
    "TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g'))"
)

def text_pack_offsets(spark: SparkSession, sf_dir: str, budget: int = 512) -> DataFrame:
    """Sequence packing for LLM pre-training (concat-then-chop): within
    each source stream, documents are concatenated in doc_id order into
    one virtual token stream that is chopped into fixed `budget`-token
    context windows. Each doc gets its exact token offset, the window
    (bin) its first token falls in, and whether it straddles a window
    boundary — the bookkeeping a packing pipeline needs to mask
    cross-document attention.

    The offset is a running-sum window partitioned by source (ONE shuffle
    keyed on source, integer arithmetic throughout — `div` on longs, no
    float). At 100 TB the partition key must be a bounded shard (e.g.
    source × file-split) rather than a raw source with billions of docs;
    the per-source ordinal chain is inherently sequential, so packing is
    parallel ACROSS shards, sequential within — exactly how striped
    pre-tokenized corpora (e.g. Megatron-style .bin shards) are laid out."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    base = d.select(
        "doc_id", "source", n_tokens.alias("n_tokens")
    ).withColumn("offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    bin_id = F.expr(f"offset div {budget}")
    end_bin = F.expr(f"(offset + n_tokens - 1) div {budget}")
    return base.select(
        "doc_id",
        "source",
        "n_tokens",
        "offset",
        bin_id.alias("bin_id"),
        (end_bin != bin_id).alias("spans_boundary"),
    )


def text_vocab_encode(spark: SparkSession, sf_dir: str, k: int = 64) -> DataFrame:
    """Tokenizer encode pass: build a top-k vocabulary (count DESC, word
    ASC — fully deterministic ids 0..k-1), then map every document to its
    ordered token-id sequence with -1 for out-of-vocabulary tokens.

    The vocab is tiny by construction, so the encode is a BROADCAST left
    join against the exploded (doc_id, pos, word) stream — no shuffle of
    the corpus for the lookup; the only wide op is the groupBy(doc_id)
    that reassembles sequences (one shuffle keyed on doc_id, carrying the
    compact id structs, not the text). The id sequence is emitted as a
    canonical CSV string: engine-portable, hash-comparable, and exactly
    what a downstream packing stage would checksum. At 100 TB the same
    plan holds — a real 50k-token vocab still broadcasts (<1 MB) and the
    reassembly shuffle carries ~4 bytes/token."""
    d = load_for_compute(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("pos", "word"),
    )
    wv = Window.orderBy(F.desc("c"), F.asc("word"))  # k rows only — safe
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("word"))
        .limit(k)
        .withColumn("token_id", (F.row_number().over(wv) - 1).cast("int"))
        .select("word", "token_id")
    )
    enc = words.join(F.broadcast(vocab), "word", "left").select(
        "doc_id", "pos", F.coalesce("token_id", F.lit(-1)).alias("tid")
    )
    seq = F.array_sort(F.collect_list(F.struct("pos", "tid")))
    return enc.groupBy("doc_id").agg(
        F.concat_ws(",", F.transform(seq, lambda s: s.tid.cast("string"))).alias(
            "token_ids_csv"
        ),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("tid") == -1, 1).otherwise(0)).alias("n_unk"),
    )


def mg_candidates(words: DataFrame, n_counters: int) -> DataFrame:
    """Per-partition Misra-Gries sketch over a 1-column `word` DataFrame:
    ≤ `n_counters` counters per partition, Arrow-batched, vectorized
    value_counts feeding weighted MG updates. Emits the surviving words
    (the candidate superset); counts are NOT emitted because MG counts
    are underestimates — callers must recount exactly. Guarantee: any
    word whose count in a partition exceeds partition_n/(n_counters+1)
    survives that partition's sketch."""
    import pandas as pd

    def mg_sketch(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for w, c in pdf["word"].value_counts().items():
                counters[w] = counters.get(w, 0) + int(c)
            if len(counters) > n_counters:
                vals = sorted(counters.values(), reverse=True)
                t = vals[n_counters]  # (n_counters+1)-th largest count
                counters = {w: c - t for w, c in counters.items() if c > t}
        yield pd.DataFrame({"word": list(counters) or []}, dtype="object")

    return words.mapInPandas(mg_sketch, schema="word string").distinct()


def text_heavy_hitters(spark: SparkSession, sf_dir: str, k: int = 50) -> DataFrame:
    """Frequent tokens (count·k > corpus total) via the distributed
    Misra-Gries two-pass: pass 1 runs a BOUNDED-MEMORY sketch per
    partition (2k counters, Arrow-batched `mapInPandas` with vectorized
    value_counts feeding weighted MG updates) and emits ≤2k candidate
    words per partition; pass 2 exact-counts only the candidates and
    applies the threshold as an integer cross-multiply against the
    broadcast corpus total.

    Why not plain groupBy: exact word-count shuffles one row per distinct
    token per partition — fine for words, fatal when the key space is
    unbounded (URLs, n-grams, user-ids at 100 TB). MG's superset
    guarantee (any token with global share > 1/k is locally frequent in
    ≥1 partition, and 2k counters keep everything above a 1/(2k+1) local
    share) means pass 2's shuffle carries ≤ 2k·#partitions candidate
    rows, independent of the distinct-key count. The final counts are
    exact, so the oracle is the plain HAVING query."""
    d = load_for_compute(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("word")
    )
    candidates = mg_candidates(words, n_counters=2 * k)
    tot = words.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        words.join(F.broadcast(candidates), "word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .join(F.broadcast(tot))
        .filter(F.col("n_occurrences") * F.lit(k) > F.col("n_total"))
        .select("word", "n_occurrences")
    )


def _distinct_5grams(d: DataFrame) -> DataFrame:
    """(doc_id, gram): distinct lowercase word-5-grams per document.
    Token array materialized once per row (see _token_trigrams note in
    functions/dedup.py — CollapseProject keeps the non-cheap alias in
    its own Project, so the regex runs once, not 5× per gram)."""
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    w = F.col("__words")
    tok = d.select("doc_id", words.alias("__words")).filter(F.size(w) >= 5)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - 5),
        lambda i: F.concat_ws(
            " ",
            F.element_at(w, i + 1),
            F.element_at(w, i + 2),
            F.element_at(w, i + 3),
            F.element_at(w, i + 4),
            F.element_at(w, i + 5),
        ),
    )
    return tok.select("doc_id", F.explode(F.array_distinct(grams)).alias("gram"))


def text_contamination(spark: SparkSession, sf_dir: str, split_mod: int = 50) -> DataFrame:
    """Train/eval contamination check — the gate every LLM data pipeline
    runs before training: for each held-out eval document, how many of
    its distinct word-5-grams also occur in ANY training document.

    Split is deterministic (``doc_id % split_mod == 0`` → eval). Scale
    shape: the eval set is bounded (a benchmark suite, not a corpus), so
    its distinct-gram set broadcasts; the 100 TB train side is only ever
    SCANNED and semi-joined against that broadcast — no shuffle of train
    grams, no join keyed on the unbounded side. The matched-gram set
    (⊆ eval grams) broadcasts back to score each eval doc. Two corpus
    passes (train scan + eval scan), zero wide exchanges over train."""
    d = load_for_compute(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % split_mod == 0
    eval_g = _distinct_5grams(d.filter(is_eval))
    train_g = _distinct_5grams(d.filter(~is_eval))
    eval_gramset = eval_g.select("gram").distinct()
    matched_grams = (
        train_g.join(F.broadcast(eval_gramset), "gram", "left_semi")
        .select("gram")
        .distinct()
    )
    totals = eval_g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        eval_g.join(F.broadcast(matched_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    joined = totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
    )
    return joined.withColumn(
        "contamination_rate",
        F.round(F.col("n_contaminated").cast("double") / F.col("n_grams"), 6),
    )


def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition signals: duplicate-word
    fraction and duplicate-3-gram fraction per document — the quality
    rules that catch boilerplate and looping generations.

    ENTIRELY NARROW: token array materialized once per row, distinct
    counts via array_distinct — no explode, no shuffle, no UDF. At
    100 TB this runs at scan speed; the fractions are exact rationals
    rounded at 6, identical in both engines."""
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    w = F.col("__words")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", words.alias("__words")
    ).filter(F.size(w) >= 3)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - 3),
        lambda i: F.concat_ws(
            " ", F.element_at(w, i + 1), F.element_at(w, i + 2), F.element_at(w, i + 3)
        ),
    )
    n_words = F.size(w).cast("long")
    n_distinct_words = F.size(F.array_distinct(w)).cast("long")
    out = d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_distinct_words.alias("n_distinct_words"),
        F.size(grams).cast("long").alias("n_3grams"),
        F.size(F.array_distinct(grams)).cast("long").alias("n_distinct_3grams"),
    )
    dup_word = (F.col("n_words") - F.col("n_distinct_words")).cast("double") / F.col(
        "n_words"
    )
    dup_gram = (F.col("n_3grams") - F.col("n_distinct_3grams")).cast(
        "double"
    ) / F.col("n_3grams")
    return out.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        "n_3grams",
        "n_distinct_3grams",
        F.round(dup_word, 6).alias("dup_word_frac"),
        F.round(dup_gram, 6).alias("dup_3gram_frac"),
    )


def pipeline_quality_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4/Gopher-shaped quality FILTER pass as one operator: every
    document scored on word count, mean word length and duplicate-3-gram
    fraction, with a kept flag. Thresholds compare EXACT integers
    (cross-multiplied rationals — e.g. dup_frac ≤ 0.2 becomes
    5·(n−distinct) ≤ n on longs), so no document near a float boundary
    can flip between engines or partitionings. Narrow end to end —
    loaded via `load_for_heavy_compute`: the per-row scoring (regex
    tokenization + 3-gram set math) is a heavy deterministic filter
    that Catalyst would otherwise push back into the one-row-group
    scan task (measured 25 s single-task vs ~1.5 s spread at sf0.1);
    the lineage-broken load pins it at core parallelism and is
    load_table verbatim on well-laid-out input."""
    from ..catalog import load_for_heavy_compute

    return quality_scored(load_for_heavy_compute(spark, sf_dir, "documents"))


def quality_scored(docs: DataFrame) -> DataFrame:
    """The quality scoring+gate core of `pipeline_quality_kept` over an
    arbitrary documents frame — per-row and narrow, so a streaming gate
    (`stream_quality_gate_live`) applies the IDENTICAL integer
    predicates to each micro-batch."""
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    w = F.col("__words")
    d = docs.select("doc_id", "lang", "source", words.alias("__words"))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - 3),
        lambda i: F.concat_ws(
            " ", F.element_at(w, i + 1), F.element_at(w, i + 2), F.element_at(w, i + 3)
        ),
    )
    n_words = F.size(w).cast("long")
    alpha_chars = F.aggregate(
        F.transform(w, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_grams = F.when(n_words >= 3, F.size(grams).cast("long")).otherwise(F.lit(0))
    n_dup_grams = F.when(
        n_words >= 3,
        (F.size(grams) - F.size(F.array_distinct(grams))).cast("long"),
    ).otherwise(F.lit(0))
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        n_words.alias("n_words"),
        alpha_chars.alias("alpha_chars"),
        n_grams.alias("n_3grams"),
        n_dup_grams.alias("n_dup_3grams"),
    )
    # all-integer predicates: 10 ≤ words; 2 ≤ mean_wordlen ≤ 12 as
    # 2n ≤ chars ≤ 12n; dup_3gram_frac ≤ 0.2 as 5·dup ≤ grams
    kept = (
        (F.col("n_words") >= 10)
        & (2 * F.col("n_words") <= F.col("alpha_chars"))
        & (F.col("alpha_chars") <= 12 * F.col("n_words"))
        & (5 * F.col("n_dup_3grams") <= F.col("n_3grams"))
    )
    return scored.withColumn("kept", kept)


def text_unigram_logprob(
    spark: SparkSession, sf_dir: str, top_v: int = 65536
) -> DataFrame:
    """Unigram language-model scoring — the cheap perplexity proxy LLM
    pipelines use to rank document quality: train unigram probabilities
    on the corpus itself (vocabulary truncated to the ``top_v`` most
    frequent words, ties broken by word; every out-of-vocab token pools
    into one UNK bucket whose probability is the truncated tail's total
    mass), score each document by its mean token log-probability.

    The top-V truncation is what BOUNDS the vocab broadcast at any
    corpus size (round-4 advice — an untruncated distinct-word set is
    unbounded at 100 TB): the rank is a distributed top-k
    (TakeOrderedAndProject, never a global sort), V is a constant, and
    the UNK row is one extra scalar. On the driver corpora (31 distinct
    words) nothing truncates, so values equal the untruncated model;
    the UNK path is exercised by a small-V fixture test in
    tests/test_llm_ops.py.

    Cross-engine float discipline for a sum of logs: each token's
    ln(count/total) is computed on IDENTICAL doubles in both engines
    (count/total is an exact rational → the same IEEE double), scaled
    to micro-nats, rounded to 3 decimals BEFORE the floor — Spark's
    Math.log and DuckDB's libm ln are each only 1-ulp-accurate, and a
    raw floor could flip on a boundary token where the two libms
    disagree by 1 ulp; after round(·, 3) a ≲2e-9 µnat disagreement
    cannot move the floored long (round-4 advice) — then floored to a
    LONG before the per-doc sum, so the aggregate is exact integer
    addition, immune to summation order, and the final mean divides
    once. Plan: one shuffle to count the vocab, a top-k, a broadcast of
    the bounded vocab into the exploded token stream, one groupBy(doc)."""
    d = load_for_compute(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    vocab_top = counts.orderBy(F.desc("c"), F.asc("word")).limit(top_v)
    totals = (
        counts.agg(F.sum("c").alias("n_total"))
        .crossJoin(vocab_top.agg(F.sum("c").alias("n_invocab")))
        .select("n_total", (F.col("n_total") - F.col("n_invocab")).alias("n_unk"))
    )

    def _logp_unats(count_col):
        return (
            F.floor(
                F.round(
                    F.log(count_col.cast("double") / F.col("n_total").cast("double"))
                    * F.lit(1_000_000.0),
                    3,
                )
            )
            .cast("long")
        )

    vocab = vocab_top.crossJoin(F.broadcast(totals)).select(
        "word", _logp_unats(F.col("c")).alias("logp_unats")
    )
    unk = totals.select(
        F.when(F.col("n_unk") > 0, _logp_unats(F.col("n_unk"))).alias("unk_logp_unats")
    )
    scored = (
        words.join(F.broadcast(vocab), "word", "left")
        .crossJoin(F.broadcast(unk))
        .select(
            "doc_id",
            F.coalesce(F.col("logp_unats"), F.col("unk_logp_unats")).alias("logp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("logp").alias("sum_logp_unats"),
        )
        .withColumn(
            # raw IEEE division — see text_bigram_logprob note (round(x,6)
            # near a boundary is engine-ambiguous; the quotient of two
            # identical integers is not)
            "mean_logp",
            F.col("sum_logp_unats").cast("double")
            / F.lit(1_000_000.0)
            / F.col("n_tokens"),
        )
    )


def text_bigram_logprob(
    spark: SparkSession,
    sf_dir: str,
    top_v: int = 65536,
    top_b: int = 131072,
) -> DataFrame:
    """Interpolated bigram language-model scoring — one step up the LM
    ladder from `text_unigram_logprob`, the standard next quality proxy:
    for every within-document adjacent token pair,
    ``p = 0.75·c(w₁w₂)/c(w₁) + 0.25·c(w₂)/N``, falling back to the pure
    unigram term when the bigram is outside the model. λ = 0.75/0.25
    are EXACT binary fractions, so the interpolation arithmetic is the
    identical IEEE operation tree in both engines.

    Boundedness at corpus scale (the unigram entry's discipline, twice):
    tokens UNK-encode against the top-V unigram vocab FIRST, then the
    bigram table truncates to the top-B pairs (distributed top-k, ties
    broken lexicographically) — both model tables broadcast at fixed
    size regardless of corpus size; out-of-model pairs take the backoff
    path, exercised by a small-B fixture test in tests/test_llm_ops.py.
    The conditional uses the plain unigram count of w₁ as the prefix
    mass (the always-bounded approximation; exact prefix counting would
    subtract doc-final occurrences — same plan, one more aggregate).
    Float discipline: every count ratio is an exact-rational→double,
    scaled to micro-nats and rounded at 3 decimals BEFORE the floor so
    a 1-ulp libm ln disagreement cannot flip the per-token long; the
    per-doc sum is exact integer addition. Plan: one doc_id exchange
    for the lag (production keeps per-doc arrays co-located and builds
    pairs array-side), two bounded top-k model builds, broadcast joins."""
    d = load_for_compute(spark, sf_dir, "documents")
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    toks = d.select("doc_id", words.alias("__words")).filter(F.size("__words") >= 2)
    pos = toks.select("doc_id", F.posexplode("__words").alias("i", "word"))
    counts = pos.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        counts.orderBy(F.desc("c"), F.asc("word"))
        .limit(top_v)
        .select("word", F.lit(1).alias("__in"))
    )
    enc = pos.join(F.broadcast(vocab), "word", "left").select(
        "doc_id",
        "i",
        F.when(F.col("__in").isNotNull(), F.col("word"))
        .otherwise(F.lit("<unk>"))
        .alias("tok"),
    )
    uc = enc.groupBy("tok").agg(F.count(F.lit(1)).alias("cu"))
    n_total = uc.agg(F.sum("cu").cast("double").alias("n_total"))
    prev = F.lag("tok").over(Window.partitionBy("doc_id").orderBy("i"))
    pairs = (
        enc.select("doc_id", "i", prev.alias("prev"), "tok")
        .filter(F.col("prev").isNotNull())
    )
    bc = (
        pairs.groupBy("prev", "tok")
        .agg(F.count(F.lit(1)).alias("cb"))
        .orderBy(F.desc("cb"), F.asc("prev"), F.asc("tok"))
        .limit(top_b)
    )
    up = uc.select(F.col("tok").alias("prev"), F.col("cu").alias("c_prev"))
    ut = uc.select("tok", F.col("cu").alias("c_tok"))
    uni_term = F.lit(0.25) * (F.col("c_tok").cast("double") / F.col("n_total"))
    p = F.when(
        F.col("cb").isNotNull(),
        F.lit(0.75) * (F.col("cb").cast("double") / F.col("c_prev").cast("double"))
        + uni_term,
    ).otherwise(uni_term)
    scored = (
        pairs.join(F.broadcast(bc), ["prev", "tok"], "left")
        .join(F.broadcast(up), "prev")
        .join(F.broadcast(ut), "tok")
        .crossJoin(F.broadcast(n_total))
        .select(
            "doc_id",
            F.floor(F.round(F.log(p) * F.lit(1_000_000.0), 3))
            .cast("long")
            .alias("logp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("logp").alias("sum_logp_unats"),
        )
        .withColumn(
            # RAW IEEE division, no rounding: sum and count are identical
            # integers in both engines, so the quotient is bit-identical —
            # whereas round(x, 6) near a 6-dp boundary can flip between
            # Spark's BigDecimal HALF_UP and DuckDB's multiply-based round
            # (observed at sf0.1: one doc's mean at ...2825 exactly).
            "mean_logp",
            F.col("sum_logp_unats").cast("double")
            / F.lit(1_000_000.0)
            / F.col("n_bigrams"),
        )
    )


def text_tfidf_topterms(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """Per-document top-k TF-IDF terms — the classic retrieval /
    keyword-extraction statistic. Rank determinism is engineered the
    same way as the LM scores: idf = ln((N+1)/(df+1)) is an
    exact-rational→double (identical IEEE input in both engines),
    scaled to micro-nats and rounded at 3 decimals BEFORE the floor
    (the libm 1-ulp guard), and the final score is tf · idf_unats —
    INTEGER × INTEGER, so the ranking key is exact and no document near
    a score boundary can order differently across engines or
    partitionings. Plan: one tf groupBy, one vocab-sized df aggregate
    joined back on the term (AQE picks broadcast vs shuffle by actual
    vocab size; at 100 TB the df table is the unbounded object and gets
    the top-V truncation the LM ops use), one per-doc top-k window."""
    d = load_for_compute(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("term"),
    )
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = words.agg(F.countDistinct("doc_id").alias("n"))
    idf = df_t.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.floor(
            F.round(
                F.log(
                    (F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
                )
                * F.lit(1_000_000.0),
                3,
            )
        )
        .cast("long")
        .alias("idf_unats"),
    )
    scored = tf.join(idf, "term").select(
        "doc_id",
        "term",
        "tf",
        (F.col("tf") * F.col("idf_unats")).alias("score_unats"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_unats"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "score_unats", F.col("rnk").cast("long").alias("rnk"))
    )


_SPELL_DIST = 2


def text_spell_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spell-variant resolution over the corpus vocabulary: every pair
    of distinct tokens within Levenshtein distance ≤ 2, with corpus
    frequencies and the canonical pick (higher document frequency, ties
    to the lexicographically smaller token) — the fuzzy-join step of an
    entity-resolution / OCR-cleanup pipeline.

    The blocking is LOSSLESS, not heuristic: |len(a)−len(b)| > d implies
    levenshtein(a,b) > d, so one side explodes each token to its d+1=5
    candidate partner lengths and the candidate join is a plain
    EQUI-join on length — no CartesianProduct, no similarity predicate
    in the join condition. The oracle deliberately uses the naive
    quadratic formulation (join on the length band, filter by
    levenshtein), so the hash match certifies the blocking loses
    nothing. At 100 TB the vocabulary is the top-V-truncated table every
    LM op here already bounds (|V| ≪ corpus), length blocks are further
    splittable by first-character for skew, and the count-signature
    filter (shared letters ≥ len−d) is the standard next prune — noted,
    not needed at this V."""
    d = load_for_compute(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("tok")
    )
    vocab = words.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    left = vocab.select(
        F.col("tok").alias("tok_a"),
        F.col("freq").alias("freq_a"),
        F.length("tok").alias("blk_len"),
    )
    right = vocab.select(
        F.col("tok").alias("tok_b"),
        F.col("freq").alias("freq_b"),
        F.explode(
            F.sequence(
                F.length("tok") - _SPELL_DIST, F.length("tok") + _SPELL_DIST
            )
        ).alias("blk_len"),
    )
    return (
        left.join(right, "blk_len")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .withColumn("dist", F.levenshtein("tok_a", "tok_b"))
        .filter(F.col("dist") <= _SPELL_DIST)
        .select(
            "tok_a",
            "tok_b",
            F.col("dist").cast("long").alias("dist"),
            "freq_a",
            "freq_b",
            F.when(F.col("freq_a") > F.col("freq_b"), F.col("tok_a"))
            .when(F.col("freq_b") > F.col("freq_a"), F.col("tok_b"))
            .otherwise(F.least("tok_a", "tok_b"))
            .alias("canonical"),
        )
    )


SPELL_VARIANTS_ORACLE = f"""
    WITH vocab AS (
        SELECT tok, COUNT(*) AS freq FROM (
            SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
            FROM documents
        ) GROUP BY tok
    )
    SELECT x.tok AS tok_a, y.tok AS tok_b,
           CAST(levenshtein(x.tok, y.tok) AS BIGINT) AS dist,
           x.freq AS freq_a, y.freq AS freq_b,
           CASE WHEN x.freq > y.freq THEN x.tok
                WHEN y.freq > x.freq THEN y.tok
                ELSE least(x.tok, y.tok) END AS canonical
    FROM vocab x JOIN vocab y
      ON x.tok < y.tok
     AND abs(length(x.tok) - length(y.tok)) <= {_SPELL_DIST}
    WHERE levenshtein(x.tok, y.tok) <= {_SPELL_DIST}
"""

_BM25_TERMS = ("hash", "join", "spark")
_BM25_K = 10


def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 full-text retrieval: top-10 documents for a fixed query term
    set, scored with the classic Okapi formula (k1=1.2, b=0.75) made
    EXACT-INTEGER so the ranking is engine-independent:

    - idf: the BM25+ form ln(1 + (N−df+0.5)/(df+0.5)) simplifies to
      ln((2N+2)/(2df+1)) — one exact-rational→double division feeding
      ln, scaled to micro-nats with the same round-at-3-then-floor
      libm-ulp guard as TF-IDF (`text_tfidf_topterms`).
    - tf normalization: tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with
      avgdl = L/N kept as the exact rational it is. Clearing
      denominators (k1=6/5, b=3/4, avgdl=L/N) gives
      score_micro = idf_unats · 22·tf·L div (10·tf·L + 3·L + 9·dl·N)
      — INTEGER ÷ INTEGER, zero float accumulation anywhere.
    - per-doc score: a SUM of integers — order-insensitive, so the
      global top-k (score desc, doc_id asc) is a total order both
      engines reproduce bit-for-bit.

    Plan at 100 TB: tf for the 3 query terms only (filter BEFORE the
    tf aggregate — the posting-list read, not a corpus-wide score), dl
    from one per-doc count, the (N, L) scalars broadcast; top-k is
    Spark's TakeOrderedAndProject, never a full sort. int64 headroom:
    idf_unats·22·tf·L needs the decimal path past ~10¹¹ total tokens —
    same documented envelope as the lift/pricing entries."""
    d = load_for_compute(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("term"),
    )
    dl = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    consts = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    qterms = words.filter(F.col("term").isin(*_BM25_TERMS))
    tf = qterms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_t.crossJoin(F.broadcast(consts)).select(
        "term",
        F.floor(
            F.round(
                F.log(
                    (F.lit(2.0) * F.col("n_docs") + F.lit(2.0))
                    / (F.lit(2.0) * F.col("df") + F.lit(1.0))
                )
                * F.lit(1_000_000.0),
                3,
            )
        )
        .cast("long")
        .alias("idf_unats"),
    )
    scored = (
        tf.join(idf, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "score_micro",
            F.expr(
                "idf_unats * (22 * tf * total_len)"
                " div (10 * tf * total_len + 3 * total_len + 9 * dl * n_docs)"
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.min("dl").alias("dl"),
        F.sum("score_micro").alias("score_micro"),
    )
    return (
        per_doc.orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(_BM25_K)
        .select("doc_id", "n_terms", "dl", "score_micro")
    )


BM25_ORACLE = f"""
    WITH words AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        FROM documents
    ), dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id
    ), consts AS (
        SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dl
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM words
        WHERE term IN {_BM25_TERMS!r}
        GROUP BY doc_id, term
    ), df_t AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), idf AS (
        SELECT term,
               CAST(FLOOR(ROUND(LN((2.0 * n_docs + 2.0) / (2.0 * df + 1.0))
                                * 1000000.0, 3)) AS BIGINT) AS idf_unats
        FROM df_t CROSS JOIN consts
    ), scored AS (
        SELECT t.doc_id, d.dl,
               (i.idf_unats * (22 * t.tf * c.total_len))
                 // (10 * t.tf * c.total_len + 3 * c.total_len
                     + 9 * d.dl * c.n_docs) AS score_micro
        FROM tf t
        JOIN idf i ON i.term = t.term
        JOIN dl d ON d.doc_id = t.doc_id
        CROSS JOIN consts c
    )
    SELECT doc_id, COUNT(*) AS n_terms, MIN(dl) AS dl,
           CAST(SUM(score_micro) AS BIGINT) AS score_micro
    FROM scored GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id ASC LIMIT {_BM25_K}
"""


def text_boilerplate_strip(
    spark: SparkSession, sf_dir: str, chunk_words: int = 8, min_docs: int = 2
) -> DataFrame:
    """CCNet/RefinedWeb-style cross-document boilerplate removal: the
    corpus is cut into non-overlapping ``chunk_words``-word chunks (the
    stand-in for lines/paragraphs — this corpus has no newlines), a
    chunk whose md5 appears in ≥ ``min_docs`` DISTINCT documents is
    boilerplate (nav bars, license footers, scraped templates), and
    every document is reassembled from its surviving chunks in order.
    Output per doc: chunk counts, dropped count, kept token count, and
    the md5 of the reassembled text — so the hash oracle proves the
    exact reassembly, not just the counts.

    Scale shape: posexplode is narrow; chunk assembly is one shuffle on
    (doc_id, chunk_id) with the in-chunk order restored by sort_array
    (not collect_list order, which is nondeterministic post-shuffle);
    the boilerplate filter is a frequency aggregate on the chunk hash
    followed by an ANTI join — both keyed shuffles, no broadcast of
    anything corpus-scaled, and the chunk hash (16 bytes) is what
    shuffles, never the chunk text twice. The md5 chunk identity makes
    the whole pipeline portable to the DuckDB oracle bit for bit."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = d.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "word"),
    )
    chunks = (
        words.groupBy("doc_id", F.expr(f"pos div {chunk_words}").alias("chunk_id"))
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ),
            ).alias("chunk_text")
        )
        .withColumn("chunk_hash", F.md5("chunk_text"))
    )
    boiler = (
        chunks.groupBy("chunk_hash")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("chunk_hash")
    )
    kept = chunks.join(boiler, "chunk_hash", "left_anti")
    kept_agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("chunk_id", "chunk_text"))),
                    lambda s: s["chunk_text"],
                ),
            )
        ).alias("kept_md5"),
        F.sum(F.size(F.split("chunk_text", " "))).alias("kept_words"),
    )
    totals = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    return (
        totals.join(kept_agg, "doc_id", "left_outer")
        .select(
            "doc_id",
            "n_chunks",
            (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0))).alias("n_dropped"),
            F.coalesce("kept_words", F.lit(0)).alias("kept_words"),
            F.coalesce("kept_md5", F.md5(F.lit(""))).alias("kept_md5"),
        )
    )


def text_bpe_pair_stats(spark: SparkSession, sf_dir: str, top_k: int = 20) -> DataFrame:
    """One BPE training iteration's pair statistics: adjacent-symbol
    pair counts over the corpus vocabulary, weighted by word frequency —
    the top row IS the merge a byte-pair-encoding tokenizer would learn
    next. This is the inner loop of tokenizer training at corpus scale,
    and its scale shape is the important part: the corpus collapses to
    its VOCABULARY first (one word-count shuffle — the same aggregate
    `text_vocab_topk` runs), and the pair explosion happens over
    distinct words only (bounded by |vocab| × max word length, NOT by
    corpus size — a trillion-token corpus has a few million distinct
    words). Pair counting is a second small shuffle over ≤26² keys with
    map-side combine; the top-k is a TakeOrdered on a tiny table with a
    full lexical tie-break so the result set is deterministic. All
    built-in JVM expressions; the oracle reproduces every step."""
    d = load_for_compute(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("word")
    )
    vocab = (
        words.filter((F.length("word") >= 2) & (F.length("word") <= 20))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = vocab.select(
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
        F.col("word"),
    ).select(
        F.expr("substring(word, i, 1)").alias("left_sym"),
        F.expr("substring(word, i + 1, 1)").alias("right_sym"),
        "freq",
    )
    return (
        pairs.groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym"))
        .limit(top_k)
    )


def text_bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
) -> DataFrame:
    """The learned BPE merge table — see `_bpe_train_state` for the
    trainer; `text_bpe_segment` exposes the other artifact (the final
    per-word segmentation the same run produces)."""
    out, _vocab = _bpe_train_state(spark, sf_dir, n_merges)
    return out


def text_bpe_segment(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
) -> DataFrame:
    """The trained tokenizer's OBSERVABLE behavior: every vocabulary
    word's final BPE segmentation after ``n_merges`` learned merges —
    (word, freq, toks, n_pieces) with toks the '|'-joined subword
    pieces. This is the encode table a tokenizer ships (applying it to
    a corpus is one broadcast join, `text_vocab_encode`'s shape); it is
    the round-``n_merges`` vocabulary state of `_bpe_train_state`, so
    the DuckDB oracle replays the identical unrolled rounds and
    hash-matches every segmentation byte-for-byte."""
    _out, vocab = _bpe_train_state(spark, sf_dir, n_merges)
    return vocab.select(
        "word",
        "freq",
        "toks",
        (F.size(F.split(F.col("toks"), r"\|"))).cast("long").alias("n_pieces"),
    )


def text_bpe_encode_trained(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
) -> DataFrame:
    """Train → ship → APPLY: encode every document with the BPE
    segmentation `text_bpe_train` just learned. The segmentation table
    (word → '|'-joined pieces) joins onto the corpus's positional token
    stream — the `text_vocab_encode` broadcast-lookup shape, so the
    document text never shuffles for the lookup; out-of-vocabulary
    tokens (outside the trainer's 2..20-length gate) pass through as
    single pieces, byte-preserving. Per document this emits exact
    accounting plus the md5 of the full ordered piece stream — hash
    parity on that digest proves the ENCODED BYTES of every document
    match DuckDB's replay of the same trained tokenizer, not just the
    counts. Per-doc reassembly is one groupBy carrying (pos, pieces)
    structs sorted in-array (bounded by document length). Output:
    (doc_id, n_tokens, n_pieces, stream_md5)."""
    _out, vocab = _bpe_train_state(spark, sf_dir, n_merges)
    seg = vocab.select(
        "word",
        F.col("toks").alias("__pieces"),
        F.size(F.split(F.col("toks"), r"\|")).cast("long").alias("__np"),
    )
    d = load_for_compute(spark, sf_dir, "documents")
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    tok = d.select(
        "doc_id", F.posexplode(words).alias("pos", "word")
    )
    j = tok.join(seg, "word", "left_outer").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("__pieces"), F.col("word")).alias("piece"),
        F.coalesce(F.col("__np"), F.lit(1)).cast("long").alias("np"),
    )
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("np").alias("n_pieces"),
        F.md5(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "piece"))
                    ),
                    lambda s: s.piece,
                ),
            )
        ).alias("stream_md5"),
    )


def text_bpe_fertility(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
) -> DataFrame:
    """Tokenizer FERTILITY by language — the acceptance metric a
    tokenizer ships or dies on (pieces per word, and how many characters
    each piece carries): languages the merges under-serve show high
    fertility, which inflates training cost and context usage for that
    language. Computed from the SAME trained segmentation as
    `text_bpe_encode_trained` (train → apply → measure, one artifact),
    but aggregating straight to |langs| rows: the corpus-sized work is
    one token explode + one broadcast-lookup join against the bounded
    vocab table; the divisions happen on exact integer sums per
    language, so the rounded ratios are engine-stable. Output: (lang,
    n_words, n_pieces, n_chars, fertility, chars_per_piece)."""
    _out, vocab = _bpe_train_state(spark, sf_dir, n_merges)
    seg = vocab.select(
        "word",
        F.size(F.split(F.col("toks"), r"\|")).cast("long").alias("__np"),
    )
    d = load_for_compute(spark, sf_dir, "documents")
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    tok = d.select("lang", F.explode(words).alias("word"))
    j = tok.join(seg, "word", "left_outer").select(
        "lang",
        F.coalesce("__np", F.lit(1)).cast("long").alias("np"),
        F.length("word").cast("long").alias("nch"),
    )
    n_words = F.count(F.lit(1))
    n_pieces = F.sum("np")
    n_chars = F.sum("nch")
    return j.groupBy("lang").agg(
        n_words.alias("n_words"),
        n_pieces.alias("n_pieces"),
        n_chars.alias("n_chars"),
        F.round(n_pieces.cast("double") / n_words.cast("double"), 6).alias(
            "fertility"
        ),
        F.round(n_chars.cast("double") / n_pieces.cast("double"), 6).alias(
            "chars_per_piece"
        ),
    )


def _bpe_fertility_oracle(n_merges: int = 8) -> str:
    return f"""WITH {_bpe_rounds_ctes(n_merges)},
    seg AS MATERIALIZED (
        SELECT word, CAST(LENGTH(string_split(toks, '|')) AS BIGINT) AS np
        FROM v{n_merges}
    ), tok AS (
        SELECT lang, UNNEST(regexp_extract_all(LOWER(text), '[a-z]+')) AS word
        FROM documents
    ), enc AS (
        SELECT tok.lang, COALESCE(s.np, 1) AS np, LENGTH(tok.word) AS nch
        FROM tok LEFT JOIN seg s ON s.word = tok.word
    )
    SELECT lang, COUNT(*) AS n_words,
           CAST(SUM(np) AS BIGINT) AS n_pieces,
           CAST(SUM(nch) AS BIGINT) AS n_chars,
           ROUND(CAST(SUM(np) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS fertility,
           ROUND(CAST(SUM(nch) AS DOUBLE) / CAST(SUM(np) AS DOUBLE), 6)
               AS chars_per_piece
    FROM enc GROUP BY lang"""


def _bpe_encode_oracle(n_merges: int = 8) -> str:
    return f"""WITH {_bpe_rounds_ctes(n_merges)},
    seg AS MATERIALIZED (
        SELECT word, toks AS pieces,
               CAST(LENGTH(string_split(toks, '|')) AS BIGINT) AS np
        FROM v{n_merges}
    ), tok AS (
        SELECT doc_id, t.pos AS pos, t.w AS word FROM (
            SELECT doc_id,
                   UNNEST([STRUCT_PACK(pos := i - 1, w := ws[i])
                           FOR i IN RANGE(1, LENGTH(ws) + 1)]) AS t
            FROM (SELECT doc_id,
                         regexp_extract_all(LOWER(text), '[a-z]+') AS ws
                  FROM documents)
        )
    ), enc AS (
        SELECT tok.doc_id, tok.pos,
               COALESCE(s.pieces, tok.word) AS piece,
               COALESCE(s.np, 1) AS np
        FROM tok LEFT JOIN seg s ON s.word = tok.word
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(np) AS BIGINT) AS n_pieces,
           md5(string_agg(piece, '|' ORDER BY pos)) AS stream_md5
    FROM enc GROUP BY doc_id"""


def _bpe_train_state(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
):
    """The full BPE TRAINER — `text_bpe_pair_stats` is one iteration;
    this runs ``n_merges`` rounds and emits the learned merge table,
    the actual tokenizer artifact (round, left_sym, right_sym,
    pair_count). Each round: (1) adjacent-pair counts over the DISTINCT
    WORD vocabulary weighted by word frequency (the vocab-collapse
    discipline — per-round cost is bounded by |vocab| × word length,
    never corpus size), (2) the argmax pair under the total order
    (count DESC, pair lex ASC) — one TakeOrdered on a tiny table, (3)
    the merge applied to every word's symbol sequence by a LEFT-TO-RIGHT
    fold (``aggregate`` over the symbol array: append, or join the last
    token when it equals `a` and the next symbol is `b` — exact BPE
    single-pass semantics, so 'aaa' under merge (a,a) becomes
    [aa, a]), broadcast from the 1-row best. Symbol sequences ride as
    one '|'-delimited string (the separator cannot occur in [a-z]+
    tokens), which makes the fold a portable string accumulator both
    engines evaluate identically — the DuckDB oracle replays every
    round as unrolled CTEs (list_reduce twin) and hash-matches the
    whole merge table. Per-round state pins eagerly (the iterative
    discipline); at 100 TB the vocabulary still fits a few million
    rows and every round is two small shuffles."""
    d = load_for_compute(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("word")
    )
    vocab = (
        words.filter((F.length("word") >= 2) & (F.length("word") <= 20))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "word",
            "freq",
            F.concat_ws(
                "|",
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.expr("word").substr(i, F.lit(1)),
                ),
            ).alias("toks"),
        )
        .localCheckpoint(eager=True)
    )
    out: DataFrame | None = None
    for r in range(1, n_merges + 1):
        syms = F.split(F.col("toks"), r"\|")
        pairs = vocab.select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(syms) - 1),
                    lambda i: F.struct(
                        F.element_at(syms, i).alias("a"),
                        F.element_at(syms, i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        ).filter(F.size(syms) >= 2)
        counts = pairs.groupBy(
            F.col("p.a").alias("a"), F.col("p.b").alias("b")
        ).agg(F.sum("freq").alias("c"))
        best = counts.orderBy(
            F.desc("c"), F.asc("a"), F.asc("b")
        ).limit(1)
        row = best.select(
            F.lit(r).alias("round"),
            F.col("a").alias("left_sym"),
            F.col("b").alias("right_sym"),
            F.col("c").cast("long").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
        folded = F.aggregate(
            F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
            F.element_at(syms, 1),
            lambda acc, x: F.when(
                (
                    (acc == F.col("a"))
                    | acc.endswith(F.concat(F.lit("|"), F.col("a")))
                )
                & (x == F.col("b")),
                F.concat(acc, x),
            ).otherwise(F.concat(acc, F.lit("|"), x)),
        )
        vocab = (
            # LEFT join on TRUE, not crossJoin: when the corpus runs out
            # of adjacent pairs `best` is EMPTY, the merge columns come
            # back NULL, every fold condition evaluates NULL, and the
            # otherwise-branch reconstructs each word unchanged — the
            # trainer idles instead of wiping the vocabulary
            vocab.join(F.broadcast(best.select("a", "b")), F.lit(True), "left")
            .select("word", "freq", folded.alias("toks"))
            .localCheckpoint(eager=True)  # iterative pin per round
        )
    return out, vocab


def _bpe_rounds_ctes(n_merges: int = 8) -> str:
    """The unrolled BPE training rounds as CTE text — shared by the
    merge-table and segmentation oracles."""
    parts = [
        """v0 AS MATERIALIZED (
        SELECT word, freq,
               array_to_string([word[i] FOR i IN RANGE(1, LENGTH(word) + 1)],
                               '|') AS toks
        FROM (
            SELECT word, COUNT(*) AS freq FROM (
                SELECT UNNEST(regexp_extract_all(LOWER(text), '[a-z]+')) AS word
                FROM documents
            ) WHERE LENGTH(word) BETWEEN 2 AND 20
            GROUP BY word
        )
    )"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f"""p{r} AS MATERIALIZED (
        SELECT p.a AS a, p.b AS b, SUM(freq) AS c FROM (
            SELECT freq, UNNEST([STRUCT_PACK(a := s[i], b := s[i+1])
                                 FOR i IN RANGE(1, LENGTH(s))]) AS p
            FROM (SELECT string_split(toks, '|') AS s, freq FROM v{r - 1})
            WHERE LENGTH(s) >= 2
        ) GROUP BY p.a, p.b
    ), best{r} AS MATERIALIZED (
        SELECT a, b, c FROM p{r} ORDER BY c DESC, a ASC, b ASC LIMIT 1
    ), v{r} AS MATERIALIZED (
        SELECT word, freq, list_reduce(
            string_split(toks, '|'),
            (acc, x) -> CASE WHEN (acc = m.a OR suffix(acc, '|' || m.a))
                              AND x = m.b
                             THEN acc || x
                             ELSE acc || '|' || x END
        ) AS toks
        FROM v{r - 1} LEFT JOIN best{r} m ON TRUE
    )"""
        )
    return ",\n    ".join(parts)


def _bpe_train_oracle(n_merges: int = 8) -> str:
    union = "\n        UNION ALL\n        ".join(
        f"SELECT {r} AS round, a AS left_sym, b AS right_sym,"
        f" CAST(c AS BIGINT) AS pair_count FROM best{r}"
        for r in range(1, n_merges + 1)
    )
    return f"WITH {_bpe_rounds_ctes(n_merges)}\n        {union}"


def _bpe_segment_oracle(n_merges: int = 8) -> str:
    return f"""WITH {_bpe_rounds_ctes(n_merges)}
        SELECT word, CAST(freq AS BIGINT) AS freq, toks,
               CAST(LENGTH(string_split(toks, '|')) AS BIGINT) AS n_pieces
        FROM v{n_merges}"""


TEXT_BPE_PAIR_ORACLE = """
    WITH words AS (
        SELECT UNNEST(regexp_extract_all(LOWER(text), '[a-z]+')) AS word
        FROM documents
    ),
    vocab AS (
        SELECT word, COUNT(*) AS freq FROM words
        WHERE LENGTH(word) BETWEEN 2 AND 20
        GROUP BY word
    ),
    pairs AS (
        SELECT substring(word, i, 1) AS left_sym,
               substring(word, i + 1, 1) AS right_sym,
               freq
        FROM (SELECT word, freq,
                     UNNEST(generate_series(1, LENGTH(word) - 1)) AS i
              FROM vocab)
    )
    SELECT left_sym, right_sym, CAST(SUM(freq) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY left_sym, right_sym
    ORDER BY pair_count DESC, left_sym ASC, right_sym ASC
    LIMIT 20
"""


QUERIES = {
    "text_bpe_pair_stats": text_bpe_pair_stats,
    "text_bpe_train": text_bpe_train,
    "text_bpe_segment": text_bpe_segment,
    "text_bpe_encode_trained": text_bpe_encode_trained,
    "text_bpe_fertility": text_bpe_fertility,
    "text_boilerplate_strip": text_boilerplate_strip,
    "text_spell_variants": text_spell_variants,
    "text_bm25_search": text_bm25_search,
    "text_tfidf_topterms": text_tfidf_topterms,
    "text_bigram_logprob": text_bigram_logprob,
    "text_contamination": text_contamination,
    "text_unigram_logprob": text_unigram_logprob,
    "text_repetition_signals": text_repetition_signals,
    "pipeline_quality_kept": pipeline_quality_kept,
    "text_heavy_hitters": text_heavy_hitters,
    "text_vocab_encode": text_vocab_encode,
    "text_pack_offsets": text_pack_offsets,
    "text_vocab_topk": text_vocab_topk,
    "text_chunking": text_chunking,
    "text_token_stats": text_token_stats,
    "text_quality_score": text_quality_score,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "text_lang_stats": text_lang_stats,
}


def _lang_id_oracle() -> str:
    score_cols = ",\n               ".join(
        f"{_sql_marker_hits('text', words)} AS score_{lang}"
        for lang, words in _LANG_MARKERS.items()
    )
    langs = list(_LANG_MARKERS)
    greatest = "GREATEST(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lang} = best THEN '{lang}'" for lang in sorted(langs)
    ) + " END"
    return f"""
        WITH scored AS (
            SELECT doc_id, lang,
               {score_cols}
            FROM documents
        ), with_best AS (
            SELECT *, {greatest} AS best FROM scored
        )
        SELECT doc_id, lang, best AS best_score,
               {case} AS lang_pred,
               {case} = lang AS agrees
        FROM with_best
    """


ORACLES = {
    "text_bpe_pair_stats": TEXT_BPE_PAIR_ORACLE,
    "text_bpe_train": _bpe_train_oracle(),
    "text_bpe_segment": _bpe_segment_oracle(),
    "text_bpe_fertility": _bpe_fertility_oracle(),
    "text_bpe_encode_trained": _bpe_encode_oracle(),
    "text_boilerplate_strip": """
        WITH words AS (
            SELECT doc_id, w.word, CAST(w.ord - 1 AS BIGINT) AS pos
            FROM documents,
                 LATERAL (SELECT UNNEST(string_split_regex(TRIM(text), '\\s+'))
                              AS word,
                          generate_subscripts(
                              string_split_regex(TRIM(text), '\\s+'), 1) AS ord) w
        ), chunks AS (
            SELECT doc_id, pos // 8 AS chunk_id,
                   string_agg(word, ' ' ORDER BY pos) AS chunk_text,
                   md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_hash
            FROM words GROUP BY doc_id, pos // 8
        ), boiler AS (
            SELECT chunk_hash FROM chunks
            GROUP BY chunk_hash HAVING COUNT(DISTINCT doc_id) >= 2
        ), kept AS (
            SELECT * FROM chunks
            WHERE chunk_hash NOT IN (SELECT chunk_hash FROM boiler)
        ), kept_agg AS (
            SELECT doc_id, COUNT(*) AS n_kept,
                   md5(string_agg(chunk_text, ' ' ORDER BY chunk_id)) AS kept_md5,
                   CAST(SUM(LENGTH(chunk_text)
                            - LENGTH(REPLACE(chunk_text, ' ', '')) + 1)
                        AS BIGINT) AS kept_words
            FROM kept GROUP BY doc_id
        )
        SELECT t.doc_id, t.n_chunks,
               t.n_chunks - COALESCE(k.n_kept, 0) AS n_dropped,
               COALESCE(k.kept_words, 0) AS kept_words,
               COALESCE(k.kept_md5, md5('')) AS kept_md5
        FROM (SELECT doc_id, COUNT(*) AS n_chunks FROM chunks GROUP BY doc_id) t
        LEFT JOIN kept_agg k ON t.doc_id = k.doc_id
    """,
    "text_spell_variants": SPELL_VARIANTS_ORACLE,
    "text_bm25_search": BM25_ORACLE,
    "text_tfidf_topterms": """
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(regexp_extract_all(LOWER(text), '[a-z]+')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
        ), df_t AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ), n_docs AS (
            SELECT COUNT(DISTINCT doc_id) AS n FROM toks
        ), idf AS (
            SELECT term,
                   CAST(FLOOR(ROUND(LN((n + 1.0) / (df + 1.0))
                                    * 1000000.0, 3)) AS BIGINT) AS idf_unats
            FROM df_t CROSS JOIN n_docs
        ), scored AS (
            SELECT t.doc_id, t.term, t.tf,
                   t.tf * i.idf_unats AS score_unats
            FROM tf t JOIN idf i USING (term)
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY score_unats DESC, term ASC
            ) AS rnk
            FROM scored
        )
        SELECT doc_id, term, tf, score_unats, CAST(rnk AS BIGINT) AS rnk
        FROM ranked WHERE rnk <= 5
    """,
    "text_bigram_logprob": """
        WITH docs AS (
            SELECT doc_id, regexp_extract_all(LOWER(text), '[a-z]+') AS w
            FROM documents WHERE len(regexp_extract_all(LOWER(text), '[a-z]+')) >= 2
        ), tokens AS (
            SELECT doc_id, UNNEST(generate_series(1, len(w))) AS i, w
            FROM docs
        ), toks AS (
            SELECT doc_id, i, w[i] AS word FROM tokens
        ), counts AS (
            SELECT word, COUNT(*) AS c FROM toks GROUP BY word
        ), vocab AS (
            SELECT word FROM counts ORDER BY c DESC, word LIMIT 65536
        ), enc AS (
            SELECT t.doc_id, t.i,
                   CASE WHEN v.word IS NULL THEN '<unk>' ELSE t.word END AS tok
            FROM toks t LEFT JOIN vocab v USING (word)
        ), uc AS (
            SELECT tok, COUNT(*) AS cu FROM enc GROUP BY tok
        ), tot AS (
            SELECT CAST(SUM(cu) AS DOUBLE) AS n_total FROM uc
        ), pairs AS (
            SELECT e.doc_id, e.i, p.tok AS prev, e.tok
            FROM enc e JOIN enc p ON e.doc_id = p.doc_id AND p.i = e.i - 1
        ), bc AS (
            SELECT prev, tok, COUNT(*) AS cb FROM pairs GROUP BY prev, tok
            ORDER BY cb DESC, prev, tok LIMIT 131072
        ), scored AS (
            SELECT pr.doc_id,
                   CAST(FLOOR(ROUND(LN(
                       CASE WHEN b.cb IS NOT NULL
                            THEN 0.75 * (CAST(b.cb AS DOUBLE)
                                         / CAST(up.cu AS DOUBLE))
                                 + 0.25 * (CAST(ut.cu AS DOUBLE) / n_total)
                            ELSE 0.25 * (CAST(ut.cu AS DOUBLE) / n_total)
                       END) * 1000000.0, 3)) AS BIGINT) AS logp
            FROM pairs pr
            LEFT JOIN bc b ON pr.prev = b.prev AND pr.tok = b.tok
            JOIN uc up ON pr.prev = up.tok
            JOIN uc ut ON pr.tok = ut.tok
            CROSS JOIN tot
        )
        SELECT doc_id,
               COUNT(*) AS n_bigrams,
               CAST(SUM(logp) AS BIGINT) AS sum_logp_unats,
               CAST(SUM(logp) AS DOUBLE) / 1000000.0 / COUNT(*)
                 AS mean_logp
        FROM scored GROUP BY doc_id
    """,
    "text_unigram_logprob": """
        WITH words AS (
            SELECT doc_id,
                   UNNEST(regexp_extract_all(LOWER(text), '[a-z]+')) AS word
            FROM documents
        ), counts AS (
            SELECT word, COUNT(*) AS c FROM words GROUP BY word
        ), vocab_top AS (
            SELECT word, c FROM counts ORDER BY c DESC, word LIMIT 65536
        ), tot AS (
            SELECT (SELECT CAST(SUM(c) AS DOUBLE) FROM counts) AS n_total,
                   (SELECT CAST(SUM(c) AS DOUBLE) FROM counts)
                   - (SELECT CAST(SUM(c) AS DOUBLE) FROM vocab_top) AS n_unk
        ), vocab AS (
            SELECT word,
                   CAST(FLOOR(ROUND(LN(CAST(c AS DOUBLE) / n_total)
                                    * 1000000.0, 3))
                        AS BIGINT) AS logp_unats
            FROM vocab_top, tot
        ), unk AS (
            SELECT CASE WHEN n_unk > 0
                        THEN CAST(FLOOR(ROUND(LN(n_unk / n_total)
                                              * 1000000.0, 3)) AS BIGINT)
                   END AS unk_logp_unats
            FROM tot
        )
        SELECT w.doc_id,
               COUNT(*) AS n_tokens,
               CAST(SUM(COALESCE(v.logp_unats, u.unk_logp_unats)) AS BIGINT)
                 AS sum_logp_unats,
               CAST(SUM(COALESCE(v.logp_unats, u.unk_logp_unats)) AS DOUBLE)
                     / 1000000.0 / COUNT(*) AS mean_logp
        FROM words w LEFT JOIN vocab v USING (word) CROSS JOIN unk u
        GROUP BY w.doc_id
    """,
    "text_repetition_signals": """
        WITH docs AS (
            SELECT doc_id, regexp_extract_all(LOWER(text), '[a-z]+') AS toks
            FROM documents
        ), pos AS (
            SELECT doc_id, toks, UNNEST(generate_series(1, len(toks) - 2)) AS p
            FROM docs WHERE len(toks) >= 3
        ), grams AS (
            SELECT doc_id,
                   COUNT(*) AS n_3grams,
                   COUNT(DISTINCT toks[p] || ' ' || toks[p+1] || ' ' || toks[p+2])
                     AS n_distinct_3grams
            FROM pos GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(len(d.toks) AS BIGINT) AS n_words,
               CAST(len(list_distinct(d.toks)) AS BIGINT) AS n_distinct_words,
               CAST(g.n_3grams AS BIGINT) AS n_3grams,
               CAST(g.n_distinct_3grams AS BIGINT) AS n_distinct_3grams,
               ROUND(CAST(len(d.toks) - len(list_distinct(d.toks)) AS DOUBLE)
                     / len(d.toks), 6) AS dup_word_frac,
               ROUND(CAST(g.n_3grams - g.n_distinct_3grams AS DOUBLE)
                     / g.n_3grams, 6) AS dup_3gram_frac
        FROM docs d JOIN grams g ON d.doc_id = g.doc_id
        WHERE len(d.toks) >= 3
    """,
    "pipeline_quality_kept": """
        WITH docs AS (
            SELECT doc_id, lang, source,
                   regexp_extract_all(LOWER(text), '[a-z]+') AS toks
            FROM documents
        ), gram_stats AS (
            SELECT doc_id,
                   COUNT(*) AS n_3grams,
                   COUNT(*) - COUNT(DISTINCT
                       toks[p] || ' ' || toks[p+1] || ' ' || toks[p+2])
                     AS n_dup_3grams
            FROM (
                SELECT doc_id, toks, UNNEST(generate_series(1, len(toks) - 2)) AS p
                FROM docs WHERE len(toks) >= 3
            ) GROUP BY doc_id
        ), scored AS (
            SELECT d.doc_id, d.lang, d.source,
                   CAST(len(d.toks) AS BIGINT) AS n_words,
                   CAST(COALESCE(list_sum(list_transform(d.toks,
                        t -> LENGTH(t))), 0) AS BIGINT) AS alpha_chars,
                   CAST(COALESCE(g.n_3grams, 0) AS BIGINT) AS n_3grams,
                   CAST(COALESCE(g.n_dup_3grams, 0) AS BIGINT) AS n_dup_3grams
            FROM docs d LEFT JOIN gram_stats g ON d.doc_id = g.doc_id
        )
        SELECT *,
               (n_words >= 10 AND 2 * n_words <= alpha_chars
                AND alpha_chars <= 12 * n_words
                AND 5 * n_dup_3grams <= n_3grams) AS kept
        FROM scored
    """,
    "text_contamination": """
        WITH docs AS (
            SELECT doc_id, regexp_extract_all(LOWER(text), '[a-z]+') AS toks
            FROM documents
        ), pos AS (
            SELECT doc_id, toks, UNNEST(generate_series(1, len(toks) - 4)) AS p
            FROM docs WHERE len(toks) >= 5
        ), grams AS (
            SELECT DISTINCT doc_id,
                   toks[p] || ' ' || toks[p+1] || ' ' || toks[p+2] || ' '
                           || toks[p+3] || ' ' || toks[p+4] AS gram
            FROM pos
        ), eval_g AS (
            SELECT * FROM grams WHERE doc_id % 50 = 0
        ), train_g AS (
            SELECT DISTINCT gram FROM grams WHERE doc_id % 50 <> 0
        ), tot AS (
            SELECT doc_id, COUNT(*) AS n_grams FROM eval_g GROUP BY doc_id
        ), hit AS (
            SELECT e.doc_id, COUNT(*) AS n_contaminated
            FROM eval_g e JOIN train_g t USING (gram) GROUP BY e.doc_id
        )
        SELECT t.doc_id,
               CAST(t.n_grams AS BIGINT) AS n_grams,
               CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
               ROUND(CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / t.n_grams, 6)
                 AS contamination_rate
        FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
    """,
    # exact frequent-items semantics — the MG pass may only change HOW
    # candidates are found, never the final set
    "text_heavy_hitters": """
        WITH words AS (
            SELECT UNNEST(regexp_extract_all(LOWER(text), '[a-z]+')) AS word
            FROM documents
        ), tot AS (SELECT COUNT(*) AS n FROM words)
        SELECT word, COUNT(*) AS n_occurrences
        FROM words, tot
        GROUP BY word, n
        HAVING COUNT(*) * 50 > n
    """,
    "text_vocab_encode": """
        WITH docs AS (
            SELECT doc_id, regexp_extract_all(LOWER(text), '[a-z]+') AS toks
            FROM documents
        ), pos AS (
            SELECT doc_id, toks,
                   UNNEST(generate_series(1, GREATEST(len(toks), 1))) AS p
            FROM docs
        ), words AS (
            SELECT doc_id, p - 1 AS pos, toks[p] AS word
            FROM pos WHERE len(toks) >= p
        ), vocab AS (
            SELECT word,
                   CAST(ROW_NUMBER() OVER (ORDER BY c DESC, word ASC) - 1
                        AS INT) AS token_id
            FROM (
                SELECT word, COUNT(*) AS c FROM words GROUP BY word
                ORDER BY c DESC, word ASC LIMIT 64
            )
        ), enc AS (
            SELECT w.doc_id, w.pos, COALESCE(v.token_id, -1) AS tid
            FROM words w LEFT JOIN vocab v USING (word)
        )
        SELECT doc_id,
               string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos)
                 AS token_ids_csv,
               COUNT(*) AS n_tokens,
               -- CAST: DuckDB SUM(int) yields HUGEINT -> pandas float64,
               -- which breaks strict value hashing vs Spark's int64
               CAST(SUM(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_unk
        FROM enc GROUP BY doc_id
    """,
    "text_pack_offsets": """
        WITH toks AS (
            SELECT doc_id, source,
                   CAST(LENGTH(regexp_split_to_array(TRIM(text), '\\s+'))
                        AS BIGINT) AS n_tokens
            FROM documents
        ), packed AS (
            -- CAST: DuckDB window SUM(BIGINT) yields HUGEINT -> pandas
            -- float64, which breaks strict value hashing vs Spark's int64
            SELECT doc_id, source, n_tokens,
                   CAST(SUM(n_tokens) OVER (PARTITION BY source
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens AS BIGINT) AS "offset"
            FROM toks
        )
        SELECT doc_id, source, n_tokens, "offset",
               CAST("offset" // 512 AS BIGINT) AS bin_id,
               ("offset" + n_tokens - 1) // 512 <> "offset" // 512
                 AS spans_boundary
        FROM packed
    """,
    "text_vocab_topk": """
        SELECT word, COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS doc_freq
        FROM (
            SELECT doc_id,
                   UNNEST(regexp_extract_all(LOWER(text), '[a-z]+')) AS word
            FROM documents
        ) w
        GROUP BY word
        ORDER BY n_occurrences DESC, word ASC
        LIMIT 50
    """,
    "text_chunking": """
        SELECT doc_id,
               CAST((start - 1) // 150 AS BIGINT) AS chunk_id,
               CAST(start AS BIGINT) AS start,
               substr(text, start, 200) AS chunk,
               CAST(LENGTH(substr(text, start, 200)) AS BIGINT) AS chunk_len
        FROM (
            SELECT doc_id, text,
                   UNNEST(generate_series(1, GREATEST(LENGTH(text), 1), 150))
                     AS start
            FROM documents
        ) t
    """,
    "text_token_stats": """
        SELECT doc_id, lang,
               CAST(LENGTH(text) AS BIGINT) AS n_chars_actual,
               CAST(LENGTH(regexp_split_to_array(TRIM(text), '\\s+')) AS BIGINT)
                 AS n_ws_tokens,
               CAST(LENGTH(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words,
               CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT)
                 AS n_alpha_chars,
               CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                 / LENGTH(regexp_extract_all(text, '[A-Za-z]+')) AS avg_word_len,
               CAST(CEIL(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) / 4.0)
                    AS BIGINT) AS n_subtokens
        FROM documents
    """,
    "text_quality_score": f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(LENGTH(text) AS DOUBLE) AS n_chars_d,
                   CAST(LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                     AS punct,
                   CAST({_sql_marker_hits("text", _LANG_MARKERS["en"])} AS DOUBLE)
                     AS stop_hits,
                   CAST(LENGTH(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE)
                     AS n_words
            FROM documents
        )
        SELECT doc_id, n_chars_d,
               punct / n_chars_d AS punct_ratio,
               stop_hits / n_words AS stopword_ratio,
               (CASE WHEN n_words >= 5 AND n_words <= 100000 THEN 1.0 ELSE 0.0 END)
                 * (0.5 + 0.5 * (stop_hits / n_words))
                 * (1.0 - punct / n_chars_d) AS quality_score
        FROM base
    """,
    "text_lang_id": _lang_id_oracle(),
    "text_fingerprint": f"""
        SELECT md5({_SQL_NORM}) AS fingerprint,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS canonical_id
        FROM documents
        GROUP BY 1
    """,
    "text_lang_stats": f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               {sql_davg("CAST(LENGTH(text) AS DOUBLE)", 2)} AS avg_len,
               COUNT(DISTINCT source) AS n_sources
        FROM documents
        GROUP BY lang
    """,
}
