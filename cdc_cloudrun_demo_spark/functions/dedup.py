"""Deduplication over `documents`: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design (the point of each variant):
* exact — one hash-groupBy on a normalized-text digest: a single shuffle
  of (digest, doc_id), never the full text;
* n-gram Jaccard — exact pairwise similarity *within blocking keys*
  (lang, source): the cross-product is bounded per block, and the join is
  shingle-equality driven (posting-list join), not a cartesian;
* MinHash-LSH — `pyspark.ml.feature.MinHashLSH` over HashingTF shingles
  (rows-only: engine-seeded hash family), plus a PORTABLE 16-permutation
  md5 MinHash banding twin that DuckDB reproduces bit-for-bit → full
  hash-match oracle; banding makes candidate generation subquadratic;
* SimHash — 60-bit sketch via per-token portable md5 bit votes: one pass,
  one groupBy; candidates = equal sketches / ≤3-hamming banded pairs,
  both hash-match oracled (the oracle recomputes all 60 bit votes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_for_compute, load_table

_SQL_NORM = (
    "TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g'))"
)

# Hot-shingle document-frequency cap: a shingle held by > MAX_SHINGLE_DF
# docs in a block is non-discriminative (stopword-like) and would emit an
# O(df²) posting list — the classic quadratic blowup at corpus scale. Both
# the Spark plan and every oracle drop such shingles BEFORE pairing AND
# before the per-doc set-size count, so numerator and denominator range
# over the same universe: the reported value is a true Jaccard over
# discriminative shingles (a capped numerator over an uncapped denominator
# would systematically underestimate similarity on stopword-heavy corpora).
MAX_SHINGLE_DF = 50


def normalize_text(col: Column) -> Column:
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(col), "[^a-z0-9 ]", ""), " +", " ")
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep min(doc_id) per normalized-text group; report
    survivors with their duplicate multiplicity."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(normalize_text(F.col("text"))).alias("norm_hash"))
        .groupBy("norm_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated id set itself (what a pipeline would keep)."""
    d = load_table(spark, sf_dir, "documents")
    ranked = d.select(
        "doc_id", "lang", F.md5(normalize_text(F.col("text"))).alias("norm_hash")
    )
    keep = ranked.groupBy("norm_hash").agg(F.min("doc_id").alias("doc_id"))
    return keep.join(ranked, ["norm_hash", "doc_id"]).select("doc_id", "lang")


def _token_trigrams(d: DataFrame) -> DataFrame:
    """Distinct word-3-gram shingles per doc: (doc_id, block keys, shingle).

    The token array is materialized in its own projection BEFORE the
    gram builder references it 3× per element: CollapseProject keeps
    non-cheap multiply-referenced aliases in a separate Project, so the
    regex tokenizer runs once per document instead of once per
    element_at — measured 2× on the whole shingle pass."""
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    w = F.col("__words")
    tok = d.select("doc_id", "lang", "source", words.alias("__words")).filter(
        F.size(w) >= 3
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(w, i + 1),
            F.element_at(w, i + 2),
            F.element_at(w, i + 3),
        ),
    )
    return tok.select(
        "doc_id", "lang", "source", F.explode(F.array_distinct(grams)).alias("shingle")
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity for candidate pairs within
    (lang, source) blocks, j >= 0.1.

    Plan: posting lists, not a self-join — group shingles by a 64-bit
    hash of (block, shingle), emit each list's canonical pairs, count
    co-occurrences per pair. One shuffle of the shingle set instead of
    two copies through a sort-merge join, and only docs sharing a shingle
    ever meet. The per-doc set sizes are a doc-count-sized table, joined
    by broadcast (one broadcast, reused for both pair sides).
    Hot (non-discriminative) shingles would make quadratic posting lists,
    so postings longer than MAX_SHINGLE_DF are dropped before pairing —
    mirrored in the oracle — bounding pair emission per shingle at
    O(MAX_SHINGLE_DF²) regardless of corpus size (property-tested in
    tests/test_llm_ops.py). Set sizes are counted over the SAME capped
    universe (see MAX_SHINGLE_DF note), so the statistic is a true Jaccard
    over discriminative shingles; both sizes and pairs derive from one
    persisted posting aggregate, so the shingle set shuffles once.
    At corpus scale the posting table is materialized/bucketed instead of
    persist()ed, and the sizes join falls back to shuffle automatically
    once it exceeds the broadcast threshold."""
    d = load_for_compute(spark, sf_dir, "documents")
    inter, sa, sb = _capped_posting_stats(d)
    jac = F.col("n_common").cast("double") / (
        F.col("size_a") + F.col("size_b") - F.col("n_common")
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.1)
    )


def _token_trigram_keys(d: DataFrame) -> DataFrame:
    """Distinct word-3-gram shingles per doc as 64-bit posting keys:
    (doc_id, key) with key = xxhash64(lang, source, xxhash64(w1,w2,w3)).

    Shingle identity is the HASH, never the concatenated string: the
    gram string (3 words + separators, ~25 bytes) is never built, and
    the posting shuffle moves an 8-byte long per shingle instead of the
    (lang, source, string) triple — the same identity-by-hash move
    HashingTF/MinHash make. A 64-bit collision would merge two shingles
    inside one block (P ≈ n²/2⁶⁵ ≈ 2e-9 at 260k distinct shingles —
    negligible vs the oracle, and shrinking the key space is exactly
    what the oracle's HAVING-capped string grouping tolerates too).
    Token array is materialized in its own projection before the gram
    builder references it 3× per element (see _token_trigrams note)."""
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    w = F.col("__words")
    tok = d.select("doc_id", "lang", "source", words.alias("__words")).filter(
        F.size(w) >= 3
    )
    gram_hashes = F.transform(
        F.sequence(F.lit(0), F.size(w) - 3),
        lambda i: F.xxhash64(
            F.element_at(w, i + 1), F.element_at(w, i + 2), F.element_at(w, i + 3)
        ),
    )
    return tok.select(
        "doc_id", "lang", "source", F.explode(F.array_distinct(gram_hashes)).alias("gh")
    ).select("doc_id", F.xxhash64("lang", "source", "gh").alias("key"))


def _capped_posting_stats(d: DataFrame):
    """Shared posting-list machinery for the shingle-overlap family:
    capped postings → (pair co-occurrence counts, per-doc set sizes as
    id_a/id_b-keyed tables). One tokenization pass, ONE shuffle of the
    shingle set: the pid aggregate is LAZY-localCheckpointed below, so
    the first job of the consumer's action materializes it once and the
    pair branch plus both broadcast size projections read the pinned
    partitions (round-14 — this replaced reliance on exchange reuse,
    which deduplicated only two of the three consumers: the r13 executed
    plan still scanned the corpus 4×; the pin took jaccard 0.93 → 0.17 s
    at sf0.1). No module-global cache and no eager work: nothing
    survives the invocation, concurrent sessions can't evict each
    other's state, and bench timings stay cold-honest by construction
    (round-4 review items both closed by deletion).

    Shuffle-width discipline (round-4 perf review): the posting groupBy
    key is ONE long (hashed block+shingle, `_token_trigram_keys`), the
    lists are unsorted (pair canonicalization via least/greatest at
    emission — no per-list sort), and the pair groupBy key is ONE long
    (id_a·2³² | id_b — valid while doc_id < 2³¹; beyond that domain the
    pack widens to the two-long groupBy with no semantic change).

    Sizes ride the pair exchange (round-5 perf review): each kept list
    emits its canonical pairs PLUS one SELF-pair (x·2³² | x) per member,
    so a single pid groupBy yields both co-occurrence counts (id_a≠id_b)
    and per-doc set sizes (id_a=id_b — its count is exactly the number
    of kept shingles containing the doc). The sizes branch therefore
    replays only the tiny post-partial-agg pid reduce instead of the
    full posting-list reduce + explode — one broadcast, reused for both
    pair sides."""
    sh = _token_trigram_keys(d)
    kept = (
        sh.groupBy("key")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") <= MAX_SHINGLE_DF)
    )
    ids = F.col("ids")
    n = F.size(ids)
    pair_ids = F.concat(
        F.flatten(
            F.transform(
                ids,
                lambda x, i: F.transform(
                    F.slice(ids, i + 2, n),
                    lambda y: F.shiftleft(F.least(x, y), 32).bitwiseOR(
                        F.greatest(x, y)
                    ),
                ),
            )
        ),
        F.transform(ids, lambda x: F.shiftleft(x, 32).bitwiseOR(x)),
    )
    counts = (
        kept.select(F.explode(pair_ids).alias("pid"))
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.shiftrightunsigned(F.col("pid"), 32).alias("id_a"),
            F.col("pid").bitwiseAND(F.lit(0xFFFFFFFF)).alias("id_b"),
            "cnt",
        )
        # LAZY pin (round-14, guide §2.4): the pid aggregate feeds three
        # consumers (pair counts + both broadcast size projections);
        # exchange reuse only deduplicated two of them — the executed r13
        # plan still ran FOUR parquet scans of the corpus because the
        # broadcast builds' canonical plans diverge from the shuffle
        # branch. The pin makes the reuse structural: the first job of
        # the ACTION materializes the aggregate once (eager=False keeps
        # every byte of work inside the bench's action-only timed
        # window — an eager pin here would smuggle the posting shuffle
        # into untimed construction) and all three consumers read the
        # pinned partitions. Post-aggregate is the smallest this data
        # ever is (≤ one row per co-occurring pair, spill-backed
        # storage), and nothing survives the invocation.
        .localCheckpoint(eager=False)
    )
    inter = counts.filter(F.col("id_a") != F.col("id_b")).withColumnRenamed(
        "cnt", "n_common"
    )
    sizes = counts.filter(F.col("id_a") == F.col("id_b")).select(
        F.col("id_a").alias("doc_id"), F.col("cnt").alias("set_size")
    )
    bsizes = F.broadcast(sizes)
    sa = bsizes.select(F.col("doc_id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = bsizes.select(F.col("doc_id").alias("id_b"), F.col("set_size").alias("size_b"))
    return inter, sa, sb


def dedup_containment(spark: SparkSession, sf_dir: str, threshold: float = 0.5) -> DataFrame:
    """ASYMMETRIC shingle containment — |A∩B|/|A| and |A∩B|/|B| per
    candidate pair, kept when either side is ≥ 0.5-contained in the
    other. Jaccard misses quote/excerpt duplication (a paragraph fully
    inside a much longer doc has low Jaccard but containment ≈ 1), and
    containment is the statistic dedup literature uses for that case.
    Same capped posting-list plan as `dedup_ngram_jaccard` (shared via
    `_capped_posting_stats` — one shingle shuffle, no self-join of the
    corpus); the threshold compares exact integers cross-multiplied
    (den·n_common ≥ num·size for threshold = num/den), so no float
    boundary exists at any threshold value."""
    from fractions import Fraction

    d = load_for_compute(spark, sf_dir, "documents")
    inter, sa, sb = _capped_posting_stats(d)
    frac = Fraction(threshold).limit_denominator(10_000)
    num, den = frac.numerator, frac.denominator
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            (den * F.col("n_common") >= num * F.col("size_a"))
            | (den * F.col("n_common") >= num * F.col("size_b"))
        )
        .select(
            "id_a",
            "id_b",
            (F.col("n_common").cast("double") / F.col("size_a")).alias("containment_a"),
            (F.col("n_common").cast("double") / F.col("size_b")).alias("containment_b"),
        )
    )


def minhash_lsh_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.6, num_tables: int = 16
) -> DataFrame:
    """MinHash-LSH approximate near-dup pairs (Jaccard distance below
    1 - threshold_sim on hashed shingle sets). Rows-only check; recall vs
    the exact Jaccard truth is asserted in tests/test_dedup.py."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = load_for_compute(spark, sf_dir, "documents")
    sh = _token_trigrams(d).groupBy("doc_id").agg(
        F.collect_set("shingle").alias("shingles")
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(sh).filter(F.expr("size(shingles) > 0"))
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_tables, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 1.0 - threshold, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            (1.0 - F.col("jaccard_dist")).alias("est_jaccard"),
        )
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Low threshold: the synthetic corpus is word-salad, so true near-dups
    # are rare; the operator contract (plumbing + banding) is what's tested.
    return minhash_lsh_pairs(spark, sf_dir, threshold=0.05, num_tables=8)


def simhash_sketches(spark: SparkSession, sf_dir: str, bits: int = 60) -> DataFrame:
    """60-bit SimHash per document: per-token portable hash, each bit
    votes +1/-1 weighted by token frequency; sketch bit b = sign of
    vote sum. Pure built-in expressions (explode → groupBy → bit ops) —
    no UDF. The token hash is the md5-derived 60-bit integer (the
    KMV/CMS/Bloom discipline — `conv` of the first 15 md5 hex chars),
    NOT xxhash64: DuckDB parses the identical substring to the
    identical value, which upgrades the whole SimHash family from
    rows-only to full hash-match oracles (round-6; 60 bits because 16
    hex chars can overflow signed BIGINT in the oracle's cast). The
    hash only needs uniformity, not speed — it runs once per token."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)).alias(
            "tok"
        ),
    )
    hashed = toks.select(
        "doc_id",
        F.expr(
            "CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = hashed.groupBy("doc_id").agg(*votes)
    sketch = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        contrib = F.shiftleft(bit, b)
        sketch = contrib if sketch is None else sketch.bitwiseXOR(contrib)
    return agg.select("doc_id", sketch.alias("simhash"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: identical 60-bit sketches
    (`dedup_simhash_banded` is the hamming-tolerant extension). Portable
    md5-bit votes make the whole sketch hash-match oracleable — the
    oracle recomputes all 60 bit votes in SQL and must agree on every
    sketch (tests additionally cover determinism and self-similarity)."""
    sk = simhash_sketches(spark, sf_dir)
    return (
        sk.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_simhash_banded(
    spark: SparkSession, sf_dir: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-match pairs via 4×16-bit banding: candidates are pairs
    agreeing on at least one band, verified by exact popcount of the
    sketch XOR. The pigeonhole principle makes this LOSSLESS for the
    hamming ≤ 3 radius — 3 differing bits cannot touch all 4 bands, so
    every qualifying pair collides somewhere (asserted by exact set
    equality vs brute force in tests/test_llm_ops.py).

    Scale shape: one explode to 4 rows/doc, one equality self-join on
    (band, key) — candidate generation is O(collisions), never all-pairs;
    the 15-bit key space keeps bucket sizes small on random-ish corpora.
    Full hash-match oracle (round-6): the portable sketch lets DuckDB
    re-derive bands, candidates and exact hamming distances."""
    return hamming_banded_pairs(
        simhash_sketches(spark, sf_dir), "simhash", max_hamming, band_bits=15
    )


def hamming_banded_pairs(
    sketches: DataFrame, sketch_col: str, max_hamming: int = 3, band_bits: int = 16
) -> DataFrame:
    """Generic 4×`band_bits`-bit band-OR candidate generation + exact
    popcount verify over a (doc_id, <sketch_col>: long) table — the
    shared engine behind `dedup_simhash_banded` (60-bit sketch, 15-bit
    bands) and the multimodal perceptual-hash dedup (64-bit, 16-bit
    bands). Lossless for hamming ≤ 3 by pigeonhole (3 flipped bits
    cannot touch all 4 bands — independent of band width). One explode
    to 4 rows/doc, one equality self-join on (band, key):
    O(collisions), never all-pairs."""
    mask = (1 << band_bits) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col(sketch_col), b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(4)
        ]
    )
    bands = sketches.select(
        "doc_id", sketch_col, F.explode(band_structs).alias("bk")
    ).select(
        "doc_id", sketch_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = bands.select(
        "band", "key", F.col("doc_id").alias("id_a"), F.col(sketch_col).alias("sk_a")
    )
    b2 = bands.select(
        "band", "key", F.col("doc_id").alias("id_b"), F.col(sketch_col).alias("sk_b")
    )
    cand = (
        a.join(b2, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sk_a", "sk_b")
        .distinct()  # a pair may collide in several bands
    )
    hamming = F.bit_count(F.col("sk_a").bitwiseXOR(F.col("sk_b")))
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_ngram_clusters(spark: SparkSession, sf_dir: str, max_iter: int = 20) -> DataFrame:
    """Near-dup CLUSTER assignment: connected components of the 3-gram
    Jaccard pair graph (j >= 0.1), labeled by the component's min doc_id —
    the step a production dedup pipeline runs after pairwise scoring to
    pick one survivor per duplicate *group* (pairwise drop alone breaks
    transitive chains A~B~C).

    Algorithm: Pregel-style min-label propagation — each round every node
    takes min(own label, neighbors' labels); fixpoint in O(component
    diameter) rounds (near-dup clusters are tiny, so 2-4 in practice).
    Each round is one join + one aggregate on the (small) edge list, never
    a shuffle of the documents table; the driver loop only reads a scalar
    convergence count per round. This is the idiomatic Spark shape for
    iterative graph algorithms (GraphX/GraphFrames do the same joins);
    labels are persisted per round and lineage is cut with localCheckpoint
    so the plan doesn't grow with the iteration count."""
    edges = dedup_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    sym = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .persist()
    )
    d = load_table(spark, sf_dir, "documents")
    labels = d.select("doc_id", F.col("doc_id").alias("cluster_id")).persist()
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.src == labels.doc_id)
            .groupBy("dst")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.dst, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: drop any vector that has an earlier
    (lower vec_id) neighbor with cosine >= 0.35 inside its label block;
    return the survivors. The label block is the blocking key that bounds
    the pairwise kernel — at corpus scale the same plan runs with
    hyperplane LSH buckets (similarity.hyperplane_lsh_buckets) as the
    block key instead, keeping candidate generation subquadratic."""
    from .similarity import dot, norm

    emb = load_for_compute(spark, sf_dir, "embeddings")
    # Precompute each vector's norm ONCE (O(N) folds); inside the join
    # condition it would be re-folded per candidate pair (O(pairs)). Same
    # expression tree as cosine() — dot/(‖a‖·‖b‖) — so values (and the
    # round-6 threshold) are bit-identical to the oracle's.
    with_norm = emb.select(
        "vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    a = with_norm.select(
        F.col("label").alias("lbl"),
        F.col("vec_id").alias("id_keep"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = with_norm.select(
        F.col("label").alias("lbl"),
        F.col("vec_id").alias("id_drop"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    dropped = (
        a.join(b, "lbl")
        .filter(F.col("id_keep") < F.col("id_drop"))
        .filter(F.round(cos, 6) >= 0.35)
        .select(F.col("id_drop").alias("vec_id"))
        .distinct()
    )
    return emb.join(dropped, "vec_id", "left_anti").select("vec_id", "label")


def dedup_embedding_lsh(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.8,
    n_tables: int = 8,
    bits_per_table: int = 8,
) -> DataFrame:
    """Embedding near-dup dedup with LSH-bucket blocking — the 100 TB
    path promised in dedup_embedding_cosine's docstring, made real: drop
    any vector with an earlier (lower vec_id) neighbor at cosine >=
    ``threshold`` among candidates that share a hyperplane-LSH bucket in
    ANY of ``n_tables`` tables; return the survivors.

    Scale shape: candidate generation is an equality self-join on
    (table, bucket) over the posting list (similarity.
    hyperplane_lsh_postings) — O(bucket collisions), never all-pairs —
    then each candidate pair is verified with the exact cosine, so
    precision is 1 by construction and only recall is approximate.
    Duplicate pair hits across tables are dropped BEFORE the cosine.

    The high default threshold is load-bearing: sign-LSH collision
    probability is (1 − θ/π)^bits per table, so banding only recalls
    HIGH-similarity pairs (≈0.85 OR-recall per 0.86-cosine pair here;
    a 0.35 threshold would recall ~15% and must use exact blocked
    search, which is what dedup_embedding_cosine is). Fully
    hash-oracled (the portable integer-sign postings let DuckDB
    re-derive buckets, candidates and cosines end-to-end); drop-recall
    ≥ 0.9 vs brute force on a clustered corpus and survivor-superset vs
    exact additionally asserted in tests."""
    from .similarity import cosine, hyperplane_lsh_postings

    post = hyperplane_lsh_postings(
        spark, sf_dir, n_tables=n_tables, bits_per_table=bits_per_table
    )
    a = post.select(
        "tbl", "bucket", F.col("vec_id").alias("id_keep"), F.col("embedding").alias("va")
    )
    b = post.select(
        "tbl", "bucket", F.col("vec_id").alias("id_drop"), F.col("embedding").alias("vb")
    )
    dropped = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_keep") < F.col("id_drop"))
        # dedup (pair) hits across tables before the exact verify: each
        # candidate pair pays the cosine fold exactly once
        .dropDuplicates(["id_keep", "id_drop"])
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 6) >= threshold)
        .select(F.col("id_drop").alias("vec_id"))
        .distinct()
    )
    emb = load_for_compute(spark, sf_dir, "embeddings")
    return emb.join(dropped, "vec_id", "left_anti").select("vec_id", "label")


def dedup_embedding_ivf(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.8,
    n_clusters: int = 16,
    n_probe: int = 2,
) -> DataFrame:
    """Embedding near-dup dedup with IVF-cell blocking — the third
    blocking scheme in the family (label block → exact; LSH buckets →
    dedup_embedding_lsh; k-means cells → here), and the one aligned with
    the ANN index a vector store already maintains: reuses the SAME
    memoized coarse quantizer as sim_ann_ivf_topk, so the dedup pass
    costs zero extra index builds.

    Each vector posts to its ``n_probe`` nearest centroid cells (narrow
    per-row argmax over inlined centroid literals — no shuffle to
    assign); candidates are pairs sharing ANY cell (equality self-join
    on cell id, O(Σ cell²), never all-pairs); every candidate is
    verified with the exact cosine, so precision is 1 by construction
    and only recall is approximate. Multi-probe is the boundary-pair
    fix: a near-dup pair split by a Voronoi edge still meets in one of
    the probed cells. Fully HASH-ORACLED (round-7): the integer
    fixed-point quantizer is retrained by the DuckDB oracle, which
    re-derives postings, candidates and the exact-cosine verify;
    never-over-drops + drop-recall ≥ 0.9 additionally asserted in
    tests."""
    from .similarity import dot, ivf_ranked_cells, kmeans_centroid_rows, norm

    emb = load_for_compute(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm(F.col("embedding"))
    )
    cent_rows = kmeans_centroid_rows(spark, emb, n_clusters, corpus_key=sf_dir)
    ranked = ivf_ranked_cells(cent_rows)
    # carry each vector's precomputed norm through the posting frames so
    # the per-pair verify pays ONE array fold (the dot), not three —
    # cosine() would re-fold both norms on every candidate pair
    post = emb.select(
        "vec_id",
        "embedding",
        "nrm",
        F.explode(
            F.slice(ranked(F.col("embedding")), 1, n_probe)
        ).alias("cell"),
    )
    a = post.select(
        "cell",
        F.col("vec_id").alias("id_keep"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = post.select(
        "cell",
        F.col("vec_id").alias("id_drop"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    dropped = (
        a.join(b, "cell")
        .filter(F.col("id_keep") < F.col("id_drop"))
        # a pair sharing several probed cells pays the cosine fold once
        .dropDuplicates(["id_keep", "id_drop"])
        .filter(F.round(cos, 6) >= threshold)
        .select(F.col("id_drop").alias("vec_id"))
        .distinct()
    )
    return emb.join(dropped, "vec_id", "left_anti").select("vec_id", "label")


def pipeline_dedup_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data kept-set: quality gate (≥5 words,
    exact integer compare — no float threshold) → exact-dedup survivor
    (min doc_id per normalized-text hash) → near-dup canonical (doc is
    its own connected-component label). This is the composition a real
    corpus pipeline ships; each stage is individually oracled elsewhere
    (text_quality_score, dedup_exact_survivors, dedup_ngram_clusters) and
    the composition hash-matches the same stages chained in SQL."""
    from .text import word_count

    d = load_for_compute(spark, sf_dir, "documents")
    gated = d.filter(word_count(F.col("text")) >= 5)
    hashed = gated.select(
        "doc_id", "lang", F.md5(normalize_text(F.col("text"))).alias("h")
    )
    exact_keep = hashed.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    survivors = exact_keep.join(hashed, ["h", "doc_id"]).select("doc_id", "lang")
    canonical = (
        dedup_ngram_clusters(spark, sf_dir)
        .filter(F.col("cluster_id") == F.col("doc_id"))
        .select("doc_id")
    )
    return survivors.join(canonical, "doc_id")



_MH_PERMS = 16
_MH_BANDS = 4  # 4 bands x 4 rows over the 16 permutations


def minhash_signatures_for(docs: DataFrame) -> DataFrame:
    """`minhash_signatures` over an ARBITRARY documents frame — the
    hashing is a pure per-row/per-doc function, so a streaming gate
    (`stream_neardup_gate_live`) signs each arriving micro-batch with
    the SAME portable permutations the standing corpus was signed
    with."""
    sh = _token_trigrams(docs).select("doc_id", "shingle")
    return sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.expr(
                    f"CAST(conv(substring(md5(concat('{p}:', shingle)), 1, 15),"
                    f" 16, 10) AS BIGINT)"
                )
            ).alias(f"m{p}")
            for p in range(_MH_PERMS)
        ]
    )


def _bands_from_mins(mins: DataFrame) -> DataFrame:
    """(doc_id, band, sig) from a signature frame — THE banding
    definition (4 bands x 4 rows, '-'-joined component strings), shared
    by `dedup_minhash_banded`, `minhash_bands_for` (the live gate's
    posting builder) and mirrored by both SQL oracles."""
    r = _MH_PERMS // _MH_BANDS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "-", *[F.col(f"m{b * r + i}").cast("string") for i in range(r)]
                ).alias("sig"),
            )
            for b in range(_MH_BANDS)
        ]
    )
    return mins.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig")
    )


def minhash_bands_for(docs: DataFrame) -> DataFrame:
    """(doc_id, band, sig) banded MinHash postings for an arbitrary
    documents frame — `dedup_minhash_banded`'s banding as a reusable
    posting builder (4 bands x 4 rows over 16 portable permutations)."""
    return _bands_from_mins(minhash_signatures_for(docs))


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable 16-permutation MinHash signature per document: perm p's
    hash is the md5-60-bit integer of 'p:'||shingle (the same portable
    discipline as the SimHash sketch), and the signature component is
    the MIN over the doc's distinct 3-gram shingles. min() is
    duplicate-insensitive, so no distinct pass is needed before the
    aggregate; one tokenization pass, one groupBy(doc_id) shuffle
    carrying 16 longs per doc."""
    return minhash_signatures_for(load_table(spark, sf_dir, "documents"))


def dedup_minhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE MinHash banding — the hash-oracleable twin of
    `dedup_minhash_lsh` (which demonstrates the MLlib MinHashLSH
    integration and stays rows-only because its hash family is
    engine-seeded): 16 md5-portable permutations, 4 bands x 4 rows;
    candidates are pairs agreeing on a full band (P[collide] = 1-(1-j^4)^4,
    the standard S-curve), and each candidate reports its signature
    agreement fraction — the MinHash Jaccard estimate. Every step
    (hashing, min, band signature, agreement count) is deterministic
    SQL reproduced exactly by DuckDB → full hash-match oracle, closing
    the round-5 gap where all banded-dedup entries were rows-only.
    Scale shape identical to the SimHash banding: explode to 4
    band-signature rows per doc, ONE equality self-join on (band, sig)
    — O(collisions), never all-pairs — then two doc-keyed signature
    joins for the agreement count."""
    mins = minhash_signatures(spark, sf_dir)
    # one banding definition for the whole family: batch dedup, the live
    # gate and both SQL oracles must agree on the 4x4 '-'-joined format
    bands = _bands_from_mins(mins)
    a = bands.select("band", "sig", F.col("doc_id").alias("id_a"))
    b2 = bands.select("band", "sig", F.col("doc_id").alias("id_b"))
    cand = (
        a.join(b2, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    x = mins.select(F.col("doc_id").alias("id_a"), *[F.col(f"m{p}").alias(f"xa{p}") for p in range(_MH_PERMS)])
    y = mins.select(F.col("doc_id").alias("id_b"), *[F.col(f"m{p}").alias(f"yb{p}") for p in range(_MH_PERMS)])
    n_agree = None
    for p in range(_MH_PERMS):
        t = F.when(F.col(f"xa{p}") == F.col(f"yb{p}"), 1).otherwise(0)
        n_agree = t if n_agree is None else n_agree + t
    return (
        cand.join(x, "id_a")
        .join(y, "id_b")
        .select(
            "id_a",
            "id_b",
            n_agree.cast("long").alias("n_agree"),
            (n_agree.cast("double") / F.lit(float(_MH_PERMS))).alias("est_jaccard"),
        )
    )


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the PRODUCTION shape of exact dedup: a new
    ingest batch (odd doc_ids) is checked against the accumulated
    corpus digest index (even doc_ids), then within itself. Each batch
    doc is classified `dup_of_corpus` (digest already indexed),
    `dup_in_batch` (a smaller-id batch doc shares the digest), or `new`
    — exactly the decision an append-only curation pipeline makes per
    micro-batch without ever re-deduplicating history. Scale shape:
    both joins are digest-keyed (16-byte md5, never text); the corpus
    side is the standing dedup index (digest-only, bucketable by
    digest prefix at 100 TB so each batch probe touches one bucket
    range), and the within-batch MIN fold is one map-side-combined
    aggregate. NULL-text docs hash to NULL, match nothing on either
    join (SQL null-key semantics, identical in the oracle), and land in
    `new` — a missing payload is not a duplicate of anything."""
    d = load_table(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("h")
    )
    corpus = (
        hashed.filter(F.col("doc_id") % 2 == 0)
        .select("h")
        .distinct()
        .withColumn("in_corpus", F.lit(1))
    )
    batch = hashed.filter(F.col("doc_id") % 2 == 1)
    firsts = batch.groupBy("h").agg(F.min("doc_id").alias("first_id"))
    return (
        batch.join(corpus, "h", "left")
        .join(firsts, "h", "left")
        .select(
            "doc_id",
            F.when(F.col("in_corpus") == 1, F.lit("dup_of_corpus"))
            .when(
                F.col("first_id").isNotNull()
                & (F.col("doc_id") > F.col("first_id")),
                F.lit("dup_in_batch"),
            )
            .otherwise(F.lit("new"))
            .alias("status"),
        )
    )


DEDUP_INCREMENTAL_ORACLE = f"""
    WITH hashed AS (
        SELECT doc_id, md5({_SQL_NORM}) AS h FROM documents
    ),
    corpus AS (
        SELECT DISTINCT h FROM hashed WHERE doc_id % 2 = 0
    ),
    batch AS (
        SELECT doc_id, h FROM hashed WHERE doc_id % 2 = 1
    ),
    firsts AS (
        SELECT h, MIN(doc_id) AS first_id FROM batch GROUP BY h
    )
    SELECT b.doc_id,
           CASE WHEN c.h IS NOT NULL THEN 'dup_of_corpus'
                WHEN f.first_id IS NOT NULL AND b.doc_id > f.first_id
                     THEN 'dup_in_batch'
                ELSE 'new' END AS status
    FROM batch b
    LEFT JOIN corpus c ON b.h = c.h
    LEFT JOIN firsts f ON b.h = f.h
"""


def dedup_substring_spans(
    spark: SparkSession, sf_dir: str, w: int = 8
) -> DataFrame:
    """EXACT-SUBSTRING dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): instead of dropping whole
    near-duplicate documents, find every ``w``-token substring that
    occurs MORE THAN ONCE anywhere in the corpus and report, per
    document, the merged duplicated SPANS — the pieces a training
    pipeline cuts out while keeping the unique remainder. (The paper
    builds a corpus suffix array; the distributed equivalent is a
    rolling w-gram posting pass, the standard map-reduce reformulation.)

    Plan shape (scales where a suffix array cannot): one projection
    materializes the token array, a per-row transform emits (pos, md5
    of the w-token window) — positions matter, so no array_distinct —
    then ONE shuffle on the gram hash counts occurrences (map-side
    partial aggs), duplicated grams join back to their positions, and
    a per-doc gaps-and-islands window merges overlapping [pos, pos+w)
    intervals. No pair join anywhere: a gram repeated k times costs k
    posting rows, never k² pairs, so hot boilerplate cannot go
    quadratic (contrast the capped-posting discipline the Jaccard pair
    ops need). At 100 TB the gram table is the big intermediate: ~1 row
    per corpus token position at 24 bytes — the same budget as the
    inverted-index builders.

    Output: (doc_id, span_start, span_end, n_dup_grams) with token
    indices, span_end exclusive; every span is >= w tokens and spans
    within a doc never overlap (property-tested). Fully hash-oracled:
    md5 grams, integer positions and window arithmetic are
    engine-portable."""
    from pyspark.sql.window import Window

    d = load_for_compute(spark, sf_dir, "documents")
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    wc = F.col("__words")
    tok = d.select("doc_id", words.alias("__words")).filter(F.size(wc) >= w)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(wc) - w),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.md5(F.concat_ws(" ", F.slice(wc, i + 1, w))).alias("h"),
        ),
    )
    occ = tok.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h")
    )
    # occurrence counting as ONE window over the gram hash instead of
    # groupBy(h) + join-back (round-13): the agg+join shape scanned the
    # documents and recomputed the md5 gram projection TWICE (once for
    # the counts, once for the positions — two RoundRobin exchanges +
    # two Generate stages in the before-plan); the count-over-partition
    # keeps every position row in hand, so the corpus is read and the
    # grams hashed exactly once, with the same single hash(h) exchange.
    # Hot grams cost the same either way — the join side already
    # carried every occurrence row of a duplicated gram.
    #
    # Round-14 re-examination (r13 verdict "hot-gram guard"): the
    # guard — explicit repartition(h), post-shuffle count, semi join of
    # positions against the ≥2 gram set — was implemented and measured.
    # It does NOT keep the single scan: column pruning specializes the
    # two consumers of the shared exchange differently (the count
    # branch prunes to bare `h`), their canonical plans diverge, and
    # exchange/stage reuse never fires — the executed plan showed two
    # Generates + two parquet scans and the bench went 0.92 → 1.28 s
    # (best-of-6). Reverted. The skew exposure this keeps is bounded in
    # kind: WindowExec buffers each gram's occurrence rows in an
    # ExternalAppendOnlyUnsafeRowArray that SPILLS to disk past
    # spark.sql.windowExec.buffer.spill.threshold, so a planet-hot gram
    # (hash-partitioned to one task regardless of shape — equal keys
    # must colocate) is a straggler/spill, not an OOM; the 24-byte
    # posting row keeps even a 10⁹-occurrence gram at ~24 GB of
    # spill-backed single-task I/O. On the skew watchlist (see
    # OPTIMIZATION_r14.md) for a corpus whose gram histogram actually
    # shows such mass.
    hits = (
        occ.withColumn(
            "__cnt", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("__cnt") >= 2)
        .select("doc_id", "pos")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + w).over(
        win.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    island = F.sum(is_new).over(win.rowsBetween(Window.unboundedPreceding, 0))
    return (
        hits.withColumn("__island", island)
        .groupBy("doc_id", "__island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + w).alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .select("doc_id", "span_start", "span_end", "n_dup_grams")
    )


def dedup_substring_kept(
    spark: SparkSession, sf_dir: str, w: int = 8
) -> DataFrame:
    """Survivorship gate over exact-substring dedup — the decision the
    training pipeline actually makes with `dedup_substring_spans`'
    output: per document, how many of its tokens sit inside duplicated
    spans, and keep the document iff at most half do (heavily-boilerplate
    docs are dropped whole; lightly-contaminated docs survive for span
    excision). The threshold compare is exact integer cross-
    multiplication (2·dup_tokens <= n_tokens) — no float boundary at
    any scale. One extra aggregate + one broadcast-sized join over the
    spans op's plan; docs shorter than ``w`` tokens have no grams and
    pass trivially. Output: (doc_id, n_tokens, dup_tokens, kept)."""
    d = load_for_compute(spark, sf_dir, "documents")
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    toks = d.select("doc_id", F.size(words).cast("long").alias("n_tokens"))
    dup = (
        dedup_substring_spans(spark, sf_dir, w=w)
        .groupBy("doc_id")
        .agg(F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens"))
    )
    return toks.join(dup, "doc_id", "left_outer").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
        (
            2 * F.coalesce(F.col("dup_tokens"), F.lit(0)) <= F.col("n_tokens")
        ).alias("kept"),
    )


def dedup_substring_excised(
    spark: SparkSession, sf_dir: str, w: int = 8
) -> DataFrame:
    """Span EXCISION — the actual Lee et al. (2022) training product:
    join `dedup_substring_spans` back to each document's token array
    and emit the cleaned remainder (the tokens OUTSIDE every duplicated
    span), plus the exact excision accounting. Built-ins only: the
    per-doc span set is collected into one sorted array (spans are
    disjoint and ≤ n_tokens/w per doc, so the array is bounded), and
    kept positions are a single JVM-side higher-order filter —
    ``filter(sequence(...), i -> !exists(spans, x -> s <= i < e))`` —
    no UDF, no explode of token positions, no second shuffle beyond
    the spans op's own. Docs with no duplicated span keep everything
    (left join + empty-array coalesce). Output: (doc_id, n_tokens,
    n_excised, kept_text); excised ∪ kept partitions every document —
    property-tested, and n_excised always equals the span-length sum
    because spans are disjoint by construction."""
    d = load_for_compute(spark, sf_dir, "documents")
    words = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
    tok = d.select("doc_id", words.alias("__words"))
    sp = (
        dedup_substring_spans(spark, sf_dir, w=w)
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("span_start").alias("s"),
                        F.col("span_end").alias("e"),
                    )
                )
            ).alias("__sp")
        )
    )
    j = tok.join(sp, "doc_id", "left_outer").withColumn(
        "__sp",
        F.coalesce(
            F.col("__sp"), F.expr("array()").cast("array<struct<s:bigint,e:bigint>>")
        ),
    )
    # sequence(0, -1) would DESCEND for empty docs — guard explicitly
    kept_pos = F.expr(
        "CASE WHEN size(__words) = 0 THEN array() "
        "ELSE filter(sequence(0, size(__words) - 1), "
        "            i -> NOT exists(__sp, x -> i >= x.s AND i < x.e)) END"
    )
    return (
        j.withColumn("__kp", kept_pos)
        .select(
            "doc_id",
            F.size("__words").cast("long").alias("n_tokens"),
            (F.size("__words") - F.size("__kp")).cast("long").alias("n_excised"),
            F.expr(
                "concat_ws(' ', transform(__kp, i -> __words[CAST(i AS INT)]))"
            ).alias("kept_text"),
        )
    )


def _substring_excised_oracle(w: int = 8) -> str:
    return f"""
        WITH spans AS ({_substring_spans_oracle(w)}
        ), sp AS (
            SELECT doc_id,
                   list_sort(list(STRUCT_PACK(s := span_start,
                                              e := span_end))) AS sp
            FROM spans GROUP BY doc_id
        ), tok AS (
            SELECT doc_id,
                   regexp_extract_all(LOWER(text), '[a-z]+') AS words
            FROM documents
        ), kept AS (
            SELECT t.doc_id, t.words,
                   [i FOR i IN RANGE(0, LENGTH(t.words))
                    IF LENGTH(list_filter(COALESCE(s.sp, []),
                              x -> i >= x.s AND i < x.e)) = 0] AS kp
            FROM tok t LEFT JOIN sp s USING (doc_id)
        )
        SELECT doc_id,
               CAST(LENGTH(words) AS BIGINT) AS n_tokens,
               CAST(LENGTH(words) - LENGTH(kp) AS BIGINT) AS n_excised,
               COALESCE(array_to_string(
                   [words[CAST(i AS BIGINT) + 1] FOR i IN kp], ' '),
                   '') AS kept_text  -- DuckDB: empty list -> NULL; Spark: ''
        FROM kept
    """


def _substring_spans_oracle(w: int = 8) -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id, regexp_extract_all(LOWER(text), '[a-z]+') AS words
            FROM documents
        ), occ AS (
            SELECT doc_id, g.pos AS pos, g.h AS h FROM (
                SELECT doc_id, UNNEST(
                    [STRUCT_PACK(
                         pos := CAST(i - 1 AS BIGINT),
                         h := md5(array_to_string(words[i:i+{w - 1}], ' ')))
                     FOR i IN RANGE(1, LENGTH(words) - {w} + 2)]) AS g
                FROM toks WHERE LENGTH(words) >= {w}
            )
        ), dup AS (
            SELECT h FROM occ GROUP BY h HAVING COUNT(*) >= 2
        ), hits AS (
            SELECT o.doc_id, o.pos FROM occ o JOIN dup USING (h)
        ), isl AS (
            SELECT doc_id, pos,
                   SUM(CASE WHEN prev_end IS NULL OR pos > prev_end
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM (
                SELECT doc_id, pos,
                       MAX(pos + {w}) OVER (
                           PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS prev_end
                FROM hits
            )
        )
        SELECT doc_id, MIN(pos) AS span_start,
               MAX(pos) + {w} AS span_end,
               CAST(COUNT(*) AS BIGINT) AS n_dup_grams
        FROM isl GROUP BY doc_id, island
    """


QUERIES = {
    "dedup_incremental": dedup_incremental,
    "dedup_substring_spans": dedup_substring_spans,
    "dedup_substring_kept": dedup_substring_kept,
    "dedup_substring_excised": dedup_substring_excised,
    "pipeline_dedup_kept": pipeline_dedup_kept,
    "dedup_exact": dedup_exact,
    "dedup_exact_survivors": dedup_exact_survivors,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_containment": dedup_containment,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_minhash_banded": dedup_minhash_banded,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_banded": dedup_simhash_banded,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_embedding_lsh": dedup_embedding_lsh,
    "dedup_embedding_ivf": dedup_embedding_ivf,
    "dedup_ngram_clusters": dedup_ngram_clusters,
}

_SQL_TRIGRAMS = """
    SELECT doc_id, lang, source, UNNEST(list_distinct(grams)) AS shingle
    FROM (
        SELECT doc_id, lang, source,
               [array_to_string(words[i:i+2], ' ')
                FOR i IN RANGE(1, GREATEST(LENGTH(words) - 1, 1))] AS grams
        FROM (
            SELECT doc_id, lang, source,
                   regexp_extract_all(LOWER(text), '[a-z]+') AS words
            FROM documents
        ) w
        WHERE LENGTH(words) >= 3
    ) g
"""

# Capped posting set: shingles whose block document frequency exceeds
# MAX_SHINGLE_DF never participate in pairing (mirrors the Spark cap).
_SQL_POSTED = f"""
    SELECT s.doc_id, s.lang, s.source, s.shingle
    FROM shingles s
    JOIN (SELECT lang, source, shingle FROM shingles
          GROUP BY 1, 2, 3 HAVING COUNT(*) <= {MAX_SHINGLE_DF}) ok
    USING (lang, source, shingle)
"""

# Connected-components CTE chain (shared by the clusters oracle and the
# end-to-end pipeline oracle). Use after `WITH RECURSIVE`; exposes `labels`
# (doc_id, cluster_id = min doc_id of the component).
_SQL_CC_CTES = f"""shingles AS ({_SQL_TRIGRAMS}),
        posted AS ({_SQL_POSTED}),
        sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM posted GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
            FROM posted a JOIN posted b
              ON a.lang = b.lang AND a.source = b.source
             AND a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        edges AS (
            SELECT id_a, id_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_common AS DOUBLE)
                  / (sa.set_size + sb.set_size - n_common) >= 0.1
        ),
        sym AS (
            SELECT id_a AS src, id_b AS dst FROM edges
            UNION
            SELECT id_b AS src, id_a AS dst FROM edges
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM sym
            UNION
            SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
        ),
        minreach AS (SELECT src, MIN(dst) AS m FROM reach GROUP BY src),
        labels AS (
            SELECT d.doc_id,
                   LEAST(d.doc_id, COALESCE(mr.m, d.doc_id)) AS cluster_id
            FROM documents d LEFT JOIN minreach mr ON mr.src = d.doc_id
        )"""

ORACLES = {
    "dedup_incremental": DEDUP_INCREMENTAL_ORACLE,
    "dedup_exact": f"""
        SELECT md5({_SQL_NORM}) AS norm_hash,
               MIN(doc_id) AS keep_doc_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY 1
    """,
    "dedup_exact_survivors": f"""
        WITH hashed AS (
            SELECT doc_id, lang, md5({_SQL_NORM}) AS norm_hash FROM documents
        )
        SELECT h.doc_id, h.lang
        FROM hashed h
        JOIN (SELECT norm_hash, MIN(doc_id) AS doc_id
              FROM hashed GROUP BY norm_hash) k
          ON h.norm_hash = k.norm_hash AND h.doc_id = k.doc_id
    """,
    "dedup_ngram_jaccard": f"""
        WITH shingles AS ({_SQL_TRIGRAMS}),
        posted AS ({_SQL_POSTED}),
        sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM posted GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
            FROM posted a JOIN posted b
              ON a.lang = b.lang AND a.source = b.source
             AND a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               CAST(n_common AS DOUBLE) / (sa.set_size + sb.set_size - n_common)
                 AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(n_common AS DOUBLE) / (sa.set_size + sb.set_size - n_common) >= 0.1
    """,
    "dedup_containment": f"""
        WITH shingles AS ({_SQL_TRIGRAMS}),
        posted AS ({_SQL_POSTED}),
        sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM posted GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
            FROM posted a JOIN posted b
              ON a.lang = b.lang AND a.source = b.source
             AND a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               CAST(n_common AS DOUBLE) / sa.set_size AS containment_a,
               CAST(n_common AS DOUBLE) / sb.set_size AS containment_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE 2 * n_common >= sa.set_size OR 2 * n_common >= sb.set_size
    """,
    # The portable-hash sketch family (round-6): DuckDB re-derives the
    # 60-bit SimHash bit votes and the 16-permutation MinHash signatures
    # from the identical md5 substrings, so these formerly rows-only
    # entries are full hash-match checks. dedup_minhash_lsh stays
    # rows-only by design (MLlib's engine-seeded hash family).
    "dedup_simhash": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(LOWER(text), '[a-z]+')) AS tok
            FROM documents
        ), hashed AS (
            SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
            FROM toks
        ), votes AS (
            SELECT doc_id,
                   SUM(CASE WHEN ((h >> 0) & 1) = 1 THEN 1 ELSE -1 END) AS v0,
                   SUM(CASE WHEN ((h >> 1) & 1) = 1 THEN 1 ELSE -1 END) AS v1,
                   SUM(CASE WHEN ((h >> 2) & 1) = 1 THEN 1 ELSE -1 END) AS v2,
                   SUM(CASE WHEN ((h >> 3) & 1) = 1 THEN 1 ELSE -1 END) AS v3,
                   SUM(CASE WHEN ((h >> 4) & 1) = 1 THEN 1 ELSE -1 END) AS v4,
                   SUM(CASE WHEN ((h >> 5) & 1) = 1 THEN 1 ELSE -1 END) AS v5,
                   SUM(CASE WHEN ((h >> 6) & 1) = 1 THEN 1 ELSE -1 END) AS v6,
                   SUM(CASE WHEN ((h >> 7) & 1) = 1 THEN 1 ELSE -1 END) AS v7,
                   SUM(CASE WHEN ((h >> 8) & 1) = 1 THEN 1 ELSE -1 END) AS v8,
                   SUM(CASE WHEN ((h >> 9) & 1) = 1 THEN 1 ELSE -1 END) AS v9,
                   SUM(CASE WHEN ((h >> 10) & 1) = 1 THEN 1 ELSE -1 END) AS v10,
                   SUM(CASE WHEN ((h >> 11) & 1) = 1 THEN 1 ELSE -1 END) AS v11,
                   SUM(CASE WHEN ((h >> 12) & 1) = 1 THEN 1 ELSE -1 END) AS v12,
                   SUM(CASE WHEN ((h >> 13) & 1) = 1 THEN 1 ELSE -1 END) AS v13,
                   SUM(CASE WHEN ((h >> 14) & 1) = 1 THEN 1 ELSE -1 END) AS v14,
                   SUM(CASE WHEN ((h >> 15) & 1) = 1 THEN 1 ELSE -1 END) AS v15,
                   SUM(CASE WHEN ((h >> 16) & 1) = 1 THEN 1 ELSE -1 END) AS v16,
                   SUM(CASE WHEN ((h >> 17) & 1) = 1 THEN 1 ELSE -1 END) AS v17,
                   SUM(CASE WHEN ((h >> 18) & 1) = 1 THEN 1 ELSE -1 END) AS v18,
                   SUM(CASE WHEN ((h >> 19) & 1) = 1 THEN 1 ELSE -1 END) AS v19,
                   SUM(CASE WHEN ((h >> 20) & 1) = 1 THEN 1 ELSE -1 END) AS v20,
                   SUM(CASE WHEN ((h >> 21) & 1) = 1 THEN 1 ELSE -1 END) AS v21,
                   SUM(CASE WHEN ((h >> 22) & 1) = 1 THEN 1 ELSE -1 END) AS v22,
                   SUM(CASE WHEN ((h >> 23) & 1) = 1 THEN 1 ELSE -1 END) AS v23,
                   SUM(CASE WHEN ((h >> 24) & 1) = 1 THEN 1 ELSE -1 END) AS v24,
                   SUM(CASE WHEN ((h >> 25) & 1) = 1 THEN 1 ELSE -1 END) AS v25,
                   SUM(CASE WHEN ((h >> 26) & 1) = 1 THEN 1 ELSE -1 END) AS v26,
                   SUM(CASE WHEN ((h >> 27) & 1) = 1 THEN 1 ELSE -1 END) AS v27,
                   SUM(CASE WHEN ((h >> 28) & 1) = 1 THEN 1 ELSE -1 END) AS v28,
                   SUM(CASE WHEN ((h >> 29) & 1) = 1 THEN 1 ELSE -1 END) AS v29,
                   SUM(CASE WHEN ((h >> 30) & 1) = 1 THEN 1 ELSE -1 END) AS v30,
                   SUM(CASE WHEN ((h >> 31) & 1) = 1 THEN 1 ELSE -1 END) AS v31,
                   SUM(CASE WHEN ((h >> 32) & 1) = 1 THEN 1 ELSE -1 END) AS v32,
                   SUM(CASE WHEN ((h >> 33) & 1) = 1 THEN 1 ELSE -1 END) AS v33,
                   SUM(CASE WHEN ((h >> 34) & 1) = 1 THEN 1 ELSE -1 END) AS v34,
                   SUM(CASE WHEN ((h >> 35) & 1) = 1 THEN 1 ELSE -1 END) AS v35,
                   SUM(CASE WHEN ((h >> 36) & 1) = 1 THEN 1 ELSE -1 END) AS v36,
                   SUM(CASE WHEN ((h >> 37) & 1) = 1 THEN 1 ELSE -1 END) AS v37,
                   SUM(CASE WHEN ((h >> 38) & 1) = 1 THEN 1 ELSE -1 END) AS v38,
                   SUM(CASE WHEN ((h >> 39) & 1) = 1 THEN 1 ELSE -1 END) AS v39,
                   SUM(CASE WHEN ((h >> 40) & 1) = 1 THEN 1 ELSE -1 END) AS v40,
                   SUM(CASE WHEN ((h >> 41) & 1) = 1 THEN 1 ELSE -1 END) AS v41,
                   SUM(CASE WHEN ((h >> 42) & 1) = 1 THEN 1 ELSE -1 END) AS v42,
                   SUM(CASE WHEN ((h >> 43) & 1) = 1 THEN 1 ELSE -1 END) AS v43,
                   SUM(CASE WHEN ((h >> 44) & 1) = 1 THEN 1 ELSE -1 END) AS v44,
                   SUM(CASE WHEN ((h >> 45) & 1) = 1 THEN 1 ELSE -1 END) AS v45,
                   SUM(CASE WHEN ((h >> 46) & 1) = 1 THEN 1 ELSE -1 END) AS v46,
                   SUM(CASE WHEN ((h >> 47) & 1) = 1 THEN 1 ELSE -1 END) AS v47,
                   SUM(CASE WHEN ((h >> 48) & 1) = 1 THEN 1 ELSE -1 END) AS v48,
                   SUM(CASE WHEN ((h >> 49) & 1) = 1 THEN 1 ELSE -1 END) AS v49,
                   SUM(CASE WHEN ((h >> 50) & 1) = 1 THEN 1 ELSE -1 END) AS v50,
                   SUM(CASE WHEN ((h >> 51) & 1) = 1 THEN 1 ELSE -1 END) AS v51,
                   SUM(CASE WHEN ((h >> 52) & 1) = 1 THEN 1 ELSE -1 END) AS v52,
                   SUM(CASE WHEN ((h >> 53) & 1) = 1 THEN 1 ELSE -1 END) AS v53,
                   SUM(CASE WHEN ((h >> 54) & 1) = 1 THEN 1 ELSE -1 END) AS v54,
                   SUM(CASE WHEN ((h >> 55) & 1) = 1 THEN 1 ELSE -1 END) AS v55,
                   SUM(CASE WHEN ((h >> 56) & 1) = 1 THEN 1 ELSE -1 END) AS v56,
                   SUM(CASE WHEN ((h >> 57) & 1) = 1 THEN 1 ELSE -1 END) AS v57,
                   SUM(CASE WHEN ((h >> 58) & 1) = 1 THEN 1 ELSE -1 END) AS v58,
                   SUM(CASE WHEN ((h >> 59) & 1) = 1 THEN 1 ELSE -1 END) AS v59
            FROM hashed GROUP BY doc_id
        ), sk AS (
            SELECT doc_id,
                   (CASE WHEN v0 > 0 THEN (1::BIGINT << 0) ELSE 0::BIGINT END)
                 + (CASE WHEN v1 > 0 THEN (1::BIGINT << 1) ELSE 0::BIGINT END)
                 + (CASE WHEN v2 > 0 THEN (1::BIGINT << 2) ELSE 0::BIGINT END)
                 + (CASE WHEN v3 > 0 THEN (1::BIGINT << 3) ELSE 0::BIGINT END)
                 + (CASE WHEN v4 > 0 THEN (1::BIGINT << 4) ELSE 0::BIGINT END)
                 + (CASE WHEN v5 > 0 THEN (1::BIGINT << 5) ELSE 0::BIGINT END)
                 + (CASE WHEN v6 > 0 THEN (1::BIGINT << 6) ELSE 0::BIGINT END)
                 + (CASE WHEN v7 > 0 THEN (1::BIGINT << 7) ELSE 0::BIGINT END)
                 + (CASE WHEN v8 > 0 THEN (1::BIGINT << 8) ELSE 0::BIGINT END)
                 + (CASE WHEN v9 > 0 THEN (1::BIGINT << 9) ELSE 0::BIGINT END)
                 + (CASE WHEN v10 > 0 THEN (1::BIGINT << 10) ELSE 0::BIGINT END)
                 + (CASE WHEN v11 > 0 THEN (1::BIGINT << 11) ELSE 0::BIGINT END)
                 + (CASE WHEN v12 > 0 THEN (1::BIGINT << 12) ELSE 0::BIGINT END)
                 + (CASE WHEN v13 > 0 THEN (1::BIGINT << 13) ELSE 0::BIGINT END)
                 + (CASE WHEN v14 > 0 THEN (1::BIGINT << 14) ELSE 0::BIGINT END)
                 + (CASE WHEN v15 > 0 THEN (1::BIGINT << 15) ELSE 0::BIGINT END)
                 + (CASE WHEN v16 > 0 THEN (1::BIGINT << 16) ELSE 0::BIGINT END)
                 + (CASE WHEN v17 > 0 THEN (1::BIGINT << 17) ELSE 0::BIGINT END)
                 + (CASE WHEN v18 > 0 THEN (1::BIGINT << 18) ELSE 0::BIGINT END)
                 + (CASE WHEN v19 > 0 THEN (1::BIGINT << 19) ELSE 0::BIGINT END)
                 + (CASE WHEN v20 > 0 THEN (1::BIGINT << 20) ELSE 0::BIGINT END)
                 + (CASE WHEN v21 > 0 THEN (1::BIGINT << 21) ELSE 0::BIGINT END)
                 + (CASE WHEN v22 > 0 THEN (1::BIGINT << 22) ELSE 0::BIGINT END)
                 + (CASE WHEN v23 > 0 THEN (1::BIGINT << 23) ELSE 0::BIGINT END)
                 + (CASE WHEN v24 > 0 THEN (1::BIGINT << 24) ELSE 0::BIGINT END)
                 + (CASE WHEN v25 > 0 THEN (1::BIGINT << 25) ELSE 0::BIGINT END)
                 + (CASE WHEN v26 > 0 THEN (1::BIGINT << 26) ELSE 0::BIGINT END)
                 + (CASE WHEN v27 > 0 THEN (1::BIGINT << 27) ELSE 0::BIGINT END)
                 + (CASE WHEN v28 > 0 THEN (1::BIGINT << 28) ELSE 0::BIGINT END)
                 + (CASE WHEN v29 > 0 THEN (1::BIGINT << 29) ELSE 0::BIGINT END)
                 + (CASE WHEN v30 > 0 THEN (1::BIGINT << 30) ELSE 0::BIGINT END)
                 + (CASE WHEN v31 > 0 THEN (1::BIGINT << 31) ELSE 0::BIGINT END)
                 + (CASE WHEN v32 > 0 THEN (1::BIGINT << 32) ELSE 0::BIGINT END)
                 + (CASE WHEN v33 > 0 THEN (1::BIGINT << 33) ELSE 0::BIGINT END)
                 + (CASE WHEN v34 > 0 THEN (1::BIGINT << 34) ELSE 0::BIGINT END)
                 + (CASE WHEN v35 > 0 THEN (1::BIGINT << 35) ELSE 0::BIGINT END)
                 + (CASE WHEN v36 > 0 THEN (1::BIGINT << 36) ELSE 0::BIGINT END)
                 + (CASE WHEN v37 > 0 THEN (1::BIGINT << 37) ELSE 0::BIGINT END)
                 + (CASE WHEN v38 > 0 THEN (1::BIGINT << 38) ELSE 0::BIGINT END)
                 + (CASE WHEN v39 > 0 THEN (1::BIGINT << 39) ELSE 0::BIGINT END)
                 + (CASE WHEN v40 > 0 THEN (1::BIGINT << 40) ELSE 0::BIGINT END)
                 + (CASE WHEN v41 > 0 THEN (1::BIGINT << 41) ELSE 0::BIGINT END)
                 + (CASE WHEN v42 > 0 THEN (1::BIGINT << 42) ELSE 0::BIGINT END)
                 + (CASE WHEN v43 > 0 THEN (1::BIGINT << 43) ELSE 0::BIGINT END)
                 + (CASE WHEN v44 > 0 THEN (1::BIGINT << 44) ELSE 0::BIGINT END)
                 + (CASE WHEN v45 > 0 THEN (1::BIGINT << 45) ELSE 0::BIGINT END)
                 + (CASE WHEN v46 > 0 THEN (1::BIGINT << 46) ELSE 0::BIGINT END)
                 + (CASE WHEN v47 > 0 THEN (1::BIGINT << 47) ELSE 0::BIGINT END)
                 + (CASE WHEN v48 > 0 THEN (1::BIGINT << 48) ELSE 0::BIGINT END)
                 + (CASE WHEN v49 > 0 THEN (1::BIGINT << 49) ELSE 0::BIGINT END)
                 + (CASE WHEN v50 > 0 THEN (1::BIGINT << 50) ELSE 0::BIGINT END)
                 + (CASE WHEN v51 > 0 THEN (1::BIGINT << 51) ELSE 0::BIGINT END)
                 + (CASE WHEN v52 > 0 THEN (1::BIGINT << 52) ELSE 0::BIGINT END)
                 + (CASE WHEN v53 > 0 THEN (1::BIGINT << 53) ELSE 0::BIGINT END)
                 + (CASE WHEN v54 > 0 THEN (1::BIGINT << 54) ELSE 0::BIGINT END)
                 + (CASE WHEN v55 > 0 THEN (1::BIGINT << 55) ELSE 0::BIGINT END)
                 + (CASE WHEN v56 > 0 THEN (1::BIGINT << 56) ELSE 0::BIGINT END)
                 + (CASE WHEN v57 > 0 THEN (1::BIGINT << 57) ELSE 0::BIGINT END)
                 + (CASE WHEN v58 > 0 THEN (1::BIGINT << 58) ELSE 0::BIGINT END)
                 + (CASE WHEN v59 > 0 THEN (1::BIGINT << 59) ELSE 0::BIGINT END) AS simhash
            FROM votes
        )
        SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
        FROM sk GROUP BY simhash HAVING COUNT(*) > 1
    """,
    "dedup_simhash_banded": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(LOWER(text), '[a-z]+')) AS tok
            FROM documents
        ), hashed AS (
            SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
            FROM toks
        ), votes AS (
            SELECT doc_id,
                   SUM(CASE WHEN ((h >> 0) & 1) = 1 THEN 1 ELSE -1 END) AS v0,
                   SUM(CASE WHEN ((h >> 1) & 1) = 1 THEN 1 ELSE -1 END) AS v1,
                   SUM(CASE WHEN ((h >> 2) & 1) = 1 THEN 1 ELSE -1 END) AS v2,
                   SUM(CASE WHEN ((h >> 3) & 1) = 1 THEN 1 ELSE -1 END) AS v3,
                   SUM(CASE WHEN ((h >> 4) & 1) = 1 THEN 1 ELSE -1 END) AS v4,
                   SUM(CASE WHEN ((h >> 5) & 1) = 1 THEN 1 ELSE -1 END) AS v5,
                   SUM(CASE WHEN ((h >> 6) & 1) = 1 THEN 1 ELSE -1 END) AS v6,
                   SUM(CASE WHEN ((h >> 7) & 1) = 1 THEN 1 ELSE -1 END) AS v7,
                   SUM(CASE WHEN ((h >> 8) & 1) = 1 THEN 1 ELSE -1 END) AS v8,
                   SUM(CASE WHEN ((h >> 9) & 1) = 1 THEN 1 ELSE -1 END) AS v9,
                   SUM(CASE WHEN ((h >> 10) & 1) = 1 THEN 1 ELSE -1 END) AS v10,
                   SUM(CASE WHEN ((h >> 11) & 1) = 1 THEN 1 ELSE -1 END) AS v11,
                   SUM(CASE WHEN ((h >> 12) & 1) = 1 THEN 1 ELSE -1 END) AS v12,
                   SUM(CASE WHEN ((h >> 13) & 1) = 1 THEN 1 ELSE -1 END) AS v13,
                   SUM(CASE WHEN ((h >> 14) & 1) = 1 THEN 1 ELSE -1 END) AS v14,
                   SUM(CASE WHEN ((h >> 15) & 1) = 1 THEN 1 ELSE -1 END) AS v15,
                   SUM(CASE WHEN ((h >> 16) & 1) = 1 THEN 1 ELSE -1 END) AS v16,
                   SUM(CASE WHEN ((h >> 17) & 1) = 1 THEN 1 ELSE -1 END) AS v17,
                   SUM(CASE WHEN ((h >> 18) & 1) = 1 THEN 1 ELSE -1 END) AS v18,
                   SUM(CASE WHEN ((h >> 19) & 1) = 1 THEN 1 ELSE -1 END) AS v19,
                   SUM(CASE WHEN ((h >> 20) & 1) = 1 THEN 1 ELSE -1 END) AS v20,
                   SUM(CASE WHEN ((h >> 21) & 1) = 1 THEN 1 ELSE -1 END) AS v21,
                   SUM(CASE WHEN ((h >> 22) & 1) = 1 THEN 1 ELSE -1 END) AS v22,
                   SUM(CASE WHEN ((h >> 23) & 1) = 1 THEN 1 ELSE -1 END) AS v23,
                   SUM(CASE WHEN ((h >> 24) & 1) = 1 THEN 1 ELSE -1 END) AS v24,
                   SUM(CASE WHEN ((h >> 25) & 1) = 1 THEN 1 ELSE -1 END) AS v25,
                   SUM(CASE WHEN ((h >> 26) & 1) = 1 THEN 1 ELSE -1 END) AS v26,
                   SUM(CASE WHEN ((h >> 27) & 1) = 1 THEN 1 ELSE -1 END) AS v27,
                   SUM(CASE WHEN ((h >> 28) & 1) = 1 THEN 1 ELSE -1 END) AS v28,
                   SUM(CASE WHEN ((h >> 29) & 1) = 1 THEN 1 ELSE -1 END) AS v29,
                   SUM(CASE WHEN ((h >> 30) & 1) = 1 THEN 1 ELSE -1 END) AS v30,
                   SUM(CASE WHEN ((h >> 31) & 1) = 1 THEN 1 ELSE -1 END) AS v31,
                   SUM(CASE WHEN ((h >> 32) & 1) = 1 THEN 1 ELSE -1 END) AS v32,
                   SUM(CASE WHEN ((h >> 33) & 1) = 1 THEN 1 ELSE -1 END) AS v33,
                   SUM(CASE WHEN ((h >> 34) & 1) = 1 THEN 1 ELSE -1 END) AS v34,
                   SUM(CASE WHEN ((h >> 35) & 1) = 1 THEN 1 ELSE -1 END) AS v35,
                   SUM(CASE WHEN ((h >> 36) & 1) = 1 THEN 1 ELSE -1 END) AS v36,
                   SUM(CASE WHEN ((h >> 37) & 1) = 1 THEN 1 ELSE -1 END) AS v37,
                   SUM(CASE WHEN ((h >> 38) & 1) = 1 THEN 1 ELSE -1 END) AS v38,
                   SUM(CASE WHEN ((h >> 39) & 1) = 1 THEN 1 ELSE -1 END) AS v39,
                   SUM(CASE WHEN ((h >> 40) & 1) = 1 THEN 1 ELSE -1 END) AS v40,
                   SUM(CASE WHEN ((h >> 41) & 1) = 1 THEN 1 ELSE -1 END) AS v41,
                   SUM(CASE WHEN ((h >> 42) & 1) = 1 THEN 1 ELSE -1 END) AS v42,
                   SUM(CASE WHEN ((h >> 43) & 1) = 1 THEN 1 ELSE -1 END) AS v43,
                   SUM(CASE WHEN ((h >> 44) & 1) = 1 THEN 1 ELSE -1 END) AS v44,
                   SUM(CASE WHEN ((h >> 45) & 1) = 1 THEN 1 ELSE -1 END) AS v45,
                   SUM(CASE WHEN ((h >> 46) & 1) = 1 THEN 1 ELSE -1 END) AS v46,
                   SUM(CASE WHEN ((h >> 47) & 1) = 1 THEN 1 ELSE -1 END) AS v47,
                   SUM(CASE WHEN ((h >> 48) & 1) = 1 THEN 1 ELSE -1 END) AS v48,
                   SUM(CASE WHEN ((h >> 49) & 1) = 1 THEN 1 ELSE -1 END) AS v49,
                   SUM(CASE WHEN ((h >> 50) & 1) = 1 THEN 1 ELSE -1 END) AS v50,
                   SUM(CASE WHEN ((h >> 51) & 1) = 1 THEN 1 ELSE -1 END) AS v51,
                   SUM(CASE WHEN ((h >> 52) & 1) = 1 THEN 1 ELSE -1 END) AS v52,
                   SUM(CASE WHEN ((h >> 53) & 1) = 1 THEN 1 ELSE -1 END) AS v53,
                   SUM(CASE WHEN ((h >> 54) & 1) = 1 THEN 1 ELSE -1 END) AS v54,
                   SUM(CASE WHEN ((h >> 55) & 1) = 1 THEN 1 ELSE -1 END) AS v55,
                   SUM(CASE WHEN ((h >> 56) & 1) = 1 THEN 1 ELSE -1 END) AS v56,
                   SUM(CASE WHEN ((h >> 57) & 1) = 1 THEN 1 ELSE -1 END) AS v57,
                   SUM(CASE WHEN ((h >> 58) & 1) = 1 THEN 1 ELSE -1 END) AS v58,
                   SUM(CASE WHEN ((h >> 59) & 1) = 1 THEN 1 ELSE -1 END) AS v59
            FROM hashed GROUP BY doc_id
        ), sk AS (
            SELECT doc_id,
                   (CASE WHEN v0 > 0 THEN (1::BIGINT << 0) ELSE 0::BIGINT END)
                 + (CASE WHEN v1 > 0 THEN (1::BIGINT << 1) ELSE 0::BIGINT END)
                 + (CASE WHEN v2 > 0 THEN (1::BIGINT << 2) ELSE 0::BIGINT END)
                 + (CASE WHEN v3 > 0 THEN (1::BIGINT << 3) ELSE 0::BIGINT END)
                 + (CASE WHEN v4 > 0 THEN (1::BIGINT << 4) ELSE 0::BIGINT END)
                 + (CASE WHEN v5 > 0 THEN (1::BIGINT << 5) ELSE 0::BIGINT END)
                 + (CASE WHEN v6 > 0 THEN (1::BIGINT << 6) ELSE 0::BIGINT END)
                 + (CASE WHEN v7 > 0 THEN (1::BIGINT << 7) ELSE 0::BIGINT END)
                 + (CASE WHEN v8 > 0 THEN (1::BIGINT << 8) ELSE 0::BIGINT END)
                 + (CASE WHEN v9 > 0 THEN (1::BIGINT << 9) ELSE 0::BIGINT END)
                 + (CASE WHEN v10 > 0 THEN (1::BIGINT << 10) ELSE 0::BIGINT END)
                 + (CASE WHEN v11 > 0 THEN (1::BIGINT << 11) ELSE 0::BIGINT END)
                 + (CASE WHEN v12 > 0 THEN (1::BIGINT << 12) ELSE 0::BIGINT END)
                 + (CASE WHEN v13 > 0 THEN (1::BIGINT << 13) ELSE 0::BIGINT END)
                 + (CASE WHEN v14 > 0 THEN (1::BIGINT << 14) ELSE 0::BIGINT END)
                 + (CASE WHEN v15 > 0 THEN (1::BIGINT << 15) ELSE 0::BIGINT END)
                 + (CASE WHEN v16 > 0 THEN (1::BIGINT << 16) ELSE 0::BIGINT END)
                 + (CASE WHEN v17 > 0 THEN (1::BIGINT << 17) ELSE 0::BIGINT END)
                 + (CASE WHEN v18 > 0 THEN (1::BIGINT << 18) ELSE 0::BIGINT END)
                 + (CASE WHEN v19 > 0 THEN (1::BIGINT << 19) ELSE 0::BIGINT END)
                 + (CASE WHEN v20 > 0 THEN (1::BIGINT << 20) ELSE 0::BIGINT END)
                 + (CASE WHEN v21 > 0 THEN (1::BIGINT << 21) ELSE 0::BIGINT END)
                 + (CASE WHEN v22 > 0 THEN (1::BIGINT << 22) ELSE 0::BIGINT END)
                 + (CASE WHEN v23 > 0 THEN (1::BIGINT << 23) ELSE 0::BIGINT END)
                 + (CASE WHEN v24 > 0 THEN (1::BIGINT << 24) ELSE 0::BIGINT END)
                 + (CASE WHEN v25 > 0 THEN (1::BIGINT << 25) ELSE 0::BIGINT END)
                 + (CASE WHEN v26 > 0 THEN (1::BIGINT << 26) ELSE 0::BIGINT END)
                 + (CASE WHEN v27 > 0 THEN (1::BIGINT << 27) ELSE 0::BIGINT END)
                 + (CASE WHEN v28 > 0 THEN (1::BIGINT << 28) ELSE 0::BIGINT END)
                 + (CASE WHEN v29 > 0 THEN (1::BIGINT << 29) ELSE 0::BIGINT END)
                 + (CASE WHEN v30 > 0 THEN (1::BIGINT << 30) ELSE 0::BIGINT END)
                 + (CASE WHEN v31 > 0 THEN (1::BIGINT << 31) ELSE 0::BIGINT END)
                 + (CASE WHEN v32 > 0 THEN (1::BIGINT << 32) ELSE 0::BIGINT END)
                 + (CASE WHEN v33 > 0 THEN (1::BIGINT << 33) ELSE 0::BIGINT END)
                 + (CASE WHEN v34 > 0 THEN (1::BIGINT << 34) ELSE 0::BIGINT END)
                 + (CASE WHEN v35 > 0 THEN (1::BIGINT << 35) ELSE 0::BIGINT END)
                 + (CASE WHEN v36 > 0 THEN (1::BIGINT << 36) ELSE 0::BIGINT END)
                 + (CASE WHEN v37 > 0 THEN (1::BIGINT << 37) ELSE 0::BIGINT END)
                 + (CASE WHEN v38 > 0 THEN (1::BIGINT << 38) ELSE 0::BIGINT END)
                 + (CASE WHEN v39 > 0 THEN (1::BIGINT << 39) ELSE 0::BIGINT END)
                 + (CASE WHEN v40 > 0 THEN (1::BIGINT << 40) ELSE 0::BIGINT END)
                 + (CASE WHEN v41 > 0 THEN (1::BIGINT << 41) ELSE 0::BIGINT END)
                 + (CASE WHEN v42 > 0 THEN (1::BIGINT << 42) ELSE 0::BIGINT END)
                 + (CASE WHEN v43 > 0 THEN (1::BIGINT << 43) ELSE 0::BIGINT END)
                 + (CASE WHEN v44 > 0 THEN (1::BIGINT << 44) ELSE 0::BIGINT END)
                 + (CASE WHEN v45 > 0 THEN (1::BIGINT << 45) ELSE 0::BIGINT END)
                 + (CASE WHEN v46 > 0 THEN (1::BIGINT << 46) ELSE 0::BIGINT END)
                 + (CASE WHEN v47 > 0 THEN (1::BIGINT << 47) ELSE 0::BIGINT END)
                 + (CASE WHEN v48 > 0 THEN (1::BIGINT << 48) ELSE 0::BIGINT END)
                 + (CASE WHEN v49 > 0 THEN (1::BIGINT << 49) ELSE 0::BIGINT END)
                 + (CASE WHEN v50 > 0 THEN (1::BIGINT << 50) ELSE 0::BIGINT END)
                 + (CASE WHEN v51 > 0 THEN (1::BIGINT << 51) ELSE 0::BIGINT END)
                 + (CASE WHEN v52 > 0 THEN (1::BIGINT << 52) ELSE 0::BIGINT END)
                 + (CASE WHEN v53 > 0 THEN (1::BIGINT << 53) ELSE 0::BIGINT END)
                 + (CASE WHEN v54 > 0 THEN (1::BIGINT << 54) ELSE 0::BIGINT END)
                 + (CASE WHEN v55 > 0 THEN (1::BIGINT << 55) ELSE 0::BIGINT END)
                 + (CASE WHEN v56 > 0 THEN (1::BIGINT << 56) ELSE 0::BIGINT END)
                 + (CASE WHEN v57 > 0 THEN (1::BIGINT << 57) ELSE 0::BIGINT END)
                 + (CASE WHEN v58 > 0 THEN (1::BIGINT << 58) ELSE 0::BIGINT END)
                 + (CASE WHEN v59 > 0 THEN (1::BIGINT << 59) ELSE 0::BIGINT END) AS simhash
            FROM votes
        ), bands AS (
            SELECT doc_id, simhash, 0 AS band, (simhash >> 0) & 32767 AS key FROM sk
            UNION ALL SELECT doc_id, simhash, 1 AS band, (simhash >> 15) & 32767 AS key FROM sk
            UNION ALL SELECT doc_id, simhash, 2 AS band, (simhash >> 30) & 32767 AS key FROM sk
            UNION ALL SELECT doc_id, simhash, 3 AS band, (simhash >> 45) & 32767 AS key FROM sk
        ), cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.simhash AS sk_a, b.simhash AS sk_b
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.key = b.key
                        AND a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, CAST(bit_count(xor(sk_a, sk_b)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(sk_a, sk_b)) <= 3
    """,
    "dedup_minhash_banded": f"""
        WITH shingles AS ({_SQL_TRIGRAMS}),
        mins AS (
            SELECT doc_id,
                   MIN(('0x' || substr(md5('0:' || shingle), 1, 15))::BIGINT) AS m0,
                   MIN(('0x' || substr(md5('1:' || shingle), 1, 15))::BIGINT) AS m1,
                   MIN(('0x' || substr(md5('2:' || shingle), 1, 15))::BIGINT) AS m2,
                   MIN(('0x' || substr(md5('3:' || shingle), 1, 15))::BIGINT) AS m3,
                   MIN(('0x' || substr(md5('4:' || shingle), 1, 15))::BIGINT) AS m4,
                   MIN(('0x' || substr(md5('5:' || shingle), 1, 15))::BIGINT) AS m5,
                   MIN(('0x' || substr(md5('6:' || shingle), 1, 15))::BIGINT) AS m6,
                   MIN(('0x' || substr(md5('7:' || shingle), 1, 15))::BIGINT) AS m7,
                   MIN(('0x' || substr(md5('8:' || shingle), 1, 15))::BIGINT) AS m8,
                   MIN(('0x' || substr(md5('9:' || shingle), 1, 15))::BIGINT) AS m9,
                   MIN(('0x' || substr(md5('10:' || shingle), 1, 15))::BIGINT) AS m10,
                   MIN(('0x' || substr(md5('11:' || shingle), 1, 15))::BIGINT) AS m11,
                   MIN(('0x' || substr(md5('12:' || shingle), 1, 15))::BIGINT) AS m12,
                   MIN(('0x' || substr(md5('13:' || shingle), 1, 15))::BIGINT) AS m13,
                   MIN(('0x' || substr(md5('14:' || shingle), 1, 15))::BIGINT) AS m14,
                   MIN(('0x' || substr(md5('15:' || shingle), 1, 15))::BIGINT) AS m15
            FROM shingles GROUP BY doc_id
        ), bands AS (
            SELECT doc_id, 0 AS band, CAST(m0 AS VARCHAR) || '-' || CAST(m1 AS VARCHAR) || '-' || CAST(m2 AS VARCHAR) || '-' || CAST(m3 AS VARCHAR) AS sig FROM mins
            UNION ALL SELECT doc_id, 1 AS band, CAST(m4 AS VARCHAR) || '-' || CAST(m5 AS VARCHAR) || '-' || CAST(m6 AS VARCHAR) || '-' || CAST(m7 AS VARCHAR) AS sig FROM mins
            UNION ALL SELECT doc_id, 2 AS band, CAST(m8 AS VARCHAR) || '-' || CAST(m9 AS VARCHAR) || '-' || CAST(m10 AS VARCHAR) || '-' || CAST(m11 AS VARCHAR) AS sig FROM mins
            UNION ALL SELECT doc_id, 3 AS band, CAST(m12 AS VARCHAR) || '-' || CAST(m13 AS VARCHAR) || '-' || CAST(m14 AS VARCHAR) || '-' || CAST(m15 AS VARCHAR) AS sig FROM mins
        ), cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.sig = b.sig
                        AND a.doc_id < b.doc_id
        )
        SELECT c.id_a, c.id_b,
               CAST(CASE WHEN x.m0 = y.m0 THEN 1 ELSE 0 END
                    + CASE WHEN x.m1 = y.m1 THEN 1 ELSE 0 END
                    + CASE WHEN x.m2 = y.m2 THEN 1 ELSE 0 END
                    + CASE WHEN x.m3 = y.m3 THEN 1 ELSE 0 END
                    + CASE WHEN x.m4 = y.m4 THEN 1 ELSE 0 END
                    + CASE WHEN x.m5 = y.m5 THEN 1 ELSE 0 END
                    + CASE WHEN x.m6 = y.m6 THEN 1 ELSE 0 END
                    + CASE WHEN x.m7 = y.m7 THEN 1 ELSE 0 END
                    + CASE WHEN x.m8 = y.m8 THEN 1 ELSE 0 END
                    + CASE WHEN x.m9 = y.m9 THEN 1 ELSE 0 END
                    + CASE WHEN x.m10 = y.m10 THEN 1 ELSE 0 END
                    + CASE WHEN x.m11 = y.m11 THEN 1 ELSE 0 END
                    + CASE WHEN x.m12 = y.m12 THEN 1 ELSE 0 END
                    + CASE WHEN x.m13 = y.m13 THEN 1 ELSE 0 END
                    + CASE WHEN x.m14 = y.m14 THEN 1 ELSE 0 END
                    + CASE WHEN x.m15 = y.m15 THEN 1 ELSE 0 END AS BIGINT) AS n_agree,
               CAST(CASE WHEN x.m0 = y.m0 THEN 1 ELSE 0 END
                    + CASE WHEN x.m1 = y.m1 THEN 1 ELSE 0 END
                    + CASE WHEN x.m2 = y.m2 THEN 1 ELSE 0 END
                    + CASE WHEN x.m3 = y.m3 THEN 1 ELSE 0 END
                    + CASE WHEN x.m4 = y.m4 THEN 1 ELSE 0 END
                    + CASE WHEN x.m5 = y.m5 THEN 1 ELSE 0 END
                    + CASE WHEN x.m6 = y.m6 THEN 1 ELSE 0 END
                    + CASE WHEN x.m7 = y.m7 THEN 1 ELSE 0 END
                    + CASE WHEN x.m8 = y.m8 THEN 1 ELSE 0 END
                    + CASE WHEN x.m9 = y.m9 THEN 1 ELSE 0 END
                    + CASE WHEN x.m10 = y.m10 THEN 1 ELSE 0 END
                    + CASE WHEN x.m11 = y.m11 THEN 1 ELSE 0 END
                    + CASE WHEN x.m12 = y.m12 THEN 1 ELSE 0 END
                    + CASE WHEN x.m13 = y.m13 THEN 1 ELSE 0 END
                    + CASE WHEN x.m14 = y.m14 THEN 1 ELSE 0 END
                    + CASE WHEN x.m15 = y.m15 THEN 1 ELSE 0 END AS DOUBLE) / 16.0 AS est_jaccard
        FROM cand c
        JOIN mins x ON x.doc_id = c.id_a
        JOIN mins y ON y.doc_id = c.id_b
    """,
    # dedup_minhash_lsh: rows-only (engine-seeded MLlib hash family)
    # Connected components as a recursive CTE: transitive closure over the
    # symmetrized pair graph, component label = min reachable doc_id.
    "dedup_ngram_clusters": f"""
        WITH RECURSIVE {_SQL_CC_CTES}
        SELECT doc_id, cluster_id FROM labels
    """,
    "pipeline_dedup_kept": f"""
        WITH RECURSIVE {_SQL_CC_CTES},
        gated AS (
            SELECT doc_id, lang, text FROM documents
            WHERE LENGTH(regexp_extract_all(text, '[A-Za-z]+')) >= 5
        ),
        hashed AS (SELECT doc_id, lang, md5({_SQL_NORM}) AS h FROM gated),
        keepers AS (SELECT h, MIN(doc_id) AS doc_id FROM hashed GROUP BY h)
        SELECT hd.doc_id, hd.lang
        FROM hashed hd
        JOIN keepers k ON k.h = hd.h AND k.doc_id = hd.doc_id
        JOIN labels l ON l.doc_id = hd.doc_id AND l.cluster_id = hd.doc_id
    """,
    # Explicit left-fold cosine (matches Spark's aggregate() fold order;
    # list_cosine_similarity's internal summation order is unspecified).
    "dedup_embedding_cosine": """
        WITH dropped AS (
            SELECT DISTINCT b.vec_id
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE ROUND(
                list_sum(list_transform(range(1, 65),
                    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                / (SQRT(list_sum(list_transform(range(1, 65),
                    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
                 * SQRT(list_sum(list_transform(range(1, 65),
                    i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))),
                6) >= 0.35
        )
        SELECT e.vec_id, e.label FROM embeddings e
        WHERE e.vec_id NOT IN (SELECT vec_id FROM dropped)
    """,
}


def _embedding_lsh_oracle() -> str:
    """LSH-blocked embedding dedup, re-derived end-to-end in SQL: the
    portable integer-sign postings (shared plane literals from
    `similarity._lsh_planes`), the (tbl, bucket) candidate join, the
    exact-cosine verify at the same rounded threshold, and the
    survivor anti-join."""
    from .similarity import _sql_cosine, _sql_lsh_postings

    return f"""
        WITH postings AS (
            {_sql_lsh_postings()}
        ), cand AS (
            SELECT DISTINCT a.vec_id AS id_keep, b.vec_id AS id_drop
            FROM postings a
            JOIN postings b ON a.tbl = b.tbl AND a.bucket = b.bucket
                           AND a.vec_id < b.vec_id
        ), dropped AS (
            SELECT DISTINCT c.id_drop AS vec_id
            FROM cand c
            JOIN embeddings a ON a.vec_id = c.id_keep
            JOIN embeddings b ON b.vec_id = c.id_drop
            WHERE ROUND({_sql_cosine("a.embedding", "b.embedding")}, 6) >= 0.8
        )
        SELECT e.vec_id, e.label FROM embeddings e
        WHERE e.vec_id NOT IN (SELECT vec_id FROM dropped)
    """


ORACLES["dedup_embedding_lsh"] = _embedding_lsh_oracle()
ORACLES["dedup_substring_spans"] = _substring_spans_oracle()
ORACLES["dedup_substring_excised"] = _substring_excised_oracle()
ORACLES["dedup_substring_kept"] = f"""
    WITH spans AS ({_substring_spans_oracle()}),
    dup AS (
        SELECT doc_id, SUM(span_end - span_start) AS dup_tokens
        FROM spans GROUP BY doc_id
    ), toks AS (
        SELECT doc_id,
               CAST(LENGTH(regexp_extract_all(LOWER(text), '[a-z]+'))
                    AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT t.doc_id, t.n_tokens,
           CAST(COALESCE(d.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           2 * CAST(COALESCE(d.dup_tokens, 0) AS BIGINT) <= t.n_tokens AS kept
    FROM toks t LEFT JOIN dup d ON t.doc_id = d.doc_id
"""


def _embedding_ivf_oracle(threshold: float = 0.8, n_probe: int = 2) -> str:
    """IVF-cell-blocked embedding dedup re-derived end-to-end in SQL:
    the integer k-means training chain (similarity._sql_int_kmeans),
    multi-probe cell postings, the cell-equality candidate join, the
    round-6 exact-cosine verify, and the survivor anti-join — zero
    engine state (round-7 upgrade from rows-only)."""
    from .similarity import _sql_cosine, _sql_int_kmeans, _sql_ranked_cells

    return f"""
        WITH {_sql_int_kmeans("k_", m=1)},
        {_sql_ranked_cells("k_")},
        posts AS MATERIALIZED (
            SELECT vec_id, cid FROM k_ranked WHERE rn <= {n_probe}
        ), cand AS MATERIALIZED (
            SELECT DISTINCT a.vec_id AS id_keep, b.vec_id AS id_drop
            FROM posts a JOIN posts b USING (cid)
            WHERE a.vec_id < b.vec_id
        ), dropped AS (
            SELECT DISTINCT c.id_drop AS vec_id
            FROM cand c
            JOIN embeddings a ON a.vec_id = c.id_keep
            JOIN embeddings b ON b.vec_id = c.id_drop
            WHERE ROUND({_sql_cosine("a.embedding", "b.embedding")}, 6)
                  >= {threshold}
        )
        SELECT e.vec_id, e.label FROM embeddings e
        WHERE e.vec_id NOT IN (SELECT vec_id FROM dropped)
    """


ORACLES["dedup_embedding_ivf"] = _embedding_ivf_oracle()
