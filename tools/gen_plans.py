"""Regenerate docs/PLANS.md: formatted physical plans + scale commentary
for the headline queries. Usage: python tools/gen_plans.py > docs/PLANS.md"""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cdc_cloudrun_demo_spark.operators import registry
from cdc_cloudrun_demo_spark.session import get_spark

spark = get_spark(app_name="planaudit")
spark.sparkContext.setLogLevel("ERROR")
q, _ = registry()
SF = "/root/testdata/sf0.01"

COMMENTARY = {
 "agg_pricing_summary": "Filter pushed to the parquet scan (`PushedFilters: [LE(l_quantity,45)]`), 6-column `ReadSchema` out of 16, scaled-long partial aggregation inside the scan-side codegen stage, one exchange for the final merge. At 100 TB nothing changes: partial aggs carry 6 group rows per task to the shuffle.",
 "join_star_revenue": "All five dimension-side joins run as BroadcastHashJoin; the only exchange is the final group-by. On a cluster where `orders` outgrows the broadcast threshold, AQE demotes exactly that join to sort-merge at runtime - no code change.",
 "join_asof": "The union-then-window as-of plan: ONE hash exchange on the key, one sort, one window pass. The naive per-row correlated lookup would be O(events x orders); this is O(n log n) with a single shuffle. Bench-variance note (round 3, verdict task 6): r2's +43% (0.43->0.62 s) did NOT reproduce - r3 measured 0.511/0.499 s across two full-suite runs while the suite TOTAL itself varied 7.92->9.04 s (+-14%) on identical code, and six isolated warm runs in one session were flat at 0.66-0.70 s (noop sink). joins.py is unchanged since r1. Named cause: suite-level run variance (JIT/page-cache state), not a regression.",
 "cdc_materialize": "The CDC fold is one exchange on the key + row_number - last-write-wins and tombstone drop are filters above the window, so the log is never joined against itself. Partition the log by key at write time and the exchange disappears.",
 "dedup_ngram_jaccard": "Posting-list similarity join: shingles shuffle ONCE to group by (block, shingle); pairs explode from each list; set sizes ride a broadcast. No CartesianProduct/BroadcastNestedLoopJoin anywhere in the plan (guarded by tests/test_plans.py).",
 "sim_ann_ivf_topk": "Cell assignment is a NARROW per-row integer-L2 argmin over the inlined fixed-point centroid literals (constant-folded, K*dim int64 - round-7: integer Lloyd makes the centroids oracle-retrainable, so this entry is fully hash-matched) - no crossJoin, no window, zero exchanges to assign the corpus; the probe is a BroadcastHashJoin on cell id against the bounded query set, and the only shuffle is the final per-query top-k window over candidate rows (n_probe/n_clusters of the corpus).",
 "multimodal_frame_sample": "Binary payloads flow through ArrowEvalPython (mapInPandas) in one pass after the adaptive rebalance; the expansion to frames happens inside the Arrow batch, never on the driver.",
 "dedup_embedding_cosine": "Each vector's norm is projected ONCE before the label-blocked join (O(N) folds); only the dot product remains in the join condition, evaluated per candidate pair. The small side broadcasts; the anti-join back to the corpus is the only exchange of the full table. At corpus scale the block key switches to LSH buckets - same plan shape.",
 "join_scalar_subquery": "The global mean is a 1-row aggregate joined by BroadcastNestedLoopJoin - the fact table streams once and is never repartitioned for the comparison; the threshold test is exact integer math (scaled longs), so no float boundary flip at any scale.",
 "qx_custdist": "Left-outer join shuffles both sides on the customer key once; the per-customer count and the distribution count are consecutive hash aggregates - the second one runs on #distinct-counts rows (tiny). Bucketing customer+orders by custkey removes the join exchange entirely.",
 "sample_stratified": "Two-phase salted selection: the (stratum, salt) window bounds every reducer at per_stratum rows kept; the final window ranks only n_salt*per_stratum survivors per stratum - no single reducer ever sorts a whole stratum. The md5 ordering key is computed in the scan-parallel stage (load_for_compute spreads the row-group-bound scan).",
 "join_interval_bucketed": "The interval self-join is an EQUI hash join on (user, 5-min bucket) - the 3-bucket explode triples the probe side, not the build side, and the exact |dt|<=300s residual filters post-probe. No BroadcastNestedLoopJoin/CartesianProduct: the quadratic blowup of a naive theta join never appears in the plan, so a hot user costs O(events-in-adjacent-buckets), not O(events^2).",
 "stream_gap_fill": "Gap-fill is agg -> sequence/explode (narrow, per-key) -> left join -> one window. The grid explode happens AFTER aggregation, so it expands one row per key-hour, never raw events; the forward-fill window shuffles on user_id once and reuses the join's partitioning when bucketed.",
 "cdc_scd2_history": "SCD2 is ONE window pass over the log (lead per key): one hash exchange on the key, one sort, filters above - the history table costs the same shuffle as the LWW fold itself. No self-join of the log against its own next version.",
 "join_bucketed_colocated": "Both facts are bucketed+sorted on the join key, so the SortMergeJoin consumes the bucket layout directly: ZERO Exchange (and no extra Sort of the big sides) below the join - the shuffle was paid once at ingest and every subsequent key-join reuses it free. The only exchanges are the partial/final agg of the already-grouped result. Guarded by tests/test_plans.py::test_bucketed_join_has_no_exchange.",
 "jdbc_message_roundtrip": "The JDBC scan is bounds-striped on seq (partitionColumn/lower/upper/numPartitions), so the relation parallelizes across connections instead of serializing on one task; the LWW fold above it is the standard one-exchange window. Against a real server the same plan adds fetchsize batching; nothing else changes.",
 "cdc_schema_evolution": "mergeSchema unions the two segment footers at planning time - evolution costs zero data I/O; v1 rows surface NULL for the added column inside the scan itself (no join, no backfill), and the fold is the same single-exchange window as cdc_materialize.",
 "dedup_embedding_lsh": "Candidate generation is an equality self-join on (table, bucket) over the posting list - O(collisions), never all-pairs; cross-table duplicate pairs are dropped BEFORE the exact-cosine verify so each pair pays the fold once; the survivor anti-join is the only full-corpus exchange.",
 "qx_shipping_priority": "Q3's top-10 compiles to TakeOrderedAndProject: per-partition heaps of 10 rows ride the existing agg output, no global sort of the ranked set; the revenue rank is an exact scaled-long, so the LIMIT boundary cannot flip between engines or scales.",
 "b10_regression_trend": "The five regression sums (n, Sx, Sy, Sxy, Sxx) are BIGINT partial aggregates combined map-side - 5 longs per service cross the shuffle regardless of sample count; the least-squares closed form is evaluated in doubles from exact sums, so no accumulation drift exists at any scale.",
 "cdc_log_compact": "Compaction is the same single key-shuffle window pass as the LWW fold (rank per key by seq desc, filter rn<=N) - no self-join of the log, tombstones retained; the replay invariant (fold(compacted) == fold(full)) is property-tested.",
 "qx_top_supplier": "Q15's argmax: the revenue view shuffles once on l_suppkey; its 1-row max broadcasts back into the view (BroadcastHashJoin/NestedLoop on a literal-true condition), so there is NO global sort and no rangepartitioning anywhere - the classic ORDER BY rev DESC LIMIT 1 plan would serialize the view through one reducer. Exact scaled-long equality keeps argmax ties engine-stable.",
 "qx_funnel_conversion": "The funnel's view->purchase range join rides the user_id equality (hash join; range residual filters post-probe) - never a nested loop over event pairs. Both event_type predicates push to the parquet scan, so each side reads only its slice. One shuffle per side on user_id, bounded per-user purchase lists, integer-microsecond gap.",
 "cdc_incremental_agg": "IVM refresh: both segment scans push their ts bound to parquet; each side aggregates to |keys| rows BEFORE the full-outer merge, so the join touches state-sized inputs only - agg(A union B) = merge(agg(A), agg(B)) on exact scaled longs. At 100 TB the base aggregate is the stored MV; only the delta segment is ever scanned.",
 "text_pack_offsets": "Concat-then-chop packing is ONE exchange (hash on source for the running-sum window) + narrow integer arithmetic; nothing else moves. The per-shard sequential chain is the semantics, not a plan defect - parallelism comes from the shard count, exactly like striped pretokenized corpora.",
 "text_vocab_encode": "The top-k vocab (tiny by construction) broadcasts into the exploded token stream for the id lookup - the corpus text never shuffles for the join; the only wide op is the groupBy(doc_id) reassembly carrying compact (pos, id) structs. A 50k-BPE vocab is <1 MB: the same broadcast plan holds at any corpus size.",
 "text_heavy_hitters": "Frequent items with BOUNDED memory: pass 1 is a per-partition Misra-Gries sketch (2k counters, ArrowEvalPython mapInPandas) emitting <=2k candidates per partition; pass 2 exact-counts only the broadcast candidate set. The shuffle carries O(k * partitions) rows independent of the distinct-key universe - the groupBy alternative ships one row per distinct key per partition, fatal for unbounded key spaces (URLs, n-grams).",
 "sample_mixture": "Temperature-based source mixing: the per-source counts are a tiny aggregate whose sqrt-weights and quotas are EXACT integer arithmetic (scaled-long sqrt, integer sum, one multiply-divide) broadcast back onto the corpus; the quota fill is the hash-ordered window of sample_stratified. No float accumulation anywhere, so the selection boundary is engine- and partitioning-stable.",
 "sim_quantize_int8": "4x vector compression with ZERO wide operators: per-row array transforms (JVM higher-order functions, no UDF, no shuffle) compute the symmetric scale and the int8 codes in one narrow pass - at 100 TB this runs at scan speed and is the precondition for RAM-resident ANN indexes. floor(x+0.5) on an identical IEEE chain makes every code bit-identical to the DuckDB oracle.",
 "multimodal_phash_dedup": "Image-dedup shape: 8-byte sketches per blob via one ArrowEvalPython pass (payloads read once, never shuffled), then the shared 4x16-bit hamming-banded self-join - candidates are O(band collisions), lossless for hamming <= 3 by pigeonhole. The join input is ~10^-6 of the payload bytes.",
 "dedup_embedding_ivf": "Third blocking scheme of the embedding-dedup family, aligned with the ANN index: each vector posts to its n_probe nearest IVF cells via the same narrow inlined-centroid integer-L2 argmin as sim_ann_ivf_topk (zero exchanges to assign), candidates equality-self-join on cell id (O(sum cell^2), never all-pairs), exact-cosine verify gives precision 1. The coarse quantizer is the memoized one sim_ann_ivf_topk already built - dedup costs no extra index pass.",
 "text_contamination": "Train/eval overlap gate: the bounded eval-gram set broadcasts; the unbounded train side is only SCANNED and left-semi-joined against that broadcast - no shuffle keyed on train grams anywhere. Matched grams (a subset of eval grams) broadcast back to score each eval doc, so the two corpus passes are the whole cost at any scale.",
 "source_csv_roundtrip": "CSV ingestion with the schema passed explicitly (no inferSchema pre-scan) and microsecond timestampFormat pinned on both write and read; parallelism comes from the file count, the aggregate is the standard scaled-long partial-then-merge with one exchange. Hash-matching the pristine-parquet oracle proves the text hop is identity per row.",
 "source_jsonl_roundtrip": "JSON-lines ingestion, same discipline as the CSV twin: explicit schema, pinned microsecond timestamps (Spark's default emits millis - a silent 1000x precision loss on event times), count_distinct + scaled-long aggregate above the scan, one exchange.",
 "text_pii_redact": "PII scrub is a pure projection: ZERO exchanges, 2-column ReadSchema, three chained JVM regexp_replace + regexp_count expressions inside one codegen stage - runs at scan speed at any corpus size (guarded by tests/test_pipeline_ops.py::test_pii_redact_is_narrow). Hash parity on the redacted md5 proves the emitted bytes, not just the counts.",
 "text_novelty": "Novelty scoring: distinct-gram explode -> ONE exchange keyed on the gram for the min-doc window -> one groupBy(doc_id) fold. The gram-keyed shuffle carries strings here because the oracle must see identical group identities; production swaps the key for xxhash64(gram) (the 8-byte posting discipline of dedup.py) and the plan shape is unchanged.",
 "pipeline_shard_manifest": "Deterministic shard layout: narrow arithmetic-hash projection, one groupBy(shard) with 16 groups. Per-group state is five scalars - the membership digest is an order-independent modular SUM, never a collect_list - so the aggregate survives a trillion-doc shard with constant memory (guarded by test_shard_manifest_state_is_bounded).",
 "pipeline_split_assign": "Train/val/test assignment is a pure function of doc_id (engine-portable multiplicative hash): narrow projection + one small groupBy((split, lang)). Stability across runs/partitionings/engines is the property that keeps eval sets eval sets; asserted by test_split_assign_fractions_and_stability.",
 "graph_pagerank": "Iterative fixed-point PageRank: the annotated edge list (dst-outdeg + damping constants attached) is derived once and pinned via lazy localCheckpoint - the Pregel/GraphX edge-partition discipline - then every iteration is ONE broadcast join (the slim per-source contribution vector onto the pinned edges) and ONE aggregation keyed on dst, which IS the next rank vector (symmetric graph => indegree >= 1, no node-table left join). Exact integer arithmetic end to end, so 10 iterations hash-match the unrolled-CTE oracle. Beats single-node DuckDB on the identical computation at sf0.1 (4.2 s vs 5.5 s). The rank-join strategy is GATED (round-7): above RANK_BROADCAST_MAX_NODES the auto mode switches to the co-partitioned plan below.",
 "graph_pagerank_copart": "The at-scale rank join (rank_join='copartition', what 'auto' picks above 50M nodes): edges pinned hash-partitioned on src, the rank vector exits each iteration's dst-keyed aggregate already partitioned on node, and a shuffle-hash join marries the two with ZERO additional exchanges - nothing broadcast anywhere in the loop (asserted in tests/test_plans.py::test_pagerank_copart_never_broadcasts_rank_vector), one slim shuffle per iteration, identical integer arithmetic and oracle. Benches within noise of the broadcast path at local scale, so the gate costs nothing where it isn't needed.",
 "graph_degree_stats": "Degree distribution: two hash aggregations (per-node degree, then the (kind, degree) histogram); the histogram output is |distinct degrees| rows regardless of graph size - the skew diagnostic that sizes the salting/broadcast decisions of the iterative ops.",
 "agg_quantile_sketch_merge": "Mergeable KMV quantile sketch: per-month bottom-k by md5 rank (windowed, reducers bounded at k rows kept each), global bottom-k merge over |segments|*k rows, quantile read-off at ranks derived from the OBSERVED sample count. Segment-then-merge equals whole-pass bit-for-bit (membership is a pure function of the hash order), which is why this sketch hash-matches where HLL is rows-only.",
 "agg_cms_merge": "Mergeable count-min sketch: the d*w counter grid is built per month-segment with map-side partial aggregation (shuffle carries <= segments*d*w counter rows), merged by cell-wise SUM - associative, order-independent. Bucket hashes are md5-derived and reproduced exactly by the DuckDB oracle, so the whole frequency-sketch path is hash-checked; estimate >= exact for every key is property-tested.",
 "sim_ann_pq_topk": "IVFPQ-shaped ADC search: codes assigned by narrow per-row argmin over inlined codebook literals (zero exchanges), per-query m*ksub lookup tables inlined as literals, the 8-byte-code scan summed via m element_at lookups per row, top-rerank candidates re-scored EXACT against the full vectors (bounded rerank*|Q| rows). The float corpus is read once for codes and once for the bounded re-rank fetch - never shuffled.",
 "sim_pq_codes": "PQ code assignment as the registry-facing exploded (vec_id, subspace, code) rows: the per-row argmin over inlined codebooks plus posexplode are both narrow - no exchange anywhere; the array form the ADC search consumes stays internal (driver-canonicalization contract).",
 "join_dpp_partitioned": "Dynamic partition pruning: the month-partitioned fact scan carries a dynamicpruning# partition filter injected from the dim's runtime quarter filter (plan-asserted) - only the dim-selected months are read, decided at runtime. The dim broadcasts; the aggregate shuffles the grouped result only.",
 "join_bloom_prefiltered": "Runtime Bloom filter ahead of the semi join: the build side folds into m=4096 bits whose SET POSITIONS (<= m values, never keys) inline as 64 long literals; the fact probe is narrow bit arithmetic - zero exchanges before the filter - so only true matches + ~(fill)^4 false positives enter the join shuffle. No false negatives by construction; the plain-semi-join oracle proves semantic invisibility.",
 "sample_weighted": "Weighted systematic sampling via a DISTRIBUTED two-phase prefix sum: md5-prefix buckets cumsum in parallel (the bucket IS the hash prefix, so (bucket, hash) order equals global hash order), bucket offsets windowed over exactly 256 rows, selection = integer step-boundary crossings. No transcendental ranking keys, no single reducer over the corpus.",
 "multimodal_image_decode": "The real-decoder image path: PPM blobs synthesized and decoded in one fused ArrowEvalPython stage (encode and decode are back-to-back mapInPandas - no exchange between them); the netpbm parse is pure Python over Arrow batches, per-channel sums exact integers hash-matched by the congruence oracle.",
 "layout_hilbert_key": "Hilbert clustering key: the 8-level xy->d walk unrolls into chained integer projections that Catalyst fuses into ONE codegen stage over the broadcast min/max bounds - same zero-shuffle shape as the Morton key, stronger locality (consecutive keys are Manhattan-adjacent cells, proven against an independent reference model).",
 "multimodal_scene_cuts": "Shot-boundary detection: blobs stream through one ArrowEvalPython pass emitting 24-byte (doc, frame, byte_sum) rows; the lag window shuffles ONLY those skinny rows on doc_id; the rollup is per-doc scalars. The payload bytes never shuffle at any scale.",
 "sim_ann_ivfpq_topk": "The composed production ANN index: narrow inlined-literal cell+code assignment, ADC scan restricted to each query's probed cells (array_contains on the exploded bounded query structs), candidate top-C window over skinny rows, exact re-rank on the bounded fetch. Corpus touched: n_probe/n_clusters of the rows at 8 bytes each.",
 "cdc_disorder_stats": "Watermark-sizing metrics: one key-partitioned window (the fold's own shuffle) computes per-event lateness vs the running max event time in commit order; the rollup is 3 rows of exact-integer scalars.",
 "cdc_schema_widen": "Type-widening migration: per-segment schema-on-read (the int generation cast up inside its scan projection) + union + the standard one-exchange LWW fold. mergeSchema refuses int-vs-bigint (test-pinned), so the explicit cast IS the migration; zero data rewrite.",
 "win_ewma_dyadic": "Float-free EWMA: 31 dyadic-coefficient LAG terms share ONE key-partitioned sort; the smoothed value is pure integer shifts+adds (exact, order-insensitive), with a single exact division for the double read-off.",
 "stream_join_outer_live": "Left-outer stream-stream join: watermark >= span means nothing is ever late; the two trailing sentinel files first advance the watermark past every real window, then trigger the eviction batch that emits the stranded null-extended rows - availableNow converges to the batch left join exactly.",
 "graph_bfs_hops": "Bounded multi-source BFS: the edge list pins once via lazy localCheckpoint (PageRank's discipline), then each of the 4 constant-bound relaxations is one src-keyed join + one node-keyed min-fold - the full-vector fold is a pure function of the previous vector, which is exactly what the unrolled-CTE oracle replays. At cluster scale the contribution join co-hash-partitions ranks and edges on src; nothing broadcasts at data scale.",
 "text_bm25_search": "BM25 retrieval: the query-term filter sits BELOW the tf aggregate, so only posting rows for the 3 query terms ever shuffle (the corpus-wide work is one per-doc length count). All scoring is integer-rational (idf micro-nats x denominator-cleared tf normalization); the top-k plans as TakeOrderedAndProject (plan-pinned) - per-partition heaps, never a global sort.",
 "multimodal_audio_vad": "Voice-activity segmentation: payload bytes stream through ONE ArrowEvalPython pass (never shuffled); only the 64-sample frame FEATURE rows shuffle once on doc_id for the gaps-and-islands run window, and the output is segment-sized. The activity predicate is exact-integer (sum_sq >= T*n), so segment boundaries cannot flip across engines.",
 "sim_ann_graph_topk": "NSW-style beam search over the memoized on-disk indexes (edge list + LSH posting list, both built once per corpus at ingest). Round-13 rework of the r8 pin discipline: the eagerly pinned per-hop state now carries (node, d2, beam-rank, answer-rank) instead of bare visited ids, so each hop is ONE exchange - the unioned state repartitions by query_id once and the dedup, the ranking windows and the final top-k all reuse that partitioning (hash(query_id) satisfies every one of their clustering requirements); scoring touches only the hop's NEW expansion rows (d2 is deterministic per (query, node)), and the answer rank among non-self rows rides the same sorted pass as a running conditional count. The returned plan is therefore a bare Filter+Project over the last checkpointed RDD scan - ZERO joins, ZERO exchanges in the action - and the iterative work ran, hop-bounded, during construction (FULL_TIMED in bench.py). Walk state is O(|Q| x visited) rows at ANY corpus size; per-query cost collapses at batch |Q| (bench.py batch_ann: ~13 ms/query at |Q|=500 vs ~440 ms/query at |Q|=5 - pure per-stage scheduling amortization, measured not argued).",
 "sim_knn_graph_incremental": "Incremental ANN-index ingest: candidates for the arriving batch (odd vec_ids) come from the memoized posting index probed by the batch's own postings - the src filter pushes through the candidate union into both blocking joins' probe sides, so the heavy self-joins run batch x (corpus + batch), never N x N - then one per-src top-k window. Edges equal the full rebuild's rows for batch sources (property-pinned), so the standing index is APPENDED to, never recomputed; per-ingest cost scales with |batch| x candidates-per-vector regardless of corpus size.",
 "dedup_substring_spans": "Exact-substring dedup (Lee et al. 2022 reformulated map-reduce): the token array materializes once per doc, a narrow transform emits (pos, md5-of-w-token-window) structs, occurrence counting is ONE window over the gram hash (round-13: the former groupBy(h) + join-back shape scanned the documents and recomputed the md5 gram projection TWICE - two RoundRobin exchanges + two Generate stages in the before-plan; the count-over-partition keeps every position row in hand, so the corpus is read and hashed exactly once with the same single hash(h) exchange), and a per-doc gaps-and-islands window merges [pos, pos+w) intervals. No pair join anywhere - a gram repeated k times costs k posting rows, never k^2, so hot boilerplate cannot go quadratic. The gram table is ~1 row per corpus token position: the same budget as an inverted-index build, embarrassingly scalable.",
 "sim_knn_graph_delete": "The delete half of ANN-index maintenance: the standing memoized edge list filters out tombstoned sources narrowly; the AFFECTED survivor set (lists referencing a dead dst) is a small distinct + eager pin, semi-joined into the survivor-filtered posting/cell indexes so the repair's blocking joins run |affected| x bucket-mates, never corpus^2; unaffected lists pass through a left-anti join untouched (provably already correct: top-k(C and survivors) = top-k(C) when the whole top-k survives). Round-13: the repair's candidate-pair dedup and its top-k window share ONE hash(src) exchange (repartition before dropDuplicates - the knn_graph_edges fusion), dropping the second full exchange of the pair table. At 100 TB a delete batch touches the few thousand lists that referenced it - the index is repaired, never rebuilt.",
 "dedup_substring_excised": "Span excision emits the Lee et al. training product: the per-doc span set collects into ONE bounded sorted array (spans are disjoint, <= n_tokens/w per doc), left-joins back to the token arrays, and the kept positions + kept text are a single JVM higher-order filter/transform chain - no UDF, no explode of token positions, no shuffle beyond the spans op's own posting pass. Cost above the spans op is one |docs-with-spans| join + narrow array work.",
 "sim_ann_filtered_topk": "Metadata-filtered ANN (the production retrieval query): the quality+lang predicate is evaluated scan-side over documents (narrow integer scoring, no shuffle) and SEMI-JOINED into the corpus BEFORE the probe join, so the inverted lists the probe sees are already filtered - candidate volume scales with the allowed share of the probed cells, and a restrictive filter makes the query CHEAPER, not silently smaller-than-k. Cell assignment stays the inlined-literal integer argmin (zero exchanges); the probe is a BroadcastHashJoin against the bounded query set; the only shuffle is the final per-query top-k window. At 100 TB the allowed-id set rides the semi-join's runtime filter into the corpus scan.",
 "dq_drift_psi": "PSI drift gate: one scan of events; the reference segment's (min, max) is a 1-row bounds aggregate broadcast back (vetted BNLJ - the zone-map pattern), bin assignment is a narrow clamped projection, and ONE groupBy(bin) yields both segments' counts via conditional sums; the 10-row spine + totals are 1-row-aggregate crossJoins. Output is n_bins rows at any table size. The single transcendental (ln of the smoothed ratio) uses the micro-nat round-then-floor discipline, so the gate is hash-oracled despite libm.",
 "sim_quantize_binary": "Binary (sign-bit) quantization: 32x vector compression in one NARROW pass - two per-row integer folds (JVM aggregate over sequence(0,31), no UDF, no shuffle, zero exchanges) pack 64 dims into two positive BIGINT halves. At 100 TB this runs at scan speed; the sketch table it emits is what sim_ann_binary_topk scans instead of the float corpus.",
 "sim_ann_binary_topk": "Binary-quantized ANN serving: the Hamming scan is the bounded query set BROADCAST over the two-BIGINT sketch projection (XOR+popcount per comparison - the vetted BNLJ, 17 bytes/vector so the 'scan everything' pass costs ~1/32 of a float scan), per-query shortlist via one top-rerank window over skinny (query, id, ham) rows, then the exact integer-L2 rerank joins ONLY |Q| x rerank rows back to the quantized corpus by key (BroadcastHashJoin). The full-precision vectors are touched for 100 rows per query, never N.",
 "sim_ann_recall_eval": "Recall@k monitoring as a relational operator: composes the IVF probe (broadcast-only, see sim_ann_ivf_topk) with the exact brute-force baseline over the BOUNDED query sample (sim_cosine_topk's vetted cross), intersects by equi join on (query_id, neighbor_id) and folds to |Q| rows. The exact side is |sample| x N by construction - the production recall-SLO query prices truth on a sample, never the corpus square.",
 "sim_ann_graph_adc_topk": "DiskANN-shaped serving: the beam walk's per-hop rescore joins visited nodes to their 8-byte PQ code vectors and sums m integer table lookups (per-query ADC tables broadcast) - the float corpus is joined exactly once, for the bounded final exact rerank. Like the exact-steered walk, the iterative work ran hop-bounded at construction (FULL_TIMED) through the round-13 fused one-exchange-per-hop state (see sim_ann_graph_topk); the returned plan is the bounded exact rerank join over the last pinned state (steered mode always re-ranks exact). What changed vs the exact walk is WHAT each hop reads: codes at 8 bytes/node instead of 512-byte vectors - the RAM story for serving when vectors live in cold storage. Recall cost of compressed steering is bought back with a wider beam (round-11 sweep over beam in {8,16,24,32}: default now 16, the knee - recall@10 0.86 at sf0.01 / 0.70 at sf0.1 vs 0.74/0.50 at beam=8, warm wall flat because per-hop cost is scheduling-dominated; floor test asserts >=0.8 at the default).",
 "sim_ann_graph_filtered_topk": "Filtered search on the GRAPH index (round-11): the quality+lang predicate pushed INTO the beam walk - entry point is the min allowed node, seed mates come from the allowed-filtered postings, and each hop expands through the predicate-filtered effective edge set: direct allowed dsts UNION allowed two-hop dsts reached via a blocked intermediate (the Filtered-DiskANN waypoint closure; dst-filtering alone leaves the allowed subgraph too sparse to route - measured recall@10 0.32 -> 0.70). Both the allowed-id set (ingest-time document metadata) and the closure (derivable once per predicate from the standing edge list) are per-corpus disk memos like the edge list itself, so per-query cost is the walk's bounded hop joins - same plan shape as the unfiltered walk, 2.3 s vs 2.4 s at sf0.1.",
 "sim_ann_recall_eval_graph": "The recall-SLO query as a relational operator (round-13): the beam walk side is the audited fused-exchange hop plan whose iterative work ran at construction (FULL_TIMED), and the exact-truth side — the |Q|=5 query sample broadcast over the quantized corpus (vetted BNLJ, the bounded-sample pricing of production recall monitoring, never N^2) — is eagerly pinned from a SECOND driver thread concurrently with the walk's construction (guide 2.6), so neither serializes behind the other; the intersection broadcasts the |Q|*k walk answer (explicit broadcast - unknown post-window stats otherwise force a SortMergeJoin) and folds to |Q| rows. At 100 TB the truth scan is the only corpus-sized term and it is one narrow pass.",
 "sim_ann_maintenance_advisor": "The monitoring-to-action decision priced as a plan (round-13): ONE shared pinned exact-truth scan feeds both recall signals (graph + ADC walks, each the audited bounded-hop serving plan); drift is one narrow pass over the embeddings folding to <= n_bins grouped counts with 1-row totals broadcast (integer ppm TVD - the dq_drift_psi zone-map shape); posting skew is one grouped count over the memoized posting list; the three verdict rows are integer CASEs over crossJoined 1-row aggregates. The two walks and the truth pin are independent jobs, so their eager construction runs from THREE driver threads (guide 2.6 - overlap independent jobs; measured 8.1 -> 5.1 s at sf0.1, identical results since all three are pure functions of frozen artifacts). Total cost: two serving walks + one truth scan + two metadata-sized scans - amortized over a maintenance cycle, and every signal integer-exact so the verdicts hash-match.",
 "sim_ann_graph_filtered_domain_topk": "The SECOND predicate family (source-domain) through the round-12 parameterized closure machinery - the entry differs from the quality walk only in the family name; the allowed-id and waypoint-closure memos carry the predicate identity in their keys and fingerprint the documents table they derive from, so the two families build and serve disjoint artifacts over the ONE frozen full-corpus graph. Plan shape identical to sim_ann_graph_filtered_topk: adding a predicate family costs one dict entry and its own memo build, never a second closure implementation or an index rebuild - the Filtered-DiskANN arbitrary-label-predicate contract.",
}

print("# Plan audit — headline queries\n")
print("Generated with `df.explain(\"formatted\")` at sf0.01 (plans are scale-independent;")
print("AQE may re-plan exchanges at runtime). What each plan must show — and why it")
print("survives a 100x scale-up — is noted above each dump. Regenerate with")
print("`python tools/gen_plans.py > docs/PLANS.md`.\n")
print("""## Bench-drift accounting (round 13 OPTIMIZATION pass)

Round 13's optimization pass (OPTIMIZATION_r13.md is the full record)
reworked plan shapes only — no query's results changed (331/331 oracle
parity re-proven; full suite green). Same-host best-of-two quiet runs,
before → after: suite total **64.97 → 48.01 s (0.74×)**, `r12_38q`
like-for-like 53.88 → 40.95 s; vs the committed pre-optimization
quiet-machine run (docs/bench_r13_buildtime.json, identical code) the
optimized tree reads 51.82 → 48.01 s with every touched entry at
0.66-0.94×. The levers, per plans/r13/*_{before,after}.txt:

- **Beam walks** (`_beam_walk`, hnsw): one exchange per hop (the
  repartition(query_id) shared by dedup + ranking windows), scoring
  only new expansion rows, answer rank carried in the pinned state —
  final plans collapse 8 Exchange / 4 BHJ → 0 / 0 (exact mode);
  batch_ann 13.0 → 7.1 ms/query.
- **Candidate-pair fusion** (`knn_graph_edges`, delete repair, upsert,
  live sink): hash(src) serves dedup AND top-k window — one full
  exchange of the pair table dropped; `sim_knn_graph_incremental`
  0.70×, `sim_knn_graph_delete` 0.86×.
- **Advisor/monitors**: independent eager constructions (two walks +
  exact-truth pin) overlap from driver threads (guide §2.6) —
  `sim_ann_maintenance_advisor` 8.10 → 5.09 s, SMJ 12 → 0 via
  broadcast of the knob-bounded intersect sides.
- **dedup_substring_spans**: occurrence counting as one window over the
  gram hash — corpus scanned once instead of twice (0.58×).
- Examined-and-left: pagerank pair (cadence swept — wash), pq_topk,
  jaccard (AQE stage reuse verified), multimodal (single Arrow pass),
  all sub-second entries (plans audited). No config-only wins taken.

## Bench-drift accounting (round 13)

Suite wall **51.82 s (r13, 40 queries; final end-of-round BUILD-TIME
run on a quiet machine, committed as docs/bench_r13_buildtime.json —
the driver's BENCH_r13.json is the artifact of record and supersedes
these numbers)** vs 42.52 s (r12 build-time, 38 queries): the growth
decomposes into the two new timed entries —
`sim_ann_maintenance_advisor` 5.89 s (two monitored serving walks +
one shared pinned exact-truth scan + drift/skew metadata aggregates;
the advisor's second bench run moved 6.57 -> 5.89 s, so read its
number with the walk-entry variance below) and
`sim_ann_recall_eval_graph` 2.37-2.53 s (the audited walk + the
bounded |Q|x N truth scan) — plus a UNIFORM +0.2-0.4 s drift on the
scheduling-sensitive beam-walk entries (`sim_ann_graph_topk` 1.97 ->
2.19, `_adc_topk` 3.17 -> 3.43, both filtered walks 1.77 -> ~2.2)
while every non-walk entry is flat (`sim_ann_filtered_topk` 0.69 ->
0.69, `sim_cosine_topk` 0.26 -> 0.25, `sim_ann_hnsw_topk` 2.55 ->
2.53). The walk entries run dozens of small eager jobs per query, so
they price suite composition (GC/page-cache state with two more heavy
entries resident) more than engine change — no walk-path source line
changed this round, the ratios sit inside the documented ±8-11 % band
(worst 1.24x vs r12's accepted 1.29x precedent), and the like-for-like
sums confirm: `r12_38q` 43.39 s vs r12's 42.52 s wall (+2.0 %),
`r11_37q` 41.2, `r5_20q` 7.4. Startup 4.27 s session + 0.32 s first
query = **0.885x the 5.187 s JVM anchor**.

- The round's new REAL-POSTGRES entries (`postgres_message_roundtrip`,
  `postgres_partitioned_scan`, `postgres_write_roundtrip`,
  `postgres_cdc_sink`, `postgres_pushdown_scan`) and serve-loop pair
  (`serve_message_api`, `serve_db_info`) stay out of the wall-clock
  headline with the other harness-dominated entries: their wall is
  initdb/server start and HTTP scripting, not engine throughput —
  the engine-side cost story is COPY-speed bulk transport, one merge
  transaction per CDC batch, and one keyed-window fold per log
  version (docs/SCALE.md rows). `sim_ann_search_live_filtered_crud`
  stays out with the other micro-batch harnesses.

## Bench-drift accounting (round 12)

Suite wall **42.52 s (r12, 38 queries; final end-of-round BUILD-TIME
run on a quiet machine, committed as docs/bench_r12_buildtime.json —
the driver's BENCH_r12.json is the artifact of record and supersedes
these numbers)** vs 40.73 s (r11 build-time, 37 queries): the growth
is EXACTLY the one new timed entry — like-for-like `r11_37q` sums
**40.75 s vs r11's 40.73 s wall (flat)**, and the newcomer
`sim_ann_graph_filtered_domain_topk` (1.77 s, FULL_TIMED) prices
IDENTICALLY to its quality-predicate twin (1.77 s) — the round's
predicate-family parameterization costs nothing at serve time: both
walks read their own per-(corpus, predicate) allowed/closure memos and
run the same bounded hop joins. Other like-for-like sums: `r5_20q`
7.87, `r6_23q` 15.70, `r7_26q` 23.99, `r8_30q` 30.69, `r9_32q` 33.83,
`r10_36q` 38.98 — all inside the documented ±8-11% band; worst
per-query ratio vs r11 is 1.29x on a 0.21 s multimodal entry (absolute
noise), while `sim_knn_graph_delete` came back 3.41 -> 3.03 s (0.89x).
Startup 4.58 s session + 0.32 s first query = **0.94x the 5.187 s JVM
anchor** (the CDS map probe now also requires archive-engagement
evidence before promotion and confines its deliberate crash logs to a
scratch dir).

- The round's new LIVE entries — the PQ codebook migration trio
  (`sim_ann_reindex_pq_live` / `_crud_live` /
  `sim_ann_search_reindexed_pq`), the LSH rotation pair
  (`sim_ann_reindex_lsh_live` / `sim_ann_search_rotated_index`),
  `sim_ann_search_live_adc`, `sim_ann_search_live_filtered`, and the
  live curated export `stream_curation_export_live` — stay out of the
  wall-clock headline with the other deliberately-serialized
  micro-batch harnesses: their wall is harness setup, not engine
  throughput; their cost story is the migration docstrings (one
  compaction-class narrow map per cutover, retrains bounded by the
  fixed 2048-row sample, never corpus-scaled).

## Bench-drift accounting (round 11)

Suite wall **40.73 s (r11, 37 queries; final end-of-round BUILD-TIME
run on a quiet machine, committed as docs/bench_r11_buildtime.json —
the driver's BENCH_r11.json is the artifact of record and supersedes
these numbers)** vs 40.69 s (r10 build-time, 36 queries): the suite
grew one timed entry (`sim_ann_graph_filtered_topk` 1.93 s) AND took
the PRICED ADC beam retune (8 -> 16, the recall knee: 3.20 s — bought
recall@10 0.74 -> 0.86), yet the wall is flat because the round also
made two carried queries faster (the memoized predicate metadata took
`sim_ann_filtered_topk` 2.64 -> 0.71 s). Like-for-like: `r8_30q`
**30.16 s vs r10 build-time 30.49 s (-1%, flat)**, `r10_33q` 34.39,
`r10_36q` 38.80 (new pin, carries the beam step), `r9_32q` 33.68,
`r7_26q` 23.54, `r6_23q` 15.11, `r5_20q` 7.38 — no per-query
regression outside noise. Startup 4.48 s session + 0.36 s first query
with the CDS archive (now gated by a map-probe validity check: a
truncated dump crashes a throwaway probe JVM, never a production one).

- `sim_ann_graph_filtered_topk` 1.93 s (NEW, FULL_TIMED): filtered
  graph search. First cut measured **10.4 s**: the quality-gate scan
  and the two-hop closure re-evaluated inside every hop's eager pin.
  Fixed by treating both as INDEX-BUILD artifacts (per-corpus disk
  memos, like the edge list): per-query work is only the bounded hop
  joins. Fixing that also took `sim_ann_filtered_topk` 2.64 -> 0.72 s
  (the IVF path now reads the same memoized allowed-id metadata
  column instead of re-scoring documents per query).
- The memo work surfaced a real concurrency defect, now fixed + test
  lock-keyed: the build-lock registry was keyed by the bare key tuple
  across ALL memo caches, so the filtered-edge build (key (sf_dir, fp,
  k_edges)) self-deadlocked acquiring the raw-edge-list build's lock
  (same tuple). Locks are now namespaced by cache prefix.
- `sim_ann_reindex_live` (+ its CRUD twin and the search served from
  the migrated snapshot), `stream_curation_funnel_live` (+ compacted
  twin and survivor report) and the crash/vacuum/recall-drift tests
  stay out of the wall-clock headline with the other deliberately-
  serialized micro-batch harnesses. `sim_ann_graph_adc_filtered_topk`
  also stays out: its plan is the benched ADC walk over the benched
  filtered closure — nothing new to price.

## Bench-drift accounting (round 10)

Suite wall 33.72 s (r9 build-time, 32 queries) -> **40.69 s (r10, 36
queries; final round-10 BUILD-TIME run on the end-of-round tree,
committed as docs/bench_r10_buildtime.json — the driver's BENCH_r10.json
is the artifact of record and supersedes these numbers at next
regeneration)**. The growth is three new timed entries (the DiskANN
code-steered walk at ~4 s of honest FULL_TIMED hop work, binary ANN
~0.45 s, recall eval ~0.9 s). The like-for-like series at the final
run: `r8_30q` **30.49 s vs r9's 30.32 s (+0.6% — flat)**, `r9_32q`
34.04 s (vs 33.72, +0.9%), `r10_33q` 36.08 s (best of the round's
three measurements: 39.20/38.07/36.08), `r7_26q` 23.67, `r6_23q`
14.96, `r5_20q` 7.27 — no regression anywhere. The round's six
same-code-lineage runs put r8_30q at 32.87/36.57/31.99/31.59/33.86/
30.49 s, a ±9% band with no code change on any member: per-run deltas
are sandbox spread. Verdict on the round-9 environment question: the
driver's uniform ~1.25x r9 slowdown did NOT reproduce at build time —
run-to-run variance fully accounts for it.

- **Startup: 12.46 s -> 7.49 s committed / 3.70-7.5 s measured
  across the round's runs (0.71x-1.44x the reference's 5.2 s JVM
  anchor; isolated same-code probes span 5.3-5.8 s session, so
  startup variance on this sandbox is ~2x and the committed sample is
  the pessimistic end — every observation is inside the 2x
  contract).** With the AppCDS
  archive (session.py: dump at first exit, promote+map thereafter —
  round-10 second half adds the dump-completeness gate: a dump whose
  writer is alive, short, or non-quiescent is never promoted, because
  a truncated archive SIGBUSes the mapping JVM at relocation;
  bench.py generates the archive as an explicit one-time install
  step). The round-9 'weak' (2.4x the anchor) is closed with margin —
  classloading was the whole story.
- `sim_ann_filtered_topk` 2.64 s (NEW): metadata-filtered ANN — the
  quality+lang predicate semi-joined into the inverted lists BEFORE the
  probe join. First cut measured **23.9 s**: Catalyst pushed the heavy
  regex predicate through load_for_compute's repartition back into the
  one-row-group scan task. Fix: `load_for_heavy_compute` (catalog.py)
  breaks lineage after the spreading shuffle ONLY when the layout is
  row-group-bound, pinning the scoring at core parallelism (25 s
  single-task -> 1.5 s spread); on well-laid-out input it is
  load_table verbatim. pipeline_quality_kept inherits the fix.
- `sim_ann_binary_topk` 0.41 s (NEW): the 32x-compression serving path
  — Hamming scan over two-BIGINT sketches with the two-phase
  per-(query, scan-partition) shortlist, bounded exact rerank.
  `sim_ann_recall_eval` 0.96 s (NEW): IVF recall@10 vs exact truth on
  the query sample as a hash-oracled operator.
- `sim_ann_graph_adc_topk` 4.26 s (NEW, FULL_TIMED): the DiskANN
  serving shape — hops read 8-byte PQ codes, floats touched once at
  the exact rerank. `batch_binary`: 3.7 ms/query at |Q|=500 (25x
  amortization of the Hamming scan).
- `sim_knn_graph_delete` ~3.7 s, `sim_ann_hnsw_topk` ~2.9 s,
  `graph_pagerank` ~5.6 s, `graph_pagerank_copart` ~6.6 s — flat vs r9
  within spread. `batch_ann` 14.4 ms/query at |Q|=500 (31x
  amortization), unchanged.
- The live streaming entries (`sim_knn_graph_live`,
  `sim_knn_graph_crud_live`, `sim_ann_search_live_index`, the three
  `stream_*_gate_live` gates and the compacted variants) stay out of
  the wall-clock headline: their time is deliberately-serialized
  micro-batch harness setup, not engine throughput. The r10 sink
  rewrite bounds their per-batch cost to touched buckets — the
  byte-identical-untouched-bucket test is the scale proof, not a
  single-node wall number.

## Bench-drift accounting (round 9)

Suite wall 31.13 s (r8, 30 queries) -> **33.72 s (r9, 32 queries;
round-9 BUILD-TIME run, committed as docs/bench_r9_buildtime.json —
the driver's BENCH_r09.json is the artifact of record and supersedes
these numbers at next regeneration)**: the suite grew by two queries
(`sim_knn_graph_delete` 3.30 s of honest repair work over the standing
index, `dedup_substring_excised` 0.10 s) and every carried query is
flat or faster. The pinned like-for-like series: `r8_30q` **30.32 s vs
31.13 s (-2.6%)**, `r7_26q` 23.37 s (vs 23.97), `r6_23q` 14.83 s,
`r5_20q` 7.22 s — no regression anywhere (suite spread is ±10%).

- `sim_ann_hnsw_topk` **3.00 -> 2.63 s** (construction 2.46 + action
  0.17) — round 9 REPLACED the coarse layer (hybrid md5-hashed modulus
  ∪ per-cell medoids; the raw vec_id modulus correlated with data
  regularities and left whole regions unroutable — recall 0.52 -> 0.82
  on the clustered corpus, floor raised to 0.7) and the new layer's
  k-NN build is cheaper than the old one: better recall AND ~12%
  faster, with the oracle reparameterized in lockstep.
- `sim_knn_graph_delete` 3.30 s: tombstone vec_id % 5 == 0, drop their
  lists, re-rank only the affected survivors from the survivor-filtered
  memoized postings — the cost is the repair joins, bounded by
  |affected| x bucket mates. Its composed sibling `sim_knn_graph_crud`
  (upsert then delete, equals the rebuild over survivors) and the live
  streaming ingest `sim_knn_graph_live` are correctness constructs like
  `sim_knn_graph_upsert` and stay out of the wall-clock headline.
- `dedup_substring_excised` 0.10 s warm above the spans pass it reuses:
  one bounded span-array join + a JVM higher-order filter. The packing
  pair (`pipeline_pack_sequences`/`_stats`) and the BPE trainer
  (`text_bpe_train`, 8 unrolled rounds) are sub-second at sf0.1 and
  hash-oracled; none needed a headline slot.
- `batch_ann` re-measured: **12.7 ms/query at |Q|=500 (33x
  amortization)** — unchanged within noise after the layer rework.

## Bench-drift accounting (round 8)

Suite wall 41.07 s (r7, 26 queries) -> **31.13 s (r8, 30 queries;
the driver's committed BENCH_r08.json — the artifact of record)**:
the suite GREW by four queries (`sim_knn_graph_incremental` 2.44 s of
honest cold ingest work, `sim_ann_hnsw_topk` 3.00 s,
`dedup_substring_spans` 1.32 s, `dq_drift_psi` 0.40 s) and still
dropped ~10 s, because the round's one `weak` row was fixed rather
than re-measured. The pinned series per BENCH_r08.json: `r7_26q`
**23.97 s vs 41.1 s (-42%)**, `r6_23q` 15.15 s (vs 15.2 r6, flat),
`r5_20q` 7.46 s (flat since r5); suite-level spread is ±10%
(build-time runs saw 26.0/16.8/7.9 on the same code).

- `sim_ann_graph_topk` **17.80 -> ~2.1 s** (construction ~1.9 +
  action ~0.2), hash oracle unchanged. Two fixes, both index/iteration
  discipline rather than algorithm changes: (1) `visited` is eagerly
  pinned once per hop — the Spark twin of the oracle's MATERIALIZED
  CTEs (r7 verdict item 1); the lazy chain was re-executing every
  hop's subtree in the final rescore. `beam` deliberately stays lazy
  (consumed exactly once, at depth 1 over pinned state). (2) The
  entry-point seeding now reads the memoized ON-DISK posting index
  instead of recomputing full-corpus LSH postings per search call —
  profiling showed the postings scan was ~60% of the wall; a vector
  store builds its hash index once at ingest, exactly like the edge
  list (both memos: per-key subdirs, existence-checked, evict-deletes).
- **Per-query amortization measured** (r7 verdict item 2): bench.py's
  `batch_ann` section runs the identical walk at |Q|=500 —
  **13.3 ms/query vs 426 ms/query at |Q|=5 (32x)**, and ~270x below
  r7's committed |Q|=5 ratio (3,560 ms/query). The walk's per-hop jobs
  are query-count-independent (all queries ride the same bounded hop
  count; state just gains rows), which is the scheduling-overhead claim
  of the r7 PLANS text, now a number. Result equality between the
  batch walk's first-5 slice and the |Q|=5 walk is property-pinned
  (per-query independence), so the comparison is apples-to-apples.
- `sim_knn_graph_incremental` 2.44 s: the ingest path (batch x standing
  postings candidates + per-src top-k) — real per-batch work over a
  20k-vector append at sf0.1, priced cold by design (ingest is never
  warm). Its multi-batch twin `sim_knn_graph_upsert` (not benched — a
  correctness construct) proves the maintenance algebra by
  hash-matching the one-shot rebuild's oracle.
- `dedup_substring_spans` 1.32 s and `dq_drift_psi` 0.40 s joined the
  headline as the round's LLM-pipeline/data-quality additions (one
  posting shuffle + one window; one scan + 10-row output).
- `sim_ann_hnsw_topk` 3.00 s (construction 2.83 + action 0.17,
  FULL_TIMED): the hierarchical two-layer walk — 7 eager pin jobs
  (3 coarse + 4 base hops) over tiny walk state, routing through the
  memoized coarse layer with ZERO per-query index probes. ~1 s over the
  flat walk buys the shape that holds when the posting probe itself
  would be too big to serve per query; both layers hash-oracled.

## Bench-drift accounting (round 7)

Suite wall 15.22 s (r6, 23 queries) -> **41.07 s (r7, 26 queries;
committed BENCH_r07.json)** — all growth, no regression: the BENCH json
now carries `legacy_suites` (the pinned r5 20-query and r6 23-query
membership sums), and the r6-compat 23-query series reads **16.50 s vs
15.22 s (+8.4%)** in the committed artifact. r6's four-run spread was
±0.4 s, and a post-tune rerun (probe memoization, commit 4bc7872)
measured ~15.9 s, but the artifact of record is the committed one:
+8.4%, at the edge of noise, worst absolute per-query delta +0.74 s
(graph_pagerank 5.33 -> 6.07 s). (Round-8 true-up of the r7 text, which
previously quoted the uncommitted post-tune run — verdict item 5.) The
three additions:

- `graph_pagerank_copart` (~6.9 s): the same 10-iteration fixed point
  through the AT-SCALE rank join (co-partitioned shuffle-hash, nothing
  broadcast — what the `rank_join='auto'` gate switches to above 50M
  nodes). ~20% over the broadcast path in local mode — the measured
  price of the plan that survives a rank vector too big to broadcast;
  the gate means nobody pays it below the threshold.
- `sim_knn_graph` (~0.07 s warm): the ANN graph build memoized per
  corpus as an on-disk index artifact (a vector store builds its graph
  ONCE at ingest — the k-means-memo rationale applied to a data-scaled
  artifact); the cold build (~10-15 s: two blocking joins + per-src
  top-k over ~6M candidate pairs at sf0.1) is paid in the untimed warm
  pass, exactly like the PQ codebooks.
- `sim_ann_graph_topk` (~15-18 s, FULL_TIMED): the NSW-style beam walk.
  The number is almost entirely per-hop SCHEDULING cost — 4 hops ×
  (expand ∪ dedupe ∪ rescore ∪ beam-select) over ~200-row frontiers —
  and is corpus-size-INDEPENDENT (the walk touches O(hops·beam·k_edges)
  nodes at any N; hops=4 measured recall-equivalent to 6). At |Q|=5 the
  per-stage latency cannot amortize; a production batch of 10⁵ queries
  runs the same 4 hop-rounds with full parallelism. Reported honestly
  rather than hidden behind the memo (the r6 precedent: the bigger
  number is the honest one).

`full_timed_split` (construction_s/action_s per FULL_TIMED query,
round-6 verdict item 6) plus `legacy_suites` make both decompositions —
state-build vs action, and suite growth vs per-query slowdown —
machine-readable per round. Late-round-7 tune: the auto gate's
node-count probe is memoized per (corpus, gate) — table-stats metadata,
resolved once, not inside every timed construction (graph_pagerank ~6.3
-> ~5.9 s with the probe out of the timed path).

## Bench-drift accounting (round 6)

Suite wall 7.32 s (r5, 20 queries) -> **~15 s (r6, 23 queries; 15.28 / 14.95 /
14.91 / 15.68 across four runs)**. The delta is
entirely the three NEW entries the round-5 verdict asked for (item 7), timed
under a STRICTER protocol; the carried-over 20 queries sum to ~7.4 s —
unchanged vs r5 within host noise, zero per-query regressions >15%.

Protocol change (`bench.py:FULL_TIMED`): operators that execute work while the
DataFrame is being BUILT — AQE resolves query stages at `toRdd`, so a
`localCheckpoint` inside an iterative op runs real jobs before any action
fires — are now timed from construction start. Action-only timing would have
reported `graph_pagerank` as 0.28 s while 9 of its 10 iterations ran untimed
in construction. Plan-only queries keep the r1-r5 action-only protocol, so the
20-query series stays directly comparable across rounds.

The three additions, honestly costed (each checked against the same
computation on single-node DuckDB at sf0.1, warm best-of-3):

- `graph_pagerank` **5.09-5.63 s** (isolated best-of-3: 4.20 s) vs DuckDB running
  the identical unrolled 10-iteration integer fixed-point as chained CTEs:
  **5.49 s** — Spark beats the single-node engine on identical semantics.
  Round-6 rework: dst-outdeg + damping constants annotated onto the edge list
  once (checkpointed), ONE broadcast join + ONE agg per iteration (was 3
  joins), both union arms of the symmetric edge list from a single
  join+distinct pass (was two full subtree copies). Residual cost is
  local-mode fixed overhead: ~0.2 s/iteration of AQE stage scheduling on 16k
  rank rows — at cluster scale this overhead is noise relative to the
  per-iteration shuffle it schedules.
- `sim_ann_pq_topk` **1.63 s** full-timed (action alone: 0.79 s): construction
  legitimately collects the bounded query set and parses the inlined ADC
  lookup-table literals; codebook training is memoized per corpus (the vetted
  IVF-quantizer ingest pattern).
- `agg_quantile_sketch_merge` **0.53 s**: three window/agg stages over orders;
  per-month KMV sketches then a global bottom-k merge — scale shape is
  |segments|*k rows into the merge, never the raw history.

The round-5 verdict estimated "suite wall stays <= 9 s" for these additions;
that estimate predates both the honest full-timing (pagerank alone is 5 s of
real, measured iterative work — not hideable) and the DuckDB comparison above
showing the cost is competitive, not regressive. Under the r5 action-only
protocol the r6 suite would read ~9.0 s; the bigger number is the honest one.

## Bench-drift accounting (round 5)

The suite drifted 7.52 s (r1) -> 11.26 s (r4) on a fixed query list. Round-5
audit, each headline query vs its best-ever round sample (BENCH_r01..r04 +
the round-5 run): suite wall is back to **7.72 s**, vs a composite
best-ever lower bound of 7.24 s (each per-query best cherry-picked from a
different host state - no single run ever achieved the composite). Named
causes for every query >15% above its best-ever sample:

- `dedup_ngram_jaccard` 1.28 s vs 0.98 s (r3): r3's 0.98 was
  **cache-flattered** - the best-of-2 second pass silently read the
  previous invocation's persisted posting table (documented in the r4
  verdict). The honest cold cost was r4's 2.09 s; round 5's self-pair
  fusion (`functions/dedup.py:_capped_posting_stats`) cut it to 1.28 s,
  a real -39% vs the honest number. No regression.
- `agg_pricing_summary` +19%, `cdc_materialize` +18%,
  `stream_tumbling_daily` +16%, `win_running_total` +30%: absolute
  deltas of 59/43/36/16 ms on sub-0.4 s queries - at or below the
  host-noise floor for a shared 32-thread JVM (run-to-run spread of
  these queries across rounds exceeds the delta). No code on any of
  these paths changed since their best round; plans are byte-identical.

Root causes of the r2-r4 drift, now reversed: (a) the r4 posting-cache
unpersist exposed jaccard's true cold cost (+1.1 s, honesty not
regression, since optimized away); (b) session-warmup cost was being
paid inside the first measured queries; the parallel pre-warm
(`session.py:prewarm`) moved it into session bootstrap where the
reference's own startup numbers account for it.
""")
for name in COMMENTARY:
    df = q[name](spark, SF)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    print(f"## {name}\n")
    print(COMMENTARY[name] + "\n")
    print("```")
    print(plan.strip())
    print("```\n")
