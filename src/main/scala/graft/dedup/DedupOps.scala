package graft.dedup

import graft._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings` (SURVEY §2.V
  * V1/V2): exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash-shuffle on the text key (groupBy), the
  *    canonical Spark shape;
  *  - n-gram Jaccard joins on exploded shingles — correct but quadratic
  *    in the worst case; it is the VERIFY step. The scalable CANDIDATE
  *    step is MinHash banding: candidates are pairs sharing an LSH band
  *    bucket, so the join key is (band_idx, band_hash) and the shuffle
  *    is linear in corpus size. SimHash gives the same shape for
  *    hamming-distance dedup via pigeonhole block keys.
  *  - the exact-Jaccard verification of MinHash candidates touches only
  *    candidate pairs, not all pairs.
  */
object DedupOps extends QueryModule
    with DedupPairing with DedupScrub with DedupLedger
    with DedupAudit {
  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("v1_dedup_exact",
      "V1 exact dedup: hash-groupBy on text, keep min doc_id",
      exactDedup,
      Some("""SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies,
             | md5(text) AS text_hash
             |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin)),
    GraftQuery("v2a_ngram_jaccard",
      "V2 near-dup via 3-word-shingle Jaccard >= 0.5 (exact form)",
      ngramJaccard, Some(jaccardPairsSql)),
    GraftQuery("v2b_minhash_lsh",
      "V2 near-dup via MinHash(32)+LSH(8 bands) candidates + exact " +
        "verify (scale path) — oracled against the exact-Jaccard SQL: " +
        "same verify stage, LSH recall 1.0 on this corpus (see " +
        "jaccardPairsSql doc)",
      minhashLsh, Some(jaccardPairsSql)),
    GraftQuery("v2c_simhash",
      "V2 near-dup via 64-bit SimHash, 8-block pigeonhole join, " +
        "hamming<=7 (hash-specific, no SQL oracle)",
      (s, d) => simhashDedup(s, d), None),
    GraftQuery("v2c2_simhash_agreement",
      "V2c2 SimHash cross-method agreement, ORACLE-WITNESSED: share " +
        "of exact Jaccard pairs the pigeonhole path also flags, " +
        "recomputed by DuckDB from the dumped pair set (v2d2b " +
        "convention)",
      simhashOverlap, Some(simhashOverlapSql)),
    GraftQuery("v22c_winnow_coverage",
      "V22c winnowed-fingerprint coverage, ORACLE-WITNESSED: share " +
        "of exact stride-1 substring-dup pairs the MOSS-sampled path " +
        "reports, recomputed by DuckDB from the dumped pair set",
      winnowCoverage, Some(winnowCoverageSql)),
    GraftQuery("v2e_dup_clusters",
      "V2 duplicate clusters: connected components (min-label propagation) " +
        "over the near-dup pair graph",
      dupClusters,
      Some(s"""WITH RECURSIVE
              | t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
              | s AS (SELECT doc_id, $shinglesSql AS sh FROM t),
              | p AS (SELECT a.doc_id i, b.doc_id j
              |  FROM s a JOIN s b ON a.doc_id < b.doc_id
              |  WHERE ${OracleSql.ratio6("len(list_intersect(a.sh,b.sh))",
                   "len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))")} >= 0.5),
              | e AS (SELECT i, j FROM p UNION SELECT j AS i, i AS j FROM p),
              | reach(a, b) AS (
              |   SELECT i AS a, i AS b FROM e
              |   UNION
              |   SELECT r.a, e.j FROM reach r JOIN e ON r.b = e.i)
              |SELECT a AS doc_id, min(b) AS cluster_id
              |FROM reach GROUP BY a ORDER BY a""".stripMargin)),
    GraftQuery("v73_dedup_threshold_sweep",
      "V73 dedup threshold sweep: flagged pair count, distinct docs " +
        "touched and corpus share at each candidate Jaccard tau — the " +
        "aggressiveness curve behind the threshold decision; one pass " +
        "over the memoized v2a pair frame with an in-row 5-point grid " +
        "explode, aggregates onto the bounded grid frame",
      thresholdSweep, Some(thresholdSweepSql)),
    GraftQuery("v75_split_leakage",
      "V75 split-leakage audit: near-dup pairs straddling the v28 " +
        "train/val/test assignment (the Dodge-et-al eval-integrity " +
        "check) — memoized v2a pair frame + the exact v28 split " +
        "spelling, rolled onto the dense 6-combination grid with " +
        "cross-split flags and worst-pair Jaccard",
      splitLeakage, Some(splitLeakageSql)),
    GraftQuery("v76_split_scrub",
      "V76 eval-protection scrub (v75's repair): train docs with a " +
        "near-dup in val/test are quarantined — eval membership stays " +
        "authoritative so historical scores remain valid; per-doc " +
        "keep/quarantine verdict with the smallest leaked-to eval id",
      splitScrub, Some(splitScrubSql)),
    GraftQuery("v72_quality_dedup_apply",
      "V72 quality-aware dedup apply: per near-dup cluster keep the " +
        "HIGHEST v4b-quality member (ties to lower id) instead of " +
        "v2f's lowest-id rule — the keeper policy production " +
        "pipelines run; argmax window over the pair-graph-sized " +
        "cluster frame, one corpus left_anti",
      qualityDedupApply, Some(qualityDedupApplySql)),
    GraftQuery("v2f_dedup_apply",
      "V2 apply step: left_anti join removes non-representative near-dups",
      dedupApply,
      Some(s"""WITH RECURSIVE
              | t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
              | s AS (SELECT doc_id, $shinglesSql AS sh FROM t),
              | p AS (SELECT a.doc_id i, b.doc_id j
              |  FROM s a JOIN s b ON a.doc_id < b.doc_id
              |  WHERE ${OracleSql.ratio6("len(list_intersect(a.sh,b.sh))",
                   "len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))")} >= 0.5),
              | e AS (SELECT i, j FROM p UNION SELECT j AS i, i AS j FROM p),
              | reach(a, b) AS (
              |   SELECT i AS a, i AS b FROM e
              |   UNION
              |   SELECT r.a, e.j FROM reach r JOIN e ON r.b = e.i),
              | drops AS (
              |   SELECT a AS doc_id FROM reach GROUP BY a
              |   HAVING a <> min(b))
              |SELECT doc_id, lang, source FROM documents
              |WHERE doc_id NOT IN (SELECT doc_id FROM drops)
              |ORDER BY doc_id""".stripMargin)),
    GraftQuery("v22_substring_dup",
      "V22 substring-level dup pairs: docs sharing >=5 distinct 40-char " +
        "windows (stride-1 exact; boilerplate frequency ceiling bounds " +
        "the pair join) — the span-copy granularity V1/V2 miss",
      (s, d) => substringDups(s, d), Some(substringSql)),
    GraftQuery("v22b_substring_dup_winnowed",
      "V22b winnowed fingerprints (MOSS scheme, b=8): ~2/(b+1) of the " +
        "stride-1 windows, spans >=47 chars still guaranteed found; " +
        "rows-only (engine-hash selection), guarantees pinned in " +
        "ExtendedOpsSpec",
      (s, d) => substringDupsWinnowed(s, d), None),
    GraftQuery("v20_incremental_dedup",
      "V20 incremental dedup: incoming batch anti-joined against the " +
        "existing ledger on the normalized content hash (exact form)",
      incrementalDedup, Some(incrementalSql)),
    GraftQuery("v20b_incremental_dedup_bloom",
      "V20 via the Bloom runtime-filter shape: BloomFilterAggregate " +
        "ledger sketch + codegen might_contain prunes incoming to the " +
        "candidate fraction before the exact anti-join — same oracle " +
        "as v20 (false positives removed by the residual join)",
      (s, d) => incrementalDedupBloom(s, d), Some(incrementalSql)),
    GraftQuery("v20c_incremental_neardup",
      "V20c incremental near-dup: arriving batch probed against the " +
        "ledger's STORED LSH band index (memoized ingest artifact) — " +
        "O(delta) candidate probe + exact-Jaccard verify on candidates " +
        "only, never a ledger self-pairing; per incoming doc the dup " +
        "flag, smallest matching ledger id and its Jaccard",
      incrementalNearDup, Some(incrementalNearDupSql)),
    GraftQuery("st24_streaming_neardup_gate",
      "ST24 streaming near-dup gate: arriving docs probed against the " +
        "stored LSH band index at ingest — in-row MinHash signature " +
        "(stateless, same band spelling as the index), two static " +
        "joins, exact-Jaccard verify in-row, pair-keyed dedup; every " +
        "(arriving, ledger, jaccard) decision emitted append-mode",
      streamingNearDupGate, Some(streamingNearDupSql)),
    GraftQuery("st25_streaming_ingest_dag",
      "ST25 composed streaming ingest DAG — the production crawler's " +
        "gate chain on every arriving doc in ONE streaming plan: " +
        "exact-dup (ledger hash) -> near-dup (stored band index) -> " +
        "benchmark membership / contamination (broadcast benchmark " +
        "row) -> in-row span scrub for survivors; first-failing-gate " +
        "verdict + scrub report, one spelling per gate shared with " +
        "the standalone operators",
      streamingIngestDag, Some(streamingIngestDagSql)),
    GraftQuery("v2d2_embedding_neardup_ivf",
      "V2 embedding near-dup via multi-probe IVF candidates + exact " +
        "verify (100 TB shape; recall vs exact pinned in DedupSpec " +
        "and oracle-witnessed as v2d2b)",
      (s, d) => embeddingNearDupIvf(s, d,
        graft.sim.SimilarityOps.adaptiveNlist(s, d)), None),
    GraftQuery("v67_span_scrub",
      "V67 exact repeated-span SCRUBBING (the Lee-et-al removal step " +
        "v22 only detects): every 8-word window occurring in >=2 docs " +
        "is removed from every doc except the lowest-id holder; " +
        "per-doc scrub report with the cleaned text md5-witnessed — " +
        "one explode + hash-keyed aggregate/join, no pair join",
      spanScrub, Some(spanScrubSql)),
    GraftQuery("st19_streaming_span_scrub",
      "ST19 streaming span scrub: v67 as an ingest-time gate — the " +
        "duplicated-window ledger (hash -> first holder) broadcast as " +
        "one map row, arriving docs scrub themselves in-row; " +
        "stateless append map, finite stream == batch, shares v67's " +
        "oracle",
      streamingSpanScrub, Some(spanScrubSql)),
    GraftQuery("v69_benchmark_scrub",
      "V69 benchmark span scrub: v16's decontamination as REMOVAL — " +
        "every 8-word window of a corpus doc that also occurs in the " +
        "benchmark (doc_id%7 slice) is cut out, document kept; " +
        "per-doc report with cleaned-text md5, zero-hit docs included " +
        "— broadcast benchmark window hashes, linear corpus scan",
      benchmarkScrub, Some(benchmarkScrubSql)),
    GraftQuery("v16_decontamination",
      "V16 benchmark decontamination: corpus docs whose shingle set " +
        "overlaps the pooled benchmark (doc_id%97) shingles >= 0.05 " +
        "containment — broadcast semi-join, linear in corpus size",
      (s, d) => decontaminate(s, d), Some(decontaminateSql)),
    GraftQuery("v16c_decontamination_fixedbench",
      "V16c deployment-shape decontamination: the v16 plan with the " +
        "benchmark slice held at a FIXED size (doc_id%97==0 AND " +
        "doc_id<500 — six ids at every SF, constant under corpus " +
        "blow-up), the st21c convention applied to decontam; grades " +
        "the configuration whose x100 ScaleBench row is <= linear " +
        "instead of the co-growing %97 fixture",
      (s, d) => decontaminateFixedBench(s, d),
      Some(decontaminateFixedSql)),
    GraftQuery("v16b_semantic_decontamination",
      "V16b semantic decontamination: corpus vectors with cosine >= " +
        "0.3 to any benchmark embedding (vec_id%97 slice) — benchmark " +
        "folded into one broadcast row, per-vector max cosine in-row: " +
        "linear scan, zero extra shuffle",
      (s, d) => semanticDecontaminate(s, d),
      Some(semanticDecontaminateSql)),
    GraftQuery("st17_streaming_decontamination",
      "ST17 streaming decontamination: v16 as an ingest-time gate — " +
        "broadcast benchmark shingles, per-document containment " +
        "computed in-row, stateless append map; finite stream == batch " +
        "so it shares v16's oracle",
      (s, d) => streamingDecontaminate(s, d), Some(decontaminateSql)),
    GraftQuery("v2d2b_ivf_recall",
      "V2d2 candidate-path recall, oracle-witnessed: engine dumps its " +
        "IVF pairs; DuckDB recomputes |ivf ∩ exact|/|exact| against its " +
        "own exact-pair SQL — hash match = independent agreement on " +
        "what the candidates found and missed",
      ivfRecall, Some(ivfRecallSql)),
    GraftQuery("v50_semantic_prune",
      "V50 SemDeDup semantic pruning: within each semantic block " +
        "(label; IVF cells at scale) keep the lowest-id vector of " +
        "every cos>=0.35 neighborhood, prune the rest — the dedup " +
        "DECISION with its pruning witness (max prior cosine)",
      (s, d) => semanticPrune(s, d), Some(semanticPruneSql)),
    GraftQuery("v50b_semantic_prune_kmeans",
      "V50b unsupervised SemDeDup: blocks are the v47 exact k-means " +
        "cells (the composition the paper runs — cluster, then " +
        "keep-first prune within each cluster); DuckDB reruns the " +
        "identical Lloyd unroll so even the cell map is hash-agreed",
      (s, d) => semanticPruneKmeans(s, d), Some(semanticPruneKmeansSql)),
    GraftQuery("v50c_semantic_prune_adaptive",
      "V50c the SemDeDup DEPLOYMENT shape driver-graded (the st21c " +
        "convention): v50b with the cell count grown alongside the " +
        "corpus (adaptiveCoarseK, cells of ~250) so expected block " +
        "size — and with it the within-block pair work per vector — " +
        "stays CONSTANT as the corpus scales; v50's fixed label set " +
        "is the co-growing-block degenerate case (quadratic pair " +
        "count, SCALING.md round 12). adaptiveCoarseK == 8 at every " +
        "driver SF, so the oracle replays v50b's shared Lloyd chain",
      (s, d) => semanticPruneKmeans(s, d,
        cellK = graft.sim.PqOps.adaptiveCoarseK(s, d)),
      Some(semanticPruneKmeansSql)),
    GraftQuery("v2d_embedding_neardup",
      "V2 embedding-cosine near-dup pairs (cos >= 0.4), exact " +
        "block-partitioned pair join (no unbounded broadcast)",
      embeddingNearDup,
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
             |       CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings)
             |SELECT a.vec_id AS i, b.vec_id AS j,
             | round(list_dot_product(a.v, b.v)/(a.nrm*b.nrm),6) AS cos
             |FROM e a JOIN e b ON a.vec_id < b.vec_id
             |WHERE round(list_dot_product(a.v, b.v)/(a.nrm*b.nrm),6) >= 0.4
             |ORDER BY i, j""".stripMargin)))
}
