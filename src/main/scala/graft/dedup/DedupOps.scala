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
object DedupOps extends QueryModule {
  private val Tau = 0.5 // near-dup Jaccard threshold

  /** v16's shingle-containment threshold — ONE definition shared by
    * the standalone gate (Spark default + oracle SQL) and the st25
    * ingest DAG (review finding, r8: independent 0.05 literals let
    * the composed gate silently diverge from the operator it
    * composes). */
  private[graft] val ContamTau = 0.05

  /** Distinct 3-word shingle strings of `text` — the fused single-pass
    * expression; string output keeps the DuckDB oracle's shingle
    * semantics byte-for-byte. */
  private def shingles: Column =
    graft.functions.ShingleFunctions.shingle_strings(col("text"))

  /** V1: exact dedup — hash-groupBy on the full text; keeps min doc_id
    * (the Spark-native `dropDuplicates` semantics, made deterministic). */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("text_hash"))
      .orderBy(col("keep_id"))

  /** Per-doc distinct shingle sets with sizes. */
  private def shingleSets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), shingles.as("sh"))
      .withColumn("sz", size(col("sh")))

  /** V2a: n-gram (3-word shingle) Jaccard near-dup pairs — the exact
    * count-based form: explode shingles, self-join on shingle, count
    * intersections in a hash aggregate. MEASURED faster than the
    * prefix-filtered alternative on this corpus (4.2 s vs 9.4 s at
    * sf0.1): with ~52 shingles/doc, weak frequency skew and τ=0.5, the
    * prefix join still emits ~409k candidates and the verify join drags
    * two full string arrays per candidate, while this form shuffles
    * narrow (i,j) rows straight into partial aggregation. See
    * [[ngramJaccardPrefix]] for the regime where prefix filtering wins. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    // memoized ([[graft.util.PlanMemo]]): FIVE consumers per process
    // share this one exact plan (the v2a entry, v2c2's witness baseline,
    // v2e's pair graph, v2f's apply step, and DedupSpec's equality pins)
    // — computed once, stored, read four more times. ORDER BY re-applied
    // on the (tiny) read side; the pair set itself is deterministic.
    graft.util.PlanMemo.memo(spark, "v2a_jaccard", dir)(
      ngramJaccardPlan(spark, dir))
      .orderBy(col("i"), col("j"))

  private[graft] def ngramJaccardPlan(spark: SparkSession,
      dir: String): DataFrame = {
    val sets = shingleSets(spark, dir)
    // cache: both join sides derive from the same shingle explosion
    val ex = sets.select(col("doc_id"), col("sz"),
      explode(col("sh")).as("shingle")).cache()
    val a = ex.select(col("doc_id").as("i"), col("sz").as("sz_i"),
      col("shingle"))
    val b = ex.select(col("doc_id").as("j"), col("sz").as("sz_j"),
      col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("i") < col("j"))
      .groupBy(col("i"), col("j"), col("sz_i"), col("sz_j"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", Exact.ratio6(col("inter"),
        col("sz_i") + col("sz_j") - col("inter")))
      .filter(col("jaccard") >= Tau)
      .select(col("i"), col("j"), col("jaccard"))
      .orderBy(col("i"), col("j"))
  }

  /** EXACT alternative via prefix filtering (the SSJoin/PPJoin lemma):
    * under any global total order on shingles, a pair with J(A,B) ≥ τ
    * MUST share a shingle inside both documents' prefixes of length
    * |S| - ⌈τ·|S|⌉ + 1; ordering by (document frequency asc, shingle)
    * makes the prefix join touch only rare-shingle occurrences.
    * Equality with [[ngramJaccard]] is pinned in DedupSpec. The win
    * condition is long documents, high τ and heavy df skew (prefix
    * shrinks with τ, and frequent shingles — the quadratic join terms —
    * fall outside it); on THIS corpus (short docs, τ=0.5, max df 25)
    * the candidate-verify join costs more than the count-based form,
    * so it is the documented alternative, not the registered entry. */
  def ngramJaccardPrefix(spark: SparkSession, dir: String): DataFrame = {
    val sets = shingleSets(spark, dir).cache()
    val ex = sets.select(col("doc_id"), col("sz"),
      explode(col("sh")).as("shingle"))
    val freq = ex.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    val pref = ex.join(freq, Seq("shingle"))
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= col("sz") - ceil(col("sz") * Tau) + 1)
      .select(col("doc_id"), col("shingle"))
    val cands = pref.select(col("doc_id").as("i"), col("shingle"))
      .join(pref.select(col("doc_id").as("j"), col("shingle")),
        Seq("shingle"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j")).distinct()
    verifyJaccard(cands, sets)
  }

  /** Exact-Jaccard verification of candidate pairs against the shingle
    * sets — shared by the prefix-filtered exact join and MinHash LSH. */
  private def verifyJaccard(cands: DataFrame, sets: DataFrame): DataFrame = {
    val si = sets.select(col("doc_id").as("i"), col("sh").as("sh_i"),
      col("sz").as("sz_i"))
    val sj = sets.select(col("doc_id").as("j"), col("sh").as("sh_j"),
      col("sz").as("sz_j"))
    cands.join(si, Seq("i")).join(sj, Seq("j"))
      .withColumn("inter", size(array_intersect(col("sh_i"), col("sh_j"))))
      .withColumn("jaccard", Exact.ratio6(col("inter"),
        col("sz_i") + col("sz_j") - col("inter")))
      .filter(col("jaccard") >= Tau)
      .select(col("i"), col("j"), col("jaccard"))
      .orderBy(col("i"), col("j"))
  }

  // ---- MinHash + LSH banding (V2b) ----
  private val NumPerm = 32
  private val Bands = 8 // 4 rows per band
  private[graft] val Prime = 2147483647L
  /** Fixed permutation coefficients (seeded — stable across runs). */
  private[graft] val coefs: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPerm)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash signatures: fused shingle hashes
    * ([[graft.functions.ShingleHashes]]) folded through all NumPerm
    * affine permutations in ONE compiled pass per row
    * ([[graft.functions.MinHashSig]]) — a pure per-row projection.
    * (The previous form exploded hashes into a 32-min groupBy: a
    * corpus-sized SHUFFLE for numbers that never leave the row;
    * FunctionsSpec pins bit-equality of the two spellings.) The
    * explode form dropped BOTH null-text docs AND non-null docs too
    * short to shingle (<3 words) — they had no rows to aggregate.
    * The fused form must filter both: a doc with zero shingles would
    * otherwise get an all-sentinel (Long.MaxValue) signature, making
    * every tiny doc a pairwise LSH candidate of every other (an
    * O(m^2) hot bucket) and feeding 0/0 into the Jaccard verify. */
  private[graft] def signatures(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .withColumn("sh",
        graft.functions.ShingleFunctions.shingle_hashes(col("text")))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", graft.functions.MinHashFunctions.minhash_sig(
        col("sh"), coefs, Prime))
      .select(Seq(col("doc_id")) ++ (0 until NumPerm).map(k =>
        col("sig").getItem(k).as(s"m$k")): _*)

  /** The 8 LSH band hashes over signature columns m0..m31 — ONE
    * spelling for the batch banding (groupBy-built signatures) and the
    * streaming in-row signature path (st24), so the stored index and
    * the stream probe cannot disagree on a bucket. */
  private def bandHashCols: Seq[Column] =
    (0 until Bands).map { bi =>
      hash((4 * bi until 4 * bi + 4).map(k => col(s"m$k")): _*).cast("long")
    }

  /** (doc_id, band_idx, band_hash) LSH bucket rows — the banding step
    * shared by the all-pairs candidate join (v2b) and the stored band
    * INDEX the incremental probe (v20c) maintains at ingest. */
  private def bandedBuckets(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      posexplode(array(bandHashCols: _*)).as(Seq("band_idx", "band_hash")))

  /** Candidate pairs sharing at least one LSH band bucket. */
  private[graft] def lshCandidates(sigs: DataFrame): DataFrame = {
    val banded = bandedBuckets(sigs)
    val x = banded.select(col("doc_id").as("i"), col("band_idx"),
      col("band_hash"))
    val y = banded.select(col("doc_id").as("j"), col("band_idx"),
      col("band_hash"))
    x.join(y, Seq("band_idx", "band_hash"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j")).distinct()
  }

  /** V2b: MinHash+LSH near-dup — banded candidates, then exact-Jaccard
    * verification restricted to candidates. Same output contract as
    * [[ngramJaccard]]; the scalable path. No oracle (murmur3 is
    * Spark-specific) — equivalence to V2a is pinned in DedupSpec. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sets = shingleSets(spark, dir).cache()
    val cands = lshCandidates(signatures(Tables.documents(spark, dir)))
    verifyJaccard(cands, sets)
  }

  // ---- SimHash (V2c) ----

  /** 64-bit SimHash per doc over 3-word shingle features (order-sensitive;
    * unigram features saturate on small vocabularies — every doc shares
    * nearly the same word SET — while shingles track sequence similarity,
    * aligning SimHash distance with shingle-Jaccard).
    *
    * Computed WITHOUT a shuffle: hash the shingle array once per row and
    * fold it through the codegen'd [[graft.functions.SimHash64]]
    * expression — one projection, map-side only. (The explode + 64-way
    * groupBy form costs a 500k-row shuffle at sf0.1; 64 `size(filter())`
    * higher-order calls are CodegenFallback and slower still.) */
  def simhashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.SimHashFunctions.simhash64(
        graft.functions.ShingleFunctions.shingle_hashes(col("text")))
        .as("simhash"))

  /** V2c: SimHash near-dup — pigeonhole block join (8 x 8-bit blocks: a
    * pair within hamming ≤ 7 MUST agree on at least one block), then
    * exact hamming filter. Linear-shuffle candidate generation, like
    * MinHash banding. */
  def simhashDedup(spark: SparkSession, dir: String,
      maxHamming: Int = 7): DataFrame = {
    val sigs = simhashes(Tables.documents(spark, dir))
    val blocks = (0 until 8).map(k =>
      shiftright(col("simhash"), 8 * k).bitwiseAND(lit(0xFFL)))
    val keyed = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array(blocks: _*)).as(Seq("blk_idx", "blk")))
    val x = keyed.select(col("doc_id").as("i"), col("simhash").as("h_i"),
      col("blk_idx"), col("blk"))
    val y = keyed.select(col("doc_id").as("j"), col("simhash").as("h_j"),
      col("blk_idx"), col("blk"))
    x.join(y, Seq("blk_idx", "blk"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"),
        bit_count(col("h_i").bitwiseXOR(col("h_j"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("i"), col("j"))
  }

  /** Embeddings with double-cast vectors and norms — the shared
    * projection from [[graft.sim.SimilarityOps]] (sequential-fold dot,
    * bit-identical to the oracle's list_dot_product). */
  private def normedEmbeddings(spark: SparkSession, dir: String): DataFrame =
    graft.sim.SimilarityOps.withNorm(Tables.embeddings(spark, dir))

  /** Number of id-blocks for the exact pair join: bounds every task to a
    * block-pair's worth of comparisons and gives B-way parallelism. */
  private val PairBlocks = 64

  /** V2d: embedding-cosine near-dup pairs (cos ≥ 0.4) — the EXACT
    * threshold join, executed as a block-partitioned shuffle join: the
    * left side keys each vector by `vec_id % B`, the right side is
    * replicated to all B blocks, and the join runs B-way parallel with no
    * broadcast of an unbounded table side (the earlier theta-join form
    * compiled to a single-task BroadcastNestedLoopJoin — 12.6 s at sf0.1
    * and a fact-sized broadcast at scale).
    *
    * Why this stays the oracle entry instead of an LSH/IVF candidate
    * path: at τ=0.4 the qualifying pairs are the tail of a CONTINUOUS
    * cosine distribution (max pairwise cos ≈ 0.51 in the testdata — no
    * planted high-cosine dups), so no candidate scheme prunes without
    * losing pairs. Measured on this data: 1-probe IVF cells recall 0.19
    * (nlist=16); 4-probe recall 0.94 while touching 72% of ALL pairs.
    * Exact-at-threshold is therefore quadratic by definition; the
    * sub-quadratic near-dup paths for genuinely-near thresholds are V2b
    * (MinHash LSH), V2c (SimHash) and V3c (celled kNN), plus
    * [[embeddingNearDupIvf]] as the candidates+verify shape on this very
    * query (registered, recall pinned in spec). */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.dot_product
    val e = normedEmbeddings(spark, dir)
    val a = e.select(pmod(col("vec_id"), lit(PairBlocks)).cast("int")
        .as("blk"),
      col("vec_id").as("i"), col("v").as("v_i"), col("nrm").as("n_i"))
    val b = e.select(col("vec_id").as("j"), col("v").as("v_j"),
      col("nrm").as("n_j"),
      explode(sequence(lit(0), lit(PairBlocks - 1))).as("blk"))
    // the hint marks the BUILD side: it must be `a` (N/B rows per block),
    // NOT the replicated `b` whose every block partition holds the whole
    // table — hinting b would rebuild the unbounded in-memory side this
    // join exists to avoid. PlanSpec pins BuildLeft.
    a.hint("shuffle_hash").join(b, Seq("blk"))
      .filter(col("i") < col("j")) // before the dot: only N²/2 evals
      .withColumn("cos", round(
        dot_product(col("v_i"), col("v_j")) / (col("n_i") * col("n_j")), 6))
      .filter(col("cos") >= 0.4)
      .select(col("i"), col("j"), col("cos"))
      .orderBy(col("i"), col("j"))
  }

  /** V50: SemDeDup-style semantic pruning — the dedup DECISION layered
    * on the near-dup machinery: within each semantic block (the `label`
    * column — a cluster assignment stands exactly here in the SemDeDup
    * paper; v3b's IVF cells are the unsupervised drop-in), a vector is
    * pruned when some LOWER-ID vector of the same block sits above the
    * cosine threshold — the deterministic keep-first rule, so exactly
    * one representative of every tight semantic neighborhood survives.
    * Output carries the pruning witness (max cosine against any prior
    * same-block vector, 6 dp).
    *
    * Scale: the pair work is quadratic ONLY within a block — which is
    * the entire point of SemDeDup: cluster first so the quadratic term
    * is bounded by cluster size, not corpus size. An unguarded
    * block-keyed join would still put each WHOLE block on one task, so
    * one oversized semantic cluster (exactly what real corpora have)
    * becomes a single-task quadratic blowup. Guard: the v3c subcell
    * salt, adapted to keep the keep-first rule EXACT — a row j must see
    * every lower-id same-block row i, so the higher-id (probe) side is
    * salted into ONE of `n_sub = ceil(block_n / maxBlockSize)` subcells
    * by vec_id hash while the lower-id (prior) side is REPLICATED across
    * all subcells. Every i<j pair meets exactly once (j lives in one
    * subcell; i is present in all of them), so the result — and the
    * DuckDB oracle — is bit-identical to the unsalted join, while each
    * task's pair product drops from block_n² to ~block_n·maxBlockSize
    * and tasks parallelize n_sub-ways. Replication cost is
    * block_n·n_sub rows ≈ block_n²/maxBlockSize — linear in the number
    * of pairs each i-row must anyway serve, not a new term. At sane
    * block sizes (n_sub = 1) the plan is the plain block join.
    * DedupSpec pins the bound on an all-one-label fixture. */
  def semanticPrune(spark: SparkSession, dir: String,
      tau: Double = 0.35, maxBlockSize: Int = 4096): DataFrame = {
    import graft.functions.VectorFunctions.dot_product
    // project label INLINE next to v/nrm — one scan, no recovery join
    // (review finding, round 6)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").as("blk"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot_product(col("v"), col("v"))))
    saltedSemanticPrune(e, tau, maxBlockSize)
      .withColumnRenamed("blk", "label")
      .select(col("vec_id"), col("label"), col("max_prior_cos"),
        col("pruned"))
  }

  /** The salted keep-first prune over any (blk, vec_id, v, nrm) frame —
    * the shared core of v50 (blk = label) and v50b (blk = v47 k-means
    * cell). See [[semanticPrune]]'s scaladoc for the exactness argument:
    * the j side lands in one subcell, the i side is replicated across
    * all of them, so every i<j pair meets exactly once and the result
    * is bit-identical to the unsalted block join. */
  private[graft] def saltedSemanticPrune(e: DataFrame, tau: Double,
      maxBlockSize: Int): DataFrame = {
    import graft.functions.VectorFunctions.dot_product
    val sizes = e.groupBy(col("blk")).agg(count(lit(1)).as("blk_n"))
    // ≤ |blocks| rows — broadcastable by construction
    val sized = e.join(broadcast(sizes), Seq("blk"))
      .withColumn("n_sub",
        greatest(lit(1L), ceil(col("blk_n") / maxBlockSize)).cast("int"))
    val a = sized.select(col("blk"),
      explode(sequence(lit(0), col("n_sub") - 1)).as("sub"),
      col("vec_id").as("i"), col("v").as("v_i"), col("nrm").as("n_i"))
    val b = sized.select(col("blk"),
      pmod(xxhash64(col("vec_id")), col("n_sub")).cast("int").as("sub"),
      col("vec_id").as("j"), col("v").as("v_j"), col("nrm").as("n_j"))
    // build the UNreplicated j side (~maxBlockSize rows per (blk,sub)
    // partition); the replicated i side streams — same convention as
    // the v3c cell join
    val maxPrior = a.join(b.hint("shuffle_hash"), Seq("blk", "sub"))
      .filter(col("i") < col("j"))
      .withColumn("cos", round(
        dot_product(col("v_i"), col("v_j")) / (col("n_i") * col("n_j")), 6))
      .groupBy(col("j")).agg(max(col("cos")).as("max_prior_cos"))
    e.select(col("vec_id"), col("blk"))
      .join(maxPrior, col("vec_id") === col("j"), "left")
      .select(col("vec_id"), col("blk"), col("max_prior_cos"),
        coalesce(col("max_prior_cos") >= tau, lit(false)).as("pruned"))
      .orderBy(col("vec_id"))
  }

  /** V50b: the UNSUPERVISED SemDeDup composition — the form the paper
    * actually runs: blocks are not a given label but the v47 exact
    * k-means cells (cluster first, then keep-first-prune within each
    * cluster). Every stage is oracle-checked: DuckDB reruns the
    * identical integer-micro Lloyd unroll (the lloydChainSql
    * convention), derives the same cell map, and hash-matches the prune
    * verdicts — so even the cluster assignment feeding the dedup
    * decision is engine-agreed. Same salted pair join as v50. */
  def semanticPruneKmeans(spark: SparkSession, dir: String,
      tau: Double = 0.35, maxBlockSize: Int = 4096): DataFrame = {
    import graft.functions.VectorFunctions.dot_product
    val cells = graft.sim.ClusterOps.finalAssign(spark, dir)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot_product(col("v"), col("v"))))
      .join(cells, Seq("vec_id"))
      .select(col("vec_id"), col("cid").as("blk"), col("v"), col("nrm"))
    saltedSemanticPrune(e, tau, maxBlockSize)
      .withColumnRenamed("blk", "cluster")
      .select(col("vec_id"), col("cluster"), col("max_prior_cos"),
        col("pruned"))
  }

  private lazy val semanticPruneKmeansSql: String =
    s"""${graft.sim.ClusterOps.lloydChainSql},
       | e AS (SELECT em.vec_id, fa.cid,
       |   CAST(em.embedding AS DOUBLE[]) AS v,
       |   sqrt(list_dot_product(CAST(em.embedding AS DOUBLE[]),
       |        CAST(em.embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings em JOIN fa ON fa.vec_id = em.vec_id),
       | p AS (SELECT b.vec_id AS j,
       |   max(round(list_dot_product(a.v, b.v)/(a.nrm*b.nrm), 6)) AS mpc
       |  FROM e a JOIN e b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  GROUP BY 1)
       |SELECT e.vec_id, e.cid AS cluster, p.mpc AS max_prior_cos,
       | coalesce(p.mpc >= 0.35, false) AS pruned
       |FROM e LEFT JOIN p ON p.j = e.vec_id
       |ORDER BY e.vec_id""".stripMargin

  private val semanticPruneSql: String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
       |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |       CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings),
       | p AS (SELECT b.vec_id AS j,
       |   max(round(list_dot_product(a.v, b.v)/(a.nrm*b.nrm), 6)) AS mpc
       |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |  GROUP BY 1)
       |SELECT e.vec_id, e.label, p.mpc AS max_prior_cos,
       | coalesce(p.mpc >= 0.35, false) AS pruned
       |FROM e LEFT JOIN p ON p.j = e.vec_id
       |ORDER BY e.vec_id""".stripMargin

  // ---- V67: exact repeated-span SCRUBBING (the removal operator) ----

  /** Span-scrub window width (words). Production exact-substring dedup
    * (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better") removes repeats of ~50 BPE tokens found via suffix
    * arrays; fixed-width word windows give the same removal decision
    * for any repeat ≥ W words, in plain dataflow. */
  val ScrubWindow = 8

  /** (doc_id, s, h): every [[ScrubWindow]]-word window's 1-based start
    * and md5 hash over a (doc_id, w) frame — THE window spelling (
    * lowercase words, single-space join, md5 of the W-word slice)
    * shared by v67, st19's ledger and v69 (review finding, round 8:
    * independent copies would let a tokenization tweak silently turn
    * another scrub into a no-op). st19's stream side keeps the IN-ROW
    * expression twin of this spelling; DuckDB side:
    * [[scrubWindowCtes]]. */
  private def scrubWindows(d: DataFrame): DataFrame = {
    val W = ScrubWindow
    d.filter(size(col("w")) >= W)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), size(col("w")) - (W - 1))).as("s"))
      .select(col("doc_id"), col("s"),
        md5(array_join(slice(col("w"), col("s"), lit(W)), " ")).as("h"))
  }

  /** DuckDB spelling of the `sd`/`so` window CTEs behind
    * [[scrubWindows]]. */
  private lazy val scrubWindowCtes: String = {
    val W = ScrubWindow
    s"""sd AS (SELECT doc_id, string_split(lower(text), ' ') AS w
       |  FROM documents WHERE text IS NOT NULL),
       | so AS (SELECT doc_id, s,
       |   md5(array_to_string(list_slice(w, s, s + ${W - 1}), ' ')) AS h
       |  FROM (SELECT doc_id, w,
       |          unnest(range(1, len(w) - ${W - 2})) AS s
       |        FROM sd WHERE len(w) >= $W))""".stripMargin
  }

  /** V67: the fourth dedup granularity completed — v1 removes whole
    * duplicate DOCS, v2f near-dup docs, v50 semantic neighbors, v22
    * only DETECTS copied spans; this operator REMOVES them. Every
    * [[ScrubWindow]]-word window occurring in ≥ 2 documents is
    * scrubbed from every document EXCEPT the lowest-doc_id holder
    * (keep-first, the v1/v50 convention): a word is dropped when any
    * duplicated window covering it belongs to a later doc. Output is
    * the per-doc scrub report with the cleaned text witnessed by md5 —
    * the operator that turns v22's findings into training data.
    *
    * Scale shape: one explode to (doc, start, window-hash) rows, one
    * hash-keyed aggregate for (first holder, occurrence count), one
    * hash-keyed join back, one doc-keyed aggregate of removed
    * positions, rebuild in-row — all linear in corpus token count, no
    * pair join anywhere (the hash aggregate replaces the suffix
    * array). */
  def spanScrub(spark: SparkSession, dir: String): DataFrame = {
    val W = ScrubWindow
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
    val occ = scrubWindows(d)
    val firsts = occ.groupBy(col("h"))
      .agg(min(col("doc_id")).as("keep_doc"), count(lit(1)).as("n_occ"))
    val scrubbed = occ.join(firsts, Seq("h"))
      .filter(col("n_occ") >= 2 && col("doc_id") > col("keep_doc"))
    val removed = scrubbed
      .select(col("doc_id"),
        explode(sequence(col("s"), col("s") + (W - 1))).as("p"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_removed"),
        sort_array(collect_list(col("p").cast("long"))).as("ps"))
    d.join(removed, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("w")).as("n_words"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        md5(array_join(
          when(col("ps").isNull, col("w")).otherwise(
            filter(col("w"), (_, i) =>
              !array_contains(col("ps"), i.cast("long") + 1L))),
          " ")).as("clean_hash"))
      .orderBy(col("doc_id"))
  }

  private lazy val spanScrubSql: String = {
    val W = ScrubWindow
    s"""WITH $scrubWindowCtes,
       | sg AS (SELECT h, min(doc_id) AS keep_doc, count(*) AS n_occ
       |        FROM so GROUP BY 1),
       | sp AS (SELECT DISTINCT so.doc_id, unnest(range(so.s, so.s + $W))
       |          AS p
       |  FROM so JOIN sg USING (h)
       |  WHERE sg.n_occ >= 2 AND so.doc_id > sg.keep_doc),
       | sr AS (SELECT doc_id, count(*) AS n_removed,
       |         list(p ORDER BY p) AS ps
       |        FROM sp GROUP BY 1)
       |SELECT sd.doc_id, CAST(len(sd.w) AS INT) AS n_words,
       | CAST(coalesce(sr.n_removed, 0) AS BIGINT) AS n_removed,
       | md5(coalesce(array_to_string(CASE WHEN sr.ps IS NULL THEN sd.w
       |   ELSE list_filter(sd.w,
       |          (x, i) -> NOT list_contains(sr.ps, i)) END,
       |   ' '), '')) AS clean_hash
       |FROM sd LEFT JOIN sr USING (doc_id)
       |ORDER BY sd.doc_id""".stripMargin
  }

  /** ST19: STREAMING span scrub — v67 as an ingest-time gate (copied
    * spans removed before a document lands), the st17 convention for
    * the span granularity: the duplicated-window LEDGER (hash →
    * first-holder doc id, only hashes occurring ≥ 2×) is computed
    * batch-side, folded into ONE broadcast map row (localCheckpointed
    * — broadcast sides re-execute per micro-batch), and each arriving
    * document scrubs itself IN-ROW: window hashes looked up in the
    * map, covered positions flattened/deduped, words rebuilt. A
    * stateless append map, so the finite stream equals batch v67 and
    * SHARES its oracle. At a ledger too large for one map row, the
    * v20b Bloom runtime filter is the membership probe (candidates
    * then pay a keyed join). */
  /** The duplicated-window ledger as ONE bucketed broadcast row — a
    * stored artifact (PlanMemo — a production corpus maintains its
    * dup-window ledger ingest-side, consumers read it): one row whose
    * 256 prefix buckets hold the (hash, first-holder) structs, so a
    * per-window probe is an O(1) array index + a ~|ledger|/256-entry
    * struct scan — no map (a Spark map element_at linear-scans every
    * entry: 17.8 s at sf0.1 before this layout). Shared by st19 and
    * the st25 ingest DAG. */
  private def scrubLedgerRow(spark: SparkSession, dir: String): DataFrame =
    graft.util.PlanMemo.memo(spark, "st19_ledger", dir) {
      scrubWindows(
        Tables.documents(spark, dir).filter(col("text").isNotNull)
          .select(col("doc_id"), split(lower(col("text")), " ").as("w")))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("keep_doc"), count(lit(1)).as("n_occ"))
        .filter(col("n_occ") >= 2)
        .agg(array_sort(collect_list(struct(col("h"), col("keep_doc"))))
          .as("dup"))
        .withColumn("dupB", transform(sequence(lit(0), lit(255)), b =>
          filter(col("dup"), e =>
            conv(substring(e.getField("h"), 1, 2), 16, 10).cast("long")
              === b.cast("long"))))
        .drop("dup")
    }.localCheckpoint()

  /** In-row scrub over a frame carrying (doc_id, w) already
    * crossJoined with [[scrubLedgerRow]]'s `dupB` bucket map: appends
    * n_words / n_removed / clean_hash and drops the probe scratch.
    * Membership per window is an O(1) bucket index + a bucket-sized
    * struct scan; a matching entry scrubs iff its first holder
    * precedes this doc. One spelling for st19 and st25. */
  private def withInRowScrub(df: DataFrame): DataFrame = {
    val W = ScrubWindow
    df.withColumn("starts",
        when(size(col("w")) >= W,
          sequence(lit(1), size(col("w")) - (W - 1)))
          .otherwise(array().cast("array<int>")))
      .withColumn("wh", transform(col("starts"), s =>
        md5(array_join(slice(col("w"), s, lit(W)), " "))))
      .withColumn("hits",
        filter(arrays_zip(col("starts"), col("wh")), p => {
          val m = try_element_at(
            filter(
              element_at(col("dupB"),
                (conv(substring(p.getField("wh"), 1, 2), 16, 10)
                  .cast("int") + 1)),
              e => e.getField("h") === p.getField("wh")), lit(1))
          m.isNotNull && m.getField("keep_doc") < col("doc_id")
        }))
      .withColumn("ps", array_sort(array_distinct(flatten(
        transform(col("hits"), p =>
          sequence(p.getField("starts").cast("long"),
            p.getField("starts").cast("long") + (W - 1)))))))
      .withColumn("n_words", size(col("w")))
      .withColumn("n_removed", size(col("ps")).cast("long"))
      .withColumn("clean_hash", md5(array_join(
        filter(col("w"), (_, i) =>
          !array_contains(col("ps"), i.cast("long") + 1L)), " ")))
      .drop("starts", "wh", "hits", "ps", "dupB")
  }

  def streamingSpanScrub(spark: SparkSession, dir: String): DataFrame = {
    val ledgerRow = scrubLedgerRow(spark, dir)
    val schema = Tables.table(spark, dir, "documents").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val scrubbed = withInRowScrub(stream.filter(col("text").isNotNull)
        .repartition(8)
        .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
        .crossJoin(broadcast(ledgerRow)))
      .select(col("doc_id"), col("n_words"), col("n_removed"),
        col("clean_hash"))
    graft.streaming.StreamingOps.runToBatchAppend(spark, scrubbed,
        s"st19_scrub_${System.nanoTime()}")
      .orderBy(col("doc_id"))
  }

  // ---- V69: benchmark span SCRUBBING (decontamination as removal) ----

  /** V69: window-level benchmark decontamination — the REMOVAL form of
    * v16's gate. v16 DROPS a document whose shingle containment against
    * the pooled benchmark crosses a threshold; below that threshold a
    * contaminated span still ships to the trainer verbatim. This
    * operator instead removes every [[ScrubWindow]]-word window of a
    * corpus document that also occurs anywhere in the benchmark — eval
    * answers cut out of the training text itself, the document kept.
    * The benchmark here is the `doc_id % 7 == 0` slice, denser than
    * v16's `% 97`: the sparse slice shares no 8-word window with the
    * corpus at the test SFs, so the removal branch would go untested. Output is the per-corpus-doc scrub
    * report (word count, removed-word count, cleaned-text md5), zero-hit
    * docs included, so the oracle pins both the removals AND the
    * untouched complement.
    *
    * Scale shape: the benchmark's distinct window hashes broadcast
    * (benchmarks are small by definition — v16's argument); the corpus
    * side is one linear explode → broadcast LEFT SEMI probe → one
    * doc-keyed aggregate of covered positions → in-row rebuild. No
    * corpus-vs-corpus join, no keep-first ordering (the benchmark is
    * always the holder), linear in corpus token count. */
  def benchmarkScrub(spark: SparkSession, dir: String): DataFrame = {
    val W = ScrubWindow
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
    val bench = scrubWindows(d.filter(pmod(col("doc_id"), lit(7)) === 0))
      .select(col("h")).distinct()
    val corpus = d.filter(pmod(col("doc_id"), lit(7)) =!= 0)
    val removed = scrubWindows(corpus)
      .join(broadcast(bench), Seq("h"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("s"), col("s") + (W - 1))).as("p"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_removed"),
        sort_array(collect_list(col("p").cast("long"))).as("ps"))
    corpus.join(removed, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("w")).as("n_words"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        md5(array_join(
          when(col("ps").isNull, col("w")).otherwise(
            filter(col("w"), (_, i) =>
              !array_contains(col("ps"), i.cast("long") + 1L))),
          " ")).as("clean_hash"))
      .orderBy(col("doc_id"))
  }

  private lazy val benchmarkScrubSql: String = {
    val W = ScrubWindow
    s"""WITH $scrubWindowCtes,
       | bh AS (SELECT DISTINCT h FROM so WHERE doc_id % 7 = 0),
       | sp AS (SELECT DISTINCT so.doc_id, unnest(range(so.s, so.s + $W))
       |          AS p
       |  FROM so JOIN bh USING (h) WHERE so.doc_id % 7 <> 0),
       | sr AS (SELECT doc_id, count(*) AS n_removed,
       |         list(p ORDER BY p) AS ps
       |        FROM sp GROUP BY 1)
       |SELECT sd.doc_id, CAST(len(sd.w) AS INT) AS n_words,
       | CAST(coalesce(sr.n_removed, 0) AS BIGINT) AS n_removed,
       | md5(coalesce(array_to_string(CASE WHEN sr.ps IS NULL THEN sd.w
       |   ELSE list_filter(sd.w,
       |          (x, i) -> NOT list_contains(sr.ps, i)) END,
       |   ' '), '')) AS clean_hash
       |FROM sd LEFT JOIN sr USING (doc_id)
       |WHERE sd.doc_id % 7 <> 0
       |ORDER BY sd.doc_id""".stripMargin
  }

  /** V2d2: the candidates+verify twin of [[embeddingNearDup]] — multi-probe
    * IVF cells (each vector assigned to its `nprobe` nearest of `nlist`
    * centroids), candidate pairs share a probed cell, exact cosine verify
    * touches candidates only. This is the 100 TB SHAPE (one shuffle on
    * cell id, in-cell pair products); on this data at τ=0.4 its recall vs
    * the exact join is ≈0.92-0.95 (pinned in DedupSpec) because the
    * threshold sits inside a continuous background — at true near-dup
    * thresholds the same plan is both sub-quadratic AND recall≈1. */
  def embeddingNearDupIvf(spark: SparkSession, dir: String,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions.dot_product
    // the SAME Lloyd-refined index the v3 queries use (one iteration),
    // from the shared per-process build — candidate generation and ANN
    // probing share one notion of "cell" AND one build
    val (e, cents, _) =
      graft.sim.SimilarityOps.ivfBuild(spark, dir, nlist, 1)
    val probed = graft.sim.SimilarityOps.multiProbeAssign(e, cents, nprobe)
    val x = probed.select(col("cent_id"), col("vec_id").as("i"))
    val y = probed.select(col("cent_id"), col("vec_id").as("j"))
    // hash join beats SMJ on the nlist-key cell join (no sort needed)
    val cands = x.join(y.hint("shuffle_hash"), Seq("cent_id"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"))
      .distinct() // a pair may share several probed cells
    val si = e.select(col("vec_id").as("i"), col("v").as("v_i"),
      col("nrm").as("n_i"))
    val sj = e.select(col("vec_id").as("j"), col("v").as("v_j"),
      col("nrm").as("n_j"))
    cands.join(si, Seq("i")).join(sj, Seq("j"))
      .withColumn("cos", round(
        dot_product(col("v_i"), col("v_j")) / (col("n_i") * col("n_j")), 6))
      .filter(col("cos") >= 0.4)
      .select(col("i"), col("j"), col("cos"))
      .orderBy(col("i"), col("j"))
  }

  /** V16: benchmark decontamination — the training-data op that keeps
    * eval answers out of the corpus: flag every corpus document whose
    * 3-word-shingle set is contained in the POOLED benchmark shingle
    * set above `tau`. The benchmark here is the deterministic
    * `doc_id % 97 == 0` slice standing in for an external eval table
    * (tiny relative to the corpus, as real benchmarks are).
    *
    * Scale shape: the benchmark's distinct shingles broadcast (a few
    * million strings at worst — benchmarks are small by definition);
    * the corpus side is one linear explode → broadcast LEFT SEMI probe
    * → one shuffle on doc_id for the hit count. No corpus-vs-corpus
    * join anywhere, so it stays linear in corpus size. */
  def decontaminate(spark: SparkSession, dir: String,
      tau: Double = ContamTau): DataFrame = {
    val sets = shingleSets(spark, dir)
    val bench = sets.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select(explode(col("sh")).as("shingle")).distinct()
    val corpus = sets.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    corpus
      .select(col("doc_id"), col("sz"), explode(col("sh")).as("shingle"))
      .join(broadcast(bench), Seq("shingle"), "left_semi")
      .groupBy(col("doc_id"), col("sz"))
      .agg(count(lit(1)).as("n_hit"))
      .withColumn("contamination", Exact.ratio6(col("n_hit"), col("sz")))
      .filter(col("contamination") >= tau)
      .select(col("doc_id"), col("sz").as("n_shingles"), col("n_hit"),
        col("contamination"))
      .orderBy(col("doc_id"))
  }

  // lazy: interpolates shinglesSql, which is declared LATER in this
  // object — a plain val here would capture null at construction time
  // (object vals initialize in declaration order) and silently emit
  // `null AS sh` into the oracle SQL.
  private lazy val decontaminateSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
       | s AS (SELECT doc_id, $shinglesSql AS sh FROM t),
       | bench AS (SELECT DISTINCT unnest(sh) AS shingle FROM s
       |           WHERE doc_id % 97 = 0),
       | c AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS shingle FROM s
       |       WHERE doc_id % 97 <> 0),
       | h AS (SELECT doc_id, sz, count(*) AS n_hit FROM c
       |       WHERE shingle IN (SELECT shingle FROM bench) GROUP BY 1,2)
       |SELECT doc_id, CAST(sz AS INT) AS n_shingles,
       | CAST(n_hit AS BIGINT) AS n_hit,
       | ${OracleSql.ratio6("n_hit", "sz")} AS contamination
       |FROM h
       |WHERE ${OracleSql.ratio6("n_hit", "sz")} >= $ContamTau
       |ORDER BY doc_id""".stripMargin

  /** V16b: SEMANTIC decontamination — v16's embedding-space sibling
    * (and the modern pipeline's second line of defense: paraphrased or
    * translated eval material shares no shingles but sits next to the
    * benchmark in embedding space). Flag every corpus vector whose
    * cosine to ANY benchmark vector (the same deterministic
    * `vec_id % 97` slice convention as v16's doc slice) reaches `tau`.
    *
    * Scale shape: the benchmark embeddings fold into ONE broadcast row
    * of structs (benchmarks are small by definition — the assignSub /
    * v47 centroid-bundle convention) and the per-vector max cosine is
    * computed IN-ROW (transform + array_max over the bundle): one
    * linear corpus scan, ZERO extra shuffle, no corpus-vs-corpus join. */
  def semanticDecontaminate(spark: SparkSession, dir: String,
      tau: Double = 0.3): DataFrame = {
    val e = graft.sim.SimilarityOps.withNorm(Tables.embeddings(spark, dir))
    val benchRow = e.filter(pmod(col("vec_id"), lit(97)) === 0)
      .agg(array_sort(collect_list(struct(col("vec_id").as("bid"),
        col("v").as("bv"), col("nrm").as("bn")))).as("bs"))
    e.filter(pmod(col("vec_id"), lit(97)) =!= 0)
      .crossJoin(broadcast(benchRow))
      .withColumn("cs", transform(col("bs"), b =>
        round(graft.sim.SimilarityOps.dot(col("v"), b.getField("bv")) /
          (col("nrm") * b.getField("bn")), 6)))
      .select(col("vec_id"),
        size(filter(col("cs"), _ >= tau)).cast("long").as("n_bench_hits"),
        array_max(col("cs")).as("max_bench_cos"))
      .filter(col("max_bench_cos") >= tau)
      .orderBy(col("vec_id"))
  }

  private val semanticDecontaminateSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |       CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings),
       | b AS (SELECT * FROM e WHERE vec_id % 97 = 0),
       | c AS (SELECT * FROM e WHERE vec_id % 97 <> 0),
       | s AS (SELECT c.vec_id,
       |   round(list_dot_product(c.v, b.v)/(c.nrm*b.nrm), 6) AS cos
       |  FROM c, b)
       |SELECT vec_id,
       | CAST(count(*) FILTER (WHERE cos >= 0.3) AS BIGINT) AS n_bench_hits,
       | max(cos) AS max_bench_cos
       |FROM s GROUP BY 1 HAVING max(cos) >= 0.3
       |ORDER BY vec_id""".stripMargin

  /** ST17: STREAMING decontamination — v16 as an ingest-time gate
    * (catch eval contamination before a document ever lands in the
    * corpus) in the st15/st16 train-batch/serve-streaming convention:
    * the pooled benchmark shingles are computed batch-side (a static
    * eval table in production), folded into one broadcast row, and each
    * arriving document's containment is computed IN-ROW over its own
    * shingle set — a stateless append-mode map, so the finite stream
    * equals the batch decontaminate and SHARES v16's oracle unchanged.
    * (At a benchmark too large for array_contains scans, the v20b
    * Bloom runtime filter is the drop-in membership probe.) */
  def streamingDecontaminate(spark: SparkSession, dir: String,
      tau: Double = 0.05): DataFrame = {
    // PlanMemo (was localCheckpoint): a broadcast subquery on a stream
    // re-executes EVERY micro-batch — without materialization the
    // 1-row benchmark bundle re-scans the corpus per batch (measured
    // ~1.7 s/batch at sf0.1). The memo additionally survives the
    // bench's between-run block hygiene, so the second drive broadcasts
    // a trivial parquet read instead of re-aggregating the corpus.
    val benchRow = graft.util.PlanMemo.memo(spark, "st17_bench_row",
      dir)(shingleSets(spark, dir)
        .filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(explode(col("sh")).as("shingle")).distinct()
        .agg(array_sort(collect_list(col("shingle"))).as("bench")))
    val schema = Tables.table(spark, dir, "documents").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val scored = stream
      .filter(pmod(col("doc_id"), lit(97)) =!= 0)
      // the micro-batch inherits the FILE's partitioning (one task per
      // source file) — spread the per-row shingle+intersect work
      // across cores before it runs (measured 2.2 s -> sub-second on
      // one sf0.1 file); at 100 TB this is the decode-parallelism
      // exchange every scoring ingest pays
      .repartition(8)
      .select(col("doc_id"), shingles.as("sh"))
      .withColumn("sz", size(col("sh")))
      .filter(col("sz") > 0)
      .crossJoin(broadcast(benchRow))
      // array_intersect, NOT filter+array_contains: both sides are
      // distinct sets, so |sh ∩ bench| is the same count, but the
      // per-row cost is one hash-set pass (O(|sh|+|bench|)) instead of
      // |sh|·|bench| string comparisons — measured 50.9 s → ~1 s at
      // sf0.1 (~2.6k bench shingles × ~52 per doc × 5k docs)
      .withColumn("n_hit",
        size(array_intersect(col("sh"), col("bench"))).cast("long"))
      .withColumn("contamination", Exact.ratio6(col("n_hit"), col("sz")))
      .filter(col("contamination") >= tau)
      .select(col("doc_id"), col("sz").as("n_shingles"), col("n_hit"),
        col("contamination"))
    graft.streaming.StreamingOps.runToBatchAppend(spark, scored,
        s"st17_decon_${System.nanoTime()}")
      .orderBy(col("doc_id"))
  }

  /** Path for the dumped IVF pair set — referenced by the v2d2b oracle
    * SQL, so it must be stable within a process (pid-suffixed against
    * concurrent runners, same convention as the ingest fixture). */
  // NOT TempArtifacts-registered: the v2d2b oracle SQL reads this path
  // from DuckDB after the Verify JVM exits (same contract as the OTLP
  // fixture) — exit-time deletion would break the gate.
  val IvfPairsPath: String =
    s"${sys.props("java.io.tmpdir")}/graft_ivf_pairs_" +
      ProcessHandle.current().pid()

  /** One write per process, and the IVF pairs DEPEND on the data dir
    * (unlike the dir-independent OTLP fixture), so a second dir in the
    * same process would silently compare recall against the wrong dump
    * — [[graft.util.OncePerProcess]] guards it loudly instead. */
  private val ivfPairsOnce = new graft.util.OncePerProcess("IVF pair dump")

  /** Shared tail of every oracle-witnessed quality metric (v2d2b,
    * v2c2, v22c, and SimilarityOps' v3b3/v18c): ONE pass over the
    * exact plan with a left join against the (tiny) dumped approximate
    * result marking hits, one aggregate for both counts, the ratio in
    * exact integer space. */
  private[graft] def overlapAgainstDump(spark: SparkSession,
      dumpPath: String, exact: DataFrame, keys: Seq[String],
      metric: String): DataFrame = {
    val stored = spark.read.parquet(dumpPath).withColumn("h", lit(1))
    exact.join(broadcast(stored), keys, "left")
      .agg(coalesce(sum(coalesce(col("h"), lit(0))), lit(0))
        .cast("long").as("n_hit"),
        count(lit(1)).as("n_exact"))
      .select(col("n_hit"), col("n_exact"),
        Exact.ratio6(col("n_hit"), col("n_exact")).as(metric))
  }

  /** V2d2b: the recall of the IVF candidate path, ORACLE-WITNESSED —
    * not just spec-pinned. The engine dumps its verified IVF pairs to
    * parquet; Spark computes |ivf ∩ exact| / |exact| from its own two
    * plans, and the DuckDB oracle recomputes the SAME number from the
    * dump plus its own independent exact-pair SQL (the v2d oracle). A
    * hash match means an independent engine agrees on exactly which
    * pairs the candidate path found and missed — the driver sees the
    * candidate quality as a value row every round. */
  def ivfRecall(spark: SparkSession, dir: String): DataFrame = {
    // build the candidate plan only when the dump actually happens —
    // embeddingNearDupIvf is EAGER (the Lloyd refinement
    // localCheckpoints), so hoisting it out of the once-block would
    // re-run the full IVF build on every call just to discard it
    ivfPairsOnce.ensure(dir) {
      embeddingNearDupIvf(spark, dir).select(col("i"), col("j"))
        .coalesce(1).write.mode("overwrite").parquet(IvfPairsPath)
    }
    // ONE pass over the exact pairs: a left join against the (tiny)
    // dumped candidate set marks hits, and a single aggregate counts
    // both totals — the previous two-action form (semi-join count +
    // separate total count) executed the O(N²) exact pair plan twice
    val stored = spark.read.parquet(IvfPairsPath).withColumn("h", lit(1))
    embeddingNearDup(spark, dir).select(col("i"), col("j"))
      .join(broadcast(stored), Seq("i", "j"), "left")
      // outer coalesce: sum over ZERO rows (no exact pairs at all) is
      // NULL where the oracle's count(*) yields 0
      .agg(coalesce(sum(coalesce(col("h"), lit(0))), lit(0))
        .cast("long").as("n_hit"),
        count(lit(1)).as("n_exact"))
      .select(col("n_hit"), col("n_exact"),
        Exact.ratio6(col("n_hit"), col("n_exact")).as("recall"))
  }

  private val ivfRecallSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |       CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings),
       |x AS (SELECT a.vec_id AS i, b.vec_id AS j
       |      FROM e a JOIN e b ON a.vec_id < b.vec_id
       |      WHERE round(list_dot_product(a.v, b.v)/(a.nrm*b.nrm),6) >= 0.4),
       |c AS (SELECT i, j FROM read_parquet('$IvfPairsPath/*.parquet')),
       |h AS (SELECT count(*) AS n_hit FROM x
       |      WHERE EXISTS (SELECT 1 FROM c WHERE c.i=x.i AND c.j=x.j)),
       |t AS (SELECT count(*) AS n_exact FROM x)
       |SELECT CAST(n_hit AS BIGINT) AS n_hit,
       | CAST(n_exact AS BIGINT) AS n_exact,
       | ${OracleSql.ratio6("n_hit", "n_exact")} AS recall
       |FROM h, t""".stripMargin

  /** V2e: duplicate-cluster assignment — connected components over the
    * near-dup pair graph (the step that turns pairs into "keep one per
    * cluster" decisions). The pair graph after near-dup filtering is tiny
    * relative to the corpus (25 pairs from 5k docs here; the same ratio
    * holds for real corpora), so up to [[LocalEdgeLimit]] edges the
    * components are solved with driver-side union-find in one pass.
    * Beyond that, distributed min-label propagation takes over:
    * O(diameter) joins, each a linear shuffle (the GraphX-free
    * large-scale shape). Both paths yield min-reachable-id labels. */
  def dupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = ngramJaccard(spark, dir).select(col("i"), col("j")).cache()
    // Both paths fully consume `pairs` before returning (local path
    // collects; distributed path ends on a localCheckpoint with severed
    // lineage), so the cache can be released here rather than pinning
    // the pair blocks until session end for library callers.
    try {
      if (pairs.count() <= LocalEdgeLimit) localComponents(spark, pairs)
      else distributedComponents(pairs)
    } finally pairs.unpersist()
  }

  val LocalEdgeLimit = 1000000L

  private[graft] def localComponents(spark: SparkSession,
      pairs: DataFrame): DataFrame = {
    import spark.implicits._
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    // iterative find with two-pass path compression: union-by-min-id can
    // chain linearly (ordering, not rank, picks the root), and a
    // recursive find would blow the driver stack near LocalEdgeLimit
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent(root)
      var cur = x
      while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
      root
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      // min id becomes the root, matching the label-propagation result
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    verts.map(v => (v, find(v))).toSeq
      .toDF("doc_id", "cluster_id").orderBy(col("doc_id"))
  }

  /** Iteration ceiling for min-label propagation — a SAFETY bound, not a
    * convergence knob: propagation needs O(graph diameter) rounds, and a
    * pair graph with diameter beyond this is not a dedup cluster shape.
    * Hitting it raises instead of silently returning unconverged labels. */
  private val MaxLabelIters = 100

  private[graft] def distributedComponents(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .union(pairs.select(col("j").as("i"), col("i").as("j")))
      .cache()
    val vertices = edges.select(col("i")).distinct()
    // localCheckpoint severs lineage (each iteration otherwise nests the
    // previous plan — stack/planning blowup on long chains); superseded
    // label frames are unpersisted so the loop holds ONE labels frame of
    // executor memory, not `iter` of them.
    var labels = vertices.withColumn("label", col("i")).localCheckpoint()
    var changed = 1L
    var iter = 0
    // finally (not just the happy path) releases `edges` — and, on the
    // non-convergence raise, the last checkpointed labels frame — so a
    // long-lived session doesn't leak executor storage when the ceiling
    // trips.
    try {
      while (changed > 0) {
        if (iter >= MaxLabelIters)
          throw new IllegalStateException(
            s"connected components did not converge in $MaxLabelIters " +
              "iterations — pair-graph diameter is pathological for dedup")
        val viaNeighbor = edges
          .join(labels.withColumnRenamed("i", "j")
            .withColumnRenamed("label", "nl"), Seq("j"))
          .groupBy(col("i")).agg(min(col("nl")).as("nmin"))
        val next = labels.join(viaNeighbor, Seq("i"), "left")
          .select(col("i"),
            least(col("label"), coalesce(col("nmin"), col("label")))
              .as("label"))
          .localCheckpoint() // eager: materializes before the old frame goes
        changed = next.join(labels.withColumnRenamed("label", "old"), Seq("i"))
          .filter(col("label") =!= col("old")).count()
        labels.unpersist()
        labels = next
        iter += 1
      }
    } finally {
      edges.unpersist()
      if (changed > 0) labels.unpersist() // failure exit: result frame unused
    }
    labels.select(col("i").as("doc_id"), col("label").as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** V2f: apply the dedup decision — keep only cluster representatives
    * (min doc_id per near-dup cluster) plus all unclustered docs. A
    * left_anti join against the non-representative side: the canonical
    * "materialize the cleaned corpus" step after pair-finding. */
  def dedupApply(spark: SparkSession, dir: String): DataFrame = {
    val dropIds = dupClusters(spark, dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    Tables.documents(spark, dir)
      .join(dropIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** V72: quality-aware dedup apply — v2f's keeper rule upgraded to
    * what production pipelines actually do: within a near-dup cluster,
    * keep the HIGHEST-QUALITY member (v4b score, [[graft.nlp.TextOps
    * .qualityMicro]] — the same integer micro spelling the quality
    * gate runs), not the lowest id; ties break to the lower id so the
    * decision stays deterministic. The dropped near-dups leave by the
    * same left_anti shape as v2f.
    *
    * Scale shape: the cluster frame is pair-graph-sized (tiny relative
    * to the corpus — the v2e argument), so the per-cluster argmax
    * window runs over it, never over the corpus; quality joins in
    * doc-keyed; the corpus pays one left_anti hash join. */
  def qualityDedupApply(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("sc").desc, col("doc_id"))
    val drops = dupClusters(spark, dir)
      .join(graft.nlp.TextOps.qualityMicro(spark, dir), Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") > 1)
      .select(col("doc_id"))
    Tables.documents(spark, dir)
      .join(drops, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  private lazy val qualityDedupApplySql: String = {
    import graft.nlp.TextOps.{markerSql, wordsSql}
    s"""WITH RECURSIVE
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
       | cl AS (SELECT a AS doc_id, min(b) AS cluster_id
       |        FROM reach GROUP BY a),
       | q0 AS (SELECT doc_id,
       |   len($wordsSql) AS nw,
       |   len(list_distinct($wordsSql)) AS nd,
       |   ${markerSql("en")} AS sm
       |  FROM documents WHERE text IS NOT NULL),
       | q AS (SELECT doc_id, ${OracleSql.ratio6Micro(
            "(least(nw,100)*nw*40 + (sm+nd)*3000)", "nw*10000")} AS sc
       |       FROM q0),
       | k AS (SELECT cl.doc_id,
       |   row_number() OVER (PARTITION BY cl.cluster_id
       |     ORDER BY q.sc DESC, cl.doc_id) AS rk
       |  FROM cl JOIN q USING (doc_id)),
       | drops AS (SELECT doc_id FROM k WHERE rk > 1)
       |SELECT doc_id, lang, source FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM drops)
       |ORDER BY doc_id""".stripMargin
  }

  /** The V20 corpus split: `incoming` (doc_id%3==0) arriving against the
    * `existing` accumulated ledger (the rest) — derived deterministically
    * from the one documents table so the oracle states the identical
    * construction. */
  private def splitCorpus(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        TextCanon.normHash.as("norm_hash"))
    (docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 =!= 0))
  }

  /** V20: incremental dedup — the docs of an incoming batch whose
    * normalized content is NOT already in the existing ledger: one
    * left_anti hash join on the content hash, the canonical exact form
    * (linear shuffle both sides). */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val (inc, ex) = splitCorpus(spark, dir)
    newDocsExact(inc, ex)
  }

  /** Core of V20 on explicit (incoming, existing) frames, both carrying
    * (doc_id, source, norm_hash) — spec-reachable with crafted overlap. */
  private[graft] def newDocsExact(inc: DataFrame, ex: DataFrame): DataFrame =
    inc.join(ex.select(col("norm_hash")), Seq("norm_hash"), "left_anti")
      .select(col("doc_id"), col("source"), col("norm_hash"))
      .orderBy(col("doc_id"))

  /** V20b: IDENTICAL semantics through the runtime-filter shape Spark's
    * own InjectRuntimeFilter uses: a Bloom filter of the ledger's hashes
    * (built with Catalyst's `BloomFilterAggregate`, probed with codegen'd
    * `might_contain` — no UDF) splits incoming into definitely-new rows,
    * which SKIP the join entirely, and the small might-contain candidate
    * fraction, which alone pays the exact anti-join — false positives
    * are removed there, so the output is exact and shares v20's oracle.
    * At 100 TB the ledger dwarfs each incoming batch; the filter costs
    * one linear pass + a driver-held sketch (~1.2 GB per 10⁹ ledger keys
    * at these parameters — broadcastable), and the anti-join's probe
    * side shrinks from the full batch to dup-rate + fpp of it. Pair
    * with a hash-bucketed ledger layout (v17) and the ledger side of
    * the residual join needs no shuffle either. */
  def incrementalDedupBloom(spark: SparkSession, dir: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val (inc, ex) = splitCorpus(spark, dir)
    newDocsBloom(inc, ex, expectedItems)
  }

  /** Core of V20b on explicit frames; `expectedItems` sizes the sketch
    * (8 bits/item here ≈ 2% fpp at capacity). */
  private[graft] def newDocsBloom(inc: DataFrame, ex: DataFrame,
      expectedItems: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.ColumnBridge
    import org.apache.spark.sql.types.BinaryType
    def hashOf(c: Column) = new XxHash64(Seq(ColumnBridge.expression(c)))
    val bfBytes = ex.select(ColumnBridge.column(
        new BloomFilterAggregate(hashOf(col("norm_hash")),
          Literal(expectedItems), Literal(expectedItems * 8L))
          .toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]](0)
    val sel = Seq(col("doc_id"), col("source"), col("norm_hash"))
    // empty ledger: the aggregate evals to null, and a null filter
    // bloom would drop EVERY row on both branches — the exact answer
    // is "everything is new", no probe needed
    if (bfBytes == null) return inc.select(sel: _*).orderBy(col("doc_id"))
    val might = ColumnBridge.column(BloomFilterMightContain(
      Literal(bfBytes, BinaryType), hashOf(col("norm_hash"))))
    val definiteNew = inc.filter(not(might)).select(sel: _*)
    val candidates = inc.filter(might)
      .join(ex.select(col("norm_hash")), Seq("norm_hash"), "left_anti")
      .select(sel: _*)
    definiteNew.unionByName(candidates).orderBy(col("doc_id"))
  }

  /** V20c: incremental NEAR-dup — v20's arriving-batch question asked at
    * v2b's granularity: which incoming docs are Jaccard-≥τ near-dups of
    * something ALREADY IN the accumulated ledger, without ever pairing
    * the ledger with itself. The ledger's LSH band buckets are a STORED
    * index (memoized parquet — the v19b/v18i ingest-artifact
    * convention): the probe is (incoming bands) ⋈ (stored bands) —
    * O(delta·Bands + matching buckets), never O(ledger²) — and exact
    * Jaccard verification touches candidate pairs only, so the output
    * is exact given candidate recall (1.0 on this corpus, the pinned
    * v2b property; at a scale where banding misses, the miss rate is
    * exactly what v2b's oracle measures). Output: every incoming doc
    * with its dup flag, the smallest matching ledger id, and that
    * match's Jaccard. */
  def incrementalNearDup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val inc = docs.filter(col("doc_id") % 3 === 0)
    val ledgerBands = graft.util.PlanMemo.memo(spark, "v20c_band_index",
      dir)(bandedBuckets(signatures(docs.filter(col("doc_id") % 3 =!= 0))))
    val cands = bandedBuckets(signatures(inc))
      .select(col("doc_id").as("i"), col("band_idx"), col("band_hash"))
      .join(ledgerBands.select(col("doc_id").as("j"), col("band_idx"),
        col("band_hash")), Seq("band_idx", "band_hash"))
      .select(col("i"), col("j")).distinct()
    // struct-min picks the smallest ledger id WITH its jaccard (field
    // order makes the comparison lexicographic on j first)
    val best = verifyJaccard(cands, shingleSets(spark, dir))
      .groupBy(col("i"))
      .agg(min(struct(col("j"), col("jaccard"))).as("b"))
      .select(col("i").as("doc_id"), col("b.j").as("dup_of"),
        col("b.jaccard").as("jaccard"))
    inc.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of").isNotNull.as("is_dup"),
        col("dup_of"), col("jaccard"))
      .orderBy(col("doc_id"))
  }

  /** ST24: streaming near-dup gate — v20c at ingest time: each ARRIVING
    * document is probed against the ledger's stored LSH band index the
    * moment it lands, emitting every verified (arriving doc, ledger
    * doc, Jaccard) decision for the downstream dedup apply. The MinHash
    * signature is computed IN-ROW on the stream (the fused one-pass
    * [[graft.functions.MinHashSig]] expression — no explode/groupBy,
    * stateless per row) through the SAME permutation coefficients and
    * band-hash spelling as the stored index, so stream probe and batch
    * index cannot disagree on a bucket; candidates join the two static
    * frames (band index, ledger shingle sets), verify exact Jaccard
    * in-row, and dedupe multi-band hits with a keyed dropDuplicates
    * (state bounded by VERIFIED pairs, not the corpus). Append mode
    * end-to-end — no aggregation, no watermark needed on a finite
    * stream.
    *
    * CONTRACT (unbounded reuse): the keyed dropDuplicates holds its
    * keys in the state store with NO watermark, which is safe here
    * only because the source is a finite file stream. Reusing this
    * path on a genuinely unbounded source requires switching to
    * `withWatermark(...).dropDuplicatesWithinWatermark(...)` (or an
    * event-time column + watermark-scoped dropDuplicates) so dedup
    * state is evictable; otherwise state grows without bound. */
  def streamingNearDupGate(spark: SparkSession, dir: String): DataFrame = {
    val ledger = Tables.documents(spark, dir)
      .filter(col("text").isNotNull && col("doc_id") % 3 =!= 0)
    val ledgerBands = graft.util.PlanMemo.memo(spark, "v20c_band_index",
      dir)(bandedBuckets(signatures(ledger)))
      .select(col("doc_id").as("j"), col("band_idx"), col("band_hash"))
    val ledgerSets = graft.util.PlanMemo.memo(spark, "st24_ledger_sets",
      dir)(ledger.select(col("doc_id"), shingles.as("sh"))
        .withColumn("sz", size(col("sh"))))
      .select(col("doc_id").as("j"), col("sh").as("sh_j"),
        col("sz").as("sz_j"))
    val schema = Tables.table(spark, dir, "documents").schema
    val probes = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .filter(col("text").isNotNull && col("doc_id") % 3 === 0)
      // same zero-shingle guard as the batch signatures(): a <3-word
      // doc must not probe with an all-sentinel signature
      .filter(size(graft.functions.ShingleFunctions
        .shingle_hashes(col("text"))) > 0)
      .repartition(8)
      .withColumn("sig", graft.functions.MinHashFunctions.minhash_sig(
        graft.functions.ShingleFunctions.shingle_hashes(col("text")),
        coefs, Prime))
      .select(Seq(col("doc_id").as("i"), shingles.as("sh_i")) ++
        (0 until NumPerm).map(k => col("sig").getItem(k).as(s"m$k")): _*)
      .withColumn("sz_i", size(col("sh_i")))
      .select(col("i"), col("sh_i"), col("sz_i"),
        posexplode(array(bandHashCols: _*)).as(Seq("band_idx", "band_hash")))
    val verified = probes
      .join(ledgerBands, Seq("band_idx", "band_hash"))
      .join(ledgerSets, Seq("j"))
      .withColumn("inter",
        size(array_intersect(col("sh_i"), col("sh_j"))))
      .withColumn("jaccard", Exact.ratio6(col("inter"),
        col("sz_i") + col("sz_j") - col("inter")))
      .filter(col("jaccard") >= Tau)
      .select(col("i").as("doc_id"), col("j").as("dup_of"), col("jaccard"))
      .dropDuplicates("doc_id", "dup_of")
    graft.streaming.StreamingOps.runToBatchAppend(spark, verified,
        s"st24_neardup_${System.nanoTime()}")
      .orderBy(col("doc_id"), col("dup_of"))
  }

  private lazy val streamingNearDupSql: String =
    s"""WITH pr AS (SELECT i, j, jaccard FROM ($jaccardPairsSql)),
       | sym AS (SELECT i, j, jaccard FROM pr
       |         UNION ALL SELECT j, i, jaccard FROM pr)
       |SELECT i AS doc_id, j AS dup_of, jaccard FROM sym
       |WHERE i % 3 = 0 AND j % 3 <> 0
       |ORDER BY 1, 2""".stripMargin

  /** V75: split-leakage audit — the eval-integrity check every paper
    * that reports a test score implicitly claims (Dodge et al. 2021's
    * C4 finding: benchmark data leaks through near-dups, not just
    * exact copies): how many near-dup pairs STRADDLE the v28
    * train/val/test assignment? A train doc whose near-dup sits in
    * test inflates the test score without any exact duplication. One
    * pass: the memoized v2a pair frame joins each side's split label
    * (the EXACT v28 spelling, shared — [[graft.nlp.MixOps
    * .splitAssign]]), pairs canonicalize to (least, greatest), and the
    * rollup lands on the dense 6-combination grid with the cross-split
    * flag. Scale: pair-frame-sized work + two broadcast-able label
    * joins; no new pair mining. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.documents(spark, dir)
      .select(col("doc_id"), graft.nlp.MixOps.splitAssign.as("sp"))
    val si = s.select(col("doc_id").as("i"), col("sp").as("sp_i"))
    val sj = s.select(col("doc_id").as("j"), col("sp").as("sp_j"))
    val agg = ngramJaccard(spark, dir)
      .join(si, Seq("i")).join(sj, Seq("j"))
      .withColumn("split_a", least(col("sp_i"), col("sp_j")))
      .withColumn("split_b", greatest(col("sp_i"), col("sp_j")))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"),
        max(col("jaccard")).as("max_jaccard"))
    val combos = Seq("test" -> "test", "test" -> "train", "test" -> "val",
      "train" -> "train", "train" -> "val", "val" -> "val")
    val grid = spark.range(1)
      .select(explode(array(combos.map { case (a, b) =>
        struct(lit(a).as("split_a"), lit(b).as("split_b"))
      }: _*)).as("c"))
      .select(col("c.split_a").as("split_a"), col("c.split_b").as("split_b"))
    grid.join(broadcast(agg), Seq("split_a", "split_b"), "left")
      .select(col("split_a"), col("split_b"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        col("max_jaccard"),
        (col("split_a") =!= col("split_b")).as("cross_split"))
      .orderBy(col("split_a"), col("split_b"))
  }

  private lazy val splitLeakageSql: String =
    s"""WITH pr AS (SELECT i, j, jaccard FROM ($jaccardPairsSql)),
       | sp AS (SELECT doc_id, ${graft.nlp.MixOps.splitAssignSql} AS sp
       |        FROM documents),
       | cl AS (SELECT least(a.sp, b.sp) AS split_a,
       |         greatest(a.sp, b.sp) AS split_b, pr.jaccard
       |   FROM pr JOIN sp a ON a.doc_id = pr.i
       |   JOIN sp b ON b.doc_id = pr.j),
       | ag AS (SELECT split_a, split_b,
       |         CAST(count(*) AS BIGINT) AS n_pairs,
       |         max(jaccard) AS max_jaccard
       |   FROM cl GROUP BY 1, 2),
       | grid AS (SELECT * FROM (VALUES
       |   ('test','test'), ('test','train'), ('test','val'),
       |   ('train','train'), ('train','val'), ('val','val'))
       |   AS g(split_a, split_b))
       |SELECT g.split_a, g.split_b,
       | CAST(coalesce(ag.n_pairs, 0) AS BIGINT) AS n_pairs,
       | ag.max_jaccard, g.split_a <> g.split_b AS cross_split
       |FROM grid g LEFT JOIN ag USING (split_a, split_b)
       |ORDER BY 1, 2""".stripMargin

  /** V76: eval-protection scrub — v75's REPAIR step: the audit counts
    * leaks, this operator removes them. Policy: the eval sets (val,
    * test) are authoritative — a TRAIN document with a near-dup in
    * either is quarantined (dropped from the training corpus), so the
    * shipped eval scores stay meaningful without re-drawing the split
    * (re-drawing would invalidate every historical score — the reason
    * production pipelines scrub train, not eval). Output: every doc
    * with its split, the keep/quarantine action, and the smallest
    * eval doc it leaked to. Same cost shape as v75: pair-frame work +
    * label joins, no new mining. */
  def splitScrub(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.documents(spark, dir)
      .select(col("doc_id"), graft.nlp.MixOps.splitAssign.as("split"))
    val pairs = ngramJaccard(spark, dir).select(col("i"), col("j"))
    val sym = pairs.unionByName(
      pairs.select(col("j").as("i"), col("i").as("j")))
    val leaks = sym
      .join(s.select(col("doc_id").as("i"), col("split").as("sp_i")),
        Seq("i"))
      .join(s.select(col("doc_id").as("j"), col("split").as("sp_j")),
        Seq("j"))
      .filter(col("sp_i") === "train" && col("sp_j") =!= "train")
      .groupBy(col("i").as("doc_id"))
      .agg(min(col("j")).as("leak_to"))
    s.join(leaks, Seq("doc_id"), "left")
      .select(col("doc_id"), col("split"),
        when(col("leak_to").isNotNull, "quarantine").otherwise("keep")
          .as("action"),
        col("leak_to"))
      .orderBy(col("doc_id"))
  }

  private lazy val splitScrubSql: String =
    s"""WITH pr AS (SELECT i, j FROM ($jaccardPairsSql)),
       | sym AS (SELECT i, j FROM pr UNION ALL SELECT j AS i, i AS j FROM pr),
       | sp AS (SELECT doc_id, ${graft.nlp.MixOps.splitAssignSql} AS sp
       |        FROM documents),
       | lk AS (SELECT sym.i AS doc_id, min(sym.j) AS leak_to
       |   FROM sym JOIN sp a ON a.doc_id = sym.i
       |   JOIN sp b ON b.doc_id = sym.j
       |   WHERE a.sp = 'train' AND b.sp <> 'train'
       |   GROUP BY 1)
       |SELECT sp.doc_id, sp.sp AS split,
       | CASE WHEN lk.leak_to IS NOT NULL THEN 'quarantine'
       |      ELSE 'keep' END AS action,
       | lk.leak_to
       |FROM sp LEFT JOIN lk USING (doc_id)
       |ORDER BY sp.doc_id""".stripMargin

  /** ST25: the composed STREAMING INGEST DAG — the gate chain a
    * production crawler actually runs on every arriving document, as
    * ONE streaming plan (v66 is the batch curation composition; this
    * is the ingest-time sibling): exact-dup against the ledger's
    * content hashes → near-dup against the stored LSH band index
    * (st24's probe) → benchmark membership / shingle-containment
    * decontamination (v16's gate against one broadcast benchmark row)
    * → duplicated-span scrub (st19's in-row machinery) for the docs
    * that survive. Per arriving doc: the first-failing-gate verdict
    * and, for kept docs, the scrub report (removed words + cleaned
    * md5). Every signal is computed in-row or against a static
    * artifact; the only state is the per-arriving-doc aggregation that
    * folds the 8 band probes back to one row — O(ingest batch), never
    * O(corpus). Reuses one spelling per gate (normHash, bandHashCols,
    * shingles, withInRowScrub), so the composition CANNOT drift from
    * the individual operators it composes. */
  def streamingIngestDag(spark: SparkSession, dir: String): DataFrame = {
    val docsB = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val ledgerDocs = docsB.filter(col("doc_id") % 3 =!= 0)
    // memoized like the band index below: the exact-dup hash ledger
    // and the benchmark shingle row are per-dir statics every drive
    // (and the bench's second run) would otherwise recompute
    val exLedger = graft.util.PlanMemo.memo(spark, "st25_ex_ledger",
      dir)(ledgerDocs
        .select(TextCanon.normHash.as("norm_hash")).distinct()
        .withColumn("ex_flag", lit(1)))
    val bandIndex = graft.util.PlanMemo.memo(spark, "v20c_band_index",
      dir)(bandedBuckets(signatures(ledgerDocs)))
      .select(col("doc_id").as("j"), col("band_idx"), col("band_hash"))
    val ledgerSets = graft.util.PlanMemo.memo(spark, "st24_ledger_sets",
      dir)(ledgerDocs.select(col("doc_id"), shingles.as("sh"))
        .withColumn("sz", size(col("sh"))))
      .select(col("doc_id").as("j"), col("sh").as("sh_j"),
        col("sz").as("sz_j"))
    val benchRow = graft.util.PlanMemo.memo(spark, "st25_bench_row",
      dir)(docsB.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(explode(shingles).as("shingle")).distinct()
        .agg(collect_list(col("shingle")).as("bench")))
    val ledgerRow = scrubLedgerRow(spark, dir)
    val schema = Tables.table(spark, dir, "documents").schema
    val enriched = withInRowScrub(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .filter(col("text").isNotNull && col("doc_id") % 3 === 0)
        .repartition(8)
        .withColumn("w", split(lower(col("text")), " "))
        .withColumn("norm_hash", TextCanon.normHash)
        .withColumn("sh_i", shingles)
        .withColumn("sz_i", size(col("sh_i")))
        .withColumn("sig", graft.functions.MinHashFunctions.minhash_sig(
          graft.functions.ShingleFunctions.shingle_hashes(col("text")),
          coefs, Prime))
        .withColumn("bm", pmod(col("doc_id"), lit(97)) === 0)
        .crossJoin(broadcast(benchRow))
        .withColumn("contam", Exact.ratio6(
          size(array_intersect(col("sh_i"), col("bench"))), col("sz_i")))
        .crossJoin(broadcast(ledgerRow)))
      .join(exLedger, Seq("norm_hash"), "left")
    val cand = enriched
      .select(Seq(col("doc_id"), col("ex_flag"), col("bm"), col("contam"),
        col("n_removed"), col("clean_hash"), col("sh_i"), col("sz_i")) ++
        (0 until NumPerm).map(k => col("sig").getItem(k).as(s"m$k")): _*)
      .select(col("doc_id"), col("ex_flag"), col("bm"), col("contam"),
        col("n_removed"), col("clean_hash"), col("sh_i"), col("sz_i"),
        posexplode(array(bandHashCols: _*)).as(Seq("band_idx", "band_hash")))
      .join(bandIndex, Seq("band_idx", "band_hash"), "left")
      .join(ledgerSets, Seq("j"), "left")
      .withColumn("inter",
        size(array_intersect(col("sh_i"), col("sh_j"))))
      .withColumn("jac", Exact.ratio6(col("inter"),
        col("sz_i") + col("sz_j") - col("inter")))
    val perDoc = cand.groupBy(col("doc_id"))
      .agg(first(col("ex_flag")).as("ex_flag"), first(col("bm")).as("bm"),
        first(col("contam")).as("contam"),
        first(col("n_removed")).as("n_rm"),
        first(col("clean_hash")).as("ch"),
        max(when(col("jac") >= Tau, 1).otherwise(0)).as("near_hit"))
    val kept = col("ex_flag").isNull && col("near_hit") === 0 &&
      !col("bm") && col("contam") < ContamTau
    val out = perDoc.select(col("doc_id"),
      when(col("ex_flag").isNotNull, "exact_dup")
        .when(col("near_hit") === 1, "near_dup")
        .when(col("bm"), "benchmark")
        .when(col("contam") >= ContamTau, "contaminated")
        .otherwise("kept").as("verdict"),
      when(kept, col("n_rm")).as("n_removed"),
      when(kept, col("ch")).as("clean_hash"))
    graft.streaming.StreamingOps.runToBatch(spark, out,
        s"st25_ingest_${System.nanoTime()}")
      .orderBy(col("doc_id"))
  }

  private lazy val streamingIngestDagSql: String =
    s"""WITH pr AS (SELECT i, j, jaccard FROM ($jaccardPairsSql)),
       | nd AS (SELECT DISTINCT i FROM (
       |   SELECT i, j FROM pr UNION ALL SELECT j AS i, i AS j FROM pr)
       |  WHERE i % 3 = 0 AND j % 3 <> 0),
       | exh AS (SELECT DISTINCT ${OracleSql.normHashText} AS nh
       |  FROM documents WHERE text IS NOT NULL AND doc_id % 3 <> 0),
       | tt AS (SELECT doc_id, string_split(text, ' ') AS w
       |        FROM documents WHERE text IS NOT NULL),
       | ss AS (SELECT doc_id, $shinglesSql AS sh FROM tt),
       | bl AS (SELECT list(DISTINCT shingle) AS bench FROM (
       |   SELECT unnest(sh) AS shingle FROM ss WHERE doc_id % 97 = 0)),
       | $scrubWindowCtes,
       | sg AS (SELECT h, min(doc_id) AS keep_doc, count(*) AS n_occ
       |        FROM so GROUP BY 1),
       | sp AS (SELECT DISTINCT so.doc_id,
       |          unnest(range(so.s, so.s + $ScrubWindow)) AS p
       |  FROM so JOIN sg USING (h)
       |  WHERE sg.n_occ >= 2 AND so.doc_id > sg.keep_doc),
       | sr AS (SELECT doc_id, count(*) AS n_removed,
       |         list(p ORDER BY p) AS ps
       |        FROM sp GROUP BY 1),
       | scrub AS (SELECT sd.doc_id,
       |    CAST(coalesce(sr.n_removed, 0) AS BIGINT) AS n_removed,
       |    md5(coalesce(array_to_string(
       |      CASE WHEN sr.ps IS NULL THEN sd.w
       |           ELSE list_filter(sd.w,
       |                  (x, i) -> NOT list_contains(sr.ps, i)) END,
       |      ' '), '')) AS clean_hash
       |   FROM sd LEFT JOIN sr USING (doc_id)),
       | flg AS (SELECT d.doc_id,
       |    (${OracleSql.normHashText} IN (SELECT nh FROM exh)) AS ex_hit,
       |    (d.doc_id IN (SELECT i FROM nd)) AS near_hit,
       |    (d.doc_id % 97 = 0) AS bm,
       |    ${OracleSql.ratio6("len(list_intersect(ss.sh, bl.bench))",
            "len(ss.sh)")} AS contam
       |  FROM documents d JOIN ss USING (doc_id) CROSS JOIN bl
       |  WHERE d.text IS NOT NULL AND d.doc_id % 3 = 0)
       |SELECT f.doc_id,
       | CASE WHEN ex_hit THEN 'exact_dup' WHEN near_hit THEN 'near_dup'
       |      WHEN bm THEN 'benchmark'
       |      WHEN contam >= $ContamTau THEN 'contaminated'
       |      ELSE 'kept' END AS verdict,
       | CASE WHEN NOT ex_hit AND NOT near_hit AND NOT bm
       |       AND contam < $ContamTau THEN sc.n_removed END AS n_removed,
       | CASE WHEN NOT ex_hit AND NOT near_hit AND NOT bm
       |       AND contam < $ContamTau THEN sc.clean_hash END AS clean_hash
       |FROM flg f JOIN scrub sc USING (doc_id)
       |ORDER BY f.doc_id""".stripMargin

  /** v20c oracle: the symmetric closure of the v2a exact pair frame,
    * restricted to (incoming, ledger) pairs — only as expensive as the
    * v2a oracle the driver already runs. */
  private lazy val incrementalNearDupSql: String =
    s"""WITH pr AS (SELECT i, j, jaccard FROM ($jaccardPairsSql)),
       | sym AS (SELECT i, j, jaccard FROM pr
       |         UNION ALL SELECT j, i, jaccard FROM pr),
       | f AS (SELECT i, j, jaccard FROM sym
       |       WHERE i % 3 = 0 AND j % 3 <> 0),
       | b AS (SELECT i, min(j) AS dup_of FROM f GROUP BY 1),
       | g AS (SELECT b.i, b.dup_of, f.jaccard
       |       FROM b JOIN f ON f.i = b.i AND f.j = b.dup_of),
       | inc AS (SELECT doc_id FROM documents
       |         WHERE text IS NOT NULL AND doc_id % 3 = 0)
       |SELECT inc.doc_id, g.dup_of IS NOT NULL AS is_dup,
       | g.dup_of, g.jaccard
       |FROM inc LEFT JOIN g ON g.i = inc.doc_id
       |ORDER BY inc.doc_id""".stripMargin

  /** V22 window length (chars) and the boilerplate ceiling: windows
    * shared by more than [[MaxDocsPerWindow]] docs are boilerplate
    * (license headers, templates) — at corpus scale one such window
    * would explode the pair join quadratically, and dedup-by-pair is
    * the wrong tool for it anyway (a frequency report is). */
  val WindowChars = 40
  val MaxDocsPerWindow = 100
  val MinSharedWindows = 5

  /** Distinct 40-char sliding windows per doc (stride 1 — every
    * position; exact detection). Dedup happens in the hash aggregate
    * AFTER the explode, not via per-row array_distinct: the aggregate's
    * map-side partial pass dedupes before the shuffle just the same
    * (equal wall time measured at sf0.1), without array_distinct's
    * O(windows²) string compares per document — the form that stays
    * linear when documents grow long. */
  private def charWindows(spark: SparkSession, dir: String,
      k: Int): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull && length(col("text")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, length(text)-$k), " +
          s"i -> substring(text, i+1, $k))")).as("win"))
      .distinct()

  /** Shared pair tail for V22/V22b: admit windows in 2..maxDocs docs,
    * self-join on the window, count shared windows per (i<j) pair.
    * The cache is a registry-SF convenience (three consumers of one
    * explode); at corpus scale the window/fingerprint table is
    * materialized once to storage instead — the v19b/v3b2
    * build-at-ingest pattern — and the three consumers read it. */
  private def windowPairs(wins: DataFrame, maxDocs: Int,
      minShared: Int): DataFrame = {
    val w = wins.cache()
    val admissible = w.groupBy(col("win"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd").between(2, maxDocs))
      .select(col("win"))
    val adm = w.join(admissible, Seq("win"))
    val a = adm.select(col("doc_id").as("i"), col("win"))
    val b = adm.select(col("doc_id").as("j"), col("win"))
    a.join(b, Seq("win")).filter(col("i") < col("j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("i"), col("j"))
  }

  /** V22: substring-level duplicate detection — the third dedup
    * granularity next to whole-doc exact (V1) and near-dup (V2): doc
    * pairs sharing ≥ [[MinSharedWindows]] distinct 40-char character
    * windows, i.e. verbatim copied spans that whole-doc hashing misses
    * and shingle-Jaccard underweights. Stride-1 windows make detection
    * EXACT (any shared ≥40-char span is found); the frequency ceiling
    * bounds the pair join against boilerplate windows. This is the
    * VERIFY-grade baseline; [[substringDupsWinnowed]] is the
    * fingerprint-sampled scale path. */
  def substringDups(spark: SparkSession, dir: String,
      minShared: Int = MinSharedWindows): DataFrame =
    // memoized: the v22 entry and v22c's witness baseline share one
    // execution of the stride-1 plan per process (minShared spelled
    // into the key — specs probe non-default thresholds)
    graft.util.PlanMemo.memo(spark, s"v22_substr_$minShared", dir)(
      substringDupsPlan(spark, dir, minShared))
      .orderBy(col("i"), col("j"))

  private[graft] def substringDupsPlan(spark: SparkSession, dir: String,
      minShared: Int): DataFrame =
    windowPairs(charWindows(spark, dir, WindowChars),
      MaxDocsPerWindow, minShared)

  /** V22b: the scale path — winnowing (the MOSS fingerprint scheme):
    * per doc, hash every window and keep one ARGMIN per sliding run of
    * `b` consecutive windows (min over struct(hash,pos,win), start-of-
    * run windows included so short docs still fingerprint). Guarantee:
    * two docs sharing a span of ≥ k+b-1 chars share at least one
    * selected fingerprint — the b-run of identical hashes inside the
    * shared span selects the same argmin in both docs (hash ties break
    * by RELATIVE position inside the aligned span, identically on both
    * sides). Density is ~2/(b+1) of stride-1, so the shuffle shrinks
    * ~4× at b=8 while pairs sharing a 47+-char span are still found;
    * engine-hash-dependent selection ⇒ rows-only, guarantees pinned in
    * ExtendedOpsSpec (planted shared span + subset-of-exact). The
    * boilerplate ceiling here counts FINGERPRINT occurrences, which
    * are ≤ the stride-1 doc-counts — so for a window whose full
    * doc-count straddles the ceiling (> maxDocs docs, ≤ maxDocs of
    * them selecting it as a fingerprint) the winnowed path can admit
    * what the exact path excluded; subset-of-exact therefore holds
    * exactly for windows clear of the ceiling (the spec fixtures are),
    * and at the boundary the disagreement is confined to boilerplate
    * the exact path deliberately suppressed. */
  def substringDupsWinnowed(spark: SparkSession, dir: String, b: Int = 8,
      minShared: Int = 2): DataFrame =
    // memoized: the v22b entry and v22c's dump side share one execution
    graft.util.PlanMemo.memo(spark, s"v22b_winnow_${b}_$minShared", dir)(
      substringDupsWinnowedPlan(spark, dir, b, minShared))
      .orderBy(col("i"), col("j"))

  private[graft] def substringDupsWinnowedPlan(spark: SparkSession,
      dir: String, b: Int = 8, minShared: Int = 2): DataFrame = {
    val k = WindowChars
    // The whole winnowing runs IN-ROW (one codegen projection): build
    // the (hash, pos, win) structs once per document, take the argmin
    // of every b-length slice, dedupe the selections — and only THEN
    // explode. The earlier form posexploded every position into a
    // per-doc sort window, shipping every stride-1 window (40-char
    // string included) through a full shuffle+sort just to throw
    // ~b/(b+1) of them away; here nothing leaves the row until the
    // ~2/(b+1)-density fingerprint set exists, so the one shuffle in
    // the pair tail carries ONLY fingerprints. The single-element
    // `transform(array(...), hs -> ...)` binds the struct array once
    // per row (a let-binding — inlining it into the slice lambda would
    // rebuild it per position, O(n²)). Tail slices shorter than b
    // (start-of-run positions near the end) still select, exactly like
    // the old rowsBetween(current, b-1) frame.
    val fingerprints = Tables.documents(spark, dir)
      .filter(col("text").isNotNull && length(col("text")) >= k)
      .select(col("doc_id"), expr(
        s"transform(sequence(0, length(text)-$k), " +
          s"i -> substring(text, i+1, $k))").as("wins"))
      .select(col("doc_id"), explode(expr(
        s"""transform(array(transform(wins,
           |   (w, i) -> named_struct('h', xxhash64(w), 'p', i, 'w', w))),
           |  hs -> array_distinct(transform(
           |    transform(sequence(1, size(hs)), p -> array_min(slice(hs, p, $b))),
           |    s -> s.w)))[0]""".stripMargin)).as("win"))
    windowPairs(fingerprints, MaxDocsPerWindow, minShared)
  }

  private val substringSql: String =
    s"""WITH d AS (SELECT doc_id, text FROM documents
       |      WHERE text IS NOT NULL AND length(text) >= $WindowChars),
       | w0 AS (SELECT doc_id, unnest([substr(text, i, $WindowChars)
       |          for i in generate_series(1, length(text)-${WindowChars - 1})]) AS win
       |        FROM d),
       | w AS (SELECT DISTINCT doc_id, win FROM w0),
       | nd AS (SELECT win FROM (SELECT win, count(*) AS c FROM w GROUP BY 1) t
       |        WHERE c BETWEEN 2 AND $MaxDocsPerWindow),
       | p AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS n_shared
       |       FROM (SELECT w.doc_id, w.win FROM w JOIN nd USING (win)) a
       |       JOIN (SELECT w.doc_id, w.win FROM w JOIN nd USING (win)) b
       |         ON a.win = b.win AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2)
       |SELECT i, j, CAST(n_shared AS BIGINT) AS n_shared
       |FROM p WHERE n_shared >= $MinSharedWindows
       |ORDER BY i, j""".stripMargin

  private val incrementalSql: String =
    s"""WITH d AS (SELECT doc_id, source,
      |        ${OracleSql.normHashText} AS norm_hash
      |       FROM documents WHERE text IS NOT NULL),
      | inc AS (SELECT * FROM d WHERE doc_id % 3 = 0),
      | ex AS (SELECT norm_hash FROM d WHERE doc_id % 3 <> 0)
      |SELECT doc_id, source, norm_hash FROM inc
      |WHERE norm_hash NOT IN (SELECT norm_hash FROM ex)
      |ORDER BY doc_id""".stripMargin

  private[graft] val shinglesSql =
    """list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      | for i in generate_series(1, greatest(len(w)-2, 1))])""".stripMargin
      .replace("\n", " ")

  /** Exact shingle-Jaccard pair SQL — the oracle for BOTH v2a and v2b:
    * v2b's banded candidate generation feeds the same exact-Jaccard
    * verify stage, so its output equals v2a's exactly when LSH recall
    * is 1.0. Recall is probabilistic in general but deterministic per
    * corpus (fixed permutation seeds), and on the test corpus it IS 1.0
    * — verified pair-for-pair at sf0.001/0.01/0.1 (28/25/256 pairs) and
    * pinned against the fixture in DedupSpec. At a scale where a banded
    * miss appears, this oracle would catch exactly that recall loss,
    * which is the honest thing to measure. */
  /** v2c2 / v22c dump paths + per-process guards (the IvfPairsPath
    * contract: pid-suffixed, NOT exit-deleted — the oracle SQL reads
    * them from DuckDB after the Verify JVM exits). */
  val SimhashPairsPath: String =
    s"${sys.props("java.io.tmpdir")}/graft_simhash_pairs_" +
      ProcessHandle.current().pid()
  val WinnowPairsPath: String =
    s"${sys.props("java.io.tmpdir")}/graft_winnow_pairs_" +
      ProcessHandle.current().pid()
  private val simhashPairsOnce =
    new graft.util.OncePerProcess("SimHash pair dump")
  private val winnowPairsOnce =
    new graft.util.OncePerProcess("winnowed pair dump")

  /** V2c2: cross-method agreement of the SimHash path,
    * ORACLE-WITNESSED — the share of exact Jaccard≥τ near-dup pairs
    * the hamming≤7 pigeonhole join also flags. SimHash approximates
    * COSINE of the shingle multiset, not Jaccard, so this is a
    * cross-method agreement rate (not a recall against its own
    * target); it is exactly the number a curation owner needs before
    * swapping v2a's quadratic join for v2c's linear one. */
  def simhashOverlap(spark: SparkSession, dir: String): DataFrame = {
    simhashPairsOnce.ensure(dir) {
      simhashDedup(spark, dir).select(col("i"), col("j"))
        .coalesce(1).write.mode("overwrite").parquet(SimhashPairsPath)
    }
    overlapAgainstDump(spark, SimhashPairsPath,
      ngramJaccard(spark, dir).select(col("i"), col("j")),
      Seq("i", "j"), "agreement")
  }

  private lazy val simhashOverlapSql: String =
    s"""WITH x AS (SELECT i, j FROM ($jaccardPairsSql)),
       | c AS (SELECT i, j FROM read_parquet('$SimhashPairsPath/*.parquet')),
       | h AS (SELECT CAST(count(*) AS BIGINT) AS n_hit FROM x
       |       WHERE EXISTS (SELECT 1 FROM c WHERE c.i=x.i AND c.j=x.j)),
       | t AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM x)
       |SELECT n_hit, n_exact,
       | ${OracleSql.ratio6("n_hit", "n_exact")} AS agreement
       |FROM h, t""".stripMargin

  /** V22c: coverage of the winnowed fingerprint path,
    * ORACLE-WITNESSED — the share of exact stride-1 substring-dup
    * pairs (v22) the MOSS-sampled path (v22b) also reports. The
    * winnowing guarantee says spans ≥ k+b−1 chars are always caught;
    * this value row shows what that means on the live corpus, judged
    * independently by both engines every round. */
  def winnowCoverage(spark: SparkSession, dir: String): DataFrame = {
    winnowPairsOnce.ensure(dir) {
      substringDupsWinnowed(spark, dir).select(col("i"), col("j"))
        .coalesce(1).write.mode("overwrite").parquet(WinnowPairsPath)
    }
    overlapAgainstDump(spark, WinnowPairsPath,
      substringDups(spark, dir).select(col("i"), col("j")),
      Seq("i", "j"), "coverage")
  }

  private lazy val winnowCoverageSql: String =
    s"""WITH x AS (SELECT i, j FROM ($substringSql)),
       | c AS (SELECT i, j FROM read_parquet('$WinnowPairsPath/*.parquet')),
       | h AS (SELECT CAST(count(*) AS BIGINT) AS n_hit FROM x
       |       WHERE EXISTS (SELECT 1 FROM c WHERE c.i=x.i AND c.j=x.j)),
       | t AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM x)
       |SELECT n_hit, n_exact,
       | ${OracleSql.ratio6("n_hit", "n_exact")} AS coverage
       |FROM h, t""".stripMargin

  /** V73 sweep grid: the τ range a curation owner actually debates.
    * Starts at [[Tau]] (0.5) because the memoized v2a pair frame is
    * already filtered there — every grid point ≥ τ₀ reuses it for
    * free; a sweep below τ₀ would need a re-mined pair frame. */
  private[graft] val SweepTaus = Seq(0.5, 0.6, 0.7, 0.8, 0.9)

  /** V73: dedup threshold sweep — the aggressiveness curve behind the
    * "where do we set τ?" decision: for each candidate Jaccard
    * threshold, the flagged pair count, the number of distinct
    * documents touched, and their corpus share. One pass over the
    * MEMOIZED v2a pair frame (already mined once per process): each
    * pair explodes into the bounded 5-point grid IN-ROW and filters by
    * `jaccard >= tau` — no new pair join, no window; the aggregates
    * land on the 5-row grid frame. The double compare is safe
    * cross-engine: both sides derive jaccard as micro/1e6 (identical
    * IEEE doubles) and the grid literals are the same doubles. Scale:
    * the pair frame is the τ₀-filtered near-dup set (corpus-sublinear
    * by construction); ×5 in-row replication is free. */
  def thresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val flagged = ngramJaccard(spark, dir)
      .withColumn("tau", explode(array(SweepTaus.map(lit): _*)))
      .filter(col("jaccard") >= col("tau"))
    val nPairs = flagged.groupBy(col("tau"))
      .agg(count(lit(1)).as("n_pairs"))
    val nDocs = flagged
      .select(col("tau"), explode(array(col("i"), col("j"))).as("d"))
      .groupBy(col("tau"))
      .agg(countDistinct(col("d")).as("n_docs"))
    val grid = spark.range(1)
      .select(explode(array(SweepTaus.map(lit): _*)).as("tau"))
    val total = Tables.documents(spark, dir)
      .agg(count(lit(1)).as("n_total"))
    grid.join(broadcast(nPairs), Seq("tau"), "left")
      .join(broadcast(nDocs), Seq("tau"), "left")
      .crossJoin(broadcast(total))
      .select(col("tau"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        Exact.ratio6(coalesce(col("n_docs"), lit(0L)), col("n_total"))
          .as("docs_share"))
      .orderBy(col("tau"))
  }

  private lazy val thresholdSweepSql: String =
    s"""WITH p AS (SELECT i, j, jaccard FROM ($jaccardPairsSql)),
       | taus AS (SELECT unnest([${SweepTaus.mkString(", ")}]) AS tau),
       | f AS (SELECT tau, i, j FROM taus, p WHERE jaccard >= tau),
       | np AS (SELECT tau, CAST(count(*) AS BIGINT) AS n_pairs
       |        FROM f GROUP BY 1),
       | nd AS (SELECT tau, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
       |        FROM (SELECT tau, unnest([i, j]) AS d FROM f) GROUP BY 1),
       | tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents)
       |SELECT t.tau,
       | CAST(coalesce(np.n_pairs, 0) AS BIGINT) AS n_pairs,
       | CAST(coalesce(nd.n_docs, 0) AS BIGINT) AS n_docs,
       | ${OracleSql.ratio6("coalesce(nd.n_docs, 0)", "n_total")}
       |   AS docs_share
       |FROM taus t LEFT JOIN np USING (tau) LEFT JOIN nd USING (tau), tot
       |ORDER BY t.tau""".stripMargin

  private val jaccardPairsSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
       | s AS (SELECT doc_id, $shinglesSql AS sh FROM t),
       | p AS (SELECT a.doc_id i, b.doc_id j,
       |   ${OracleSql.ratio6("len(list_intersect(a.sh,b.sh))",
             "len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh))")} AS jaccard
       |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
       |SELECT i, j, jaccard FROM p WHERE jaccard >= 0.5
       |ORDER BY i, j""".stripMargin

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
      (s, d) => embeddingNearDupIvf(s, d), None),
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
