package graft.sim

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval fusion and diversification — the serving-side tail of the
  * hybrid-search pipeline the corpus operators feed: lexical BM25
  * (v19) and dense cosine (v3a) candidate pools fused by Reciprocal
  * Rank Fusion, and a result list diversified by Maximal Marginal
  * Relevance.
  *
  * Scale shape: both operators run on POOLS — rank-k prefixes whose
  * size is fixed by the query (TakeOrderedAndProject outputs), never
  * by the corpus — so every join, window and greedy step below is over
  * frames of ≤ [[Pool]] rows regardless of data volume. The corpus-
  * scale work is the candidate generation itself, which stays in the
  * already-registered v19/v3a/v3b2/v19b plans (stored partition-pruned
  * indexes at 100 TB).
  *
  * Determinism: RRF is computed in INTEGER micro-units
  * (⌊1e6/(60+rank)⌋ — ranks are integers, so the fold is exact in both
  * engines); MMR works on rounded-6 cosines, scaled by λ=0.5 (a power
  * of two — exact in IEEE), with vec_id tie-breaks at every argmax.
  */
object FusionOps extends QueryModule {

  /** Candidate-pool size per retriever (bounded by construction). */
  val Pool = 20

  /** The RRF smoothing constant from Cormack et al. — rank
    * contributions are 1/(RrfK + rank). */
  val RrfK = 60L

  /** MMR trade-off λ: score = λ·relevance − (1−λ)·max-similarity.
    * 0.5 is exact in binary, so the double arithmetic is
    * engine-identical. */
  val Lambda = 0.5

  /** V59: hybrid retrieval via Reciprocal Rank Fusion — BM25's top-20
    * (lexical) and brute-cosine's top-20 (dense) joined FULL OUTER on
    * doc id, each doc scored Σ ⌊1e6/(60+rank)⌋ over the lists it
    * appears in (rank 0 = absent = no contribution), top-k by the
    * fused score. The standard zero-training hybrid ranker; both
    * source rankings are the oracle-green v19/v3a plans, and the fused
    * arithmetic is integer-exact, so the HYBRID list itself carries a
    * full oracle. */
  def hybridRrf(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val bm = graft.nlp.RankOps.bm25(spark, dir, k = Pool)
      .select(col("doc_id"), row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).as("r_bm25"))
    val vec = SimilarityOps.cosineTopK(spark, dir, k = Pool)
      .select(col("vec_id").as("doc_id"), row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id"))).as("r_vec"))
    bm.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(Exact.intDiv(lit(1000000L),
          lit(RrfK) + col("r_bm25").cast("long")), lit(0L)) +
        coalesce(Exact.intDiv(lit(1000000L),
          lit(RrfK) + col("r_vec").cast("long")), lit(0L)))
      .select(col("doc_id"),
        coalesce(col("r_bm25"), lit(0)).cast("long").as("r_bm25"),
        coalesce(col("r_vec"), lit(0)).cast("long").as("r_vec"),
        (col("rrf_micro").cast("double") / 1000000.0).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  /** The dense pool's CTE chain (v3a's spelling, pool-sized):
    * `vpool(vec_id, rel, v, nrm)` — the top-[[Pool]] by rounded cosine
    * WITH their vectors (MMR needs in-pool similarities). */
  private val vpoolCtes: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |       CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings),
       | q AS (SELECT v AS q_v, nrm AS q_nrm FROM e WHERE vec_id = 0),
       | vpool AS (SELECT e.vec_id,
       |   round(list_dot_product(e.v, q.q_v)/(e.nrm*q.q_nrm), 6) AS rel,
       |   e.v, e.nrm
       |  FROM e, q WHERE e.vec_id <> 0
       |  ORDER BY rel DESC, e.vec_id LIMIT $Pool)""".stripMargin

  /** The RRF fusion chain as a CTE LIST (no WITH), ending in
    * `fused10(doc_id, r_bm25, r_vec, rrf_micro)` — the fused top-10
    * with integer micro-unit scores. Spliced whole into the v64
    * ranking-quality oracles so the witnessed list and the registered
    * v59 list come from ONE spelling. */
  private[graft] val rrfCtes: String =
    s"""${graft.nlp.RankOps.bm25Ctes},
       | bmp AS (SELECT doc_id, score FROM bmscores
       |         ORDER BY score DESC, doc_id LIMIT $Pool),
       | bmr AS (SELECT doc_id, row_number()
       |           OVER (ORDER BY score DESC, doc_id) AS r_bm25 FROM bmp),
       | $vpoolCtes,
       | vr AS (SELECT vec_id AS doc_id, row_number()
       |          OVER (ORDER BY rel DESC, vec_id) AS r_vec FROM vpool),
       | f AS (SELECT coalesce(bmr.doc_id, vr.doc_id) AS doc_id,
       |        r_bm25, r_vec
       |       FROM bmr FULL OUTER JOIN vr ON bmr.doc_id = vr.doc_id),
       | fused10 AS (SELECT doc_id,
       |   CAST(coalesce(r_bm25, 0) AS BIGINT) AS r_bm25,
       |   CAST(coalesce(r_vec, 0) AS BIGINT) AS r_vec,
       |   CAST(coalesce(1000000 // ($RrfK + r_bm25), 0)
       |      + coalesce(1000000 // ($RrfK + r_vec), 0) AS BIGINT) AS rrf_micro
       |  FROM f ORDER BY rrf_micro DESC, doc_id LIMIT 10)""".stripMargin

  private val hybridRrfSql: String =
    s"""WITH $rrfCtes
       |SELECT doc_id, r_bm25, r_vec,
       | CAST(rrf_micro AS DOUBLE) / 1000000.0 AS rrf
       |FROM fused10 ORDER BY rrf DESC, doc_id""".stripMargin

  /** V60: Maximal Marginal Relevance diversification of the dense
    * top-[[Pool]]: greedily select `k` results maximizing
    * λ·rel − (1−λ)·max-cosine-to-already-selected — the classic
    * redundancy killer for retrieval-augmented sampling (near-identical
    * passages stop crowding the context window).
    *
    * The greedy loop is UNROLLED as k−1 dataflow steps over the
    * ≤[[Pool]]-row pool (the v47/v49 unroll convention — each step is
    * a bounded join + argmax, never a driver-side collect), and DuckDB
    * replays the identical unroll as chained CTEs, so every pick —
    * including each step's marginal score — is hash-agreed. */
  def mmrDiversify(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    // localCheckpoint both bounded frames (≤20 / ≤380 rows): the
    // unrolled greedy steps each reference them several times, and
    // without the cut every step would re-execute the corpus scan +
    // pair join from scratch (measured 8.9 s → sub-second at sf0.1)
    val rel = SimilarityOps.cosineTopK(spark, dir, k = Pool)
      .withColumnRenamed("cos", "rel").localCheckpoint()
    val e = SimilarityOps.withNorm(Tables.embeddings(spark, dir))
    val pool = rel.join(e, Seq("vec_id"))
    val sims = pool.select(col("vec_id").as("i"), col("v").as("vi"),
        col("nrm").as("ni"))
      .join(broadcast(pool.select(col("vec_id").as("j"),
        col("v").as("vj"), col("nrm").as("nj"))), col("i") =!= col("j"))
      .select(col("i"), col("j"), round(SimilarityOps.dot(col("vi"),
        col("vj")) / (col("ni") * col("nj")), 6).as("sim"))
      .localCheckpoint()
    var sel = rel.orderBy(col("rel").desc, col("vec_id")).limit(1)
      .select(col("vec_id"), lit(1).as("step"), col("rel"),
        (lit(Lambda) * col("rel")).as("mmr"))
    for (step <- 2 to k) {
      val chosen = sel.select(col("vec_id").as("j"))
      val marg = sims.join(broadcast(chosen), Seq("j"))
        .groupBy(col("i")).agg(max(col("sim")).as("max_sim"))
      val pick = rel
        .join(chosen.withColumnRenamed("j", "vec_id"),
          Seq("vec_id"), "left_anti")
        .join(marg, col("vec_id") === col("i"))
        .withColumn("mmr",
          lit(Lambda) * col("rel") - lit(1 - Lambda) * col("max_sim"))
        .orderBy(col("mmr").desc, col("vec_id"))
        .limit(1)
        .select(col("vec_id"), lit(step).as("step"), col("rel"),
          col("mmr"))
      sel = sel.unionByName(pick)
    }
    sel.orderBy(col("step"))
  }

  /** [[mmrDiversify]]'s greedy selection in ONE job — the u5
    * grouped-walk convention applied to the MMR unroll. The unrolled
    * form is correct dataflow but pays k−1 job round-trips (join +
    * argmax + union each) over a ≤[[Pool]]-row pool: pure scheduler
    * overhead at ANY scale, because the pool is query-bounded by
    * construction (top-[[Pool]] of one query — the nprobe-id-list
    * boundedness class, not a corpus-sized frame). Here the bounded
    * pool (≤Pool rel rows + <Pool² sim rows) shuffles to one task and
    * the greedy walk runs in-group, mirroring the unroll EXACTLY: the
    * same λ·rel − (1−λ)·max-sim doubles in the same evaluation order,
    * candidates require a sim edge to the selected set (the unroll's
    * inner join against `marg`), argmax ties break toward the smaller
    * vec_id, picks append with their step index. Corpus-side work —
    * the top-Pool scan and the pair-sims join — stays distributed and
    * identical; only the O(k·Pool) selection moves in-group.
    * FusionProbeSpec pins grouped ≡ unrolled bit-for-bit at two SFs;
    * the registered v60 entry keeps the identical DuckDB unroll
    * oracle. NaN handling: the walk uses java.lang.Double.compare
    * (NaN above every double, NaN equal to NaN) to mirror Spark's
    * orderBy/max ordering, so a zero-norm embedding (cosine = NaN)
    * cannot split the grouped and unrolled paths. */
  def mmrDiversifyGrouped(spark: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    import spark.implicits._
    val rel = SimilarityOps.cosineTopK(spark, dir, k = Pool)
      .withColumnRenamed("cos", "rel").localCheckpoint()
    val e = SimilarityOps.withNorm(Tables.embeddings(spark, dir))
    val pool = rel.join(e, Seq("vec_id"))
    val sims = pool.select(col("vec_id").as("i"), col("v").as("vi"),
        col("nrm").as("ni"))
      .join(broadcast(pool.select(col("vec_id").as("j"),
        col("v").as("vj"), col("nrm").as("nj"))), col("i") =!= col("j"))
      .select(col("i"), col("j"), round(SimilarityOps.dot(col("vi"),
        col("vj")) / (col("ni") * col("nj")), 6).as("sim"))
    val tagged = rel.select(lit("r").as("t"),
        col("vec_id").cast("long").as("i"), lit(-1L).as("j"),
        col("rel").as("x"))
      .unionByName(sims.select(lit("s").as("t"), col("i").cast("long"),
        col("j").cast("long"), col("sim").as("x")))
    tagged.as[(String, Long, Long, Double)]
      .groupByKey(_ => 0)
      .flatMapGroups { (_, it) =>
        val relA = new scala.collection.mutable.ArrayBuffer[(Long, Double)]()
        val simM = new java.util.HashMap[Long, java.util.HashMap[Long, java.lang.Double]]()
        it.foreach {
          case ("r", i, _, x) => relA += ((i, x))
          case (_, i, j, x) =>
            var m = simM.get(i)
            if (m == null) { m = new java.util.HashMap(); simM.put(i, m) }
            m.put(j, x): Unit
        }
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Int, Double, Double)]()
        if (relA.nonEmpty) {
          // s1: argmax rel, ties toward the smaller vec_id — the
          // unroll's orderBy(rel desc, vec_id).limit(1)
          var first = relA.head
          relA.foreach { c =>
            // Double.compare, not `>`: Spark's orderBy ranks NaN above
            // every double and NaN equal to NaN — a zero-norm embedding
            // (cosine = NaN) must break the same way in both paths.
            val cmp = java.lang.Double.compare(c._2, first._2)
            if (cmp > 0 || (cmp == 0 && c._1 < first._1))
              first = c
          }
          val selected = new scala.collection.mutable.ArrayBuffer[Long]()
          val selSet = new java.util.HashSet[Long]()
          selected += first._1; selSet.add(first._1): Unit
          out += ((first._1, 1, first._2, Lambda * first._2))
          var step = 2
          while (step <= k) {
            // (vec, rel, mmr); null = no candidate this step (the
            // unroll's empty `pick` frame)
            var bv = -1L; var br = 0.0; var bm = 0.0; var any = false
            relA.foreach { case (i, r) =>
              if (!selSet.contains(i)) {
                val edges = simM.get(i)
                var ms = 0.0; var has = false
                if (edges != null) selected.foreach { j =>
                  val s = edges.get(j)
                  // Spark's max aggregate returns NaN when any input
                  // is NaN (NaN ranks above all doubles)
                  if (s != null && (!has ||
                      java.lang.Double.compare(s.doubleValue, ms) > 0)) {
                    ms = s.doubleValue; has = true
                  }
                }
                if (has) {
                  val m = Lambda * r - (1 - Lambda) * ms
                  val cmp =
                    if (any) java.lang.Double.compare(m, bm) else 1
                  if (cmp > 0 || (cmp == 0 && i < bv)) {
                    bv = i; br = r; bm = m; any = true
                  }
                }
              }
            }
            if (any) {
              selected += bv; selSet.add(bv): Unit
              out += ((bv, step, br, bm))
            }
            step += 1
          }
        }
        out.iterator
      }
      .toDF("vec_id", "step", "rel", "mmr")
      .orderBy(col("step"))
  }

  private def mmrSql(k: Int = 5): String = {
    val steps = (2 to k).map { n =>
      val selected = (1 until n).map(i => s"SELECT vec_id FROM s$i")
        .mkString(" UNION ALL ")
      s"""p$n AS (SELECT c.vec_id, c.rel, max(s.sim) AS ms
         |  FROM vpool c JOIN sims s ON s.i = c.vec_id
         |   AND s.j IN ($selected)
         |  WHERE c.vec_id NOT IN ($selected)
         |  GROUP BY 1, 2),
         | s$n AS (SELECT vec_id, $n AS step, rel,
         |   $Lambda*rel - ${1 - Lambda}*ms AS mmr
         |  FROM p$n ORDER BY mmr DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n ")
    val unionAll = (1 to k).map(i => s"SELECT * FROM s$i")
      .mkString(" UNION ALL ")
    s"""WITH $vpoolCtes,
       | sims AS (SELECT a.vec_id AS i, b.vec_id AS j,
       |   round(list_dot_product(a.v, b.v)/(a.nrm*b.nrm), 6) AS sim
       |  FROM vpool a JOIN vpool b ON a.vec_id <> b.vec_id),
       | s1 AS (SELECT vec_id, 1 AS step, rel, $Lambda*rel AS mmr
       |        FROM vpool ORDER BY rel DESC, vec_id LIMIT 1),
       | $steps
       |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(step AS INT) AS step,
       | rel, mmr
       |FROM ($unionAll) ORDER BY step""".stripMargin
  }

  // ---- V62: feature-hashed document vectors (the hashing trick) ----

  /** Hashed-vector dimensionality (production uses 2^18+; 16 keeps the
    * oracle output readable while exercising the identical dataflow). */
  val HashDim = 16

  /** V62: model-free document vectors via the hashing trick — each
    * word maps to a bucket (md5 hex → int, the v28 spelling, both
    * engines bit-identical) with a ±1 sign bit, per-doc bucket sums
    * form a [[HashDim]]-dim integer vector. The cheap text-side
    * representation when no embedding model is in the loop: one
    * explode + one (doc,bucket) partial-agg shuffle, output ≤
    * docs×HashDim rows, integer-exact end-to-end. Zero-sum buckets
    * are dropped (HAVING <> 0) so the sparse representation is
    * canonical. */
  def hashedFeatures(spark: SparkSession, dir: String): DataFrame =
    hashedVecs(spark, dir)
      .select(col("doc_id"), col("bucket"), col("weight"))
      .orderBy(col("doc_id"), col("bucket"))

  private def hashedVecs(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(lit("feat"), col("word")))
    Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("word"))
      .select(col("doc_id"),
        pmod(conv(substring(h, 1, 2), 16, 10).cast("long"),
          lit(HashDim.toLong)).as("bucket"),
        when(conv(substring(h, 3, 1), 16, 10).cast("int") < 8, 1L)
          .otherwise(-1L).as("sgn"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("sgn")).as("weight"))
      .filter(col("weight") =!= 0)
  }

  /** V62b: cosine top-10 over the hashed vectors against doc 0 — text
    * similarity search with NO model anywhere (v3a's shape on v62's
    * representation): the query's ≤HashDim weights broadcast, one
    * bucket-keyed join + doc-keyed partial agg for the dots, LEFT
    * join so zero-overlap docs keep dot 0 (exactness), integer dots +
    * IEEE sqrt (the v51 convention) for the rounded cosine. */
  def hashedTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val f = hashedVecs(spark, dir)
    val q = f.filter(col("doc_id") === 0)
      .select(col("bucket"), col("weight").as("qw"))
    val qn = q.agg(sum(col("qw") * col("qw")).as("qnn"))
    val norms = f.groupBy(col("doc_id"))
      .agg(sum(col("weight") * col("weight")).as("nn"))
    val dots = f.join(broadcast(q), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("weight") * col("qw")).as("dot"))
    norms.join(dots, Seq("doc_id"), "left")
      .crossJoin(broadcast(qn))
      .filter(col("doc_id") =!= 0)
      .select(col("doc_id"),
        round(coalesce(col("dot"), lit(0L)).cast("double") /
          (sqrt(col("nn").cast("double")) * sqrt(col("qnn").cast("double"))),
          6).as("cos"))
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(k)
  }

  /** Shared CTE chain: words → signed buckets → canonical sparse
    * vectors `hf(doc_id, bucket, weight)`. */
  private[graft] val hashedCtes: String =
    s"""hw AS (SELECT doc_id,
       |   unnest(string_split(lower(text), ' ')) AS word
       |  FROM documents WHERE text IS NOT NULL),
       | hb AS (SELECT doc_id,
       |   CAST(('0x' || substr(md5('feat' || word), 1, 2))::INT % $HashDim
       |     AS BIGINT) AS bucket,
       |   CASE WHEN ('0x' || substr(md5('feat' || word), 3, 1))::INT < 8
       |        THEN 1 ELSE -1 END AS sgn
       |  FROM hw),
       | hf AS (SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS weight
       |  FROM hb GROUP BY 1, 2 HAVING sum(sgn) <> 0)""".stripMargin

  private val hashedFeaturesSql: String =
    s"""WITH $hashedCtes
       |SELECT doc_id, bucket, weight FROM hf
       |ORDER BY doc_id, bucket""".stripMargin

  /** The hashed-cosine ranking chain as a CTE LIST (no WITH), ending
    * in `hrank10(doc_id, cos)` — the v62b top-10; spliced into the v64
    * ranking-quality oracle so both entries rank from ONE spelling. */
  private[graft] val hashedRankCtes: String =
    s"""$hashedCtes,
       | hq AS (SELECT bucket, weight AS qw FROM hf WHERE doc_id = 0),
       | hqn AS (SELECT sum(qw * qw) AS qnn FROM hq),
       | hn AS (SELECT doc_id, sum(weight * weight) AS nn FROM hf
       |        GROUP BY 1),
       | hd AS (SELECT f.doc_id, sum(f.weight * q.qw) AS dot
       |        FROM hf f JOIN hq q USING (bucket) GROUP BY 1),
       | hrank10 AS (SELECT hn.doc_id,
       |   round(CAST(coalesce(hd.dot, 0) AS DOUBLE)
       |     / (sqrt(CAST(hn.nn AS DOUBLE)) * sqrt(CAST(hqn.qnn AS DOUBLE))),
       |     6) AS cos
       |  FROM hn LEFT JOIN hd ON hd.doc_id = hn.doc_id CROSS JOIN hqn
       |  WHERE hn.doc_id <> 0
       |  ORDER BY cos DESC, hn.doc_id LIMIT 10)""".stripMargin

  private val hashedTopKSql: String =
    s"""WITH $hashedRankCtes
       |SELECT doc_id, cos FROM hrank10 ORDER BY cos DESC, doc_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("v62_hashed_features",
      "V62 feature-hashing document vectors (the hashing trick, " +
        "model-free): md5-bucketed signed word counts as canonical " +
        "sparse HashDim-dim integer vectors — one explode + one " +
        "(doc,bucket) partial-agg shuffle, integer-exact",
      hashedFeatures, Some(hashedFeaturesSql)),
    GraftQuery("v62b_hashed_topk",
      "V62b cosine top-10 over the hashed vectors (text similarity " +
        "with no model): broadcast query weights, bucket-keyed dot " +
        "join with LEFT-join zero-overlap exactness, integer dots + " +
        "IEEE sqrt",
      (s, d) => hashedTopK(s, d), Some(hashedTopKSql)),
    GraftQuery("v59_hybrid_rrf",
      "V59 hybrid retrieval: BM25 top-20 + dense cosine top-20 fused " +
        "by Reciprocal Rank Fusion (integer micro-unit 1/(60+rank) " +
        "sums — the fused ranking itself fully oracled); all work is " +
        "over query-bounded pools, candidate generation stays in the " +
        "stored-index plans",
      (s, d) => hybridRrf(s, d), Some(hybridRrfSql)),
    GraftQuery("v60_mmr_diversify",
      "V60 MMR diversification of the dense top-20: distributed " +
        "top-pool + pair-sims, then the greedy lambda*rel - " +
        "(1-lambda)*max-sim selection as ONE in-group walk over the " +
        "query-bounded pool (pinned bit-identical to the k-step " +
        "dataflow unroll); DuckDB replays the unroll so every pick " +
        "and marginal score hash-match",
      (s, d) => mmrDiversifyGrouped(s, d), Some(mmrSql())))
}
