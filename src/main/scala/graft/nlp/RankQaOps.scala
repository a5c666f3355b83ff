package graft.nlp

import graft._
import graft.sim.FusionOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality validation for the retrieval stack (north-star
  * family, SURVEY §2.V) — the half of the signal-QA layer v55-v57 left
  * open: v55/v56/v57 score the curation SIGNALS (AUC, calibration,
  * kappa); these entries score the RANKERS. Every ANN path already has
  * a recall witness; here the lexical (v19 BM25), model-free dense
  * (v62b hashed cosine) and fused (v59 RRF) rankings get a
  * graded-relevance quality number — nDCG@10 — plus a rank-correlation
  * (Kendall tau) between the fused list and its BM25 arm.
  *
  * Cross-engine exactness: DCG's log2 discount is transcendental, so
  * the 10 position weights are precomputed ONCE here as integer
  * micro-units (⌊1e6/log2(i+1)⌉, i = 1..10) and spliced as literals
  * into BOTH the Spark plan and the DuckDB oracle — the metric is then
  * pure integer arithmetic (gains 2^rel−1 ∈ {0,1,3,7}) and the final
  * ratio uses the [[Exact.ratio6]] convention, so even the QUALITY
  * NUMBER itself is hash-agreed. Kendall tau is concordant/discordant
  * pair counts over a ≤10-row frame — integers end to end.
  *
  * Scale shape: rankers are the already-registered pool-bounded plans
  * (top-10 TakeOrderedAndProject outputs); relevance labels are one
  * linear scan each (an in-row term count / one word-keyed partial-agg
  * join); IDCG is a top-10 of the label frame. Nothing here grows past
  * the corpus-linear label pass regardless of data volume.
  */
object RankQaOps extends QueryModule {

  /** nDCG cutoff. */
  val DcgK = 10

  /** Integer micro-unit DCG discounts ⌊1e6/log2(i+1)⌉ for positions
    * 1..[[DcgK]] — computed once, spliced into both engines' plans as
    * literals so no transcendental is evaluated at query time. */
  val DcgWeights: Seq[Long] = (1 to DcgK).map(i =>
    math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))

  /** Lexical grade thresholds on total query-term frequency (qtf =
    * Σ tf over [[RankOps.QueryTerms]]): ≥12 → 3, ≥8 → 2, ≥1 → 1.
    * Chosen off the corpus qtf distribution (p95 ≈ 12, p90 ≈ 10) so
    * the ideal top-10 is all grade-3 while BM25's length
    * normalization produces a real mix — the witness discriminates
    * instead of saturating at 1.0. */
  val LexHi = 12
  val LexMid = 8

  /** Dense grade thresholds on the exact word-count-vector cosine
    * against doc 0 (rounded 6, the v51 integer-dots + IEEE-sqrt
    * convention): ≥0.70 → 3, ≥0.62 → 2, ≥0.50 → 1. The hashed ranker
    * (HashDim=16) is judged against the UNHASHED vectors it
    * approximates — graded distortion, complementing the ANN recall
    * witnesses. */
  val CosHi = 0.70
  val CosMid = 0.62
  val CosLo = 0.50

  /** Gain 2^rel − 1 for rel ∈ {0..3} as an in-row lookup (the SQL
    * spelling is `(1 << rel) - 1` — identical values). */
  private def gains(rel: Column): Column =
    element_at(typedLit(Seq(0L, 1L, 3L, 7L)), rel.cast("int") + 1)

  /** nDCG@10 of `ranked` (a ≤10-row frame with a deterministic total
    * order given by `ord`) against `labels(doc_id, rel)`: rank weights
    * from [[DcgWeights]], gains 2^rel−1, unlabeled docs grade 0, ideal
    * DCG from the label frame's top-10 grades. One output row.
    *
    * ONE labels pass (round 13): ideal DCG is a pure function of the
    * per-grade label counts — gains depend only on rel, and the
    * doc_id tie-break never moves the sum — so the old sort + limit +
    * window arm folds into the same aggregate that computes the DCG
    * hits, halving the label passes (v64b's labels are a full corpus
    * dataflow at scale). The ≤10-row ranked frame is checkpointed so
    * n_ranked and the broadcast probe share one ranker execution (the
    * v64d pool convention); ranked docs missing from the labels frame
    * carry grade 0 = gain 0, so the labels-side probe loses nothing. */
  private def ndcg10(ranker: String, ranked: DataFrame, ord: Seq[Column],
      labels: DataFrame): DataFrame = {
    val wArr = typedLit(DcgWeights)
    // cumulative rank-weight sums W(0)..W(10): ideal-DCG in closed form
    val cumW = typedLit(DcgWeights.scanLeft(0L)(_ + _))
    def wTo(n: Column) =
      element_at(cumW, least(n, lit(DcgK.toLong)).cast("int") + 1)
    val r = ranked
      .withColumn("rnk", row_number().over(Window.orderBy(ord: _*)))
      .select(col("doc_id"), col("rnk"))
      // LAZY checkpoint: the first consumer's own job materializes the
      // ≤10 rows (no separate eager job — that cost more than it saved
      // on the cheap-label arms when measured); the second consumer
      // reads the blocks, so the ranker still executes exactly once
      .localCheckpoint(eager = false)
    val stats = labels.join(broadcast(r), Seq("doc_id"), "left")
      .agg(count(lit(1)).as("n_lab"),
        coalesce(sum(when(col("rnk").isNotNull,
          gains(col("rel")) * element_at(wArr, col("rnk")))), lit(0L))
          .as("dcg_hit"),
        coalesce(sum(when(col("rel") === 3, 1L)), lit(0L)).as("n3"),
        coalesce(sum(when(col("rel") === 2, 1L)), lit(0L)).as("n2"),
        coalesce(sum(when(col("rel") === 1, 1L)), lit(0L)).as("n1"))
    r.agg(count(lit(1)).as("n_ranked")).crossJoin(stats)
      // degenerate-input parity with the old two-arm form: an empty
      // ranked frame summed to NULL dcg, an empty labels frame to
      // NULL idcg
      .withColumn("dcg_micro", when(col("n_ranked") === 0,
        lit(null).cast("long")).otherwise(col("dcg_hit")))
      .withColumn("t3", wTo(col("n3")))
      .withColumn("t32", wTo(col("n3") + col("n2")))
      .withColumn("t321", wTo(col("n3") + col("n2") + col("n1")))
      .withColumn("idcg_micro", when(col("n_lab") === 0,
        lit(null).cast("long")).otherwise(
          lit(7L) * col("t3") + lit(3L) * (col("t32") - col("t3")) +
            (col("t321") - col("t32"))))
      .select(lit(ranker).as("ranker"), col("n_ranked"),
        col("dcg_micro"), col("idcg_micro"),
        Exact.ratio6(col("dcg_micro"), col("idcg_micro")).as("ndcg"))
  }

  /** Graded lexical relevance: one in-row count of query-term
    * occurrences per doc (no shuffle), bucketed by
    * [[LexHi]]/[[LexMid]]. */
  private def lexLabels(spark: SparkSession, dir: String): DataFrame = {
    val terms = RankOps.QueryTerms
    Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(filter(split(lower(col("text")), " "),
          t => t.isInCollection(terms))).as("qtf"))
      .select(col("doc_id"),
        when(col("qtf") >= LexHi, 3).when(col("qtf") >= LexMid, 2)
          .when(col("qtf") >= 1, 1).otherwise(0).as("rel"))
  }

  /** Graded dense relevance: exact word-count-vector cosine of every
    * doc against doc 0 — integer dots via one word-keyed join against
    * the broadcast query counts, IEEE sqrt norms, rounded 6 — bucketed
    * by [[CosHi]]/[[CosMid]]/[[CosLo]]. */
  private def wordCosLabels(spark: SparkSession, dir: String): DataFrame = {
    // materialized once (round 12): f feeds the query row, the norms
    // and the dots — three aggregation consumers that each re-ran the
    // word explode+count otherwise (no exchange reuse fires across the
    // differing parent aggregates)
    val f = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val q = f.filter(col("doc_id") === 0)
      .select(col("word"), col("c").as("qc"))
    val qn = q.agg(sum(col("qc") * col("qc")).as("qnn"))
    val norms = f.groupBy(col("doc_id"))
      .agg(sum(col("c") * col("c")).as("nn"))
    val dots = f.join(broadcast(q), Seq("word"))
      .groupBy(col("doc_id")).agg(sum(col("c") * col("qc")).as("dot"))
    norms.join(dots, Seq("doc_id"), "left")
      .crossJoin(broadcast(qn))
      .filter(col("doc_id") =!= 0)
      .withColumn("cos",
        round(coalesce(col("dot"), lit(0L)).cast("double") /
          (sqrt(col("nn").cast("double")) *
            sqrt(col("qnn").cast("double"))), 6))
      .select(col("doc_id"),
        when(col("cos") >= CosHi, 3).when(col("cos") >= CosMid, 2)
          .when(col("cos") >= CosLo, 1).otherwise(0).as("rel"))
      // no label-grain checkpoint since round 13: ndcg10 folds the
      // ideal-DCG arm into the DCG aggregate, so the labels frame has
      // exactly ONE consumer and the eager materialization would be
      // pure overhead (the measured-and-rejected generic-checkpoint
      // lesson, now applying to this frame too).
  }

  /** V64a: nDCG@10 of the BM25 ranking against the graded lexical
    * labels. */
  def ndcgBm25(spark: SparkSession, dir: String): DataFrame =
    ndcg10("bm25", RankOps.bm25(spark, dir),
      Seq(col("score").desc, col("doc_id")), lexLabels(spark, dir))

  /** V64b: nDCG@10 of the hashed-vector cosine ranking (v62b,
    * HashDim=16) against grades from the exact un-hashed word-vector
    * cosine — the hashing trick's retrieval distortion as one graded
    * number. */
  def ndcgHashed(spark: SparkSession, dir: String): DataFrame =
    ndcg10("hashed_cosine", FusionOps.hashedTopK(spark, dir),
      Seq(col("cos").desc, col("doc_id")), wordCosLabels(spark, dir))

  /** V64c: nDCG@10 of the RRF-fused list (v59) against the graded
    * lexical labels — what hybrid fusion costs/keeps in lexical
    * relevance terms (the dense arm pulls in docs the lexical grades
    * don't reward). */
  def ndcgRrf(spark: SparkSession, dir: String): DataFrame =
    ndcg10("rrf", FusionOps.hybridRrf(spark, dir),
      Seq(col("rrf").desc, col("doc_id")), lexLabels(spark, dir))

  /** V64d: Kendall tau between the fused top-10 order and its BM25-arm
    * order, over fused docs present in the BM25 pool — how much the
    * dense arm re-orders the lexical ranking. Concordant/discordant
    * pair counts over a ≤10-row frame; tau as a signed micro ratio
    * ([[Exact.signedDivRound]]). */
  def rrfTauVsBm25(spark: SparkSession, dir: String): DataFrame = {
    // materialized once (round 12): the ≤10-row fused pool feeds both
    // sides of the pair self-join, which otherwise re-ran the whole
    // RRF fusion (bm25 + dense arm) twice
    val fused = FusionOps.hybridRrf(spark, dir)
      .withColumn("f", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("r_bm25") > 0)
      .select(col("doc_id"), col("f"), col("r_bm25"))
      .localCheckpoint()
    val a = fused.select(col("doc_id").as("i"), col("f").as("fi"),
      col("r_bm25").as("bi"))
    val b = fused.select(col("doc_id").as("j"), col("f").as("fj"),
      col("r_bm25").as("bj"))
    val sgn = (col("fi") - col("fj")) * (col("bi") - col("bj"))
    // explicit broadcast: the checkpointed pool's ≤10-row bound is no
    // longer visible in its lineage, so the hint carries the
    // smallness claim (PlanSpec sweep convention)
    a.crossJoin(broadcast(b)).filter(col("i") < col("j"))
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(when(sgn > 0, 1L).otherwise(0L)), lit(0L))
          .as("n_concordant"),
        coalesce(sum(when(sgn < 0, 1L).otherwise(0L)), lit(0L))
          .as("n_discordant"))
      .select(col("n_pairs"), col("n_concordant"), col("n_discordant"),
        when(col("n_pairs") === 0, lit(0.0)).otherwise(
          Exact.signedDivRound(
            (col("n_concordant") - col("n_discordant")) * 1000000L,
            col("n_pairs")).cast("double") / 1000000.0).as("tau"))
  }

  // ---- oracle SQL ----

  /** The DCG weight table as a VALUES CTE — the SAME [[DcgWeights]]
    * literals the Spark plan splices. */
  private lazy val wtsCte: String =
    "wts(i, wt) AS (VALUES " +
      DcgWeights.zipWithIndex
        .map { case (w, i) => s"(${i + 1}, ${w})" }.mkString(", ") + ")"

  /** nDCG tail over CTEs `ranked10(doc_id, rnk)` and
    * `lab(doc_id, rel)`. */
  private lazy val ndcgTail: String =
    s"""dcg AS (SELECT count(*) AS n_ranked,
       |   sum(((1 << coalesce(l.rel, 0)) - 1) * w.wt) AS dcg_micro
       |  FROM ranked10 r JOIN wts w ON w.i = r.rnk
       |  LEFT JOIN lab l ON l.doc_id = r.doc_id),
       | itop AS (SELECT rel, row_number() OVER (ORDER BY rel DESC,
       |    doc_id) AS rnk
       |  FROM (SELECT doc_id, rel FROM lab
       |        ORDER BY rel DESC, doc_id LIMIT $DcgK)),
       | idcg AS (SELECT sum(((1 << rel) - 1) * w.wt) AS idcg_micro
       |  FROM itop JOIN wts w ON w.i = itop.rnk)""".stripMargin

  private def ndcgSelect(ranker: String): String =
    s"""SELECT '$ranker' AS ranker, CAST(n_ranked AS BIGINT) AS n_ranked,
       | CAST(dcg_micro AS BIGINT) AS dcg_micro,
       | CAST(idcg_micro AS BIGINT) AS idcg_micro,
       | ${OracleSql.ratio6("dcg_micro", "idcg_micro")} AS ndcg
       |FROM dcg, idcg""".stripMargin

  /** Lexical label CTEs appended after [[RankOps.bm25Ctes]] (which
    * provides dd and tf). */
  private lazy val lexLabCtes: String =
    s"""qt AS (SELECT dd.doc_id, coalesce(t.qtf, 0) AS qtf
       |  FROM dd LEFT JOIN (SELECT doc_id, sum(tf) AS qtf FROM tf
       |                     GROUP BY 1) t ON t.doc_id = dd.doc_id),
       | lab AS (SELECT doc_id, CASE WHEN qtf >= $LexHi THEN 3
       |   WHEN qtf >= $LexMid THEN 2 WHEN qtf >= 1 THEN 1 ELSE 0 END
       |   AS rel FROM qt)""".stripMargin

  private lazy val ndcgBm25Sql: String =
    s"""WITH ${RankOps.bm25Ctes},
       | $lexLabCtes,
       | ranked10 AS (SELECT doc_id, row_number() OVER (ORDER BY score
       |    DESC, doc_id) AS rnk
       |  FROM (SELECT doc_id, score FROM bmscores
       |        ORDER BY score DESC, doc_id LIMIT $DcgK)),
       | $wtsCte,
       | $ndcgTail
       |${ndcgSelect("bm25")}""".stripMargin

  private lazy val ndcgHashedSql: String =
    s"""WITH ${FusionOps.hashedRankCtes},
       | wf AS (SELECT doc_id, word, count(*) AS c FROM hw GROUP BY 1, 2),
       | wq AS (SELECT word, c AS qc FROM wf WHERE doc_id = 0),
       | wqn AS (SELECT sum(qc * qc) AS qnn FROM wq),
       | wn AS (SELECT doc_id, sum(c * c) AS nn FROM wf GROUP BY 1),
       | wd AS (SELECT f.doc_id, sum(f.c * q.qc) AS dot
       |        FROM wf f JOIN wq q USING (word) GROUP BY 1),
       | lab AS (SELECT doc_id, CASE WHEN cos >= $CosHi THEN 3
       |    WHEN cos >= $CosMid THEN 2 WHEN cos >= $CosLo THEN 1
       |    ELSE 0 END AS rel
       |  FROM (SELECT wn.doc_id,
       |     round(CAST(coalesce(wd.dot, 0) AS DOUBLE)
       |       / (sqrt(CAST(wn.nn AS DOUBLE))
       |          * sqrt(CAST(wqn.qnn AS DOUBLE))), 6) AS cos
       |    FROM wn LEFT JOIN wd ON wd.doc_id = wn.doc_id CROSS JOIN wqn
       |    WHERE wn.doc_id <> 0)),
       | ranked10 AS (SELECT doc_id, row_number() OVER (ORDER BY cos
       |    DESC, doc_id) AS rnk FROM hrank10),
       | $wtsCte,
       | $ndcgTail
       |${ndcgSelect("hashed_cosine")}""".stripMargin

  private lazy val ndcgRrfSql: String =
    s"""WITH ${FusionOps.rrfCtes},
       | $lexLabCtes,
       | ranked10 AS (SELECT doc_id, row_number() OVER (ORDER BY
       |    rrf_micro DESC, doc_id) AS rnk FROM fused10),
       | $wtsCte,
       | $ndcgTail
       |${ndcgSelect("rrf")}""".stripMargin

  private lazy val rrfTauSql: String =
    s"""WITH ${FusionOps.rrfCtes},
       | fr AS (SELECT doc_id, r_bm25, row_number() OVER (ORDER BY
       |    rrf_micro DESC, doc_id) AS f FROM fused10),
       | cmn AS (SELECT doc_id, f, r_bm25 FROM fr WHERE r_bm25 > 0),
       | prs AS (SELECT a.f AS fi, a.r_bm25 AS bi, b.f AS fj,
       |    b.r_bm25 AS bj
       |  FROM cmn a JOIN cmn b ON a.doc_id < b.doc_id),
       | agg AS (SELECT count(*) AS n_pairs,
       |   coalesce(sum(CASE WHEN (fi - fj) * (bi - bj) > 0
       |     THEN 1 ELSE 0 END), 0) AS n_concordant,
       |   coalesce(sum(CASE WHEN (fi - fj) * (bi - bj) < 0
       |     THEN 1 ELSE 0 END), 0) AS n_discordant
       |  FROM prs)
       |SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
       | CAST(n_concordant AS BIGINT) AS n_concordant,
       | CAST(n_discordant AS BIGINT) AS n_discordant,
       | CASE WHEN n_pairs = 0 THEN 0.0 ELSE
       |  CAST(${OracleSql.signedDivRound(
              "(n_concordant - n_discordant) * 1000000", "n_pairs")}
       |    AS DOUBLE) / 1000000.0 END AS tau
       |FROM agg""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("v64a_ndcg_bm25",
      "V64a nDCG@10 of the BM25 ranking vs graded query-term-frequency " +
        "labels: integer-rational DCG (precomputed micro-unit log2 " +
        "discounts spliced into both engines), gains 2^rel-1 — the " +
        "ranking-quality number itself is hash-agreed",
      ndcgBm25, Some(ndcgBm25Sql)),
    GraftQuery("v64b_ndcg_hashed",
      "V64b nDCG@10 of the hashed-vector cosine ranking (v62b, " +
        "HashDim=16) vs grades from the exact un-hashed word-vector " +
        "cosine: the hashing trick's graded retrieval distortion, " +
        "integer-exact end to end",
      ndcgHashed, Some(ndcgHashedSql)),
    GraftQuery("v64c_ndcg_rrf",
      "V64c nDCG@10 of the RRF-fused top-10 (v59) vs the graded " +
        "lexical labels: what hybrid fusion keeps of lexical relevance " +
        "when the dense arm votes",
      ndcgRrf, Some(ndcgRrfSql)),
    GraftQuery("v64d_rrf_tau",
      "V64d Kendall tau between the fused top-10 order and its " +
        "BM25-arm ranks (concordant/discordant pairs over a <=10-row " +
        "frame, signed micro ratio): how much the dense arm re-orders " +
        "the lexical list",
      rrfTauVsBm25, Some(rrfTauSql)))
}
