package graft.nlp

import graft._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** V55-V57: statistical QA of the curation signals themselves — the
  * step a real training-data pipeline runs BEFORE trusting a heuristic
  * at 100 TB: does the v4b quality score actually separate the class
  * it's used to gate (ROC-AUC), is it calibrated (reliability bins),
  * and does the v4a language-ID agree with the corpus's declared
  * labels beyond chance (Cohen's kappa)?
  *
  * All three are EXACT integer/rational statistics (micro-unit scores,
  * rank-free pairwise AUC, integer confusion sums), so each carries a
  * full DuckDB oracle — the signal-validation layer is hash-checked
  * like every other operator.
  *
  * Scale shapes: AUC avoids the textbook global rank (a
  * constant-partitioned window over the corpus — exactly what the
  * PlanSpec sweep rejects) by aggregating (score → n_pos, n_neg) onto
  * the score-DOMAIN frame (≤1e6 micro values by construction,
  * corpus-size-independent) and prefix-summing negatives there;
  * calibration is one groupBy onto 11 bins; kappa is one confusion
  * aggregate onto a labels×labels frame.
  */
object ScoreQaOps extends QueryModule {

  /** Per-doc (micro-unit score, is_en) — the v4b score verbatim: the
    * blend comes from [[TextOps.scoreMicro]] and the marker list from
    * [[TextOps.markers]], the SAME definitions the gate itself runs
    * (re-spelling either here would let the validated score silently
    * drift from the gating score — review finding, r7). The binary
    * class is the corpus's DECLARED language (the score later gates
    * English training data, so "does it separate declared-en" is the
    * natural validation question). */
  private def scored(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      // THE gate's tokenization (TextOps.words), not a local re-spell:
      // these validators certify the score the v13 gate ships, so a
      // tokenization change must hit scorer and validators at once
      // (round-10 review)
      .withColumn("w", TextOps.words)
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("n_distinct",
        size(array_distinct(col("w"))).cast("long"))
      .withColumn("s_en", graft.functions.MarkerFunctions.marker_counts(
        col("w"), Seq(TextOps.markers("en"))).getItem(0).cast("long"))
      .select(col("doc_id"), TextOps.scoreMicro.as("sc"),
        (col("lang") === "en").cast("int").as("pos"))

  private val scoredSql: String =
    s"""sc0 AS (SELECT doc_id,
       |  len(${TextOps.wordsSql}) AS nw,
       |  len(list_distinct(${TextOps.wordsSql})) AS nd,
       |  ${TextOps.markerSql("en")} AS sm,
       |  CAST(lang = 'en' AS INT) AS pos
       | FROM documents WHERE text IS NOT NULL),
       | scd AS (SELECT doc_id,
       |  ${OracleSql.ratio6Micro(
            "(least(nw,100)*nw*40 + (sm+nd)*3000)", "nw*10000")} AS sc,
       |  pos
       | FROM sc0)""".stripMargin

  /** V55: ROC-AUC of the quality score against the declared-English
    * class, in the tie-aware pairwise form: AUC = (#(pos>neg pairs) +
    * ½·#(ties)) / (n_pos·n_neg). Computed WITHOUT a global rank:
    * aggregate to one row per distinct micro-score (the score-domain
    * frame), order THAT frame, prefix-sum negatives, and fold — the
    * doubled-integer numerator Σ n_pos(s)·(2·neg_below(s) + n_neg(s))
    * over 2·n_pos·n_neg stays exact in both engines. The numerator is
    * ~n²/2 — quadratic in corpus size — so it accumulates in
    * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): in Long it wraps
    * silently at ~5M docs while DuckDB errors, breaking both the value
    * and the cross-engine agreement (review finding, r7). */
  def scoreAuc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    def d(c: Column): Column = c.cast(DecimalType(38, 0))
    val byScore = scored(spark, dir)
      .groupBy(col("sc"))
      .agg(sum(col("pos")).cast("long").as("np"),
        sum(lit(1) - col("pos")).cast("long").as("nn"))
    val w = Window.orderBy(col("sc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("cum_nn", sum(col("nn")).over(w) - col("nn"))
      .agg(sum(col("np")).cast("long").as("n_pos"),
        sum(col("nn")).cast("long").as("n_neg"),
        sum(d(col("np")) * d(col("cum_nn") * 2L + col("nn")))
          .as("num2"))
      .select(col("n_pos"), col("n_neg"),
        Exact.ratio6Dec(col("num2"), d(col("n_pos")) * d(col("n_neg")) * 2L)
          .as("auc"))
  }

  private lazy val scoreAucSql: String =
    s"""WITH $scoredSql,
       | g AS (SELECT sc, CAST(sum(pos) AS BIGINT) AS np,
       |        CAST(sum(1 - pos) AS BIGINT) AS nn
       |       FROM scd GROUP BY sc),
       | c AS (SELECT sc, np, nn,
       |        sum(nn) OVER (ORDER BY sc
       |          ROWS UNBOUNDED PRECEDING) - nn AS cum_nn
       |       FROM g)
       |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       | CAST(sum(nn) AS BIGINT) AS n_neg,
       | ${OracleSql.ratio6Huge("sum(np::HUGEINT * (cum_nn * 2 + nn))",
          "sum(np)::HUGEINT * sum(nn)::HUGEINT * 2")} AS auc
       |FROM c""".stripMargin

  /** V56: calibration / reliability bins — score deciles (fixed 0.1
    * bins over the micro score, clamped to bin 10 for score ≥ 1) with
    * per-bin count, exact mean score and empirical positive rate. The
    * reliability-diagram table that says whether 0.8 means 80%. */
  def scoreCalibration(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir)
      .withColumn("bin", least(Exact.intDiv(col("sc"), lit(100000L)),
        lit(10L)).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        // per-bin micro-score mass is n·1e6-scale: ×1e6 again inside
        // the ratio passes Long at ~9M docs/bin → DECIMAL/HUGEINT
        Exact.ratio6Dec(sum(col("sc")), count(lit(1)) * 1000000L)
          .as("mean_score"),
        Exact.ratio6(sum(col("pos")).cast("long"), count(lit(1)))
          .as("pos_rate"))
      .orderBy(col("bin"))

  private lazy val scoreCalibrationSql: String =
    s"""WITH $scoredSql
       |SELECT CAST(least(sc // 100000, 10) AS INT) AS bin,
       | CAST(count(*) AS BIGINT) AS n,
       | ${OracleSql.ratio6Huge("sum(sc)",
          "count(*) * 1000000")} AS mean_score,
       | ${OracleSql.ratio6("CAST(sum(pos) AS BIGINT)", "count(*)")}
       |   AS pos_rate
       |FROM scd GROUP BY 1 ORDER BY 1""".stripMargin

  /** V57: Cohen's kappa between the corpus's DECLARED language column
    * and the v4a marker-argmax detector — chance-corrected agreement,
    * the label-QA number that tells you whether a heuristic labeler is
    * better than guessing before it gates anything. Exact rational:
    * kappa = (diag·N − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k),
    * signed half-up at 6 dp (the numerator can go negative). One
    * confusion aggregate onto a labels² frame. */
  def langIdKappa(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d(c: Column): Column = c.cast(DecimalType(38, 0))
    val conf = TextOps.withMarkerScores(
        Tables.documents(spark, dir).filter(col("text").isNotNull))
      .withColumn("detected", TextOps.argmaxLang)
      .select(col("lang"), col("detected"))
    val cells = conf.groupBy(col("lang"), col("detected"))
      .agg(count(lit(1)).as("c")).localCheckpoint()
    val n = cells.agg(sum(col("c")).cast("long").as("n"))
    val diag = cells.filter(col("lang") === col("detected"))
      .agg(coalesce(sum(col("c")), lit(0L)).cast("long").as("diag"))
    val rows = cells.groupBy(col("lang"))
      .agg(sum(col("c")).cast("long").as("rn"))
    val cols = cells.groupBy(col("detected"))
      .agg(sum(col("c")).cast("long").as("cn"))
    // rn·cn and the n², diag·n chance terms below are quadratic in
    // corpus size: DECIMAL(38,0) throughout (Long wraps at ~3M docs
    // where DuckDB's HUGEINT doesn't — review finding, r7)
    val rc = rows.join(cols, col("lang") === col("detected"))
      .agg(coalesce(sum(d(col("rn")) * d(col("cn"))),
        d(lit(0L))).as("src"))
    n.crossJoin(broadcast(diag)).crossJoin(broadcast(rc))
      .select(col("n").as("n_docs"),
        Exact.ratio6(col("diag"), col("n")).as("po"),
        Exact.ratio6Dec(col("src"), d(col("n")) * d(col("n"))).as("pe"),
        (Exact.signedDivRoundDec(
          (d(col("diag")) * d(col("n")) - col("src")) * 1000000L,
          d(col("n")) * d(col("n")) - col("src")).cast("double")
          / 1000000.0)
          .as("kappa"))
  }

  private lazy val langIdKappaSql: String =
    s"""WITH s AS (SELECT lang,
       |  ${TextOps.markerSql("en")} AS s_en, ${TextOps.markerSql("de")} AS s_de,
       |  ${TextOps.markerSql("es")} AS s_es, ${TextOps.markerSql("fr")} AS s_fr
       | FROM documents WHERE text IS NOT NULL),
       | d AS (SELECT lang, CASE
       |   WHEN s_en+s_de+s_es+s_fr = 0 THEN 'und'
       |   WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
       |   WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
       |   WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS detected
       |  FROM s),
       | cells AS (SELECT lang, detected, count(*) AS c
       |           FROM d GROUP BY 1, 2),
       | nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
       | dg AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS diag
       |        FROM cells WHERE lang = detected),
       | r AS (SELECT lang, CAST(sum(c) AS BIGINT) AS rn
       |       FROM cells GROUP BY 1),
       | cc AS (SELECT detected, CAST(sum(c) AS BIGINT) AS cn
       |        FROM cells GROUP BY 1),
       | rc AS (SELECT coalesce(sum(rn::HUGEINT * cn), 0::HUGEINT) AS src
       |        FROM r JOIN cc ON r.lang = cc.detected)
       |SELECT n AS n_docs,
       | ${OracleSql.ratio6("diag", "n")} AS po,
       | ${OracleSql.ratio6Huge("src", "n::HUGEINT * n")} AS pe,
       | CAST(${OracleSql.signedDivRound(
          "(diag::HUGEINT * n - src) * 1000000",
          "n::HUGEINT * n - src")} AS DOUBLE)
       |   / 1000000.0 AS kappa
       |FROM nn, dg, rc""".stripMargin

  /** The shipped v13 gate threshold in micro units (0.38) — the
    * operating point v77 evaluates. */
  private val GateMicro =
    math.round(graft.nlp.TextOps.GateThreshold * 1e6)

  /** V77: gate operating point — v55 says the score RANKS well and
    * v56 says it is calibrated; neither says what the gate DOES at
    * the threshold the pipeline actually ships (0.38): per-class
    * confusion counts and exact precision / recall / F1 / accuracy
    * against the declared-English class. F1 avoids the two-ratio
    * composition entirely via its integer identity
    * 2tp/(2tp+fp+fn) — one exact ratio, no intermediate rounding.
    * One conditional-sum pass over the scored frame; a 1-row
    * output. */
  def gateOperatingPoint(spark: SparkSession, dir: String): DataFrame = {
    val s = scored(spark, dir)
      .withColumn("pred", (col("sc") >= GateMicro).cast("int"))
    s.agg(
      sum(col("pred") * col("pos")).cast("long").as("tp"),
      sum(col("pred") * (lit(1) - col("pos"))).cast("long").as("fp"),
      sum((lit(1) - col("pred")) * col("pos")).cast("long").as("fn"),
      sum((lit(1) - col("pred")) * (lit(1) - col("pos"))).cast("long")
        .as("tn"))
      .select(lit(GateMicro / 1e6).as("threshold"),
        col("tp"), col("fp"), col("fn"), col("tn"),
        Exact.ratio6(col("tp"), col("tp") + col("fp")).as("precision"),
        Exact.ratio6(col("tp"), col("tp") + col("fn")).as("recall"),
        Exact.ratio6(col("tp") * 2L,
          col("tp") * 2L + col("fp") + col("fn")).as("f1"),
        Exact.ratio6(col("tp") + col("tn"),
          col("tp") + col("fp") + col("fn") + col("tn")).as("accuracy"))
  }

  private lazy val gateOperatingPointSql: String =
    s"""WITH $scoredSql,
       | cm AS (SELECT
       |   CAST(sum(CASE WHEN sc >= $GateMicro AND pos = 1
       |     THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |   CAST(sum(CASE WHEN sc >= $GateMicro AND pos = 0
       |     THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |   CAST(sum(CASE WHEN sc < $GateMicro AND pos = 1
       |     THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |   CAST(sum(CASE WHEN sc < $GateMicro AND pos = 0
       |     THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM scd)
       |SELECT CAST(${GateMicro / 1e6} AS DOUBLE) AS threshold, tp, fp, fn, tn,
       | ${OracleSql.ratio6("tp", "tp + fp")} AS precision,
       | ${OracleSql.ratio6("tp", "tp + fn")} AS recall,
       | ${OracleSql.ratio6("tp * 2", "tp * 2 + fp + fn")} AS f1,
       | ${OracleSql.ratio6("(tp + tn)", "tp + fp + fn + tn")} AS accuracy
       |FROM cm""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("v77_gate_operating_point",
      "V77 gate operating point: confusion counts + exact precision/" +
        "recall/F1/accuracy of the v4b score at the SHIPPED 0.38 gate " +
        "threshold vs the declared-English class — F1 via its integer " +
        "identity 2tp/(2tp+fp+fn), one conditional-sum pass, 1-row " +
        "output",
      gateOperatingPoint, Some(gateOperatingPointSql)),
    GraftQuery("v55_score_auc",
      "V55 ROC-AUC of the v4b quality score vs the declared-English " +
        "class (tie-aware pairwise form) — computed on the bounded " +
        "score-DOMAIN frame with a prefix sum, never a global rank " +
        "over the corpus; exact doubled-integer arithmetic",
      scoreAuc, Some(scoreAucSql)),
    GraftQuery("v56_score_calibration",
      "V56 reliability bins for the quality score: per-decile count, " +
        "exact mean score and empirical positive rate — the " +
        "calibration table behind any score threshold decision",
      scoreCalibration, Some(scoreCalibrationSql)),
    GraftQuery("v57_langid_kappa",
      "V57 Cohen's kappa between declared lang and the v4a detector " +
        "(chance-corrected label agreement, signed exact rational) — " +
        "one confusion aggregate onto a labels-squared frame",
      langIdKappa, Some(langIdKappaSql)))
}
