package graft.operators

import graft._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-monitoring statistics over `events`: distribution drift
  * between time windows (v35), robust MAD outlier gating (v36),
  * least-squares trend slopes (w11) and series gap-fill by linear
  * interpolation (w12). None exist in the reference (its analytics stop
  * at grouped aggregates/percentiles — api/service.go:1040-1341); all
  * four are table-stakes for a pipeline that has to notice when an
  * upstream feed changes shape before a 100 TB training run consumes it.
  *
  * Determinism: every comparison and every emitted number is computed in
  * exact integer (micro-unit) space or on 6-dp-rounded fences — the
  * [[Exact]]/[[OracleSql]] conventions — so DuckDB reproduces each row
  * bit-for-bit. Logs/sqrt are deliberately avoided (PSI → total-variation
  * distance; robust z → a rational multiple of MAD): transcendental
  * libm calls are the one thing two engines won't agree on.
  *
  * Scale notes: v35/w11/w12 aggregate onto DOMAIN-bounded frames (~23
  * value bins, 30 days, 720 hour-buckets per type) before any window
  * runs, so their windows never see data-sized partitions — same
  * argument as v30's bucketed CDF. v36 is winsorize's (v26) two-level
  * extension: two grouped-percentile passes + a broadcast-back map; at
  * 100 TB both fences swap to approx_percentile, same as v26.
  */
object StatsOps extends QueryModule {
  private val Start = EventWindow.StartS
  private val End = EventWindow.EndS
  private val Day = 86400L
  private val Hour = 3600L
  /** v35's split point: first 15 days vs the rest of the month. */
  private val Mid = Start + 15 * Day
  /** v35's value-bin width; shipped values reach ~560 at sf0.1 → ~23
    * bins (the earlier "≤21" claim was stale); the 1024 pack factor
    * keeps the decode sound through value < 25600. */
  private val BinW = 25.0

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)

  // ---- U9: seasonal-baseline anomaly report ----

  /** U9: seasonal anomaly detection — the alerting layer on top of
    * w16's seasonality profile: the first 21 days build a per
    * (event_type, weekday, hour-of-day) baseline (3 same-slot
    * occurrences summed), and every hour of the final 9 days is graded
    * against its slot: HIGH when the hour's count exceeds 2× the slot's
    * weekly average (3·n > 2·base), LOW when it falls under a sixth of
    * it (6·n < base) — both pure integer cross-multiplications, no
    * division, so zero-baseline slots are safe by construction (the
    * v35 ADVICE lesson) and both engines agree bit-for-bit. Grading
    * runs over the DENSE (type × day × hour) domain grid, so an hour
    * with ZERO events and a live baseline is flagged low — the outage
    * shape a sparse join would silently skip. Output: one summary row
    * per (type, day) with flagged-hour counts — bounded at
    * types×9 rows at any data volume.
    *
    * Scale: two linear scans aggregate onto domain-bounded frames
    * (types×168 baseline, types×216 eval) BEFORE any join; the grid is
    * a calendar Range crossed with the tiny type dictionary, the
    * baseline joins back broadcast. No window at all. */
  def seasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
      .withColumn("off", col("ts_s") - Start)
      .withColumn("day", Exact.intDiv(col("off"), lit(Day)))
      .withColumn("hod", Exact.intDiv(col("off") % Day, lit(3600L)))
    val base = e.filter(col("day") < 21)
      .groupBy(col("event_type"), pmod(col("day"), lit(7L)).as("dow"),
        col("hod"))
      .agg(count(lit(1)).as("base"))
    val obs = e.filter(col("day") >= 21)
      .groupBy(col("event_type"), col("day"), col("hod"))
      .agg(count(lit(1)).as("n_obs"))
    val grid = e.select(col("event_type")).distinct()
      .crossJoin(spark.range(21, 30).select(col("id").as("day")))
      .crossJoin(spark.range(0, 24).select(col("id").as("hod")))
    val graded = grid
      .join(obs, Seq("event_type", "day", "hod"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      // fresh aliases on the baseline side: grid/obs/base all descend
      // from the same scan, and same-id attributes across a self-join
      // are unresolvable (the st-suite lesson)
      .join(broadcast(base.select(col("event_type").as("b_type"),
          col("dow").as("b_dow"), col("hod").as("b_hod"), col("base"))),
        col("event_type") === col("b_type") &&
          pmod(col("day"), lit(7L)) === col("b_dow") &&
          col("hod") === col("b_hod"), "left")
      .drop("b_type", "b_dow", "b_hod")
      .withColumn("base", coalesce(col("base"), lit(0L)))
    graded.groupBy(col("event_type"), col("day"))
      .agg(
        sum(when(col("n_obs") * 3 > col("base") * 2, 1L).otherwise(0L))
          .as("n_hours_high"),
        sum(when(col("n_obs") * 6 < col("base"), 1L).otherwise(0L))
          .as("n_hours_low"),
        sum(col("n_obs")).as("obs_total"),
        sum(col("base")).as("base_total"))
      .orderBy(col("event_type"), col("day"))
  }

  /** W26: CUSUM change-point monitor — the SEQUENTIAL drift detector
    * u9's per-slot grading can't express: a small persistent level
    * shift never trips a per-hour threshold but accumulates in a
    * cumulative sum. Page's CUSUM with allowance k = μ/4 and decision
    * threshold h = 2μ, run per event type over the dense final-9-day
    * grid against the first-21-day baseline mean μ. The recursive
    * C_t = max(0, C_{t−1} + x_t − μ − k) is rewritten into its CLOSED
    * form C_t = P_t − min(0, min_{s≤t} P_s) (prefix sum minus running
    * floor) so it is two window functions, not a recursion; everything
    * is INTEGER by cross-multiplication — scaling by 84 = 4·21 turns
    * x_t − μ ∓ μ/4 into 84·x_t − 5·S21 / 3·S21 − 84·x_t and h into
    * 8·S21 (S21 = the type's 21-day count), so both engines agree
    * bit-for-bit with zero division. Both directions monitored; a
    * type absent from the baseline (S21 = 0, threshold 0) alarms UP
    * from its first observation onward — new-feed detection,
    * deliberate — and the strict `statistic > 0` conjunct keeps the
    * zero threshold from firing on empty days before that first
    * observation, or ever firing DOWN for a feed with no baseline to
    * fall below (review finding, r8).
    *
    * Scale: two linear scans aggregate onto domain-bounded frames
    * (types, types×9) before the windows; windows run per type over
    * ≤9 rows. */
  def cusumMonitor(spark: SparkSession, dir: String): DataFrame =
    cusumOf(spark, ev(spark, dir)
      .withColumn("day", Exact.intDiv(col("ts_s") - Start, lit(Day))))

  /** [[cusumMonitor]]'s core over any (event_type, day) event frame —
    * public so the spec can plant a level shift (the shipped feed is
    * stable, which a detection test must not rely on). */
  private[graft] def cusumOf(spark: SparkSession, e: DataFrame): DataFrame = {
    val s21 = e.filter(col("day") < 21).groupBy(col("event_type"))
      .agg(count(lit(1)).as("s21"))
    val obs = e.filter(col("day") >= 21)
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_obs"))
    val grid = e.select(col("event_type")).distinct()
      .crossJoin(spark.range(21, 30).select(col("id").as("day")))
    cusumReadout(cusumAssemble(grid, obs, s21))
  }

  /** Dense (type × eval-day) frame with observed counts and baseline
    * mass — the shape [[cusumReadout]] consumes; shared by the batch
    * monitor and its streaming twin (st26), which supplies `obs` from
    * streaming aggregation state. */
  private def cusumAssemble(grid: DataFrame, obs: DataFrame,
      s21: DataFrame): DataFrame =
    grid.join(obs, Seq("event_type", "day"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .join(broadcast(s21), Seq("event_type"), "left")
      .withColumn("s21", coalesce(col("s21"), lit(0L)))

  /** The closed-form CUSUM windows + alarm readout over the assembled
    * bounded frame — ONE spelling for w26 and st26. */
  private def cusumReadout(x: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    x.withColumn("p_up",
        sum(col("n_obs") * 84L - col("s21") * 5L).over(w))
      .withColumn("p_dn",
        sum(col("s21") * 3L - col("n_obs") * 84L).over(w))
      .withColumn("c_up", col("p_up") -
        least(min(col("p_up")).over(w), lit(0L)))
      .withColumn("c_dn", col("p_dn") -
        least(min(col("p_dn")).over(w), lit(0L)))
      .select(col("event_type"), col("day"), col("n_obs"),
        col("c_up"), col("c_dn"),
        (col("c_up") >= col("s21") * 8L && col("c_up") > 0L)
          .as("alarm_up"),
        (col("c_dn") >= col("s21") * 8L && col("c_dn") > 0L)
          .as("alarm_dn"))
      .orderBy(col("event_type"), col("day"))
  }

  /** ST26: the CUSUM monitor SERVED LIVE — the whole point of a
    * sequential test is to watch a RUNNING feed (the w24→st22
    * argument applied to drift detection): per-(type, day) eval
    * counts are maintained as streaming aggregation state (algebraic,
    * O(types × days) rows), the baseline mass is the batch-side
    * trained artifact (localCheckpointed — broadcast sides re-execute
    * per micro-batch), and the closed-form window readout runs on the
    * final bounded state through the SAME [[cusumReadout]] spelling —
    * batch and stream cannot drift. Shares w26's oracle. */
  def streamingCusum(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
      .withColumn("day", Exact.intDiv(col("ts_s") - Start, lit(Day)))
    val s21 = e.filter(col("day") < 21).groupBy(col("event_type"))
      .agg(count(lit(1)).as("s21")).localCheckpoint()
    val grid = e.select(col("event_type")).distinct()
      .crossJoin(spark.range(21, 30).select(col("id").as("day")))
      .localCheckpoint()
    val obs = graft.streaming.StreamingOps.runToBatch(spark,
      graft.streaming.StreamingOps.eventsStream(spark, dir)
        .withColumn("day", Exact.intDiv(col("ts_s") - Start, lit(Day)))
        .filter(col("day") >= 21)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n_obs")),
      s"st26_cusum_${System.nanoTime()}")
    cusumReadout(cusumAssemble(grid, obs, s21))
  }

  private[graft] lazy val cusumSql: String =
    s"""WITH e AS (SELECT event_type,
       |   (epoch_us(ts)//1000000 - $Start) // $Day AS day FROM events),
       | s21 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS s21
       |         FROM e WHERE day < 21 GROUP BY 1),
       | obs AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_obs
       |         FROM e WHERE day >= 21 GROUP BY 1, 2),
       | grid AS (SELECT t.event_type, d.day
       |   FROM (SELECT DISTINCT event_type FROM e) t,
       |        (SELECT unnest(range(21, 30)) AS day) d),
       | x AS (SELECT g.event_type, g.day,
       |    coalesce(o.n_obs, 0) AS n_obs, coalesce(s.s21, 0) AS s21
       |   FROM grid g LEFT JOIN obs o USING (event_type, day)
       |   LEFT JOIN s21 s USING (event_type)),
       | p AS (SELECT *,
       |    sum(n_obs * 84 - s21 * 5) OVER wd AS p_up,
       |    sum(s21 * 3 - n_obs * 84) OVER wd AS p_dn
       |   FROM x WINDOW wd AS (PARTITION BY event_type ORDER BY day
       |     ROWS UNBOUNDED PRECEDING)),
       | c AS (SELECT *,
       |    p_up - least(min(p_up) OVER wd, 0) AS c_up,
       |    p_dn - least(min(p_dn) OVER wd, 0) AS c_dn
       |   FROM p WINDOW wd AS (PARTITION BY event_type ORDER BY day
       |     ROWS UNBOUNDED PRECEDING))
       |SELECT event_type, day, n_obs,
       | CAST(c_up AS BIGINT) AS c_up, CAST(c_dn AS BIGINT) AS c_dn,
       | c_up >= s21 * 8 AND c_up > 0 AS alarm_up,
       | c_dn >= s21 * 8 AND c_dn > 0 AS alarm_dn
       |FROM c ORDER BY event_type, day""".stripMargin

  private lazy val seasonalAnomalySql: String =
    s"""WITH e AS (
       |  SELECT event_type,
       |   (epoch_us(ts)//1000000 - $Start) AS off FROM events),
       | ed AS (SELECT event_type, off // $Day AS day,
       |         (off % $Day) // 3600 AS hod FROM e),
       | b AS (SELECT event_type, day % 7 AS dow, hod, count(*) AS base
       |       FROM ed WHERE day < 21 GROUP BY 1, 2, 3),
       | o AS (SELECT event_type, day, hod, count(*) AS n_obs
       |       FROM ed WHERE day >= 21 GROUP BY 1, 2, 3),
       | g AS (SELECT ty.event_type, d.day, h.hod
       |       FROM (SELECT DISTINCT event_type FROM events) ty,
       |            range(21, 30) d(day), range(0, 24) h(hod)),
       | j AS (SELECT g.event_type, g.day, g.hod,
       |        coalesce(o.n_obs, 0) AS n_obs, coalesce(b.base, 0) AS base
       |       FROM g
       |        LEFT JOIN o ON o.event_type = g.event_type
       |                   AND o.day = g.day AND o.hod = g.hod
       |        LEFT JOIN b ON b.event_type = g.event_type
       |                   AND b.dow = g.day % 7 AND b.hod = g.hod)
       |SELECT event_type, CAST(day AS BIGINT) AS day,
       | CAST(sum(CASE WHEN n_obs*3 > base*2 THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_hours_high,
       | CAST(sum(CASE WHEN n_obs*6 < base THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_hours_low,
       | CAST(sum(n_obs) AS BIGINT) AS obs_total,
       | CAST(sum(base) AS BIGINT) AS base_total
       |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- V35: distribution drift (early vs late window) ----

  /** V35: distribution-shift monitor — per event_type, compare the value
    * distribution of the first 15 days against the rest of the month on
    * a fixed 25-wide bin grid: total-variation distance (½·Σ|p−q|), the
    * largest single-bin jump and which bin jumped. The dataset-shift
    * check a feed-level SLO runs before training data is extended; TVD
    * is PSI's bounded, log-free cousin — exact in integer space, where
    * PSI's per-bin log ratio would hash-diverge across engines.
    *
    * One scan → (type, bin) counts (~23 bins/type BY DOMAIN, however
    * many rows); shares and |p−q| in integer micro-units over the
    * bounded bin frame; max-jump tie-broken deterministically by packing
    * (Δmicro, bin) into one integer key. Linear, one shuffle. */
  def drift(spark: SparkSession, dir: String): DataFrame = {
    val binned = ev(spark, dir)
      .groupBy(col("event_type"),
        floor(col("value") / BinW).cast("int").as("bin"))
      .agg(sum(when(col("ts_s") < Mid, 1).otherwise(0)).cast("long").as("na"),
        sum(when(col("ts_s") >= Mid, 1).otherwise(0)).cast("long").as("nb"))
    val wt = Window.partitionBy(col("event_type"))
    val shares = binned
      .withColumn("na_tot", sum(col("na")).over(wt))
      .withColumn("nb_tot", sum(col("nb")).over(wt))
      // empty-half guard: a type with every row in one half has
      // na_tot/nb_tot = 0; define that half's shares as 0 (TVD then
      // reads 0.5 = full drift) instead of letting the integer division
      // go NULL and silently drop the bins from the sum
      .withColumn("pm", when(col("na_tot") > 0, Exact.intDiv(
        col("na") * 1000000L + shiftright(col("na_tot"), 1), col("na_tot")))
        .otherwise(0L))
      .withColumn("qm", when(col("nb_tot") > 0, Exact.intDiv(
        col("nb") * 1000000L + shiftright(col("nb_tot"), 1), col("nb_tot")))
        .otherwise(0L))
      .withColumn("d", abs(col("pm") - col("qm")))
    shares.groupBy(col("event_type"))
      .agg(max(col("na_tot")).as("n_early"),
        max(col("nb_tot")).as("n_late"),
        count(lit(1)).as("n_bins"),
        (sum(col("d")).cast("double") / 2000000.0).as("tvd"),
        // (Δmicro, bin) packed into one integer so max() is
        // deterministic under ties (largest bin wins); factor 1024
        // (the w17 convention) bounds the decode at value < 25600 —
        // the shipped data already passed the earlier comment's ~500
        // domain (sf0.1 max 560 → bin 22), so the old *100 pack had
        // only ~4x headroom before silently decoding garbage in BOTH
        // engines (round-10 review); mirrored in the oracle
        max(col("d") * 1024L + col("bin")).as("key"))
      .select(col("event_type"), col("n_early"), col("n_late"),
        col("n_bins"),
        col("tvd"),
        (Exact.intDiv(col("key"), lit(1024L)).cast("double") / 1000000.0)
          .as("max_jump"),
        pmod(col("key"), lit(1024L)).cast("int").as("jump_bin"))
      .orderBy(col("event_type"))
  }

  private[graft] lazy val driftSql: String = {
    val pm = OracleSql.ratio6Micro("na", "na_tot")
    val qm = OracleSql.ratio6Micro("nb", "nb_tot")
    s"""WITH b AS (
       |  SELECT event_type, CAST(floor(value / $BinW) AS INT) AS bin,
       |   sum(CASE WHEN epoch_us(ts)//1000000 < $Mid THEN 1 ELSE 0 END) AS na,
       |   sum(CASE WHEN epoch_us(ts)//1000000 >= $Mid THEN 1 ELSE 0 END) AS nb
       |  FROM events GROUP BY 1, 2),
       | s AS (
       |  SELECT event_type, bin, na, nb,
       |   sum(na) OVER (PARTITION BY event_type) AS na_tot,
       |   sum(nb) OVER (PARTITION BY event_type) AS nb_tot
       |  FROM b),
       | d AS (
       |  SELECT event_type, bin, na_tot, nb_tot,
       |   abs((CASE WHEN na_tot > 0 THEN $pm ELSE 0 END)
       |     - (CASE WHEN nb_tot > 0 THEN $qm ELSE 0 END)) AS d
       |  FROM s)
       |SELECT event_type, CAST(max(na_tot) AS BIGINT) AS n_early,
       | CAST(max(nb_tot) AS BIGINT) AS n_late,
       | CAST(count(*) AS BIGINT) AS n_bins,
       | CAST(sum(d) AS DOUBLE) / 2000000.0 AS tvd,
       | CAST(max(d * 1024 + bin) // 1024 AS DOUBLE) / 1000000.0 AS max_jump,
       | CAST(max(d * 1024 + bin) % 1024 AS INT) AS jump_bin
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---- V36: robust outliers via median/MAD ----

  /** V36: robust outlier gate — per event_type median m and MAD
    * (median of |value − m|), rows flagged when |value − m| > 5·MAD
    * (≈ robust z 3.37; the multiple is kept rational so both engines
    * compare identical bits — the usual 0.6745 normalizer is a double
    * constant that buys nothing here). Winsorize's (v26) two-level
    * extension: median-based fences survive the >25% contamination that
    * moves v26's p05/p95. Three scans as written (median fence, MAD
    * fence, flag pass — each percentile is holistic over the previous
    * pass's output) with 5-row fence tables broadcast back; at 100 TB
    * approx_percentile turns the fence passes into one mergeable scan
    * each, or the d-distribution rides v30's bounded histogram. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val med = e.groupBy(col("event_type"))
      .agg(round(percentile(col("value"), lit(0.5)), 6).as("med"))
    val withD = e.join(broadcast(med), Seq("event_type"))
      .withColumn("d", abs(col("value") - col("med")))
    val mad = withD.groupBy(col("event_type"))
      .agg(round(percentile(col("d"), lit(0.5)), 6).as("mad"))
    withD.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("d") > col("mad") * 5, 1).otherwise(0))
          .cast("long").as("n_out"),
        round(max(col("d")), 6).as("max_dev"))
      .withColumn("out_share", Exact.ratio6(col("n_out"), col("n")))
      .select(col("event_type"), col("med"), col("mad"), col("n"),
        col("n_out"), col("out_share"), col("max_dev"))
      .orderBy(col("event_type"))
  }

  private val madSql: String =
    s"""WITH m AS (
       |  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
       |  FROM events GROUP BY 1),
       | dd AS (
       |  SELECT e.event_type, med, abs(e.value - med) AS d
       |  FROM events e JOIN m USING (event_type)),
       | md AS (
       |  SELECT event_type, round(quantile_cont(d, 0.5), 6) AS mad
       |  FROM dd GROUP BY 1)
       |SELECT dd.event_type, med, mad, CAST(count(*) AS BIGINT) AS n,
       | CAST(sum(CASE WHEN d > mad * 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
       | ${OracleSql.ratio6("sum(CASE WHEN d > mad * 5 THEN 1 ELSE 0 END)",
          "count(*)")} AS out_share,
       | round(max(d), 6) AS max_dev
       |FROM dd JOIN md USING (event_type)
       |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

  /** V36b: the 100 TB MAD — v36's fences computed from v30's
    * DOMAIN-bounded unit-bucket histogram instead of three holistic
    * percentile scans: ONE scan reduces events to (type, bucket) counts
    * (localCheckpoint'd — the v3b one-pass precedent — so the three
    * fence derivations reuse it instead of rescanning), the median
    * bucket is the smallest with 2·cum ≥ n, deviations re-aggregate the
    * HISTOGRAM (not the rows) into a dev histogram for the MAD bucket,
    * and the outlier count reads dev > 5·mad off the same frame. Bucket
    * resolution (unit-width) replaces interpolated percentiles — the
    * deterministic coarsening that makes the whole computation integer
    * math over a bounded frame, so unlike the approx_percentile swap it
    * still carries a FULL oracle. StatsOpsSpec pins agreement with the
    * exact v36 within one bucket. */
  def madOutliersHistogram(spark: SparkSession, dir: String): DataFrame = {
    val hist = ev(spark, dir)
      .groupBy(col("event_type"), floor(col("value")).cast("long").as("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val wt = Window.partitionBy(col("event_type"))
    val cumW = wt.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def medianKey(h: DataFrame, key: String): DataFrame =
      h.withColumn("cum", sum(col("n")).over(cumW))
        .withColumn("tot", sum(col("n")).over(wt))
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy(col("event_type")).agg(min(col("b")).as(key))
    val med = medianKey(hist, "med_b")
    val dev = hist.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"), abs(col("b") - col("med_b")).as("b"))
      .agg(sum(col("n")).as("n"))
    val mad = medianKey(dev, "mad_b")
    hist.join(broadcast(med), Seq("event_type"))
      .join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"), col("med_b"), col("mad_b"))
      .agg(sum(col("n")).as("n"),
        sum(when(abs(col("b") - col("med_b")) > col("mad_b") * 5, col("n"))
          .otherwise(0L)).as("n_out"))
      .withColumn("out_share", Exact.ratio6(col("n_out"), col("n")))
      .select(col("event_type"), col("med_b"), col("mad_b"), col("n"),
        col("n_out"), col("out_share"))
      .orderBy(col("event_type"))
  }

  private lazy val madHistSql: String =
    s"""WITH h AS (
       |  SELECT event_type, CAST(floor(value) AS BIGINT) AS b,
       |   count(*) AS n
       |  FROM events GROUP BY 1, 2),
       | m AS (
       |  SELECT event_type, min(b) AS med_b FROM (
       |   SELECT event_type, b, n,
       |    sum(n) OVER (PARTITION BY event_type ORDER BY b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(n) OVER (PARTITION BY event_type) AS tot
       |   FROM h) WHERE cum * 2 >= tot GROUP BY 1),
       | dv AS (
       |  SELECT h.event_type, abs(h.b - m.med_b) AS b, sum(h.n) AS n
       |  FROM h JOIN m USING (event_type) GROUP BY 1, 2),
       | md AS (
       |  SELECT event_type, min(b) AS mad_b FROM (
       |   SELECT event_type, b, n,
       |    sum(n) OVER (PARTITION BY event_type ORDER BY b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(n) OVER (PARTITION BY event_type) AS tot
       |   FROM dv) WHERE cum * 2 >= tot GROUP BY 1)
       |SELECT h.event_type, CAST(m.med_b AS BIGINT) AS med_b,
       | CAST(md.mad_b AS BIGINT) AS mad_b,
       | CAST(sum(h.n) AS BIGINT) AS n,
       | CAST(sum(CASE WHEN abs(h.b - m.med_b) > md.mad_b * 5
       |          THEN h.n ELSE 0 END) AS BIGINT) AS n_out,
       | ${OracleSql.ratio6(
          "sum(CASE WHEN abs(h.b - m.med_b) > md.mad_b * 5 THEN h.n ELSE 0 END)",
          "sum(h.n)")} AS out_share
       |FROM h JOIN m USING (event_type) JOIN md USING (event_type)
       |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

  // ---- W11: least-squares trend ----

  /** W11: per-type least-squares trend — daily event counts and daily
    * value mass regressed on the day index over the month, slopes and
    * the count intercept solved in closed form from integer power sums:
    * slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), every term an exact integer
    * (value mass in micro-units), the one division half-away-rounded in
    * integer space ([[Exact.signedDivRound]] — numerators go NEGATIVE on
    * downtrends, where ratio6's unsigned floor would diverge between
    * engines). The "is this feed growing/shrinking" monitor; empty days
    * count as zero via the domain-bounded 30-row day frame per type.
    *
    * One scan → (type, day) partial aggregate; the regression runs on
    * ≤30 rows/type. Long headroom at sf0.1 is ~1e17 of 9.2e18; at real
    * 100 TB volume the micro-unit mass sums pre-aggregate to coarser
    * units (or DECIMAL(38)) before the power sums — noted, not needed
    * here. */
  /** Zero-filled per-(type, day) counts and value micro-mass over the
    * 30-row day frame (shared by W11 trend and W14 EMA). */
  private def dailyFilled(spark: SparkSession, dir: String): DataFrame = {
    val daily = ev(spark, dir)
      .groupBy(col("event_type"),
        Exact.intDiv(col("ts_s") - Start, lit(Day)).as("x"))
      .agg(count(lit(1)).as("yn"), Exact.microSum(col("value")).as("yv"))
    val frame = spark.range(0, (End - Start) / Day).toDF("x")
    // the dictionary is derivable from the aggregate (ev is the FULL
    // table, so every type with >=1 event has >=1 daily group) — a
    // second ev() scan doubled the dominant cost, and deriving from
    // `daily` lets ReuseExchange serve both branches from one scan
    // (round-10 review; same trick in outageWindows/gapFill below)
    val types = daily.select(col("event_type")).distinct()
    types.crossJoin(frame)
      .join(daily, Seq("event_type", "x"), "left")
      .select(col("event_type"), col("x"),
        coalesce(col("yn"), lit(0L)).as("yn"),
        coalesce(col("yv"), lit(0L)).as("yv"))
  }

  def trend(spark: SparkSession, dir: String): DataFrame = {
    val filled = dailyFilled(spark, dir)
    val sums = filled.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("yn")).as("syn"), sum(col("x") * col("yn")).as("sxyn"),
        sum(col("yv")).as("syv"), sum(col("x") * col("yv")).as("sxyv"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
    sums.select(col("event_type"), col("n").as("n_days"),
      col("syn").as("total_n"),
      (Exact.signedDivRound(
        (col("n") * col("sxyn") - col("sx") * col("syn")) * 1000000L,
        col("den")).cast("double") / 1000000.0).as("slope_n"),
      (Exact.signedDivRound(
        (col("syn") * col("sxx") - col("sx") * col("sxyn")) * 1000000L,
        col("den")).cast("double") / 1000000.0).as("intercept_n"),
      (Exact.signedDivRound(
        col("n") * col("sxyv") - col("sx") * col("syv"),
        col("den")).cast("double") / 1000000.0).as("slope_value"))
      .orderBy(col("event_type"))
  }

  private val trendSql: String = {
    val nDays = (End - Start) / Day
    s"""WITH d AS (
       |  SELECT event_type, (epoch_us(ts)//1000000 - $Start) // $Day AS x,
       |   count(*) AS yn, ${OracleSql.microSum("value")} AS yv
       |  FROM events GROUP BY 1, 2),
       | g AS (
       |  SELECT t.event_type, x.x
       |  FROM (SELECT DISTINCT event_type FROM events) t
       |  CROSS JOIN (SELECT unnest(range(0, $nDays)) AS x) x),
       | f AS (
       |  SELECT g.event_type, g.x, coalesce(d.yn, 0) AS yn,
       |   coalesce(d.yv, 0) AS yv
       |  FROM g LEFT JOIN d ON g.event_type = d.event_type AND g.x = d.x),
       | a AS (
       |  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(x*x) AS sxx,
       |   sum(yn) AS syn, sum(x*yn) AS sxyn,
       |   sum(yv) AS syv, sum(x*yv) AS sxyv
       |  FROM f GROUP BY 1)
       |SELECT event_type, CAST(n AS BIGINT) AS n_days,
       | CAST(syn AS BIGINT) AS total_n,
       | CAST(${OracleSql.signedDivRound("(n*sxyn - sx*syn) * 1000000",
          "n*sxx - sx*sx")} AS DOUBLE) / 1000000.0 AS slope_n,
       | CAST(${OracleSql.signedDivRound("(syn*sxx - sx*sxyn) * 1000000",
          "n*sxx - sx*sx")} AS DOUBLE) / 1000000.0 AS intercept_n,
       | CAST(${OracleSql.signedDivRound("n*sxyv - sx*syv",
          "n*sxx - sx*sx")} AS DOUBLE) / 1000000.0 AS slope_value
       |FROM a ORDER BY 1""".stripMargin
  }

  // ---- W14: exponential smoothing ----

  /** W14: exponentially-weighted daily count (EMA, α=1/4) per type —
    * trend's (w11) recency-weighted sibling, the smoothing a monitoring
    * baseline uses when old days should fade geometrically. The
    * recurrence EMA_t = (3·EMA_{t-1} + 10⁶·y_t) div 4 floors each step,
    * so it is NOT associative — no window/aggregate reorders it safely.
    * Instead the zero-filled day series collects into ONE array per
    * type (30 elements, domain-bounded) and a sequential in-row fold
    * (`aggregate` here, `list_reduce` with a prepended 0-seed in
    * DuckDB) runs the recurrence in exact integer micro-units — both
    * engines fold the identical list in identical order, v29's
    * scaled-integer-iteration idea without the per-round jobs (the
    * horizon is the day DOMAIN, so the whole loop fits in one
    * expression). EMA is bounded by max daily count ⇒ no overflow. */
  def emaSeries(spark: SparkSession, dir: String): DataFrame =
    dailyFilled(spark, dir)
      .groupBy(col("event_type"))
      .agg(sum(col("yn")).as("total_n"),
        transform(array_sort(collect_list(struct(col("x"), col("yn")))),
          s => s.getField("yn")).as("ys"))
      .select(col("event_type"), col("total_n"),
        element_at(col("ys"), -1).as("last_n"),
        (aggregate(col("ys"), lit(0L), (acc, y) =>
          Exact.intDiv(acc * 3L + y * 1000000L, lit(4L)))
          .cast("double") / 1000000.0).as("ema"))
      .orderBy(col("event_type"))

  private lazy val emaSql: String = {
    val nDays = (End - Start) / Day
    s"""WITH d AS (
       |  SELECT event_type, (epoch_us(ts)//1000000 - $Start) // $Day AS x,
       |   count(*) AS yn
       |  FROM events GROUP BY 1, 2),
       | f AS (
       |  SELECT t.event_type, x.x, coalesce(d.yn, 0) AS yn
       |  FROM (SELECT DISTINCT event_type FROM events) t
       |  CROSS JOIN (SELECT unnest(range(0, $nDays)) AS x) x
       |  LEFT JOIN d ON t.event_type = d.event_type AND d.x = x.x),
       | l AS (
       |  SELECT event_type, CAST(sum(yn) AS BIGINT) AS total_n,
       |   list(yn ORDER BY x) AS ys
       |  FROM f GROUP BY 1)
       |SELECT event_type, total_n,
       | CAST(ys[-1] AS BIGINT) AS last_n,
       | CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), ys),
       |   (acc, y) -> (acc * 3 + y * 1000000) // 4) AS DOUBLE)
       |   / 1000000.0 AS ema
       |FROM l ORDER BY 1""".stripMargin
  }

  // ---- W17: outage windows (gaps and islands) ----

  /** W17: outage report — per type, the EMPTY-hour runs of the month
    * (count of empty hours, number of contiguous gaps, the longest
    * gap's length and start), via the classic gaps-and-islands
    * rewrite: empty hours get an island id `hour − row_number()` that
    * is constant exactly across consecutive empties. Monitoring's "did
    * the feed stop, and for how long" — w12 interpolates THROUGH these
    * gaps; this one reports them. All windows run over the
    * domain-bounded 720-hour grid; the longest-gap tie (two gaps of
    * equal length) breaks to the EARLIEST via an integer
    * (len, 719−start_hour) pack, mirrored in the oracle. Types with no
    * gaps report zeros with start −1 (at sf0.1 every hour has events —
    * the empty report is itself the assertion). */
  def outageWindows(spark: SparkSession, dir: String): DataFrame = {
    val obs = ev(spark, dir)
      .groupBy(col("event_type"),
        Exact.intDiv(col("ts_s") - Start, lit(Hour)).as("h"))
      .agg(count(lit(1)).as("n"))
    // ONE spelling of the grid's last index: 719 was previously
    // hardcoded in the tie-break pack AND the start reconstruction —
    // a widened EventWindow would silently decode every
    // max_gap_start_s against the wrong anchor (round-10 review)
    val lastH = (End - Start) / Hour - 1
    val frame = spark.range(0, (End - Start) / Hour).toDF("h")
    val types = obs.select(col("event_type")).distinct()
    val empties = types.crossJoin(frame)
      .join(obs, Seq("event_type", "h"), "left")
      .filter(col("n").isNull)
    val wT = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val islands = empties
      .withColumn("island", col("h") - row_number().over(wT))
      .groupBy(col("event_type"), col("island"))
      .agg(count(lit(1)).as("len"), min(col("h")).as("start_h"))
    val gaps = islands.groupBy(col("event_type"))
      .agg(sum(col("len")).as("n_empty_hours"),
        count(lit(1)).as("n_gaps"),
        max(col("len") * 1024L + (lit(lastH) - col("start_h"))).as("key"))
      .select(col("event_type"), col("n_empty_hours"), col("n_gaps"),
        Exact.intDiv(col("key"), lit(1024L)).as("max_gap_hours"),
        ((lit(lastH) - pmod(col("key"), lit(1024L))) * Hour + Start)
          .as("max_gap_start_s"))
    types.join(gaps, Seq("event_type"), "left")
      .select(col("event_type"),
        coalesce(col("n_empty_hours"), lit(0L)).as("n_empty_hours"),
        coalesce(col("n_gaps"), lit(0L)).as("n_gaps"),
        coalesce(col("max_gap_hours"), lit(0L)).as("max_gap_hours"),
        coalesce(col("max_gap_start_s"), lit(-1L)).as("max_gap_start_s"))
      .orderBy(col("event_type"))
  }

  private lazy val outageSql: String = {
    val nHours = (End - Start) / Hour
    val lastH = nHours - 1
    s"""WITH o AS (
       |  SELECT event_type, (epoch_us(ts)//1000000 - $Start) // $Hour AS h,
       |   count(*) AS n
       |  FROM events GROUP BY 1, 2),
       | t AS (SELECT DISTINCT event_type FROM events),
       | e AS (
       |  SELECT t.event_type, x.h
       |  FROM t CROSS JOIN (SELECT unnest(range(0, $nHours)) AS h) x
       |  LEFT JOIN o ON o.event_type = t.event_type AND o.h = x.h
       |  WHERE o.n IS NULL),
       | i AS (
       |  SELECT event_type, h,
       |   h - row_number() OVER (PARTITION BY event_type ORDER BY h)
       |     AS island
       |  FROM e),
       | g AS (
       |  SELECT event_type, island, count(*) AS len, min(h) AS start_h
       |  FROM i GROUP BY 1, 2),
       | a AS (
       |  SELECT event_type, sum(len) AS n_empty_hours,
       |   count(*) AS n_gaps,
       |   max(len * 1024 + ($lastH - start_h)) AS key
       |  FROM g GROUP BY 1)
       |SELECT t.event_type,
       | CAST(coalesce(a.n_empty_hours, 0) AS BIGINT) AS n_empty_hours,
       | CAST(coalesce(a.n_gaps, 0) AS BIGINT) AS n_gaps,
       | CAST(coalesce(a.key // 1024, 0) AS BIGINT) AS max_gap_hours,
       | CAST(coalesce(($lastH - a.key % 1024) * $Hour + $Start, -1) AS BIGINT)
       |   AS max_gap_start_s
       |FROM t LEFT JOIN a USING (event_type)
       |ORDER BY 1""".stripMargin
  }

  // ---- U8: activity concentration profile ----

  /** U8: power-user concentration — users bucketed into activity
    * deciles, each decile's share of total event volume (the "top 10%
    * of users drive X% of traffic" curve that sizes per-user state,
    * rate limits, and skew handling). NO ntile: a rank-based decile is
    * a global sort of the user histogram — one task at 1e9 users.
    * Instead the nine decile FENCES come from one percentile aggregate
    * over per-user counts (6-dp-rounded, broadcast back), and bucket
    * assignment is a pure-map fence comparison — v26's
    * fence-pass-then-map shape applied to ranking. Equal-frequency up
    * to ties on the fence values (tied counts land in the same bucket
    * — deterministic on both engines because the compares run on
    * identical rounded fences). Cumulative share runs over the ≤10-row
    * decile frame. */
  def concentration(spark: SparkSession, dir: String): DataFrame = {
    val uc = ev(spark, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("c"))
    val fences = uc.agg(percentile(col("c"),
      array((1 to 9).map(i => lit(i / 10.0)): _*)).as("f"))
      .select((1 to 9).map(i =>
        round(element_at(col("f"), i), 6).as(s"f$i")): _*)
    val decile = (1 to 9).map(i =>
      when(col("c") > col(s"f$i"), 1).otherwise(0)).reduce(_ + _)
    val byDecile = uc.crossJoin(broadcast(fences))
      .withColumn("decile", decile)
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("c")).as("n_events"))
    val wAll = Window.partitionBy(lit(1))
    val wCum = wAll.orderBy(col("decile").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDecile
      .withColumn("tot", sum(col("n_events")).over(wAll))
      .withColumn("event_share", Exact.ratio6(col("n_events"), col("tot")))
      .withColumn("top_cum_share",
        Exact.ratio6(sum(col("n_events")).over(wCum), col("tot")))
      .select(col("decile"), col("n_users"), col("n_events"),
        col("event_share"), col("top_cum_share"))
      .orderBy(col("decile"))
  }

  private lazy val concentrationSql: String = {
    val fcols = (1 to 9).map(i =>
      s"round(quantile_cont(c, ${i / 10.0}), 6) AS f$i").mkString(", ")
    val dec = (1 to 9).map(i =>
      s"CASE WHEN c > f$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH uc AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
       | f AS (SELECT $fcols FROM uc),
       | d AS (
       |  SELECT $dec AS decile, c FROM uc CROSS JOIN f),
       | g AS (
       |  SELECT decile, count(*) AS n_users, sum(c) AS n_events
       |  FROM d GROUP BY 1),
       | t AS (
       |  SELECT *, sum(n_events) OVER () AS tot,
       |   sum(n_events) OVER (ORDER BY decile DESC
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM g)
       |SELECT CAST(decile AS INT) AS decile,
       | CAST(n_users AS BIGINT) AS n_users,
       | CAST(n_events AS BIGINT) AS n_events,
       | ${OracleSql.ratio6("n_events", "tot")} AS event_share,
       | ${OracleSql.ratio6("cum", "tot")} AS top_cum_share
       |FROM t ORDER BY decile""".stripMargin
  }

  // ---- W16: weekday seasonality profile ----

  /** W16: day-of-week seasonality — per (type, weekday): event count,
    * decimal-exact mean value, and the share of the type's weekly
    * traffic. The baseline that turns t21's "is today anomalous" into
    * "is today anomalous FOR A SATURDAY". Weekday is pure integer
    * calendar arithmetic — (ts_s − Start) div 86400 mod 7, day 0 =
    * 2024-01-01 = Monday — so both engines bucket identically without
    * touching timezone-dependent date functions. One scan → the 35-row
    * (type × weekday) frame; the share window runs on that frame. */
  def weekdayProfile(spark: SparkSession, dir: String): DataFrame = {
    val byDow = ev(spark, dir)
      .groupBy(col("event_type"),
        pmod(Exact.intDiv(col("ts_s") - Start, lit(Day)), lit(7L))
          .as("dow"))
      .agg(count(lit(1)).as("n"), Exact.avgExact(col("value")).as("avg_v"))
    byDow
      .withColumn("n_type",
        sum(col("n")).over(Window.partitionBy(col("event_type"))))
      .select(col("event_type"), col("dow"), col("n"), col("avg_v"),
        Exact.ratio6(col("n"), col("n_type")).as("week_share"))
      .orderBy(col("event_type"), col("dow"))
  }

  private lazy val weekdaySql: String =
    s"""WITH d AS (
       |  SELECT event_type,
       |   ((epoch_us(ts)//1000000 - $Start) // $Day) % 7 AS dow,
       |   count(*) AS n, ${OracleSql.avgExact("value")} AS avg_v
       |  FROM events GROUP BY 1, 2)
       |SELECT event_type, CAST(dow AS BIGINT) AS dow,
       | CAST(n AS BIGINT) AS n, avg_v,
       | ${OracleSql.ratio6("n",
          "sum(n) OVER (PARTITION BY event_type)")} AS week_share
       |FROM d ORDER BY 1, 2""".stripMargin

  // ---- W12: gap-fill by linear interpolation ----

  /** W12: series imputation — hourly mean value per type on the dense
    * 720-bucket grid, empty buckets LINEARLY INTERPOLATED between their
    * nearest observed neighbors (edges carry the nearest value), each
    * row labeled obs/interp/ffill/bfill. The step after zero-fill (H14)
    * when a downstream consumer needs a gapless signal, not zeros —
    * rate-normalization, anomaly baselines, model features.
    *
    * The hourly mean is half-up-rounded into integer micro-units FIRST,
    * so the interpolation arithmetic — py·(nt−t) + ny·(t−pt), one
    * half-up division by (nt−pt) — is pure integer and bit-identical in
    * both engines. Neighbor lookup is last/first IGNORE NULLS over the
    * grid, which is DOMAIN-bounded (720 rows/type regardless of data
    * volume), so the per-type window is safe at any scale — the raw
    * stream is reduced by the grouped aggregate before any window. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val obs = ev(spark, dir)
      .groupBy(col("event_type"),
        (col("ts_s") - pmod(col("ts_s") - Start, lit(Hour)) - Start)
          .as("off"))
      .agg(count(lit(1)).as("n"),
        Exact.intDiv(Exact.microSum(col("value")) +
          shiftright(count(lit(1)), 1), count(lit(1))).as("vmu"))
    val frame = spark.range(0, End - Start, Hour).toDF("off")
    val types = obs.select(col("event_type")).distinct()
    val grid = types.crossJoin(frame)
      .join(obs, Seq("event_type", "off"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val w = Window.partitionBy(col("event_type")).orderBy(col("off"))
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1, Window.unboundedFollowing)
    val t = col("off")
    val filled = grid
      .withColumn("py", last(col("vmu"), ignoreNulls = true).over(before))
      .withColumn("pt", last(when(col("vmu").isNotNull, t),
        ignoreNulls = true).over(before))
      .withColumn("ny", first(col("vmu"), ignoreNulls = true).over(after))
      .withColumn("nt", first(when(col("vmu").isNotNull, t),
        ignoreNulls = true).over(after))
      .withColumn("fmu", when(col("vmu").isNotNull, col("vmu"))
        .when(col("py").isNotNull && col("ny").isNotNull, Exact.intDiv(
          col("py") * (col("nt") - t) + col("ny") * (t - col("pt")) +
            shiftright(col("nt") - col("pt"), 1),
          col("nt") - col("pt")))
        .when(col("py").isNotNull, col("py"))
        .otherwise(col("ny")))
      .withColumn("src", when(col("vmu").isNotNull, lit("obs"))
        .when(col("py").isNotNull && col("ny").isNotNull, lit("interp"))
        .when(col("py").isNotNull, lit("ffill")).otherwise(lit("bfill")))
    filled.select(col("event_type"), (t + Start).as("bucket_s"), col("n"),
      (col("fmu").cast("double") / 1000000.0).as("value6"), col("src"))
      .orderBy(col("event_type"), col("bucket_s"))
  }

  private val gapFillSql: String =
    s"""WITH o AS (
       |  SELECT event_type,
       |   (epoch_us(ts)//1000000 - $Start)
       |     - (epoch_us(ts)//1000000 - $Start) % $Hour AS off,
       |   count(*) AS n,
       |   (${OracleSql.microSum("value")} + count(*) // 2) // count(*) AS vmu
       |  FROM events GROUP BY 1, 2),
       | g AS (
       |  SELECT t.event_type, x.off, coalesce(o.n, 0) AS n, o.vmu
       |  FROM (SELECT DISTINCT event_type FROM events) t
       |  CROSS JOIN (SELECT unnest(range(0, ${End - Start}, $Hour)) AS off) x
       |  LEFT JOIN o ON t.event_type = o.event_type AND x.off = o.off),
       | wn AS (
       |  SELECT *,
       |   last_value(vmu IGNORE NULLS) OVER (PARTITION BY event_type
       |     ORDER BY off ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |     AS py,
       |   last_value(CASE WHEN vmu IS NOT NULL THEN off END IGNORE NULLS)
       |     OVER (PARTITION BY event_type ORDER BY off
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
       |   first_value(vmu IGNORE NULLS) OVER (PARTITION BY event_type
       |     ORDER BY off ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
       |     AS ny,
       |   first_value(CASE WHEN vmu IS NOT NULL THEN off END IGNORE NULLS)
       |     OVER (PARTITION BY event_type ORDER BY off
       |       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
       |  FROM g)
       |SELECT event_type, CAST(off + $Start AS BIGINT) AS bucket_s,
       | CAST(n AS BIGINT) AS n,
       | CAST(CASE
       |   WHEN vmu IS NOT NULL THEN vmu
       |   WHEN py IS NOT NULL AND ny IS NOT NULL THEN
       |     (py*(nt - off) + ny*(off - pt) + (nt - pt) // 2) // (nt - pt)
       |   WHEN py IS NOT NULL THEN py ELSE ny END AS DOUBLE) / 1000000.0
       |   AS value6,
       | CASE WHEN vmu IS NOT NULL THEN 'obs'
       |      WHEN py IS NOT NULL AND ny IS NOT NULL THEN 'interp'
       |      WHEN py IS NOT NULL THEN 'ffill' ELSE 'bfill' END AS src
       |FROM wn ORDER BY 1, 2""".stripMargin

  /** Half-up rounded num/den for NON-NEGATIVE decimal operands, spelled
    * without shiftright (which rejects decimals): ⌊(2·num + den) / 2·den⌋
    * = ⌊num/den + 1/2⌋. Returns Long (IntegralDivide's type). */
  private def decDivRound(num: Column, den: Column): Column =
    Exact.intDiv(num * 2 + den, den * 2)

  /** md5-parity A/B arm ('ab' ∥ user_id — v28's growth-stable split: a
    * user never migrates arms as data accrues). ONE spelling shared by
    * w20/w22/w23/w24 and their oracles (review finding, round 8: a salt
    * or parity tweak applied to one copy would silently place the same
    * experiment's users in different arms across the four readouts,
    * breaking the "same experiment, four ways" and "w24 look 6 == w20"
    * invariants with no compile-time signal). */
  private def armCol: Column =
    when(conv(substring(md5(concat(lit("ab"),
      col("user_id").cast("string"))), 1, 2), 16, 10)
      .cast("int") % 2 === 0, "A").otherwise("B")

  /** DuckDB spelling of [[armCol]]. */
  private val ArmSqlCase: String =
    "CASE WHEN ('0x' || substr(md5('ab' || CAST(user_id AS VARCHAR)), " +
      "1, 2))::INT % 2 = 0 THEN 'A' ELSE 'B' END"

  /** W20: A/B experiment readout — deterministic arm assignment by
    * md5('ab' ∥ user_id) parity (v28's growth-stable split: a user
    * never migrates arms as data accrues), per-user value mass as the
    * metric, and per-arm n/mean/variance + the Welch t statistic.
    * Exactness: per-user mass in micro-units (Long); arm power sums in
    * DECIMAL(38,0) — n·Σx² at real user counts passes Long where the
    * fixture does not (the v19 lesson); mean and variance half-up
    * rounded IN integer/decimal space to 6 dp, and only then does the
    * t statistic run in doubles (identical operands → identical IEEE
    * bits; sqrt is correctly rounded by spec — the v39 argument).
    * Scale: one user-keyed shuffle + a 2-row arm frame; nothing else. */
  /** The one-row per-arm sufficient-statistics frame (n, integer
    * micro mean6/var6 per arm) — w20's core, shared with the w27
    * power analysis so design and readout use one spelling. */
  private def armStatsOne(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def d(c: Column): Column = c.cast(DecimalType(38, 0))
    val perUser = ev(spark, dir)
      .groupBy(col("user_id"))
      .agg(Exact.microSum(col("value")).as("xm"))
      .withColumn("arm", armCol)
    // BOTH power sums in DECIMAL(38,0): sum(x) wraps a Long at ~2.5e10
    // events/arm of micro-mass — the same scale step the sxx comment
    // already defends against (review finding, round 6)
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(d(col("xm"))).as("sx"),
        sum(d(col("xm")) * d(col("xm"))).as("sxx"))
      .select(col("arm"), col("n"),
        decDivRound(d(col("sx")), d(col("n"))).as("mean6"),
        decDivRound(d(col("n")) * col("sxx") - d(col("sx")) * d(col("sx")),
          d(col("n")) * (d(col("n")) - 1) * lit(1000000L)).as("var6"))
    def pick(a: String, c: String): Column =
      min(when(col("arm") === a, col(c)))
    arms.agg(
      pick("A", "n").as("n_a"), pick("B", "n").as("n_b"),
      pick("A", "mean6").as("ma6"), pick("B", "mean6").as("mb6"),
      pick("A", "var6").as("va6"), pick("B", "var6").as("vb6"))
  }

  def abTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val one = armStatsOne(spark, dir)
    val ma = col("ma6").cast(DoubleType) / 1000000.0
    val mb = col("mb6").cast(DoubleType) / 1000000.0
    val va = col("va6").cast(DoubleType) / 1000000.0
    val vb = col("vb6").cast(DoubleType) / 1000000.0
    val t = abs(ma - mb) /
      sqrt(va / col("n_a").cast(DoubleType) + vb / col("n_b").cast(DoubleType))
    one.select(col("n_a"), col("n_b"),
      ma.as("mean_a"), mb.as("mean_b"), va.as("var_a"), vb.as("var_b"),
      round(t, 6).as("welch_t"), (t > 1.96).as("significant"))
  }

  /** W27: power analysis / minimum detectable effect — the DESIGN half
    * of the A/B family (w20 reads out, w24 monitors, THIS says whether
    * the experiment was ever big enough): from the same per-arm
    * sufficient statistics as w20 (one spelling, [[armStatsOne]]),
    * report the standard error of the mean difference, the absolute
    * and relative MDE at two-sided α=0.05 / power 0.80 (multiplier
    * z₀.₉₇₅+z₀.₈ ≈ 2.8), and the per-arm sample size a 5% relative
    * lift would need. The integer mean/variance pipeline is exact;
    * the final sqrt/divisions are IEEE-identical operand-for-operand
    * across engines (the w20 welch_t convention). */
  def powerAnalysis(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val one = armStatsOne(spark, dir)
    val ma = col("ma6").cast(DoubleType) / 1000000.0
    val va = col("va6").cast(DoubleType) / 1000000.0
    val vb = col("vb6").cast(DoubleType) / 1000000.0
    val se = sqrt(va / col("n_a").cast(DoubleType) +
      vb / col("n_b").cast(DoubleType))
    val mde = lit(2.8) * se
    val delta5 = lit(0.05) * ma
    one.select(col("n_a"), col("n_b"),
      round(se, 6).as("se"),
      round(mde, 6).as("mde_abs"),
      round(mde / ma, 6).as("mde_rel"),
      ceil(lit(2.8) * lit(2.8) * (va + vb) / (delta5 * delta5))
        .cast("long").as("n_per_arm_5pct"))
  }

  private lazy val powerAnalysisSql: String = {
    val ma = "CAST(ma6 AS DOUBLE) / 1000000.0"
    val va = "CAST(va6 AS DOUBLE) / 1000000.0"
    val vb = "CAST(vb6 AS DOUBLE) / 1000000.0"
    val se = s"sqrt($va / CAST(n_a AS BIGINT) + $vb / CAST(n_b AS BIGINT))"
    s"""WITH $armStatsCtes
       |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       | round($se, 6) AS se,
       | round(2.8 * $se, 6) AS mde_abs,
       | round(2.8 * $se / ($ma), 6) AS mde_rel,
       | CAST(ceil(2.8 * 2.8 * (($va) + ($vb))
       |   / ((0.05 * ($ma)) * (0.05 * ($ma)))) AS BIGINT)
       |   AS n_per_arm_5pct
       |FROM w""".stripMargin
  }

  /** DuckDB spelling of [[armStatsOne]] — the CTE chain shared by the
    * w20 readout and the w27 power analysis. */
  private lazy val armStatsCtes: String =
    s"""pu AS (SELECT user_id, ${OracleSql.microSum("value")} AS xm
       |            FROM events GROUP BY 1),
       | ar AS (SELECT $ArmSqlCase AS arm, xm FROM pu),
       | g AS (SELECT arm, count(*) AS n, sum(xm) AS sx,
       |        sum(xm::HUGEINT * xm::HUGEINT) AS sxx FROM ar GROUP BY 1),
       | s AS (SELECT arm, n,
       |        (sx * 2 + n) // (n * 2) AS mean6,
       |        ((n * sxx - sx::HUGEINT * sx::HUGEINT) * 2
       |         + n::HUGEINT * (n - 1) * 1000000)
       |        // (n::HUGEINT * (n - 1) * 1000000 * 2) AS var6 FROM g),
       | w AS (SELECT
       |   max(CASE WHEN arm = 'A' THEN n END) AS n_a,
       |   max(CASE WHEN arm = 'B' THEN n END) AS n_b,
       |   max(CASE WHEN arm = 'A' THEN mean6 END) AS ma6,
       |   max(CASE WHEN arm = 'B' THEN mean6 END) AS mb6,
       |   max(CASE WHEN arm = 'A' THEN var6 END) AS va6,
       |   max(CASE WHEN arm = 'B' THEN var6 END) AS vb6 FROM s)""".stripMargin

  private lazy val abTestSql: String =
    s"""WITH $armStatsCtes
       |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       | CAST(ma6 AS DOUBLE) / 1000000.0 AS mean_a,
       | CAST(mb6 AS DOUBLE) / 1000000.0 AS mean_b,
       | CAST(va6 AS DOUBLE) / 1000000.0 AS var_a,
       | CAST(vb6 AS DOUBLE) / 1000000.0 AS var_b,
       | round(abs(CAST(ma6 AS DOUBLE) / 1000000.0
       |         - CAST(mb6 AS DOUBLE) / 1000000.0)
       |   / sqrt(CAST(va6 AS DOUBLE) / 1000000.0 / CAST(n_a AS BIGINT)
       |        + CAST(vb6 AS DOUBLE) / 1000000.0 / CAST(n_b AS BIGINT)), 6)
       |   AS welch_t,
       | (abs(CAST(ma6 AS DOUBLE) / 1000000.0
       |    - CAST(mb6 AS DOUBLE) / 1000000.0)
       |  / sqrt(CAST(va6 AS DOUBLE) / 1000000.0 / CAST(n_a AS BIGINT)
       |       + CAST(vb6 AS DOUBLE) / 1000000.0 / CAST(n_b AS BIGINT))
       |  > 1.96) AS significant
       |FROM w""".stripMargin

  /** Pre/post cut for W22's CUPED covariate: the same window midpoint
    * v35's drift split uses (ONE spelling — review finding, round 7: a
    * duplicated `Start + 15·Day` here would silently desynchronize the
    * two split points under a future window change). */
  private val CupedCutS = Mid

  /** W22: CUPED-adjusted A/B readout — the variance-reduction
    * technique every mature experimentation platform applies on top of
    * w20's plain difference: each user's PRE-period mass (first half
    * of the window, before any hypothetical treatment) is the
    * covariate; θ = cov(pre, post)/var(pre) is fit POOLED, each arm's
    * post-period mean is adjusted by −θ·(arm pre-mean − overall
    * pre-mean), and the readout reports the raw diff, the CUPED diff,
    * θ, and the variance-reduction factor ρ² (share of outcome
    * variance the covariate removes).
    *
    * Exactness: per-user masses in micro Longs, the five pooled power
    * sums in DECIMAL(38,0), θ as a signed half-away-from-zero micro
    * ratio ([[Exact.signedDivRoundDec]]), adjusted means in pure
    * integer space; ρ² alone is formed in doubles FROM the exact
    * integer components (cov² would pass 38 digits), identically in
    * both engines. Scale shape: one user-keyed conditional aggregate,
    * a 2-row arm frame, a 1-row solve — w20's cost exactly. */
  def cupedAbTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    def d(c: Column): Column = c.cast(DecimalType(38, 0))
    def microIf(cond: Column): Column =
      sum(when(cond, Exact.micro(col("value"))).otherwise(0L))
    val perUser = ev(spark, dir)
      .groupBy(col("user_id"))
      .agg(microIf(col("ts_s") < CupedCutS).as("cm"),
        microIf(col("ts_s") >= CupedCutS).as("xm"))
      .withColumn("arm", armCol)
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"),
        sum(d(col("cm"))).as("sc"), sum(d(col("xm"))).as("sx"),
        sum(d(col("cm")) * d(col("cm"))).as("scc"),
        sum(d(col("cm")) * d(col("xm"))).as("scx"),
        sum(d(col("xm")) * d(col("xm"))).as("sxx"))
    def pick(a: String, c: String): Column =
      min(when(col("arm") === a, col(c)))
    val one = arms.agg(
      pick("A", "n").as("n_a"), pick("B", "n").as("n_b"),
      pick("A", "sc").as("sca"), pick("B", "sc").as("scb"),
      pick("A", "sx").as("sxa"), pick("B", "sx").as("sxb"),
      sum(col("n")).as("nn"), sum(col("sc")).as("sc"),
      sum(col("sx")).as("sx"), sum(col("scc")).as("scc"),
      sum(col("scx")).as("scx"), sum(col("sxx")).as("sxx"))
    val nD = d(col("nn"))
    val covN = nD * col("scx") - col("sc") * col("sx")
    val varcN = nD * col("scc") - col("sc") * col("sc")
    val varxN = nD * col("sxx") - col("sx") * col("sx")
    val theta = Exact.signedDivRoundDec(covN * 1000000L, varcN)
    val mcAll = decDivRound(d(col("sc")), nD)
    // θ·Δ runs in DECIMAL: both factors are micro-scale Longs, so the
    // raw Long product wraps near 1e19 (large fitted θ × large mean
    // gap) while the HUGEINT oracle doesn't — review finding, r7
    def adj(sx: String, sc: String, n: String): Column =
      decDivRound(d(col(sx)), d(col(n))) - Exact.signedDivRoundDec(
        d(theta) * d(decDivRound(d(col(sc)), d(col(n))) - mcAll),
        d(lit(1000000L)))
    val rho2 = round(
      (covN.cast(DoubleType) / varcN.cast(DoubleType)) *
        (covN.cast(DoubleType) / varxN.cast(DoubleType)), 6)
    one.select(col("n_a"), col("n_b"),
      (theta.cast(DoubleType) / 1000000.0).as("theta"),
      ((decDivRound(d(col("sxa")), d(col("n_a"))) -
        decDivRound(d(col("sxb")), d(col("n_b"))))
        .cast(DoubleType) / 1000000.0).as("diff_raw"),
      ((adj("sxa", "sca", "n_a") - adj("sxb", "scb", "n_b"))
        .cast(DoubleType) / 1000000.0).as("diff_cuped"),
      rho2.as("var_reduction"))
  }

  private val cupedSql: String = {
    val micro =
      "CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
    def sdr(num: String, den: String) = OracleSql.signedDivRound(num, den)
    s"""WITH pu AS (SELECT user_id,
       |   sum(CASE WHEN epoch_us(ts) // 1000000 < $CupedCutS
       |       THEN $micro ELSE 0 END) AS cm,
       |   sum(CASE WHEN epoch_us(ts) // 1000000 >= $CupedCutS
       |       THEN $micro ELSE 0 END) AS xm
       |  FROM events GROUP BY 1),
       | ar AS (SELECT $ArmSqlCase AS arm, cm, xm FROM pu),
       | g AS (SELECT arm, count(*) AS n,
       |        sum(cm::HUGEINT) AS sc, sum(xm::HUGEINT) AS sx,
       |        sum(cm::HUGEINT * cm::HUGEINT) AS scc,
       |        sum(cm::HUGEINT * xm::HUGEINT) AS scx,
       |        sum(xm::HUGEINT * xm::HUGEINT) AS sxx FROM ar GROUP BY 1),
       | w AS (SELECT
       |   max(CASE WHEN arm = 'A' THEN n END) AS n_a,
       |   max(CASE WHEN arm = 'B' THEN n END) AS n_b,
       |   max(CASE WHEN arm = 'A' THEN sc END) AS sca,
       |   max(CASE WHEN arm = 'B' THEN sc END) AS scb,
       |   max(CASE WHEN arm = 'A' THEN sx END) AS sxa,
       |   max(CASE WHEN arm = 'B' THEN sx END) AS sxb,
       |   sum(n) AS nn, sum(sc) AS sc, sum(sx) AS sx,
       |   sum(scc) AS scc, sum(scx) AS scx, sum(sxx) AS sxx FROM g),
       | k AS (SELECT *,
       |   nn::HUGEINT * scx - sc * sx AS covn,
       |   nn::HUGEINT * scc - sc * sc AS varcn,
       |   nn::HUGEINT * sxx - sx * sx AS varxn FROM w),
       | t AS (SELECT *,
       |   ${sdr("covn * 1000000", "varcn")} AS theta,
       |   (sc * 2 + nn) // (nn * 2) AS mc_all,
       |   (sxa * 2 + n_a) // (n_a * 2) AS mxa,
       |   (sxb * 2 + n_b) // (n_b * 2) AS mxb,
       |   (sca * 2 + n_a) // (n_a * 2) AS mca,
       |   (scb * 2 + n_b) // (n_b * 2) AS mcb FROM k)
       |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       | CAST(theta AS DOUBLE) / 1000000.0 AS theta,
       | CAST(mxa - mxb AS DOUBLE) / 1000000.0 AS diff_raw,
       | CAST((mxa - ${sdr("theta * (mca - mc_all)", "1000000")})
       |    - (mxb - ${sdr("theta * (mcb - mc_all)", "1000000")})
       |   AS DOUBLE) / 1000000.0 AS diff_cuped,
       | round((CAST(covn AS DOUBLE) / CAST(varcn AS DOUBLE))
       |     * (CAST(covn AS DOUBLE) / CAST(varxn AS DOUBLE)), 6)
       |   AS var_reduction
       |FROM t""".stripMargin
  }

  /** Interim-look schedule for [[groupSequential]]: 6 looks, one per
    * 5 days of the 30-day window. */
  private val SeqLooks = 6
  private val LookStep = 5 * 86400L

  /** Pocock two-sided 5% critical value for K=6 equally-spaced looks
    * (Pocock 1977, table 2 — the flat-boundary design: same threshold
    * at every look, total type-I error 0.05 across all six). */
  private val PocockC6 = 2.453

  /** W24: group-sequential A/B monitoring — the readout a LIVE
    * experiment actually uses: w20 is a single fixed-horizon test, but
    * peeking at a fixed 1.96 threshold every few days inflates type-I
    * error severalfold; the group-sequential design pre-commits to K
    * interim looks with an adjusted per-look boundary. This entry
    * replays the Welch z at 6 five-day looks against the Pocock
    * boundary and reports, per look, the enrolled arm sizes, the mean
    * difference, the z trajectory, and whether the boundary was
    * crossed — early-stopping decisions included.
    *
    * Exactness: each user's SIX cumulative masses and enrollment flags
    * come from one conditional aggregate (one user-keyed shuffle,
    * exactly w20's cost); a bounded 6-way in-row explode turns them
    * into (look, arm) sufficient statistics in DECIMAL(38), and each
    * look's mean/variance/z uses w20's integer-space spellings
    * verbatim, so z at look 6 over the full window IS a w20-grade
    * number. Scale shape: one user shuffle → ≤6n bounded explode →
    * the 12-row (look × arm) frame. */
  /** The six per-look cumulative-mass / enrollment aggregates over an
    * events frame — the per-user sufficient statistics of the
    * group-sequential readout. ALGEBRAIC (conditional sums and maxes),
    * which is exactly what lets st22 maintain them as streaming state. */
  private def lookAggs: Seq[Column] = {
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val micro = Exact.micro(col("value"))
    (1 to SeqLooks).map(l => Start + l * LookStep).zipWithIndex.flatMap {
      case (cut, i) =>
        // interim looks cut strictly BEFORE their boundary, but the
        // FINAL look is the full window and must include an event
        // stamped exactly at EndS — w20's abTest sums unconditionally
        // over the inclusive window, and the documented
        // "look 6 == w20" invariant breaks on boundary data with a
        // strict cut (round-10 review; mirrored in the oracle)
        val cond =
          if (i == SeqLooks - 1) col("ts_s") <= cut else col("ts_s") < cut
        Seq(
          sum(when(cond, micro).otherwise(0L)).as(s"c${i + 1}"),
          max(when(cond, 1).otherwise(0)).as(s"h${i + 1}"))
    }
  }

  /** w24's readout tail over the per-user sufficient-statistics frame
    * (user_id, c1..c6, h1..h6) — shared verbatim by the batch entry
    * and st22's streaming twin, so the two cannot drift. */
  private def lookReadout(perUserStats: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    def d(c: Column): Column = c.cast(DecimalType(38, 0))
    val perUser = perUserStats.withColumn("arm", armCol)
    val looks = perUser
      .select(col("arm"), explode(array((1 to SeqLooks).map(l =>
        struct(lit(l).as("lk"), col(s"c$l").as("cm"),
          col(s"h$l").as("h"))): _*)).as("u"))
      .filter(col("u.h") === 1)
      .select(col("arm"), col("u.lk").as("lk"), col("u.cm").as("cm"))
    val arms = looks.groupBy(col("lk"), col("arm"))
      .agg(count(lit(1)).as("n"), sum(d(col("cm"))).as("sx"),
        sum(d(col("cm")) * d(col("cm"))).as("sxx"))
      .select(col("lk"), col("arm"), col("n"),
        decDivRound(d(col("sx")), d(col("n"))).as("mean6"),
        decDivRound(d(col("n")) * col("sxx") - d(col("sx")) * d(col("sx")),
          d(col("n")) * (d(col("n")) - 1) * lit(1000000L)).as("var6"))
    def pick(a: String, c: String): Column =
      min(when(col("arm") === a, col(c)))
    val byLook = arms.groupBy(col("lk")).agg(
      pick("A", "n").as("n_a"), pick("B", "n").as("n_b"),
      pick("A", "mean6").as("ma6"), pick("B", "mean6").as("mb6"),
      pick("A", "var6").as("va6"), pick("B", "var6").as("vb6"))
    val ma = col("ma6").cast(DoubleType) / 1000000.0
    val mb = col("mb6").cast(DoubleType) / 1000000.0
    val va = col("va6").cast(DoubleType) / 1000000.0
    val vb = col("vb6").cast(DoubleType) / 1000000.0
    val z = abs(ma - mb) / sqrt(
      va / col("n_a").cast(DoubleType) + vb / col("n_b").cast(DoubleType))
    byLook
      // a look where an arm has <2 enrollees has no variance and no
      // decision — dropped rather than emitted as null z/crossed rows
      // (review finding, round 8); the null n from pick() on an absent
      // arm fails the same predicate. The oracle mirrors the WHERE.
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
      .select(col("lk").cast("int").as("look"),
      col("n_a"), col("n_b"),
      ((col("ma6") - col("mb6")).cast(DoubleType) / 1000000.0).as("diff"),
      round(z, 6).as("welch_z"), lit(PocockC6).as("boundary"),
      (z > PocockC6).as("crossed"))
      .orderBy(col("look"))
  }

  def groupSequential(spark: SparkSession, dir: String): DataFrame =
    lookReadout(ev(spark, dir)
      .groupBy(col("user_id"))
      .agg(lookAggs.head, lookAggs.tail: _*))

  /** ST22: the group-sequential monitor SERVED LIVE — w24's whole
    * pitch is interim looks at a running experiment, and this is the
    * running half: the per-user sufficient statistics ([[lookAggs]] —
    * six conditional cumulative masses + enrollment flags, all
    * algebraic) are maintained as streaming aggregation state (O(users)
    * rows, mergeable across micro-batches), and the bounded look
    * readout runs read-side on the final state. Finite stream == the
    * batch per-user frame, so st22 SHARES w24's oracle — the
    * st15/st18/st20 train-batch/serve-streaming convention applied to
    * the experimentation suite. */
  def streamingGroupSequential(spark: SparkSession,
      dir: String): DataFrame = {
    val perUser = graft.streaming.StreamingOps.eventsStream(spark, dir)
      .groupBy(col("user_id"))
      .agg(lookAggs.head, lookAggs.tail: _*)
    lookReadout(graft.streaming.StreamingOps.runToBatch(spark, perUser,
      s"st22_gs_${System.nanoTime()}"))
  }

  private val groupSequentialSql: String = {
    val micro =
      "CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
    val cuts = (1 to SeqLooks).map(l => Start + l * LookStep)
    val puCols = cuts.zipWithIndex.map { case (cut, i) =>
      // final look inclusive, matching lookAggs (look 6 == w20's
      // unconditional full-window sum)
      val op = if (i == SeqLooks - 1) "<=" else "<"
      s"""sum(CASE WHEN epoch_us(ts) // 1000000 $op $cut
         |     THEN $micro ELSE 0 END) AS c${i + 1},
         |   max(CASE WHEN epoch_us(ts) // 1000000 $op $cut
         |     THEN 1 ELSE 0 END) AS h${i + 1}""".stripMargin
    }.mkString(",\n   ")
    val unions = (1 to SeqLooks).map(l =>
      s"SELECT arm, $l AS lk, c$l AS cm FROM ar WHERE h$l = 1")
      .mkString("\n   UNION ALL ")
    val zExpr =
      """abs(CAST(ma6 AS DOUBLE) / 1000000.0
        |     - CAST(mb6 AS DOUBLE) / 1000000.0)
        | / sqrt(CAST(va6 AS DOUBLE) / 1000000.0 / CAST(n_a AS BIGINT)
        |      + CAST(vb6 AS DOUBLE) / 1000000.0 / CAST(n_b AS BIGINT))"""
        .stripMargin.replace("\n", " ").replaceAll(" +", " ")
    s"""WITH pu AS (SELECT user_id,
       |   $puCols
       |  FROM events GROUP BY 1),
       | ar AS (SELECT $ArmSqlCase AS arm, * FROM pu),
       | lx AS ($unions),
       | g AS (SELECT lk, arm, count(*) AS n, sum(cm::HUGEINT) AS sx,
       |        sum(cm::HUGEINT * cm::HUGEINT) AS sxx
       |       FROM lx GROUP BY 1, 2),
       | s AS (SELECT lk, arm, n,
       |        (sx * 2 + n) // (n * 2) AS mean6,
       |        ((n * sxx - sx * sx) * 2
       |         + n::HUGEINT * (n - 1) * 1000000)
       |        // (n::HUGEINT * (n - 1) * 1000000 * 2) AS var6 FROM g),
       | w AS (SELECT lk,
       |   max(CASE WHEN arm = 'A' THEN n END) AS n_a,
       |   max(CASE WHEN arm = 'B' THEN n END) AS n_b,
       |   max(CASE WHEN arm = 'A' THEN mean6 END) AS ma6,
       |   max(CASE WHEN arm = 'B' THEN mean6 END) AS mb6,
       |   max(CASE WHEN arm = 'A' THEN var6 END) AS va6,
       |   max(CASE WHEN arm = 'B' THEN var6 END) AS vb6
       |  FROM s GROUP BY 1)
       |SELECT CAST(lk AS INT) AS look,
       | CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       | CAST(ma6 - mb6 AS DOUBLE) / 1000000.0 AS diff,
       | round($zExpr, 6) AS welch_z,
       | $PocockC6 AS boundary,
       | ($zExpr > $PocockC6) AS crossed
       |FROM w WHERE n_a >= 2 AND n_b >= 2 ORDER BY look""".stripMargin
  }

  /** W23: Mann-Whitney U (Wilcoxon rank-sum) A/B readout — the
    * NONPARAMETRIC significance test w20/w22 lack: both compare arm
    * MEANS, which heavy-tailed per-user masses (u8 shows top-decile
    * concentration) can let a single whale flip; the rank-sum statistic
    * is outlier-robust and distribution-free. Same md5-parity arm split
    * and per-user micro-mass metric as w20, so the three entries read
    * out the same experiment three ways.
    *
    * Exactness: ranks never materialize — tie groups do. Per distinct
    * mass x with c users below and t = na+nb tied at x, the A-arm rank
    * sum contribution is na·(c + (t+1)/2); doubled it is the INTEGER
    * na·(2c + t + 1), so 2·R_A, 2·U_A = 2·R_A − n_A(n_A+1), and the tie
    * correction Σ(t³−t) all live in DECIMAL(38,0). The normal-approx z
    * (the standard readout at experiment scale) and the common-language
    * effect size CLES = U_A/(n_A·n_B) are then formed from those exact
    * integers — identical operands, identical IEEE doubles (the w20
    * argument); CLES rounds in integer space ([[Exact.ratio6Dec]]).
    *
    * Scale shape: one user-keyed shuffle → one mass-keyed aggregate
    * onto the distinct-value frame → a TWO-LEVEL prefix sum (the v65
    * convention: within-bucket window keyed by `xm >> 20` — arithmetic
    * shift, so bucket order = value order — plus a broadcast cumulative
    * offset from the bounded bucket-total frame); no single-task global
    * window ever sees the value frame. The oracle replays the same
    * prefix sum as one flat window — DuckDB is single-node, and prefix
    * sums are exact, so the split is invisible in the result. */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    def d(c: Column): Column = c.cast(DecimalType(38, 0))
    val perUser = ev(spark, dir)
      .groupBy(col("user_id"))
      .agg(Exact.microSum(col("value")).as("xm"))
      .withColumn("arm", armCol)
    val byVal = perUser.groupBy(col("xm"))
      .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("nb"))
      .withColumn("bkt", shiftright(col("xm"), 20))
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("xm"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inCum = byVal.withColumn("cin",
      coalesce(sum(col("na") + col("nb")).over(wIn), lit(0L)))
    val wB = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = byVal.groupBy(col("bkt"))
      .agg(sum(col("na") + col("nb")).as("bt"))
      .withColumn("coff", coalesce(sum(col("bt")).over(wB), lit(0L)))
      .select(col("bkt"), col("coff"))
    val t = col("na") + col("nb")
    val one = inCum.join(broadcast(off), Seq("bkt"))
      .withColumn("c", col("cin") + col("coff"))
      .agg(sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"),
        sum(d(col("na")) * d(col("c") * 2 + t + 1)).as("r2a"),
        sum(d(t) * d(t) * d(t) - d(t)).as("tu"))
      .withColumn("u2a", col("r2a") - d(col("n_a")) * d(col("n_a") + 1))
    val naD = col("n_a").cast(DoubleType)
    val nbD = col("n_b").cast(DoubleType)
    val nD = (col("n_a") + col("n_b")).cast(DoubleType)
    val z = (col("u2a").cast(DoubleType) - naD * nbD) /
      (lit(2.0) * sqrt(naD * nbD / 12.0 *
        ((nD + 1.0) - col("tu").cast(DoubleType) / (nD * (nD - 1.0)))))
    one.select(col("n_a"), col("n_b"),
      Exact.ratio6Dec(col("u2a"),
        d(col("n_a")) * d(col("n_b")) * 2).as("cles"),
      round(z, 6).as("mw_z"), (abs(z) > 1.96).as("significant"))
  }

  private val mannWhitneySql: String = {
    val zExpr =
      """(CAST(u2a AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        | / (2.0 * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
        |    * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
        |       - CAST(tu AS DOUBLE) / (CAST(n_a + n_b AS DOUBLE)
        |          * (CAST(n_a + n_b AS DOUBLE) - 1.0)))))"""
        .stripMargin.replace("\n", " ").replaceAll(" +", " ")
    s"""WITH pu AS (SELECT user_id, ${OracleSql.microSum("value")} AS xm
       |            FROM events GROUP BY 1),
       | ar AS (SELECT $ArmSqlCase AS arm, xm FROM pu),
       | g AS (SELECT xm,
       |        sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS na,
       |        sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS nb
       |       FROM ar GROUP BY 1),
       | r AS (SELECT *, coalesce(sum(na + nb) OVER (ORDER BY xm
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |         AS c FROM g),
       | s AS (SELECT sum(na) AS n_a, sum(nb) AS n_b,
       |        sum(na::HUGEINT * (2 * c + na + nb + 1)) AS r2a,
       |        sum((na + nb)::HUGEINT * (na + nb) * (na + nb)
       |            - (na + nb)) AS tu FROM r),
       | k AS (SELECT *, r2a - n_a::HUGEINT * (n_a + 1) AS u2a FROM s)
       |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       | ${OracleSql.ratio6Huge("u2a",
            "n_a::HUGEINT * n_b::HUGEINT * 2")} AS cles,
       | round($zExpr, 6) AS mw_z,
       | (abs($zExpr) > 1.96) AS significant
       |FROM k""".stripMargin
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("st22_streaming_group_sequential",
      "ST22 the group-sequential monitor served LIVE: the per-user " +
        "cumulative-mass/enrollment sufficient statistics maintained " +
        "as algebraic streaming aggregation state, the bounded look " +
        "readout on the final state — finite stream == batch, shares " +
        "w24's oracle (train-batch/serve-streaming for experiments)",
      streamingGroupSequential, Some(groupSequentialSql)),
    GraftQuery("w24_group_sequential",
      "W24 group-sequential A/B monitor: Welch z replayed at 6 " +
        "five-day interim looks against the Pocock K=6 boundary " +
        "(2.453) — per-look enrollment, mean diff, z trajectory, " +
        "crossing flags; one user-keyed conditional aggregate + a " +
        "bounded 6-way explode onto the 12-row (look, arm) frame",
      groupSequential, Some(groupSequentialSql)),
    GraftQuery("w23_mann_whitney",
      "W23 Mann-Whitney rank-sum A/B readout: tie-corrected 2*U and " +
        "Sum(t^3-t) exact in DECIMAL(38) from tie-group counts (ranks " +
        "never materialize), normal-approx z + CLES effect size from " +
        "identical integers in both engines; two-level distributed " +
        "prefix sum over the distinct-mass frame — no global sort",
      mannWhitney, Some(mannWhitneySql)),
    GraftQuery("w20_ab_test",
      "W20 A/B experiment readout: md5-parity arm assignment (growth-" +
        "stable), per-user value mass, per-arm mean/variance in exact " +
        "integer/decimal space, Welch t + significance — one user-" +
        "keyed shuffle and a 2-row arm frame",
      abTest, Some(abTestSql)),
    GraftQuery("w22_cuped_ab",
      "W22 CUPED-adjusted A/B readout: pre-period mass as covariate, " +
        "pooled theta = cov/var as a signed micro ratio, adjusted " +
        "means in integer space, variance-reduction rho^2 — w20's " +
        "one-shuffle cost with the industry-standard sensitivity boost",
      cupedAbTest, Some(cupedSql)),
    GraftQuery("v35_drift",
      "V35 distribution-drift monitor: per-type total-variation distance " +
        "+ max bin jump between the first 15 days and the rest, on a " +
        "domain-bounded 25-wide bin grid (integer-exact; log-free PSI " +
        "stand-in)",
      drift, Some(driftSql)),
    GraftQuery("v36_mad_outliers",
      "V36 robust outlier gate: per-type median/MAD fences, rows beyond " +
        "5*MAD flagged (two grouped-percentile passes + broadcast-back " +
        "map; approx_percentile swap at 100 TB)",
      madOutliers, Some(madSql)),
    GraftQuery("v36b_mad_histogram",
      "V36b MAD fences from the domain-bounded unit-bucket histogram " +
        "(ONE scan, localCheckpoint'd; dev histogram re-aggregates the " +
        "histogram, not the rows) — the 100 TB form of v36, still " +
        "fully oracle-checked",
      madOutliersHistogram, Some(madHistSql)),
    GraftQuery("w11_trend",
      "W11 least-squares trend: daily count and value-mass slopes per " +
        "type from integer power sums (signed half-away rounding; empty " +
        "days zero-filled on the 30-row day frame)",
      trend, Some(trendSql)),
    GraftQuery("w17_outage_windows",
      "W17 outage report: per-type empty-hour runs via gaps-and-" +
        "islands over the bounded 720-hour grid (longest gap length + " +
        "start, earliest-wins tie-break; zeros when the feed never " +
        "stopped)",
      outageWindows, Some(outageSql)),
    GraftQuery("u8_concentration",
      "U8 power-user concentration: activity deciles by percentile " +
        "fences (no ntile global sort — fence pass + pure-map " +
        "assignment), per-decile event share and top-down cumulative " +
        "share over the 10-row frame",
      concentration, Some(concentrationSql)),
    GraftQuery("u9_seasonal_anomaly",
      "U9 seasonal anomaly report: 21-day (type,dow,hour) baseline " +
        "grades the final 9 days' hours over the DENSE domain grid " +
        "(zero-event hours flag low); integer cross-multiplied " +
        "thresholds, no division, aggregates before any join",
      seasonalAnomaly, Some(seasonalAnomalySql)),
    GraftQuery("w26_cusum_monitor",
      "W26 CUSUM change-point monitor: Page's sequential drift " +
        "detector per event type (allowance mu/4, threshold 2*mu) in " +
        "the closed prefix-sum-minus-running-floor form — two windows " +
        "over the bounded (type x 9-day) grid, all-integer via x84 " +
        "cross-multiplication, both directions, dense grid so an " +
        "outage day counts zero",
      cusumMonitor, Some(cusumSql)),
    GraftQuery("w27_power_analysis",
      "W27 power analysis / MDE: standard error, absolute and " +
        "relative minimum detectable effect at alpha=0.05 power=0.8, " +
        "and the per-arm n a 5% lift needs — the design half of the " +
        "A/B family, from w20's own sufficient-statistics spelling",
      powerAnalysis, Some(powerAnalysisSql)),
    GraftQuery("st26_streaming_cusum",
      "ST26 the CUSUM monitor served live: per-(type, day) eval " +
        "counts as algebraic streaming aggregation state, batch-side " +
        "baseline artifact, closed-form window readout on the final " +
        "bounded state through the same spelling as w26 — shares its " +
        "oracle",
      streamingCusum, Some(cusumSql)),
    GraftQuery("w16_weekday_profile",
      "W16 weekday seasonality: per (type, dow) count, exact mean, " +
        "weekly share — integer calendar arithmetic (day 0 = Monday), " +
        "share window over the 35-row frame",
      weekdayProfile, Some(weekdaySql)),
    GraftQuery("w14_ema",
      "W14 exponential smoothing (alpha=1/4) of the daily count per " +
        "type: the floor recurrence is non-associative, so it runs as " +
        "a sequential in-row fold over the domain-bounded day array — " +
        "exact integer micro-units, identical order on both engines",
      emaSeries, Some(emaSql)),
    GraftQuery("w12_gap_fill",
      "W12 series gap-fill: hourly mean on the dense 720-bucket grid, " +
        "gaps linearly interpolated between nearest observations in " +
        "integer micro-units (edges carry nearest; obs/interp/ffill/" +
        "bfill labeled)",
      gapFill, Some(gapFillSql)))
}
