package graft

import graft.operators.QualityOps
import org.apache.spark.sql.functions._

/** Data-quality block: v37 expectations, v38 referential integrity.
  * The oracle pins the report numbers end-to-end; these tests pin what
  * a hash match can't — that the gates actually FIRE on bad data (the
  * shipped tables are clean, so detection is proven on handcrafted
  * frames) and that the report's accounting reconciles with the raw
  * tables.
  */
class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("v37 expectations: report reconciles with raw tables and the " +
    "tight range gate demonstrably fires") {
    val rows = QualityOps.expectations(spark, sf0001).collect()
    assert(rows.length === 9)
    val nEvents = Tables.events(spark, sf0001).count()
    val nDocs = Tables.documents(spark, sf0001).count()
    rows.foreach { r =>
      val expected =
        if (r.getAs[String]("table_name") == "events") nEvents else nDocs
      assert(r.getAs[Long]("n_checked") === expected, r.toString)
      val (bad, n) = (r.getAs[Long]("n_bad"), r.getAs[Long]("n_checked"))
      assert(r.getAs[Double]("bad_share") ===
        ((bad * 1000000L + n / 2) / n).toDouble / 1e6)
      assert(r.getAs[Int]("pass") === (if (bad == 0) 1 else 0))
    }
    val byChk = rows.map(r => r.getAs[String]("chk") -> r).toMap
    // the tight range gate reports exactly the raw violation count
    // (it fires at sf0.01+, where values reach ~490; sf0.001's tail
    // stays under 400 — the count equality is the detection proof);
    // every other expectation holds on the shipped data
    val overs = Tables.events(spark, sf0001)
      .filter(col("value") > 400 || col("value") < 0).count()
    assert(byChk("value_in_range_0_400").getAs[Long]("n_bad") === overs)
    rows.filter(_.getAs[String]("chk") != "value_in_range_0_400")
      .foreach(r => assert(r.getAs[Int]("pass") === 1, r.toString))
  }

  test("st13 streaming expectations: per-day violation counts " +
    "recompute from raw rows (streaming conditional sums = batch)") {
    val raw = Tables.events(spark, sf0001)
      .select(col("ts_s"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val rows = graft.streaming.StreamingOps
      .streamingExpectations(spark, sf0001).collect()
    val days = raw.map(e => e._1 / 86400 * 86400).distinct
    assert(rows.length === days.length * 3)
    rows.foreach { r =>
      val mine = raw.filter(e =>
        e._1 / 86400 * 86400 == r.getAs[Long]("day_s"))
      assert(r.getAs[Long]("n_checked") === mine.length.toLong)
      val bad = r.getAs[String]("chk") match {
        case "value_not_null" => 0L // fixture has no null values
        case "value_in_range_0_400" =>
          mine.count(e => e._3 < 0 || e._3 > 400).toLong
        case "type_in_set" => mine.count(e => !Set("click", "view",
          "purchase", "signup", "error").contains(e._2)).toLong
      }
      assert(r.getAs[Long]("n_bad") === bad, r.toString)
      assert(r.getAs[Int]("pass") === (if (bad == 0) 1 else 0))
    }
  }

  test("v38 referential integrity: shipped relations are clean, and " +
    "planted orphans / childless parents are counted exactly") {
    val rows = QualityOps.refIntegrity(spark, sf0001).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphan") === 0L, r.toString)
      assert(r.getAs[Double]("orphan_share") === 0.0)
    }
    val lo = rows.find(_.getAs[String]("relation") == "lineitem->orders").get
    assert(lo.getAs[Long]("n_child") ===
      Tables.lineitem(spark, sf0001).count())
    assert(lo.getAs[Long]("n_parent") ===
      Tables.orders(spark, sf0001).count())
    // detection: 2 of 5 children point at a missing parent; parents
    // 40 and 50 have no children
    val child = Seq(1 -> "a", 1 -> "b", 2 -> "c", 99 -> "d", 98 -> "e")
      .toDF("fk", "payload")
    val parent = Seq(1, 2, 40, 50).toDF("pk")
    val audit = QualityOps.audit("t", child, "fk", parent, "pk").collect()
    assert(audit.length === 1)
    val a = audit.head
    assert(a.getAs[Long]("n_child") === 5L)
    assert(a.getAs[Long]("n_orphan") === 2L)
    assert(a.getAs[Double]("orphan_share") === 0.4)
    assert(a.getAs[Long]("n_parent") === 4L)
    assert(a.getAs[Long]("n_childless") === 2L)
  }

  test("v78 release gate reconciles with every component monitor and " +
    "the verdict is the conjunction") {
    val g = QualityOps.releaseGate(spark, sf0001).collect().head
    val failed = QualityOps.expectations(spark, sf0001).collect()
      .map(r => 1L - r.getAs[Int]("pass")).sum
    val orphans = QualityOps.refIntegrity(spark, sf0001).collect()
      .map(_.getAs[Long]("n_orphan")).sum
    val alarms = graft.operators.StatsOps.cusumMonitor(spark, sf0001)
      .collect().map(r => (if (r.getAs[Boolean]("alarm_up")) 1L else 0L) +
        (if (r.getAs[Boolean]("alarm_dn")) 1L else 0L)).sum
    val maxTvd = graft.operators.StatsOps.drift(spark, sf0001)
      .collect().map(_.getAs[Double]("tvd")).max
    assert(g.getAs[Long]("n_failed_checks") === failed)
    assert(g.getAs[Long]("n_orphans") === orphans)
    assert(g.getAs[Long]("n_alarms") === alarms)
    assert(g.getAs[Double]("max_tvd") === maxTvd)
    val dup = g.getAs[Double]("dup_share")
    assert(dup >= 0.0 && dup <= 1.0)
    assert(g.getAs[Boolean]("expectations_ok") === (failed == 0L))
    assert(g.getAs[Boolean]("fk_ok") === (orphans == 0L))
    assert(g.getAs[Boolean]("feed_stable") === (alarms == 0L))
    assert(g.getAs[Boolean]("drift_ok") ===
      (maxTvd <= QualityOps.GateMaxTvd))
    assert(g.getAs[Boolean]("dup_ok") ===
      (dup <= QualityOps.GateMaxDupShare))
    assert(g.getAs[Boolean]("ship") ===
      (failed == 0L && orphans == 0L && alarms == 0L &&
        maxTvd <= QualityOps.GateMaxTvd &&
        dup <= QualityOps.GateMaxDupShare))
  }

  test("w25 l-diversity: every class recomputes from a local bracket " +
    "replay, and a planted homogeneous class flags at_risk") {
    val rows = QualityOps.lDiversity(spark, sf0001).collect()
    val raw = Tables.customer(spark, sf0001)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    def bracket(b: Double): Long =
      (BigDecimal(b).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLongExact + 1000000000L) / 2000000000L
    val grouped = raw.groupBy(e => (e._1, e._2))
    assert(rows.length === grouped.size)
    assert(rows.exists(_.getAs[Long]("l_distinct") > 1L))
    rows.foreach { r =>
      val mine = grouped((r.getAs[Int]("c_nationkey"),
        r.getAs[String]("c_mktsegment")))
      val bs = mine.map(e => bracket(e._3))
      assert(r.getAs[Long]("n") === mine.length.toLong, r.toString)
      assert(r.getAs[Long]("l_distinct") === bs.distinct.length.toLong)
      val top = bs.groupBy(identity).values.map(_.length).max.toLong
      assert(r.getAs[Double]("top_share") ===
        ((top * 1000000L + mine.length / 2) / mine.length).toDouble / 1e6)
      assert(r.getAs[Boolean]("at_risk") ===
        (bs.distinct.length < QualityOps.DiversityL))
    }
    // detection: a large-but-homogeneous class (k-safe, l-unsafe) must
    // flag — every member shares one balance bracket
    val planted = (1 to 20).map(i => (7, "HOMOG", 100.0 + i)) ++
      (1 to 20).map(i => (8, "SPREAD", i * 977.0 - 900.0))
    val pdf = planted.toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val audit = QualityOps.lDiversityOf(pdf).collect()
    val homog = audit.find(_.getAs[String]("c_mktsegment") == "HOMOG").get
    assert(homog.getAs[Long]("n") === 20L)
    assert(homog.getAs[Long]("l_distinct") === 1L)
    assert(homog.getAs[Double]("top_share") === 1.0)
    assert(homog.getAs[Boolean]("at_risk"))
    val spread = audit.find(_.getAs[String]("c_mktsegment") == "SPREAD").get
    assert(spread.getAs[Long]("l_distinct") >=
      QualityOps.DiversityL.toLong)
    assert(!spread.getAs[Boolean]("at_risk"))
  }
}
