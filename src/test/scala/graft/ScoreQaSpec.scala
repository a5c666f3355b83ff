package graft

import graft.nlp.ScoreQaOps

/** Invariants of the signal-QA readouts (v55-v57) beyond the oracle
  * hashes: range bounds, conservation, and the degenerate-input
  * behaviors the closed forms promise. */
class ScoreQaSpec extends SparkSpec {

  test("v55 AUC is a probability and the pair counts cover the corpus") {
    val r = ScoreQaOps.scoreAuc(spark, sf0001).collect().head
    val (np, nn) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))
    assert(np > 0 && nn > 0)
    assert(np + nn === 500L)
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0, s"auc $auc")
  }

  test("v56 calibration bins partition the corpus with in-bin means") {
    val rows = ScoreQaOps.scoreCalibration(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("n")).sum === 500L)
    rows.foreach { r =>
      val bin = r.getAs[Int]("bin")
      val m = r.getAs[Double]("mean_score")
      // the bin's mean score must sit inside the bin's range
      assert(m >= bin * 0.1 - 1e-6 && (bin == 10 || m < (bin + 1) * 0.1),
        s"bin $bin mean $m")
      val pr = r.getAs[Double]("pos_rate")
      assert(pr >= 0.0 && pr <= 1.0)
    }
    // bins ascend
    val bins = rows.map(_.getAs[Int]("bin"))
    assert(bins.sorted.toSeq === bins.toSeq)
  }

  test("v57 kappa is bounded and consistent with po/pe") {
    val r = ScoreQaOps.langIdKappa(spark, sf0001).collect().head
    assert(r.getAs[Long]("n_docs") === 500L)
    val (po, pe, k) = (r.getAs[Double]("po"), r.getAs[Double]("pe"),
      r.getAs[Double]("kappa"))
    assert(po >= 0.0 && po <= 1.0)
    assert(pe > 0.0 && pe < 1.0)
    assert(k >= -1.0 && k <= 1.0, s"kappa $k")
    // kappa reproduces (po-pe)/(1-pe) within the 6dp rounding of all
    // three published numbers
    assert(math.abs(k - (po - pe) / (1 - pe)) < 1e-4,
      s"kappa $k vs (po-pe)/(1-pe) ${(po - pe) / (1 - pe)}")
  }

  test("v77 operating point: confusion partitions the corpus, both " +
    "classes are populated, and the ratios reproduce the counts") {
    val r = ScoreQaOps.gateOperatingPoint(spark, sf0001).collect().head
    val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    assert(tp + fp + fn + tn === 500L)
    assert(tp > 0L, "the gate must pass some declared-en docs")
    assert(fp + tn > 0L, "the negative class must be populated")
    def r6(num: Long, den: Long): Double =
      ((num * 1000000L + den / 2) / den).toDouble / 1e6
    assert(r.getAs[Double]("precision") === r6(tp, tp + fp))
    assert(r.getAs[Double]("recall") === r6(tp, tp + fn))
    assert(r.getAs[Double]("f1") === r6(2 * tp, 2 * tp + fp + fn))
    assert(r.getAs[Double]("accuracy") === r6(tp + tn, 500L))
    // F1 sits between precision and recall's min and max
    val (p, rec, f1) = (r.getAs[Double]("precision"),
      r.getAs[Double]("recall"), r.getAs[Double]("f1"))
    assert(f1 >= math.min(p, rec) - 1e-6 && f1 <= math.max(p, rec) + 1e-6)
  }
}
