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
}
