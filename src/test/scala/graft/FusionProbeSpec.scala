package graft

import org.apache.spark.sql.functions._

/** Pins for the retrieval-fusion (v59/v60) and closed-form-probe
  * (v61) operators: semantic invariants the oracle hash can't express
  * (cross-entry consistency, monotonicity, plan shape) — the oracle
  * itself checks the values. */
class FusionProbeSpec extends SparkSpec {
  private val sf001 = "/root/testdata/sf0.01"

  test("v59 RRF ranks agree with the source rankings and the fused " +
    "score is exactly sum(1e6/(60+rank))/1e6") {
    val fused = graft.sim.FusionOps.hybridRrf(spark, sf001).collect()
    val bm = graft.nlp.RankOps.bm25(spark, sf001, k = 20)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val vec = graft.sim.SimilarityOps.cosineTopK(spark, sf001, k = 20)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    assert(fused.length === 10)
    fused.foreach { r =>
      val (id, rb, rv, rrf) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(rb === bm.getOrElse(id, 0L), s"doc $id bm25 rank")
      assert(rv === vec.getOrElse(id, 0L), s"doc $id vec rank")
      val expect = (Seq(rb, rv).map(rk =>
        if (rk == 0) 0L else 1000000L / (60L + rk)).sum).toDouble / 1e6
      assert(rrf === expect, s"doc $id rrf")
    }
    // a genuinely hybrid list: both retrievers contribute members
    assert(fused.exists(r => r.getLong(1) > 0 && r.getLong(2) == 0))
    assert(fused.exists(r => r.getLong(2) > 0 && r.getLong(1) == 0))
  }

  test("v60 MMR picks are distinct pool members, start at the argmax " +
    "relevance, and the marginal objective is non-increasing") {
    val sel = graft.sim.FusionOps.mmrDiversify(spark, sf001).collect()
    assert(sel.length === 5)
    val pool = graft.sim.SimilarityOps.cosineTopK(spark, sf001, k = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ids = sel.map(_.getLong(0))
    assert(ids.distinct.length === 5)
    ids.foreach(id => assert(pool.contains(id), s"$id not in pool"))
    // step 1 is the global relevance argmax (pool's first row)
    val top = graft.sim.SimilarityOps.cosineTopK(spark, sf001, k = 1)
      .collect()(0).getLong(0)
    assert(ids.head === top)
    // each pick's stored rel matches the pool; objective non-increasing
    sel.foreach(r => assert(r.getDouble(2) === pool(r.getLong(0))))
    val mmrs = sel.map(_.getDouble(3))
    mmrs.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
  }

  test("v60 grouped walk is bit-identical to the dataflow unroll at " +
    "two SFs (schema, every pick, every marginal score)") {
    Seq("/root/testdata/sf0.001", sf001).foreach { d =>
      val unrolled = graft.sim.FusionOps.mmrDiversify(spark, d)
      val grouped = graft.sim.FusionOps.mmrDiversifyGrouped(spark, d)
      assert(grouped.schema.map(f => (f.name, f.dataType)) ===
        unrolled.schema.map(f => (f.name, f.dataType)), s"schema @ $d")
      val u = unrolled.collect().map(_.toSeq)
      val g = grouped.collect().map(_.toSeq)
      assert(g.toSeq === u.toSeq, s"rows @ $d")
    }
  }

  test("v60 diversifies: the MMR list's mean in-pool pairwise cosine " +
    "is below the plain top-5's") {
    import graft.sim.SimilarityOps
    def meanPairCos(ids: Seq[Long]): Double = {
      val e = SimilarityOps.withNorm(Tables.embeddings(spark, sf001))
        .filter(col("vec_id").isin(ids: _*))
      val a = e.select(col("vec_id").as("i"), col("v").as("vi"),
        col("nrm").as("ni"))
      val b = e.select(col("vec_id").as("j"), col("v").as("vj"),
        col("nrm").as("nj"))
      a.join(b, col("i") < col("j"))
        .agg(avg(SimilarityOps.dot(col("vi"), col("vj")) /
          (col("ni") * col("nj"))))
        .collect()(0).getDouble(0)
    }
    val mmrIds = graft.sim.FusionOps.mmrDiversify(spark, sf001)
      .collect().map(_.getLong(0)).toSeq
    val topIds = SimilarityOps.cosineTopK(spark, sf001, k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(meanPairCos(mmrIds) < meanPairCos(topIds))
  }

  test("v61 probe distills the teacher: score separation between " +
    "teacher classes is real, accuracy at least the base rate, and " +
    "predictions re-derive from the coefficients") {
    val row = graft.nlp.ProbeOps.probeTrain(spark, sf001).collect()(0)
    val acc = row.getDouble(4)
    val scores = graft.nlp.ProbeOps.probeScores(spark, sf001).collect()
    val baseRate = {
      val nPos = scores.count(_.getBoolean(5))
      math.max(nPos, scores.length - nPos).toDouble / scores.length
    }
    assert(acc >= baseRate, s"accuracy $acc vs base $baseRate")
    // the learning signal under class imbalance: positive-class scores
    // sit well above negative-class scores (0.29 measured; band 0.15)
    assert(row.getDouble(5) >= 0.15, s"separation ${row.getDouble(5)}")
    // re-derive one prediction from the published coefficients
    val (b0m, b1m, b2m) = ((row.getDouble(1) * 1e6).round,
      (row.getDouble(2) * 1e6).round, (row.getDouble(3) * 1e6).round)
    scores.take(20).foreach { s =>
      val expect = b0m + b1m * s.getLong(1) + b2m * s.getLong(2)
      assert(s.getLong(3) === expect, s"doc ${s.getLong(0)}")
    }
  }

  test("v16b plan: the benchmark comparison is a broadcast of the " +
    "1-row bundle — no shuffle join of corpus against benchmark") {
    val p = graft.dedup.DedupOps.semanticDecontaminate(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
  }

  test("st17 streaming decontamination equals the batch v16 gate " +
    "row-for-row") {
    val batch = graft.dedup.DedupOps.decontaminate(spark, sf0001)
      .collect().map(_.toSeq)
    val stream = graft.dedup.DedupOps.streamingDecontaminate(spark, sf0001)
      .collect().map(_.toSeq)
    assert(stream.toSeq === batch.toSeq)
  }

  test("st18 streaming probe scoring equals the batch v61b scores " +
    "row-for-row") {
    val batch = graft.nlp.ProbeOps.probeScores(spark, sf0001)
      .collect().map(_.toSeq)
    val stream = graft.nlp.ProbeOps.streamingProbeScores(spark, sf0001)
      .collect().map(_.toSeq)
    assert(stream.toSeq === batch.toSeq)
  }

  test("v62 hashed vectors: weights reconstruct from a local hash of " +
    "the words, and v62b's cosine re-derives from the vectors") {
    import java.security.MessageDigest
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getString(1))
    def vecOf(text: String): Map[Long, Long] =
      text.toLowerCase.split(" ", -1).toSeq.map { w =>
        val hex = MessageDigest.getInstance("MD5")
          .digest(("feat" + w).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val b = java.lang.Long.parseLong(hex.substring(0, 2), 16) % 16
        val s = if (java.lang.Long.parseLong(hex.substring(2, 3), 16) < 8)
          1L else -1L
        b -> s
      }.groupBy(_._1).map { case (b, ss) => b -> ss.map(_._2).sum }
        .filter(_._2 != 0L)
    val expect = docs.toMap.map { case (id, t) => id -> vecOf(t) }
    val got = graft.sim.FusionOps.hashedFeatures(spark, sf0001)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    assert(got === expect.filter(_._2.nonEmpty))
    // v62b: re-derive the reported cosines
    val q = expect(0L)
    val qn = math.sqrt(q.values.map(w => w * w).sum.toDouble)
    graft.sim.FusionOps.hashedTopK(spark, sf0001).collect().foreach { r =>
      val v = expect(r.getLong(0))
      val dot = v.map { case (b, w) => w * q.getOrElse(b, 0L) }.sum
      val cos = dot.toDouble /
        (math.sqrt(v.values.map(w => w * w).sum.toDouble) * qn)
      assert(r.getDouble(1) ===
        BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, s"doc ${r.getLong(0)}")
    }
  }
}
