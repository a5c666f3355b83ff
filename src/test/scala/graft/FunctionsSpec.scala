package graft

import graft.functions.VectorFunctions.dot_product
import org.apache.spark.sql.functions._

/** Custom Catalyst expression semantics: interpreted + codegen paths,
  * null handling, length mismatch. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot_product equals the composed zip_with/aggregate form") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5, -0.5), Seq(2.0, 2.0))).toDF("a", "b")
    val got = df.select(dot_product(col("a"), col("b"))).collect()
      .map(_.getDouble(0)).toSeq
    val ref = df.select(aggregate(zip_with(col("a"), col("b"),
      (x, y) => x * y), lit(0.0), (acc, x) => acc + x)).collect()
      .map(_.getDouble(0)).toSeq
    assert(got === ref)
    assert(got === Seq(32.0, 0.0))
  }

  test("bigrams equals the composable transform/element_at spelling " +
    "bit-for-bit on real corpus text") {
    val docs = Tables.documents(spark, sf0001)
      .filter(col("text").isNotNull)
      .withColumn("w", split(lower(col("text")), " "))
      .filter(size(col("w")) >= 2)
    val got = docs.select(col("doc_id"),
        graft.functions.BigramFunctions.bigrams(col("w")).as("bg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val ref = docs.select(col("doc_id"), expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))")
        .as("bg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got.size === ref.size)
    assert(got === ref)
    assert(got.values.exists(_.nonEmpty))
    // edge semantics: null word -> null element; < 2 words -> empty
    val edge = Seq(
      (1L, Seq("a", null, "b")),
      (2L, Seq("only")),
      (3L, Seq[String]())).toDF("doc_id", "w")
    val e = edge.select(col("doc_id"),
        graft.functions.BigramFunctions.bigrams(col("w")).as("bg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(e(1L) === Seq(null, null))
    assert(e(2L) === Seq())
    assert(e(3L) === Seq())
  }

  test("dot_product edge semantics match the composed form exactly") {
    // null input, length mismatch, null element — all must agree with
    // aggregate(zip_with(a,b,*),0.0,+) or FuseDotProduct changes results
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0)))), // len mismatch
      (None: Option[Seq[Option[Double]]], Some(Seq(Some(1.0)))), // null array
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(2.0), Some(3.0)))), // null elem
      (Some(Seq.empty[Option[Double]]), Some(Seq.empty[Option[Double]])), // empty
      (Some(Seq(Some(2.0), Some(3.0))), Some(Seq(Some(4.0), Some(5.0)))))
      .toDF("a", "b")
    val fused = df.select(dot_product(col("a"), col("b"))).collect()
    val composed = df.select(aggregate(zip_with(col("a"), col("b"),
      (x, y) => x * y), lit(0.0), (acc, x) => acc + x)).collect()
    (fused zip composed).zipWithIndex.foreach { case ((f, c), i) =>
      assert(f.isNullAt(0) === c.isNullAt(0), s"row $i null mismatch")
      if (!f.isNullAt(0))
        assert(f.getDouble(0) === c.getDouble(0), s"row $i value mismatch")
    }
    assert(fused(0).isNullAt(0) && fused(1).isNullAt(0) && fused(2).isNullAt(0))
    assert(fused(3).getDouble(0) === 0.0)
    assert(fused(4).getDouble(0) === 23.0)
  }

  test("FuseDotProduct rule rewrites the composed HOF form") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("dot"))
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val before = classic.queryExecution.analyzed
    val after = graft.plans.FuseDotProduct(before)
    def hasDot(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.DotProduct]))
    assert(!hasDot(before))
    assert(hasDot(after), s"rule did not fire on:\n$before")
  }

  test("FuseDotProduct leaves non-matching aggregates alone") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x + y),
        lit(0.0), (acc, x) => acc + x).as("notdot"))
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val after = graft.plans.FuseDotProduct(classic.queryExecution.analyzed)
    assert(!after.expressions.exists(_.exists(
      _.isInstanceOf[graft.functions.DotProduct])))
  }

  test("simhash64: majority bit votes with ties set") {
    import graft.functions.SimHashFunctions.simhash64
    val df = Seq(
      Seq(1L, 1L, 2L),       // bit0: 2/3 set -> 1; bit1: 1/3 -> 0
      Seq(3L, 0L),           // ties (1/2) count as set -> bits 0,1 set
      Seq.empty[Long]).toDF("hs")
    val got = df.select(simhash64(col("hs"))).collect().map(_.getLong(0))
    assert(got(0) === 1L)
    assert(got(1) === 3L)
    // empty array: every count ties at 0*2 >= 0 -> all bits set (documented)
    assert(got(2) === -1L)
  }

  test("marker_counts equals the composed size(filter(isInCollection)) form") {
    import graft.functions.MarkerFunctions.marker_counts
    val dicts = Seq(Seq("the", "a", "of"), Seq("der", "die"),
      Seq("the", "der")) // overlapping dicts exercise the bitmask
    val df = Seq(
      "the cat of the hat",      // duplicates counted
      "der die das",
      "",                        // empty-ish (one empty token)
      "no markers here at all",
      "the der the der").toDF("text")
      .select(split(col("text"), " ").as("w"))
    val fused = df.select(marker_counts(col("w"), dicts).as("mc")).collect()
      .map(_.getSeq[Int](0))
    val hof = df.select(dicts.zipWithIndex.map { case (d, i) =>
      size(filter(col("w"), x => x.isInCollection(d))).as(s"c$i")
    }: _*).collect().map(r => dicts.indices.map(r.getInt))
    (fused zip hof).foreach { case (f, h) => assert(f === h) }
    assert(fused(0) === Seq(3, 0, 2)) // 'the' twice + 'of'; 'the' in dict3
    assert(fused(4) === Seq(2, 2, 4))
  }

  test("minhash_sig equals the per-permutation composable spelling " +
    "bit-for-bit on real documents") {
    import graft.functions.{MinHashFunctions, ShingleFunctions}
    val coefs = graft.dedup.DedupOps.coefs
    val p = graft.dedup.DedupOps.Prime
    val base = Tables.documents(spark, sf0001)
      .filter(col("text").isNotNull)
      .withColumn("h0", transform(
        ShingleFunctions.shingle_hashes(col("text")),
        h => pmod(h, lit(p))))
      .withColumn("sig", MinHashFunctions.minhash_sig(
        ShingleFunctions.shingle_hashes(col("text")), coefs, p))
    val allEq = coefs.zipWithIndex.map { case ((a, b), k) =>
      array_min(transform(col("h0"), x => pmod(x * a + b, lit(p)))) ===
        col("sig").getItem(k)
    }.reduce(_ && _)
    assert(base.filter(!allEq).count() === 0L)
    assert(base.count() > 0L)
  }

  test("dot_product rejects non-double arrays at analysis time") {
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    intercept[Exception] {
      df.select(dot_product(col("a"), col("b"))).collect()
    }
  }

  test("scrub_report equals the composable HOF spelling bit-for-bit " +
    "(incl. short docs, keep-first holder, all-removed, empty ledger)") {
    import graft.functions.ScrubFunctions
    import spark.implicits._
    val W = 3 // small window so hand-built docs exercise every branch
    val docs = Seq(
      (1L, "a b c d e f"),        // first holder of "a b c" etc.
      (2L, "a b c d e f"),        // full duplicate -> everything removed
      (3L, "x y a b c z q"),      // partial overlap -> middle removed
      (4L, "short doc"),          // < W words -> no windows
      (5L, "u v w"),              // unique -> untouched
      (6L, "")) // single empty word after split
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
    // ledger from the same docs through the v67 aggregate
    val wins = docs.filter(size(col("w")) >= W)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("w")) - (W - 1))).as("s"))
      .join(docs, Seq("doc_id"))
      .select(col("doc_id"), col("s"),
        md5(array_join(slice(col("w"), col("s"), lit(W)), " ")).as("h"))
    val ledgerRows = wins.groupBy(col("h"))
      .agg(min(col("doc_id")).as("keep_doc"), count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("h"), col("keep_doc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bc = spark.sparkContext.broadcast(ledgerRows)
    val got = docs.withColumn("sr",
        ScrubFunctions.scrub_report(col("w"), col("doc_id"), bc, W))
      .select(col("doc_id"), col("sr.n_words"), col("sr.n_removed"),
        col("sr.clean_hash"))
      .collect().map(r => (r.getLong(0),
        (r.getInt(1), r.getLong(2), r.getString(3)))).toMap
    // the composable reference spelling (the pre-round-9 in-row form,
    // kept here as the pin): flat-ledger exists probe per window
    val ledgerDf = ledgerRows.toSeq.toDF("h", "keep_doc")
      .agg(collect_list(struct(col("h"), col("keep_doc"))).as("dup"))
    val ref = docs.crossJoin(broadcast(ledgerDf))
      .withColumn("starts",
        when(size(col("w")) >= W,
          sequence(lit(1), size(col("w")) - (W - 1)))
          .otherwise(array().cast("array<int>")))
      .withColumn("wh", transform(col("starts"), s =>
        md5(array_join(slice(col("w"), s, lit(W)), " "))))
      .withColumn("hits",
        filter(arrays_zip(col("starts"), col("wh")), p =>
          exists(col("dup"), e =>
            e.getField("h") === p.getField("wh") &&
              e.getField("keep_doc") < col("doc_id"))))
      .withColumn("ps", array_sort(array_distinct(flatten(
        transform(col("hits"), p =>
          sequence(p.getField("starts").cast("long"),
            p.getField("starts").cast("long") + (W - 1)))))))
      .select(col("doc_id"), size(col("w")).as("n_words"),
        size(col("ps")).cast("long").as("n_removed"),
        md5(array_join(
          filter(col("w"), (_, i) =>
            !array_contains(col("ps"), i.cast("long") + 1L)),
          " ")).as("clean_hash"))
      .collect().map(r => (r.getLong(0),
        (r.getInt(1), r.getLong(2), r.getString(3)))).toMap
    assert(got === ref)
    // the full-duplicate doc really lost everything: md5("")
    assert(got(2L)._3 === ref(2L)._3)
    assert(got(2L)._2 === 6L)
    // and the unique doc lost nothing
    assert(got(5L)._2 === 0L)
    // empty ledger leaves every doc untouched
    val bcEmpty = spark.sparkContext
      .broadcast(Array.empty[(String, Long)])
    val untouched = docs.withColumn("sr",
        ScrubFunctions.scrub_report(col("w"), col("doc_id"), bcEmpty, W))
      .filter(col("sr.n_removed") > 0).count()
    assert(untouched === 0L)
  }
}
