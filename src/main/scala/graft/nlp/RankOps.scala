package graft.nlp

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus retrieval + repetition-quality operators over `documents`
  * (north-star family, SURVEY §2.V): BM25 full-text ranking — the
  * lexical-retrieval half of a training-data search stack next to the
  * embedding ANN in graft.sim — and Gopher-style repetition metrics
  * (duplicate-word fraction, top-bigram fraction), the classic
  * quality gates a pre-training corpus is filtered by.
  *
  * Cross-engine exactness: BM25's `ln` idf differs by ulps across
  * libms (the same reason v4g dropped it), so the idf factor is the
  * RATIONAL rarity (2N-2df+1)/(2df+1) — monotone in df, so per-term
  * doc ordering is preserved — and the whole per-term score is ONE
  * integer-space ratio ([[Exact.ratio6]]): with k1=1.2, b=0.75 and
  * T = Σdl, tf_norm = tf(k1+1)/(tf + k1(1-b+b·dl/avgdl)) scaled by
  * 10T gives 22·tf·T / (10·tf·T + 3T + 9·dl·N) — all-integer numerator
  * and denominator, folded with the rarity ratio into a single ratio6.
  * Per-doc summation then rides the decimal micro-unit sum
  * ([[Exact.sumExact]]) so partition order cannot move the hash.
  */
object RankOps extends QueryModule {

  /** Default query terms (all present in the corpus vocabulary). */
  val QueryTerms: Seq[String] = Seq("spark", "merge", "window")

  private def withWords(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))

  /** V19: BM25 top-k — scale shape: one explode pruned to the query
    * terms AT THE SCAN (the isin filter pushes into the generate
    * stage), a (doc,term) partial-agg shuffle, the tiny per-term df
    * and the 1-row corpus totals BROADCAST, and TakeOrderedAndProject
    * for the top-k. Linear in corpus size; no full-term inverted index
    * is materialized for a 3-term query. */
  def bm25(spark: SparkSession, dir: String,
      terms: Seq[String] = QueryTerms, k: Int = 10): DataFrame = {
    val docs = withWords(spark, dir).withColumn("dl", size(col("w")))
    val totals = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("total_dl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("score_t", Exact.ratio6(
        lit(22L) * col("tf") * col("total_dl") *
          (lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L)),
        (lit(10L) * col("tf") * col("total_dl") + lit(3L) * col("total_dl") +
          lit(9L) * col("dl") * col("n_docs")) *
          (lit(2L) * col("df") + lit(1L))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        Exact.sumExact(col("score_t")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  private val bm25Sql: String = {
    val inList = QueryTerms.map(t => s"'$t'").mkString(",")
    s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w
       |           FROM documents WHERE text IS NOT NULL),
       | dd AS (SELECT doc_id, len(w) AS dl, w FROM d),
       | tot AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dd),
       | tf AS (SELECT doc_id, dl, term, count(*) AS tf
       |        FROM (SELECT doc_id, dl, unnest(w) AS term FROM dd)
       |        WHERE term IN ($inList) GROUP BY 1,2,3),
       | dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       | s AS (SELECT tf.doc_id,
       |        ${OracleSql.ratio6(
                  "22*tf.tf*total_dl*(2*n_docs - 2*df + 1)",
                  "(10*tf.tf*total_dl + 3*total_dl + 9*tf.dl*n_docs)*(2*df + 1)")} AS score_t
       |       FROM tf JOIN dfq USING (term) CROSS JOIN tot)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       | ${OracleSql.sumExact("score_t")} AS score
       |FROM s GROUP BY 1
       |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  }

  /** Repetition-flag thresholds (Gopher-style gates, tuned so both
    * classes are populated on the testdata). */
  val DupWordMax = 0.82
  val TopBigramMax = 0.08

  /** V21: repetition metrics — duplicate-word fraction (1 - nd/nw) and
    * most-frequent-bigram mass (2·top/nw), flagging docs past either
    * gate. Scale shape: the bigram list is built INSIDE the row
    * (zip_with of two slices — no self-join, no positional explode
    * pairing), then one explode + (doc,bigram) partial-agg shuffle and
    * a (doc) max — both keyed by high-cardinality doc_id. Linear. */
  def repetitionFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = withWords(spark, dir)
      .withColumn("nw", size(col("w")))
      .withColumn("nd", size(array_distinct(col("w"))))
    val topBigram = docs
      .filter(col("nw") >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_bg"))
    docs.join(topBigram, Seq("doc_id"), "left")
      .withColumn("top_bg", coalesce(col("top_bg"), lit(0L)))
      .withColumn("dup_word_ratio",
        Exact.ratio6(col("nw") - col("nd"), col("nw")))
      .withColumn("top_bigram_ratio",
        Exact.ratio6(col("top_bg") * 2, col("nw")))
      .select(col("doc_id"), col("nw").as("n_words"),
        col("dup_word_ratio"), col("top_bigram_ratio"),
        (col("dup_word_ratio") > DupWordMax ||
          col("top_bigram_ratio") > TopBigramMax).as("repetitive"))
      .orderBy(col("doc_id"))
  }

  private val repetitionSql: String =
    s"""WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w
       |           FROM documents WHERE text IS NOT NULL),
       | b AS (SELECT doc_id, len(w) AS nw, len(list_distinct(w)) AS nd, w
       |       FROM d),
       | bg AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
       |          for i in generate_series(1, len(w)-1)]) AS bg
       |        FROM b WHERE len(w) >= 2),
       | top AS (SELECT doc_id, max(c) AS top_bg FROM (
       |          SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1,2)
       |         GROUP BY 1),
       | m AS (SELECT b.doc_id, CAST(nw AS INT) AS n_words,
       |        ${OracleSql.ratio6("(nw - nd)", "nw")} AS dup_word_ratio,
       |        ${OracleSql.ratio6("coalesce(top_bg, 0)*2", "nw")} AS top_bigram_ratio
       |       FROM b LEFT JOIN top ON b.doc_id = top.doc_id)
       |SELECT doc_id, n_words, dup_word_ratio, top_bigram_ratio,
       | (dup_word_ratio > $DupWordMax OR top_bigram_ratio > $TopBigramMax)
       |   AS repetitive
       |FROM m ORDER BY doc_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("v19_bm25_search",
      "V19 BM25 top-k lexical retrieval: integer-exact rational-idf " +
        "scoring, term-pruned explode + broadcast df/totals + " +
        "TakeOrderedAndProject (the keyword half of corpus search)",
      (s, d) => bm25(s, d), Some(bm25Sql)),
    GraftQuery("v21_repetition_filter",
      "V21 Gopher-style repetition gate: duplicate-word + top-bigram " +
        "mass per doc (in-row bigram build, doc-keyed shuffles only)",
      repetitionFilter, Some(repetitionSql)))
}
