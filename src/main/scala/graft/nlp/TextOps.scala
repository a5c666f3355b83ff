package graft.nlp

import graft._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** V4 text-analysis operators over the `documents` table (SURVEY §2.V):
  * language-ID (stopword-marker heuristic), quality scoring, token
  * counting (whitespace + BPE-ish regex chunks), and document
  * fingerprinting. All pure `functions._` expressions — codegen'd, no
  * UDFs, so the whole stage stays inside WholeStageCodegen at 100 TB.
  */
object TextOps extends QueryModule {

  // Marker stopwords per language for the n-gram/stopword langid
  // heuristic. private[graft]: ScoreQaOps validates these very signals
  // (v55-v57) and must score with the SAME lists — a second hardcoded
  // copy would silently drift from the oracles (review finding, r7).
  private[graft] val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  private[graft] def words: Column = split(lower(col("text")), " ")

  /** THE shipped v13 gate threshold — one spelling for the curate
    * defaults, their oracle SQL, and ScoreQaOps' micro-unit twin
    * (GateMicro) plus v77's reported threshold column: the 0.38 cut
    * previously existed as seven independent literals that a retune
    * could silently desynchronize (round-10 review). */
  private[graft] val GateThreshold: Double = 0.38

  private val langs = Seq("en", "de", "es", "fr")

  /** Adds the shared scoring columns: `w` (words), `mc` (fused marker
    * counts) and `s_en..s_fr` (shared by [[langId]] and [[curate]]). */
  private[graft] def withMarkerScores(df: DataFrame): DataFrame = {
    val d = df.withColumn("w", words)
      .withColumn("mc", graft.functions.MarkerFunctions.marker_counts(
        col("w"), langs.map(markers)))
    langs.zipWithIndex.foldLeft(d) { case (acc, (l, i)) =>
      acc.withColumn(s"s_$l", col("mc").getItem(i))
    }
  }

  /** The v4b quality-score blend's exact integer numerator/denominator
    * over n_words/s_en/n_distinct columns, in LONG space (the Int
    * expressions would overflow at nw > ~214k words where the DuckDB
    * oracle's BIGINT len() does not). THE one definition of the score:
    * [[scoreCol]] is num/den half-up at 6 dp; [[scoreMicro]] is the
    * same pair kept in integer micro space for ScoreQaOps' v55-v57
    * validation statistics — sharing the pair is what makes "the v4b
    * score verbatim" a structural fact rather than a comment. */
  private def scoreNum: Column =
    least(col("n_words"), lit(100)).cast("long") * col("n_words") * 40 +
      (col("s_en") + col("n_distinct")).cast("long") * 3000
  private def scoreDen: Column = col("n_words").cast("long") * 10000
  private def scoreCol: Column = Exact.ratio6(scoreNum, scoreDen)
  /** Integer micro-unit v4b score (half-up at 6 dp — [[scoreCol]]'s
    * value ×1e6, before the final double division). */
  private[graft] def scoreMicro: Column =
    Exact.intDiv(scoreNum * 1000000L + shiftright(scoreDen, 1), scoreDen)

  /** Argmax language over s_en..s_fr marker-count columns with the
    * deterministic en > de > es > fr tie-break (shared by [[langId]] and
    * [[curate]]; assumes non-null scores — callers gate NULL text). */
  private[graft] def argmaxLang: Column =
    when(col("s_en") + col("s_de") + col("s_es") + col("s_fr") === 0, "und")
      .when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
        col("s_en") >= col("s_fr"), "en")
      .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
      .when(col("s_es") >= col("s_fr"), "es")
      .otherwise("fr")

  /** (doc_id, sc): every non-null-text doc with its v4b score in
    * integer micro units, from THE shared [[scoreMicro]] spelling —
    * the ranking key the quality-aware dedup keeper (v72) sorts on.
    * (ScoreQaOps keeps its own single-scan prep because it carries the
    * `pos` label inline; the SCORE spelling is shared either way.) */
  private[graft] def qualityMicro(spark: SparkSession,
      dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .withColumn("w", words)
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("n_distinct",
        size(array_distinct(col("w"))).cast("long"))
      .withColumn("s_en", graft.functions.MarkerFunctions.marker_counts(
        col("w"), Seq(markers("en"))).getItem(0).cast("long"))
      .select(col("doc_id"), scoreMicro.as("sc"))

  /** V4a: language identification — argmax of per-language marker-word
    * counts, 'und' when nothing matches or the text is NULL (explicit on
    * both engines — marker scores are NULL for NULL text, which would
    * otherwise fall through every comparison to the final branch).
    * Deterministic tie-break order en > de > es > fr. All four dictionaries are counted in ONE fused
    * pass ([[graft.functions.MarkerCounts]], word→bitmask lookup inside
    * codegen) instead of four interpreter-evaluated filter lambdas. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    withMarkerScores(Tables.documents(spark, dir))
      .withColumn("detected",
        when(col("text").isNull, "und").otherwise(argmaxLang))
      .groupBy(col("detected"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("detected"))

  /** V4b: quality scoring — length, lexical diversity, stopword ratio
    * blended into one score (the classic pre-training heuristics).
    * All ratios are rounded IN INTEGER SPACE ([[Exact.ratio6]]): ratios
    * of small integers land exactly on .5e-6 boundaries often enough
    * that engine round() implementations disagree (observed at sf0.1).
    * score = 0.4*min(nw,100)/100 + 0.3*sm/nw + 0.3*nd/nw
    *       = (40*min(nw,100)*nw + 3000*(sm+nd)) / (10000*nw). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("w", words)
      .withColumn("n_words", when(col("text").isNotNull, size(col("w"))))
      .withColumn("n_distinct",
        when(col("text").isNotNull, size(array_distinct(col("w")))))
      .withColumn("s_en", graft.functions.MarkerFunctions.marker_counts(
        col("w"), Seq(markers("en"))).getItem(0))
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        Exact.ratio6(col("s_en"), col("n_words")).as("stop_ratio"),
        Exact.ratio6(col("n_distinct"), col("n_words")).as("ttr"),
        scoreCol.as("score"))
      .orderBy(col("doc_id"))

  /** V4c: token counting — whitespace tokens and BPE-ish greedy ≤4-char
    * subword chunks via regex. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("text").isNotNull, size(words)).as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z0-9]{1,4}")).as("subword_tokens"),
        length(col("text")).as("n_chars"))
      .orderBy(col("doc_id"))

  /** V4d: document fingerprint — md5 over the canonical form (sorted
    * distinct words). Two docs with the same bag-of-words collide, which
    * is exactly the dedup-canonicalization use. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        // concat_ws treats a NULL array as empty ⇒ md5('') for NULL text,
        // where the oracle's array_to_string(NULL) yields NULL — guard.
        when(col("text").isNotNull,
          md5(concat_ws(" ", array_sort(array_distinct(words)))
            .cast("binary"))).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** V4e: vocabulary build — global token counts, top-50. The classic
    * first step of tokenizer training; one explode + one shuffle on the
    * token key with map-side partial aggregation. */
  def vocab(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(words).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(50)

  /** V4g: per-document characteristic terms — TF × rarity scoring, the
    * tf-idf step of corpus analysis with the idf log replaced by the
    * integer-exact tf/df ratio: `ln` differs by ulps across engines'
    * libms, which would make a hash oracle flaky, and within a document
    * the (tf desc, df asc, term) rank used here orders ties identically
    * to any monotone rarity weight. Top-3 terms per doc.
    *
    * Scale: one explode, a (doc,term) aggregate, a term-keyed df join
    * (the tf exchange is identical in both subtrees — ReuseExchange
    * computes it once), and a (doc_id)-partitioned window — doc_id is
    * high-cardinality, so no single-task funnel anywhere. */
  def termScores(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(words).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term"))
    tf.join(dfreq, Seq("term"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .withColumn("score", Exact.ratio6(col("tf"), col("df")))
      .select(col("doc_id"), col("rk"), col("term"), col("tf"),
        col("df"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** V27: rare-bigram ratio — the perplexity-proxy quality gate: a
    * document whose word bigrams are mostly unseen in the rest of the
    * corpus (global frequency ≤ 2) is likely noise/garble, the same
    * signal an n-gram LM's perplexity gives without the libm-unstable
    * log-probs (integer counts + [[Exact.ratio6]] keep the oracle
    * hash-exact, as v4g does for tf-idf).
    *
    * Scale: one explode into (doc, bigram) occurrence rows, a
    * bigram-keyed count aggregate, and a join of occurrences to that
    * 1-row-per-key count side — hot bigrams ("the the") skew the join
    * key but the build side stays one row per key. At test SF the
    * count side fits the broadcast threshold (pure broadcast probe);
    * past it both subtrees shuffle on the bigram key and ReuseExchange
    * shares the exploded-occurrence exchange, so the op costs ~one
    * shuffle of the exploded corpus either way. */
  def rareBigrams(spark: SparkSession, dir: String): DataFrame = {
    val bg = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .withColumn("w", words)
      .filter(size(col("w")) >= 2)
      // compiled bigram pass ([[graft.functions.Bigrams]]) — the
      // interpreted transform/element_at lambda was the family's last
      // per-element HOF hot loop; bit-identical (FunctionsSpec)
      .select(col("doc_id"), explode(
        graft.functions.BigramFunctions.bigrams(col("w"))).as("bigram"))
    val freq = bg.groupBy(col("bigram")).agg(count(lit(1)).as("bf"))
    bg.join(freq, Seq("bigram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("bf") <= 2, 1).otherwise(0)).cast("long").as("n_rare"))
      .withColumn("rare_ratio", Exact.ratio6(col("n_rare"), col("n_bigrams")))
      .orderBy(col("doc_id"))
  }

  /** Chunk geometry: 64-word windows every 56 words → 8-word overlap. */
  val ChunkWords = 64
  val ChunkStride = 56

  /** V33: document chunking — fixed-size overlapping word windows, the
    * step between a curated corpus and a RAG index / pretraining
    * shards: every document becomes ⌈len/stride⌉ chunks of ≤ 64 words
    * with an 8-word overlap so no boundary sentence is lost. Pure
    * per-row compute (one codegen'd transform + explode, no shuffle
    * until the output sort); chunk text is witnessed as an md5 so the
    * oracle hash-compares content without list columns (v18's checksum
    * convention). */
  def chunk(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .withColumn("w", words)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(w), $ChunkStride), s -> struct(
           |  CAST((s - 1) div $ChunkStride AS INT) AS chunk_idx,
           |  least($ChunkWords, size(w) - s + 1) AS n_words,
           |  concat_ws(' ', slice(w, s, $ChunkWords)) AS chunk))"""
          .stripMargin)).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.n_words").as("n_words"),
        md5(col("c.chunk").cast("binary")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Keep the `n` smallest `doc_id`s per source with their exact rank,
    * WITHOUT ranking a whole source in one task: stage 1 keeps each
    * input partition's n smallest doc_ids per source — a superset of
    * the answer under ANY partitioning, in windows bounded by the input
    * partition size — and stage 2 ranks only the ≤ n·P survivors. With
    * a small cap the survivor set is tiny (n=20 across a million input
    * partitions is 2·10⁷ narrow rows) where the single-window form
    * funnels the full terabytes of a source through one sort; if P ever
    * makes the survivor window itself a bottleneck, the same prune
    * recurses. */
  private def capBySource(df: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wLocal = Window.partitionBy(col("source"), col("cap_pid"))
      .orderBy(col("doc_id"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    df.withColumn("cap_pid", spark_partition_id())
      .withColumn("cap_lrk", row_number().over(wLocal))
      .filter(col("cap_lrk") <= n)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .drop("cap_pid", "cap_lrk")
  }

  /** V8: per-source cap — keep the first `n` docs of every source
    * (the per-domain cap step of corpus curation); two-stage
    * prune-then-rank, see [[capBySource]]. */
  def perSourceCap(spark: SparkSession, dir: String, n: Int = 20): DataFrame =
    capBySource(
      Tables.documents(spark, dir).select(col("source"), col("doc_id")), n)
      .select(col("source"), col("doc_id"), col("rk"))
      .orderBy(col("source"), col("doc_id"))

  /** V8b: the per-source cap answered by the NATIVE [[graft.plans.TopKPerKey]]
    * operator — same result, same oracle as v8, but the prune stage is a
    * whole-operator physical plan (per-key bounded heaps, partial before
    * the exchange / final after) instead of the spark_partition_id window
    * trick: no local sort anywhere below the exchange, no rank column in
    * flight, and the one shuffle carries ≤ n·sources·partitions rows.
    * The rank v8's contract exposes is recovered by a window over the
    * ≤ n·sources survivors — a bounded frame, noise at any scale. */
  def perSourceCapNative(spark: SparkSession, dir: String,
      n: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kept = graft.plans.TopKPerKey.topK(
      Tables.documents(spark, dir).select(col("source"), col("doc_id")),
      Seq("source"), Seq("doc_id"), n)
    kept.withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .orderBy(col("source"), col("doc_id"))
  }

  /** V13: the curation pipeline — the composed form a training-data run
    * actually executes, in ONE query: normalize → exact-dedup on the
    * canonical hash (keep lowest doc_id) → language gate (en) → quality
    * threshold → per-source cap. One high-cardinality window shuffle
    * (dedup key) + the two-stage cap ([[capBySource]]) + the fused
    * marker pass; every stage is the same logic as its standalone
    * operator (v4f/v1/v4a/v4b/v8), so the whole pipeline stays
    * oracle-checkable end-to-end. */
  def curate(spark: SparkSession, dir: String,
      minScore: Double = GateThreshold,
      perSource: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .withColumn("norm_hash", TextCanon.normHash)
    val deduped = base
      .withColumn("dk", row_number().over(
        Window.partitionBy(col("norm_hash")).orderBy(col("doc_id"))))
      .filter(col("dk") === 1)
    val scored = withMarkerScores(deduped)
      .withColumn("detected", argmaxLang)
      .withColumn("n_words", size(col("w")))
      .withColumn("n_distinct", size(array_distinct(col("w"))))
      .withColumn("score", scoreCol)
      .filter(col("detected") === "en" && col("score") >= minScore)
    capBySource(scored, perSource)
      .select(col("doc_id"), col("source"), col("n_words"), col("score"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** V13b: curation EXPLAIN — the provenance report v13 cannot give:
    * one row per INPUT document with its verdict ('kept' or the FIRST
    * gate that dropped it, in pipeline order: null_text → duplicate →
    * language → quality → cap) plus the quality score where the doc
    * got far enough to have one. Data-quality debugging at corpus
    * scale is exactly this query — "why did my document disappear" —
    * and because each gate's population is the previous gate's
    * survivors, the verdicts must be derived in the SAME pipeline
    * order as v13's filters (a doc failing two gates reports the
    * first). Same dataflow cost as v13 itself: one dedup window, one
    * scoring pass, one per-source rank over lang+quality survivors,
    * assembled by disjoint unions. */
  def curateExplain(spark: SparkSession, dir: String,
      minScore: Double = GateThreshold, perSource: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE pass, round 12: the original disjoint-union assembly
    // recomputed every shared subtree per branch — the dedup window ran
    // 4x and the marker-scoring pass 3x (5 scans / 11 Window nodes in
    // the physical plan). All five verdicts are derivable from one
    // scored frame: the first-failing-gate order becomes a CASE chain,
    // and the per-source survivor rank is a window partitioned by
    // (source, ok) — within the ok=true slice it equals the old
    // survivors-only rank. For masked rows (null text / dups) the
    // scoring expressions evaluate to null and the verdict chain never
    // reads them: argmaxLang/scoreCol are null-proof (MarkerCounts is
    // nullSafeEval; ratio6's den nw >= 1 on any non-null text), and for
    // every row that can reach the language/quality/cap branches
    // detected and score are non-null, so the CASE picks exactly the
    // branch the old filters did. Plan: 1 scan, 2 windows, same output
    // (ScaleSpec first-gate-wins pins + the DuckDB oracle unchanged).
    val scored = withMarkerScores(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text"))
        .withColumn("norm_hash", TextCanon.normHash)
        // skew assumption (round-13 ADVICE): null-text rows all carry a
        // NULL norm_hash and share ONE window partition. Correct (the
        // verdict CASE tests text IS NULL before dk) and fine at this
        // corpus's null density (~1%); a null-heavy corpus would
        // pre-split nulls or partition by (norm_hash, text IS NULL).
        .withColumn("dk", row_number().over(
          Window.partitionBy(col("norm_hash")).orderBy(col("doc_id")))))
      .withColumn("detected", argmaxLang)
      .withColumn("n_words", size(col("w")))
      .withColumn("n_distinct", size(array_distinct(col("w"))))
      .withColumn("score", scoreCol)
    val ok = col("text").isNotNull && col("dk") === 1 &&
      col("detected") === "en" && col("score") >= minScore
    scored
      .withColumn("ok", ok)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"), col("ok"))
          .orderBy(col("doc_id"))))
      .select(col("doc_id"), col("source"),
        when(col("text").isNull, "null_text")
          .when(col("dk") > 1, "duplicate")
          .when(col("detected") =!= "en", "language")
          .when(col("score") < minScore, "quality")
          .when(col("rk") <= perSource, "kept")
          .otherwise("cap").as("verdict"),
        when(col("text").isNotNull && col("dk") === 1 &&
          col("detected") === "en", col("score"))
          .otherwise(lit(null).cast("double")).as("score"))
      .orderBy(col("doc_id"))
  }

  private lazy val curateExplainSql: String =
    s"""WITH alln AS (SELECT doc_id, source, text FROM documents),
       | base AS (SELECT doc_id, source, text,
       |   ${OracleSql.normHashText} AS norm_hash
       |  FROM alln WHERE text IS NOT NULL),
       | d AS (SELECT *, row_number() OVER (
       |    PARTITION BY norm_hash ORDER BY doc_id) AS dk FROM base),
       | s AS (SELECT doc_id, source, text,
       |   ${markerSql("en")} AS s_en, ${markerSql("de")} AS s_de,
       |   ${markerSql("es")} AS s_es, ${markerSql("fr")} AS s_fr,
       |   len($wordsSql) AS nw, len(list_distinct($wordsSql)) AS nd
       |  FROM d WHERE dk = 1),
       | g AS (SELECT doc_id, source,
       |   (s_en + s_de + s_es + s_fr > 0 AND s_en >= s_de
       |    AND s_en >= s_es AND s_en >= s_fr) AS lang_ok,
       |   ${OracleSql.ratio6("(least(nw,100)*nw*40 + (s_en+nd)*3000)",
            "nw*10000")} AS score
       |  FROM s),
       | surv AS (SELECT doc_id, source, score, row_number() OVER (
       |    PARTITION BY source ORDER BY doc_id) AS rk
       |  FROM g WHERE lang_ok AND score >= $GateThreshold)
       |SELECT doc_id, source, verdict, score FROM (
       | SELECT doc_id, source, 'null_text' AS verdict,
       |  CAST(NULL AS DOUBLE) AS score FROM alln WHERE text IS NULL
       | UNION ALL
       | SELECT doc_id, source, 'duplicate', NULL FROM d WHERE dk > 1
       | UNION ALL
       | SELECT doc_id, source, 'language', NULL FROM g WHERE NOT lang_ok
       | UNION ALL
       | SELECT doc_id, source, 'quality', score FROM g
       | WHERE lang_ok AND score < $GateThreshold
       | UNION ALL
       | SELECT doc_id, source,
       |  CASE WHEN rk <= 10 THEN 'kept' ELSE 'cap' END, score FROM surv)
       |ORDER BY doc_id""".stripMargin

  private[graft] val wordsSql = "string_split(lower(text), ' ')"
  private[graft] def markerSql(lang: String): String =
    s"len(list_filter($wordsSql, w -> w IN (${markers(lang).map(s => s"'$s'").mkString(",")})))"

  /** V42: vocabulary growth — per ingest batch (doc_id-range buckets of
    * 50 standing in for arrival order), the token volume, distinct
    * words, FIRST-SEEN words (min-batch per word), the running
    * vocabulary size, and the novelty ratio. The corpus-health curve a
    * crawler watches: a collapsing novelty rate means the crawl is
    * re-reading the same content; a spike means a new domain (or junk)
    * entered the feed. Word flow is linear (explode + two word-keyed
    * aggregates); the cumulative window runs over the BATCH frame —
    * corpus/50 rows; at extreme scale that prefix-sum shards exactly
    * like v15's. The per-batch exact countDistinct swaps to HLL at
    * 100 TB (the v9b/t20b convention). */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(split(TextCanon.normalized, " ")).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("batch", Exact.intDiv(col("doc_id"), lit(50L)))
    val perBatch = words.groupBy(col("batch"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("word")).as("n_distinct"))
    val news = words.groupBy(col("word")).agg(min(col("batch")).as("fb"))
      .groupBy(col("fb").as("batch")).agg(count(lit(1)).as("n_new"))
    perBatch.join(news, Seq("batch"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("vocab_cum", sum(col("n_new")).over(
        Window.orderBy(col("batch"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("novelty", Exact.ratio6(col("n_new"), col("n_distinct")))
      .orderBy(col("batch"))
  }

  private lazy val vocabGrowthSql: String =
    s"""WITH w AS (
       | SELECT doc_id // 50 AS batch,
       |  unnest(string_split(${OracleSql.normalizedText}, ' ')) AS word
       | FROM documents WHERE text IS NOT NULL),
       |w2 AS (SELECT batch, word FROM w WHERE len(word) > 0),
       |pb AS (
       | SELECT batch, count(*) AS n_tokens,
       |  count(DISTINCT word) AS n_distinct
       | FROM w2 GROUP BY 1),
       |fs AS (SELECT word, min(batch) AS fb FROM w2 GROUP BY 1),
       |nw AS (SELECT fb AS batch, count(*) AS n_new FROM fs GROUP BY 1)
       |SELECT pb.batch, CAST(n_tokens AS BIGINT) AS n_tokens,
       | CAST(n_distinct AS BIGINT) AS n_distinct,
       | CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
       | CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY pb.batch
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |   AS vocab_cum,
       | ${OracleSql.ratio6("coalesce(n_new, 0)", "n_distinct")} AS novelty
       |FROM pb LEFT JOIN nw USING (batch) ORDER BY 1""".stripMargin

  /** V44's vocab cutoff — a CONFIG knob, not a semantic constant: it
    * must sit BELOW the corpus's distinct-word count for the metric to
    * be informative (FIXTURES.md corpus: 31 distinct words, so 20 leaves
    * real OOV mass; v4e's usual 50 would cover everything and make the
    * gate vacuous). A production run sizes this from the tokenizer's
    * vocab budget, not from code. */
  val OovVocabTopK = 20

  /** V44: OOV rate — per source, the share of tokens OUTSIDE the
    * learned top-[[OovVocabTopK]] vocabulary (v4e's build at a tighter
    * cutoff): the tokenizer-coverage metric that
    * decides whether a vocab transfers to a new feed (a source whose
    * OOV share spikes needs its own merges). Same token convention as
    * v4e; the vocabulary side is LIMIT-bounded, so the membership probe
    * is a broadcast left join — one exploded scan + one token-keyed
    * vocab aggregate, linear. */
  def oovRate(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(words).as("token"))
    val voc = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token")).limit(OovVocabTopK)
      .select(col("token"), lit(1).as("in_vocab"))
    toks.join(broadcast(voc), Seq("token"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1).otherwise(0)).cast("long")
          .as("n_oov"))
      .withColumn("oov_share", Exact.ratio6(col("n_oov"), col("n_tokens")))
      .orderBy(col("source"))
  }

  private lazy val oovSql: String =
    s"""WITH t AS (
       |  SELECT source, unnest($wordsSql) AS token FROM documents),
       | v AS (
       |  SELECT token FROM (
       |   SELECT token, count(*) AS freq FROM t GROUP BY 1
       |   ORDER BY freq DESC, token LIMIT $OovVocabTopK))
       |SELECT t.source, CAST(count(*) AS BIGINT) AS n_tokens,
       | CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |   AS n_oov,
       | ${OracleSql.ratio6("sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)",
          "count(*)")} AS oov_share
       |FROM t LEFT JOIN v ON t.token = v.token
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** V54: the dataset card — the one-page datasheet a corpus release
    * ships with (docs, sources, languages, size, English share,
    * duplicate share, null share), as one (metric, value) frame. ONE
    * scan: every metric is a column of a single aggregate row (the v37
    * fused-conditional-sum discipline; the only non-algebraic pieces
    * are the distinct counts, which ride the same pass and swap to
    * HLL sketches at 100 TB per the v9→v9b convention), exploded to
    * rows after. All values surface as exact-integer-derived doubles
    * ([[Exact.ratio6]] for the shares), so the card hash-matches
    * DuckDB bit-for-bit. */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("nh", when(col("text").isNotNull, TextCanon.normHash))
    val a = d.agg(
      count(lit(1)).as("n"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_null"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      sum(col("n_chars")).as("chars"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
      count(col("nh")).as("n_text"),
      countDistinct(col("nh")).as("n_uniq"))
    def m(name: String, v: Column) =
      struct(lit(name).as("metric"), v.cast("double").as("value"))
    a.select(explode(array(
        // corpus-TOTAL numerator: chars*1e6 passes Long.MaxValue at
        // ~9.2e12 chars (~10 TB of text) — the decimal form is exact
        // there and identical below it (round-10 review)
        m("avg_chars", Exact.ratio6Dec(col("chars"), col("n"))),
        m("dup_share",
          Exact.ratio6(col("n_text") - col("n_uniq"), col("n_text"))),
        m("en_share", Exact.ratio6(col("n_en"), col("n"))),
        m("n_docs", col("n")),
        m("n_langs", col("n_langs")),
        m("n_sources", col("n_sources")),
        m("null_text_share", Exact.ratio6(col("n_null"), col("n"))),
        m("total_chars", col("chars")))).as("r"))
      .select(col("r.metric"), col("r.value"))
      .orderBy(col("metric"))
  }

  private lazy val datasetCardSql: String =
    s"""WITH a AS (SELECT
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_null,
       |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |  CAST(sum(n_chars) AS BIGINT) AS chars,
       |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_en,
       |  CAST(count(CASE WHEN text IS NOT NULL THEN 1 END) AS BIGINT)
       |    AS n_text,
       |  CAST(count(DISTINCT CASE WHEN text IS NOT NULL
       |    THEN ${OracleSql.normHashText} END) AS BIGINT) AS n_uniq
       | FROM documents)
       |SELECT metric, value FROM (
       | SELECT 'avg_chars' AS metric,
       |   ${OracleSql.ratio6("chars", "n")} AS value FROM a
       | UNION ALL SELECT 'dup_share',
       |   ${OracleSql.ratio6("(n_text - n_uniq)", "n_text")} FROM a
       | UNION ALL SELECT 'en_share', ${OracleSql.ratio6("n_en", "n")} FROM a
       | UNION ALL SELECT 'n_docs', CAST(n AS DOUBLE) FROM a
       | UNION ALL SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM a
       | UNION ALL SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM a
       | UNION ALL SELECT 'null_text_share',
       |   ${OracleSql.ratio6("n_null", "n")} FROM a
       | UNION ALL SELECT 'total_chars', CAST(chars AS DOUBLE) FROM a)
       |ORDER BY metric""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("v54_dataset_card",
      "V54 dataset card: the release datasheet (docs/sources/langs/" +
        "size/en-share/dup-share/null-share) as one exact (metric, " +
        "value) frame from a single fused scan pass",
      datasetCard, Some(datasetCardSql)),
    GraftQuery("v44_oov_rate",
      "V44 OOV rate per source under the learned top-20 vocab " +
        "(tokenizer-coverage metric; broadcast vocab membership probe, " +
        "linear)",
      oovRate, Some(oovSql)),
    GraftQuery("v42_vocab_growth",
      "V42 vocabulary growth per ingest batch: tokens, distinct words, " +
        "first-seen words, running vocab, novelty ratio (linear word " +
        "flow; cumulative window over the corpus/50 batch frame)",
      vocabGrowth, Some(vocabGrowthSql)),
    GraftQuery("v4a_lang_id",
      "V4 language-ID via stopword-marker argmax heuristic",
      langId,
      Some(s"""WITH s AS (SELECT doc_id,
              |  ${markerSql("en")} AS s_en, ${markerSql("de")} AS s_de,
              |  ${markerSql("es")} AS s_es, ${markerSql("fr")} AS s_fr
              | FROM documents)
              |SELECT CASE
              |  WHEN s_en IS NULL THEN 'und'
              |  WHEN s_en+s_de+s_es+s_fr = 0 THEN 'und'
              |  WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
              |  WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
              |  WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS detected,
              | CAST(count(*) AS BIGINT) AS n_docs
              |FROM s GROUP BY 1 ORDER BY 1""".stripMargin)),
    GraftQuery("v4b_quality_score",
      "V4 quality scoring: length/stopword/diversity blend " +
        "(integer-space rounding)",
      qualityScore,
      Some(s"""WITH b AS (SELECT doc_id,
              |  len($wordsSql) AS nw,
              |  len(list_distinct($wordsSql)) AS nd,
              |  ${markerSql("en")} AS sm
              | FROM documents)
              |SELECT doc_id, CAST(nw AS INT) AS n_words,
              | CAST(nd AS INT) AS n_distinct,
              | ${OracleSql.ratio6("sm", "nw")} AS stop_ratio,
              | ${OracleSql.ratio6("nd", "nw")} AS ttr,
              | ${OracleSql.ratio6("(least(nw,100)*nw*40 + (sm+nd)*3000)",
                  "nw*10000")} AS score
              |FROM b ORDER BY doc_id""".stripMargin)),
    GraftQuery("v4c_token_count",
      "V4 token counting: whitespace + BPE-ish regex chunks",
      tokenCount,
      Some(s"""SELECT doc_id, CAST(len($wordsSql) AS INT) AS ws_tokens,
              | CAST(len(regexp_extract_all(text, '[a-z0-9]{1,4}')) AS INT) AS subword_tokens,
              | CAST(length(text) AS INT) AS n_chars
              |FROM documents ORDER BY doc_id""".stripMargin)),
    GraftQuery("v4f_normalize",
      "V4 text normalization: lowercase, collapse whitespace, trim, " +
        "content hash (the pre-tokenization canonical form)",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), TextCanon.normalized.as("normalized"))
        .withColumn("norm_hash", md5(col("normalized").cast("binary")))
        .withColumn("n_chars_norm", length(col("normalized")))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
             | ${OracleSql.normalizedText} AS normalized,
             | ${OracleSql.normHashText} AS norm_hash,
             | CAST(length(${OracleSql.normalizedText}) AS INT) AS n_chars_norm
             |FROM documents ORDER BY doc_id""".stripMargin)),
    GraftQuery("v4e_vocab",
      "V4 vocabulary build: global token counts, top-50",
      vocab,
      Some("""SELECT token, CAST(count(*) AS BIGINT) AS freq
             |FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
             |      FROM documents)
             |GROUP BY 1 ORDER BY freq DESC, token LIMIT 50""".stripMargin)),
    GraftQuery("v4g_term_scores",
      "V4g characteristic terms: top-3 per doc by TF x rarity " +
        "(integer-exact tf/df ratio in place of the libm-unstable " +
        "idf log; explode + df join + doc-window)",
      termScores,
      Some(s"""WITH w AS (SELECT doc_id,
              |            unnest(string_split(lower(text), ' ')) AS term
              |           FROM documents WHERE text IS NOT NULL),
              | tf AS (SELECT doc_id, term, count(*) AS tf
              |        FROM w GROUP BY 1, 2),
              | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
              | r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
              |        row_number() OVER (PARTITION BY tf.doc_id
              |          ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rk
              |       FROM tf JOIN df USING (term))
              |SELECT doc_id, CAST(rk AS INT) AS rk, term,
              | CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
              | ${OracleSql.ratio6("tf", "df")} AS score
              |FROM r WHERE rk <= 3
              |ORDER BY doc_id, rk""".stripMargin)),
    GraftQuery("v8_per_source_cap",
      "V8 per-source document cap, two-stage prune-then-rank (no " +
        "whole-source window; corpus curation)",
      (s, d) => perSourceCap(s, d),
      Some("""SELECT source, doc_id,
             | CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS INT) AS rk
             |FROM documents
             |QUALIFY rk <= 20
             |ORDER BY source, doc_id""".stripMargin)),
    GraftQuery("v8b_per_source_cap_native",
      "V8b per-source cap via the native TopKPerKey operator (custom " +
        "LogicalPlan+Strategy+Exec, partial/final heap passes, no local " +
        "sort, no rank column) -> same oracle as v8",
      (s, d) => perSourceCapNative(s, d),
      Some("""SELECT source, doc_id,
             | CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS INT) AS rk
             |FROM documents
             |QUALIFY rk <= 20
             |ORDER BY source, doc_id""".stripMargin)),
    GraftQuery("v13_curation_pipeline",
      "V13 composed curation: normalize -> exact-dedup -> language " +
        "gate -> quality threshold -> per-source cap, one query",
      (s, d) => curate(s, d),
      Some(s"""WITH base AS (
              |  SELECT doc_id, source, text,
              |   ${OracleSql.normHashText} AS norm_hash
              |  FROM documents WHERE text IS NOT NULL),
              | d AS (SELECT *, row_number() OVER (
              |    PARTITION BY norm_hash ORDER BY doc_id) AS dk FROM base),
              | s AS (SELECT doc_id, source, text,
              |   ${markerSql("en")} AS s_en, ${markerSql("de")} AS s_de,
              |   ${markerSql("es")} AS s_es, ${markerSql("fr")} AS s_fr,
              |   len($wordsSql) AS nw, len(list_distinct($wordsSql)) AS nd
              |  FROM d WHERE dk = 1),
              | g AS (SELECT doc_id, source, nw,
              |   ${OracleSql.ratio6("(least(nw,100)*nw*40 + (s_en+nd)*3000)",
                    "nw*10000")} AS score
              |  FROM s
              |  WHERE s_en+s_de+s_es+s_fr > 0
              |   AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr)
              |SELECT doc_id, source, CAST(nw AS INT) AS n_words, score
              |FROM g
              |WHERE score >= $GateThreshold
              |QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 10
              |ORDER BY source, doc_id""".stripMargin)),
    GraftQuery("v13b_curation_explain",
      "V13b curation EXPLAIN: one verdict row per input doc — kept, or " +
        "the FIRST failing gate in pipeline order (null_text/duplicate/" +
        "language/quality/cap) with the score where computed — the " +
        "why-did-my-document-disappear provenance report",
      (s, d) => curateExplain(s, d), Some(curateExplainSql)),
    GraftQuery("v27_rare_bigrams",
      "V27 rare-bigram ratio: perplexity-proxy quality gate over " +
        "corpus bigram counts (integer-exact, no log-probs)",
      rareBigrams,
      Some(s"""WITH d AS (
              |  SELECT doc_id, $wordsSql AS w
              |  FROM documents
              |  WHERE text IS NOT NULL AND len($wordsSql) >= 2),
              | bg AS (SELECT doc_id,
              |         unnest(list_transform(range(1, len(w)),
              |           i -> w[i] || ' ' || w[i + 1])) AS bigram
              |        FROM d),
              | f AS (SELECT bigram, count(*) AS bf FROM bg GROUP BY 1)
              |SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              | CAST(sum(CASE WHEN f.bf <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
              | ${OracleSql.ratio6(
                  "sum(CASE WHEN f.bf <= 2 THEN 1 ELSE 0 END)",
                  "count(*)")} AS rare_ratio
              |FROM bg JOIN f USING (bigram)
              |GROUP BY 1 ORDER BY 1""".stripMargin)),
    GraftQuery("v33_chunking",
      "V33 document chunking: 64-word windows, 8-word overlap " +
        "(per-row transform+explode, md5-witnessed chunk content)",
      chunk,
      Some(s"""WITH d AS (
              |  SELECT doc_id, $wordsSql AS w
              |  FROM documents WHERE text IS NOT NULL),
              | c AS (SELECT doc_id, w,
              |        unnest(range(1, len(w) + 1, $ChunkStride)) AS s
              |       FROM d)
              |SELECT doc_id,
              | CAST((s - 1) // $ChunkStride AS INT) AS chunk_idx,
              | CAST(least($ChunkWords, len(w) - s + 1) AS INT) AS n_words,
              | md5(array_to_string(list_slice(w, s, s + ${ChunkWords - 1}), ' ')) AS chunk_hash
              |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),
    GraftQuery("v4d_fingerprint",
      "V4 document fingerprint: md5 of sorted distinct words",
      fingerprint,
      Some(s"""SELECT doc_id,
              | md5(array_to_string(list_sort(list_distinct($wordsSql)), ' ')) AS fingerprint
              |FROM documents ORDER BY doc_id""".stripMargin)))
}
