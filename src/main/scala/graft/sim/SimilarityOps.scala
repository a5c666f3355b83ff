package graft.sim

import graft._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** V3 similarity search over the `embeddings` table: brute-force cosine
  * top-k as the exactness baseline, and an IVF (inverted-file) variant as
  * the 100 TB path — cluster the corpus once, then probe only the nearest
  * `nprobe` partitions per query.
  *
  * All vector math is `zip_with` + `aggregate` over double-cast arrays —
  * sequential fold, so results are bit-identical to the oracle's
  * list_dot_product. A fused dot-product Catalyst Expression is the
  * optional upgrade if profiling ever shows the lambda overhead
  * (SURVEY §4); at 64 dims the codegen'd HOF is already cheap.
  */
object SimilarityOps extends QueryModule {

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Sequential-fold dot product — the fused codegen Expression
    * ([[graft.functions.DotProduct]]); identical summation order (and so
    * identical bits) to `aggregate(zip_with(a,b,*), 0.0, +)` but with no
    * per-row intermediate array. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_product(a, b)

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** V3a: brute-force cosine top-k against the query vector (vec_id=0),
    * broadcast to every partition; one scan, TakeOrderedAndProject.
    * Ordering is on the ROUNDED cosine (+ vec_id tie-break) so ulp noise
    * can never reorder the top-k. */
  def cosineTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val q = e.filter(col("vec_id") === 0)
      .select(col("v").as("q_v"), col("nrm").as("q_nrm"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("cos",
        round(dot(col("v"), col("q_v")) / (col("nrm") * col("q_nrm")), 6))
      .select(col("vec_id"), col("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF index: assign every vector to its nearest of `nlist` centroids.
    * Centroids are the first `nlist` vectors by id — deterministic seeding
    * (k-means iterations would refine but add nondeterminism for no
    * correctness gain here). Returns (vec_id, v, nrm, centroid_id). */
  def ivfAssign(spark: SparkSession, dir: String, nlist: Int): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val cents = e.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cent_id"), col("v").as("c_v"),
        col("nrm").as("c_nrm"))
    // nearest centroid per vector: broadcast the centroid table, then a
    // hash-aggregate max_by — partial/final combine instead of the sort
    // exchange a row_number window would need (tie-break: higher cosine,
    // then lower centroid id)
    val scored = e.crossJoin(broadcast(cents))
      .withColumn("c_cos",
        dot(col("v"), col("c_v")) / (col("nrm") * col("c_nrm")))
    scored.groupBy(col("vec_id"))
      .agg(first(col("v")).as("v"), first(col("nrm")).as("nrm"),
        max_by(col("cent_id"),
          struct(col("c_cos"), (-col("cent_id")).as("neg_id")))
          .as("cent_id"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cent_id"))
  }

  /** V3b: IVF-probed approximate top-k — search only the `nprobe`
    * centroids nearest to the query. At 100 TB the assignment is computed
    * once at ingest and stored partitioned by centroid_id, so a query
    * touches nprobe/nlist of the data. No SQL oracle (approximate);
    * recall vs brute force is pinned in SimilaritySpec. */
  def ivfTopK(spark: SparkSession, dir: String, k: Int = 10,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val assigned = ivfAssign(spark, dir, nlist).cache()
    val q = assigned.filter(col("vec_id") === 0)
      .select(col("v").as("q_v"), col("nrm").as("q_nrm"))
    val cents = assigned.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cent_id2"), col("v").as("c_v"),
        col("nrm").as("c_nrm"))
    val probed = cents.crossJoin(broadcast(q))
      .withColumn("c_cos",
        dot(col("c_v"), col("q_v")) / (col("c_nrm") * col("q_nrm")))
      .orderBy(col("c_cos").desc, col("cent_id2"))
      .limit(nprobe)
      .select(col("cent_id2").as("cent_id"))
    assigned.join(broadcast(probed), Seq("cent_id"))
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("cos",
        round(dot(col("v"), col("q_v")) / (col("nrm") * col("q_nrm")), 6))
      .select(col("vec_id"), col("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** V3c: approximate kNN JOIN — top-k neighbours for EVERY vector, not
    * just one query point. Vectors are grouped by IVF centroid and
    * compared within their cell only (plus nothing else — cell-local
    * recall; raise nlist resolution or probe neighbours for more).
    * Shuffle cost: one exchange on centroid_id, then an in-partition
    * pair product bounded by cell size — the linear-shuffle alternative
    * to the N² cross join at corpus scale. */
  def knnJoin(spark: SparkSession, dir: String, k: Int = 5,
      nlist: Int = 16): DataFrame = {
    // both join sides reuse one materialization of the assignment
    val assigned = ivfAssign(spark, dir, nlist).cache()
    val a = assigned.select(col("cent_id"), col("vec_id").as("i"),
      col("v").as("v_i"), col("nrm").as("n_i"))
    val b = assigned.select(col("cent_id"), col("vec_id").as("j"),
      col("v").as("v_j"), col("nrm").as("n_j"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("i")).orderBy(col("cos").desc, col("j"))
    a.join(b, Seq("cent_id"))
      .filter(col("i") =!= col("j"))
      .withColumn("cos",
        round(dot(col("v_i"), col("v_j")) / (col("n_i") * col("n_j")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("i"), col("j"), col("cos"), col("rk"))
      .orderBy(col("i"), col("rk"))
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("v3c_knn_join",
      "V3 approximate kNN join: per-vector top-5 within IVF cells " +
        "(linear-shuffle similarity join; recall pinned in DedupSpec)",
      (s, d) => knnJoin(s, d), None),
    GraftQuery("v3a_cosine_topk",
      "V3 brute-force cosine top-10 vs query vector (exact baseline)",
      (s, d) => cosineTopK(s, d),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
             |       CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings),
             | q AS (SELECT v AS q_v, nrm AS q_nrm FROM e WHERE vec_id=0)
             |SELECT e.vec_id,
             | round(list_dot_product(e.v, q.q_v)/(e.nrm*q.q_nrm),6) AS cos
             |FROM e, q WHERE e.vec_id <> 0
             |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),
    GraftQuery("v3b_ivf_topk",
      "V3 IVF-probed ANN top-10 (nlist=16, nprobe=4; scale path, " +
        "approximate — recall pinned in SimilaritySpec)",
      (s, d) => ivfTopK(s, d), None))
}
