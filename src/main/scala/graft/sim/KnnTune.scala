package graft.sim

import graft._
import org.apache.spark.sql.functions._

/** One-off tuning harness for the v3c kNN join (r7): sweeps Lloyd
  * iterations x nprobe and prints (recall@5 vs the sampled exact
  * baseline, wall seconds) per point. Not registered; run with
  *   sbt "runMain graft.sim.KnnTune [sfDir]"
  */
object KnnTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "knn-tune")
    spark.sparkContext.setLogLevel("WARN")
    val exact = SimilarityOps.exactKnn(spark, dir, 5).cache()
    val nExact = exact.count()
    println(s"exact sampled pairs: $nExact")
    for (iters <- Seq(1, 3); nprobe <- Seq(4, 8, 12)) {
      // resolve the per-(nlist,iters) IVF build OUTSIDE the timed
      // window: ivfBuild memoizes per process, so without this the
      // first nprobe point of each iters setting absorbs the whole
      // Lloyd build + parquet writes and the sweep's wall times stop
      // being comparable across points (review finding, r7)
      SimilarityOps.ivfBuild(spark, dir, nlist = 16, iters = iters)
      val t0 = System.nanoTime()
      val pairs = SimilarityOps
        .knnJoin(spark, dir, k = 5, nlist = 16, nprobe = nprobe,
          iters = iters)
        .select(col("i"), col("j")).cache()
      pairs.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val hit = exact.join(pairs, Seq("i", "j"), "left_semi").count()
      println(f"iters=$iters nprobe=$nprobe recall@5=${hit.toDouble / nExact}%.4f " +
        f"join_secs=$dt%.2f")
      pairs.unpersist()
    }
    spark.stop()
  }
}
