package graft.dedup

import org.apache.spark.sql.SparkSession

/** Diagnostic seam: expose the st19 ledger broadcast to graft.DiagInRow. */
object DiagSeam {
  def ledgerBroadcast(spark: SparkSession, dir: String):
      org.apache.spark.broadcast.Broadcast[Array[(String, Long)]] =
    DedupOps.scrubLedgerBroadcast(spark, dir)
}
