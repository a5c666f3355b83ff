package graft

/** Prints the operator registry: every query id, whether it is
  * oracle-checked or rows-only, and its one-line doc with reference
  * citation. Run: sbt "runMain graft.Ops"
  */
object Ops {
  def main(args: Array[String]): Unit = {
    val all = SparkEntry.all.sortBy(_.id)
    all.foreach { q =>
      val mode = if (q.oracle.isDefined) "oracle" else "rows  "
      println(f"${q.id}%-32s $mode  ${q.doc}")
    }
    println(s"\n${all.count(_.oracle.isDefined)} oracle-checked + " +
      s"${all.count(_.oracle.isEmpty)} rows-only = ${all.length} queries")
  }
}
