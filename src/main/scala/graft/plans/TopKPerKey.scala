package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BaseOrdering, Expression, RowOrdering, SortOrder, UnsafeProjection,
  UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy,
  UnaryExecNode}

/** Native per-key top-k: keep each key's `k` first rows under a total
  * `order`, as a whole-operator physical plan — the SURVEY §4 tier (c)
  * path (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, installed
  * via `SparkSessionExtensions`) for semantics the built-in operators
  * only approximate.
  *
  * What Spark does today for `row_number() OVER (PARTITION BY key ORDER
  * BY ord) <= k`: since 3.5 the optimizer inserts a `WindowGroupLimit`
  * (partial + final), which is already group-limit pushdown — but BOTH
  * its modes declare `requiredChildOrdering = key ++ ord`, so every map
  * partition is FULLY SORTED (O(n log n) over all n input rows, spilling
  * sorter runs at scale) before the limit looks at a row, and the rank
  * column is still materialized and filtered above.
  *
  * This operator replaces the sort with per-key bounded heaps:
  *   - partial mode, before the exchange: one UNSORTED O(n log k) pass
  *     per input partition keeps each key's k best rows (a superset of
  *     the answer under any partitioning — TextOps.capBySource's prune
  *     argument, executed natively without the spark_partition_id
  *     window trick);
  *   - the single hash exchange then carries ≤ k·keys·partitions rows,
  *     not the input;
  *   - final mode, after the exchange (`ClusteredDistribution(keys)` —
  *     EnsureRequirements plans the shuffle), merges the survivors with
  *     the same heaps.
  * Peak state per task is k rows × keys-resident-in-partition — the
  * same hash-map footprint as a partial aggregation, with rows bounded
  * by construction. No rank column exists anywhere in the plan; output
  * order within a key is unspecified (sort the k survivors downstream
  * if ranks are wanted — they are k·keys rows, noise).
  *
  * Reference analog: nabatshy's top-k endpoints (`api/service.go`
  * GetTopTraces et al.) are `ORDER BY ... LIMIT k` delegated to
  * ClickHouse; the per-key generalization (cap EVERY source, not the
  * global top) has no reference analog and no exact Spark-native
  * operator — hence this node.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKey = copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial-then-final [[TopKPerKeyExec]]; the
  * exchange between them is NOT constructed here — the final node
  * declares `ClusteredDistribution(keys)` and EnsureRequirements plans
  * it, so AQE sizes/coalesces the shuffle like any aggregate's. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** One heap pass of [[TopKPerKey]] — `partial` runs on arbitrary input
  * partitions, final (`partial = false`) on key-clustered ones. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  protected override def doExecute(): RDD[InternalRow] = {
    // locals: the task closure must not capture the SparkPlan itself
    val kk = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord: BaseOrdering = RowOrdering.create(sortOrder, childOutput)
      // per-key bounded heap, worst kept row at the head, so admission
      // is one compare against peek and eviction is O(log k)
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow,
          java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row) // reused buffer — copy only on first sight
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)
}

object TopKPerKey {
  /** Column-API door: `topK(df, keys, orderCols, k)` resolves the named
    * columns against `df`'s analyzed plan and wraps it in the custom
    * node (ascending order; pass columns forming a TOTAL order for a
    * deterministic result, as with any top-k). Construction goes
    * through [[org.apache.spark.sql.GraftPlanBridge]] — `Dataset.ofRows`
    * is the constructor every built-in DataFrame method funnels
    * through, just package-private. */
  def topK(df: DataFrame, keyNames: Seq[String], orderNames: Seq[String],
      k: Int): DataFrame = {
    // validated at the door: empty keys would otherwise die deep in
    // physical planning (ClusteredDistribution(Nil)'s require) far
    // from the caller (round-10 review); a global top-k is an
    // orderBy().limit(k) — TakeOrderedAndProject already serves it
    require(keyNames.nonEmpty,
      "topK needs at least one key column; for a GLOBAL top-k use " +
        "orderBy(...).limit(k)")
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val analyzed = ds.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(a => ds.sparkSession.sessionState.conf.resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(",")}"))
    org.apache.spark.sql.GraftPlanBridge.ofRows(ds.sparkSession,
      TopKPerKey(keyNames.map(attr),
        orderNames.map(n => SortOrder(attr(n), Ascending)), k, analyzed))
  }
}
