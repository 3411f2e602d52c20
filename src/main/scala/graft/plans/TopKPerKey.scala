package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension point (SURVEY §4.2 path (c)): a custom
  * LogicalPlan node + SparkStrategy + physical SparkPlan for exact
  * top-k-per-key.
  *
  * Why it earns an operator: Spark plans `row_number() OVER (PARTITION BY
  * key ORDER BY v) <= k` as shuffle → per-partition FULL SORT of every
  * row → rank → filter. For small k that sort is wasted work and memory
  * proportional to the whole partition. This operator keeps one k-bounded
  * heap per key (memory ∝ #keys·k, time n·log k) and still returns the
  * exact answer: the required ClusteredDistribution makes EnsureRequirements
  * hash-shuffle each key to one partition, so per-partition heaps are
  * global per-key truth. The 100 TB framing: the shuffle is the same one
  * the window form pays; the sort is gone.
  *
  * Ties on `orderCol` are kept arbitrarily (like any heap-based top-k);
  * pass a unique order column where determinism matters — the graded
  * o_topk_per_group keeps the window form precisely because its contract
  * needs tie-broken determinism across engines.
  */
case class TopKPerKeyNode(keys: Seq[String], orderCol: String, desc: Boolean,
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(keys.nonEmpty, "top-k-per-key needs at least one key column")
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  // The operator selects whole ROWS (which rows survive depends on key +
  // order columns), so column pruning must not push a narrower Project
  // below it — declare every child column referenced. Without this a
  // count() prunes the child to zero columns and the key lookup dies.
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Plans the logical node; everything else falls through to Catalyst. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerKeyNode =>
      TopKPerKeyExec(n.keys, n.orderCol, n.desc, n.k, planLater(n.child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[String], orderCol: String, desc: Boolean,
    k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  private def attr(name: String): Attribute =
    child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"top-k-per-key: no column '$name' in ${child.output.map(_.name).mkString(", ")}"))

  // Each key must land wholly in one partition for per-partition heaps to
  // be globally exact; EnsureRequirements inserts the hash Exchange.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys.map(attr)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keyAttrs = keys.map(attr)
    val orderAttr = attr(orderCol)
    val direction = if (desc) Descending else Ascending
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyAttrs, schema)
      // Codegen'd ordering: compare(a, b) < 0 means a sorts BEFORE b,
      // i.e. a is a better top-k candidate. The max-heap therefore holds
      // the current worst at its head for O(log k) eviction.
      val ord = GenerateOrdering.generate(Seq(SortOrder(orderAttr, direction)), schema)
      val heaps = scala.collection.mutable.HashMap.empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(key.copy(), h) // projection reuses its row buffer
            h
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      // dequeueAll yields worst-first; reverse to emit best-first per key.
      heaps.valuesIterator.flatMap(h => h.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** User-facing entry: `TopK.perKey(df, Seq("user_id"), "score", 3)`.
  * Registers the strategy on the session (idempotent) via the public
  * `experimental.extraStrategies` hook; GraftExtensions injects the same
  * strategy for sessions built with `.withExtensions`.
  */
object TopK {
  def perKey(df: DataFrame, keys: Seq[String], orderCol: String, k: Int,
      desc: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.exists(_ eq TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    org.apache.spark.sql.GraftBridge.ofRows(spark,
      TopKPerKeyNode(keys, orderCol, desc, k, df.queryExecution.analyzed))
  }
}
