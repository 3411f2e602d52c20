package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, StringType}

/** The LAZY command node behind every `GRAFT SNAPSHOT` mutation
  * statement (and the catalog's CTAS): parsing builds THIS — staging and
  * commit happen at EXECUTION time, exactly when Spark runs any other
  * DDL/DML command (`spark.sql(...)` executes commands when the Dataset
  * is created; a caller that only parses — dry-run tooling invoking
  * `sessionState.sqlParser.parsePlan`, EXPLAIN, a double-parse path —
  * commits NOTHING). An earlier draft executed the write inside
  * `parsePlan` itself, which made "parse" a side-effecting verb; the
  * RunnableCommand shape restores the standard contract.
  *
  * `body` runs on the driver and returns the committed version (or the
  * verb's receipt number — vacuum reports its deleted-file count);
  * the command's one output row is the `(op, root, version)` receipt
  * the eager implementation returned.
  */
case class GraftSnapshotCommand(op: String, root: String)(
    body: SparkSession => Int) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("op", StringType, nullable = false)(),
    AttributeReference("root", StringType, nullable = false)(),
    AttributeReference("version", IntegerType, nullable = false)())

  // the closure is constructor state outside the case-class product —
  // copies (makeCopy/canonicalization) must carry it along
  override protected def otherCopyArgs: Seq[AnyRef] = body :: Nil

  override def run(sparkSession: SparkSession): Seq[Row] =
    Seq(Row(op, root, body(sparkSession)))

  override def simpleString(maxFields: Int): String =
    s"GraftSnapshotCommand $op '$root'"
}
