package graft.plans

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** PARSER extension (SparkSessionExtensions.injectParser — the last
  * extension point of the U taxonomy after Expression / Generator /
  * UDAF / UDF / Strategy / Rule): a delegating `ParserInterface` that
  * adds ONE statement to the SQL surface and hands everything else to
  * Spark's own parser untouched — the standard shape of every
  * table-format SQL extension (Delta's `VACUUM`/`DESCRIBE HISTORY`,
  * Iceberg's `CALL` procedures):
  *
  * {{{
  *   GRAFT SNAPSHOT HISTORY '<table root>'
  * }}}
  *
  * returns the [[graft.sources.Snapshot.history]] frame — one row per
  * retained version (version, n_files, n_rows, is_current) — computed
  * from #versions × #files-sized MANIFEST METADATA, zero data I/O at
  * any table size. With `SnapshotSource` (reads) this closes the loop:
  * both the format's content AND its version history are reachable from
  * pure SQL. The statement is resolved EAGERLY at parse time (pointer +
  * manifests are metadata; the returned plan is the materialized local
  * relation), which is exactly how DESCRIBE-class commands behave.
  *
  * Everything that is not the graft statement — plans, expressions,
  * identifiers, types — delegates verbatim, so the extension can never
  * change the semantics of ordinary SQL (LibrarySpec pins a plain query
  * through the extended session).
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val History =
    """(?is)\s*GRAFT\s+SNAPSHOT\s+HISTORY\s+'([^']+)'\s*;?\s*""".r

  /** `GRAFT SNAPSHOT READ '<root>' [VERSION n]` — the committed (or
    * time-traveled) snapshot content as a statement, the pure-SQL twin
    * of `Snapshot.read`/`readVersion`. The VERSION and file list
    * resolve at parse time (snapshot isolation — the statement is
    * pinned to one manifest); the data scan itself stays lazy.
    */
  private val ReadV =
    """(?is)\s*GRAFT\s+SNAPSHOT\s+READ\s+'([^']+)'(?:\s+VERSION\s+(\d+))?\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case History(path) =>
      GraftBridge.planOf(graft.sources.Snapshot.history(session, path))
    case ReadV(path, v) =>
      GraftBridge.planOf(
        if (v == null) graft.sources.Snapshot.read(session, path)
        else graft.sources.Snapshot.readVersion(session, path, v.toInt))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)

  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
