package graft.engine

import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, StructType}

/** ParserInterface wrapper (SURVEY §7.2's "nice-to-have"): lets
  * `spark.sql(...)` itself accept the ranger CREATE TABLE dialect —
  * statements that look like the dialect (Iceberg types, STORAGE /
  * SETTINGS clauses) are translated by [[RangerDdl]] and handed to the
  * delegate as Spark DDL; everything else passes through untouched.
  * Registered via graft.GraftExtensions (injectParser). The facade's
  * own pre-rewrite stays — this covers direct spark.sql users. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  /** A CREATE TABLE is "ours" when it carries a dialect marker the
    * Spark parser would reject: a STORAGE/SETTINGS clause or an
    * Iceberg-only type keyword. */
  private val dialectMarker =
    """(?is)\)\s*(STORAGE\s+\w+|SETTINGS\s+\w+\s*=)|\b(int32|int64|float32|float64|timestamptz)\b""".r

  override def parsePlan(sqlText: String): LogicalPlan = {
    val upper = sqlText.trim.toUpperCase
    val isCreate = upper.startsWith("CREATE TABLE")
    // already-translated Spark DDL (e.g. what the facade emits) must
    // pass straight through — its TBLPROPERTIES carry the Iceberg type
    // names and would re-trigger the marker
    val isSparkDdl = upper.contains(" USING ") || upper.contains("TBLPROPERTIES")
    if (isCreate && !isSparkDdl && dialectMarker.findFirstIn(sqlText).isDefined) {
      val ct = RangerDdl.parse(sqlText)
      delegate.parsePlan(ct.toSparkSql(None))
    } else delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
