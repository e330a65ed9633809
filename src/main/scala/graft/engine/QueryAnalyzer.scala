package graft.engine

import scala.util.Try
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical._

/** Statement analysis, the analog of the reference's JDBC
  * SQLParserMiddleware (/root/reference/server/query/jdbc/
  * sql_parser_middleware.go:18-31,142-175,323-375): statement type,
  * referenced tables, join/subquery/aggregation flags, a
  * SIMPLE/MODERATE/COMPLEX complexity grade, and advisory (never
  * applied) optimization hints.
  *
  * Where the reference re-parses with its hand-written parser, this
  * walks Catalyst's *unresolved* logical plan — same grammar the engine
  * executes, zero drift. */
object QueryAnalyzer {

  final case class Analysis(
      statementType: String,
      tables: Seq[String],
      hasJoins: Boolean,
      hasSubqueries: Boolean,
      hasAggregations: Boolean,
      complexity: String,
      hints: Seq[String])

  /** Reference-style statement type, including the two-word DDL heads
    * the CommandComplete tag generator distinguishes
    * (sql_parser_middleware.go:377-418). */
  def statementType(sql: String): String = {
    val words = sql.trim.toUpperCase.split("\\s+")
    words.headOption.getOrElse("") match {
      case h @ ("CREATE" | "DROP" | "ALTER") if words.length > 1 =>
        val second = words(1) match {
          case "NAMESPACE" | "SCHEMA" => "DATABASE"
          case w => w
        }
        s"$h $second"
      case h => h
    }
  }

  def analyze(spark: SparkSession, sql: String): Analysis = {
    val head = sql.trim.split("\\s+", 2).headOption
      .getOrElse("").toUpperCase
    val plan = Try(spark.sessionState.sqlParser.parsePlan(sql)).toOption
    val tables = plan.map(collectTables).getOrElse(Seq.empty).distinct
    val joins = plan.exists(_.collect { case j: Join => j }.nonEmpty) ||
      tables.length > 1 // reference semantics: HasJoins = multi-table
    val subqueries = plan.exists(p =>
      p.collect { case s: SubqueryAlias => s }.nonEmpty ||
      p.exists(_.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))))
    val aggs = plan.exists(_.collect { case a: Aggregate => a }.nonEmpty)
    val score = Seq(joins, subqueries, aggs).count(identity) +
      (if (tables.length > 2) 1 else 0)
    val complexity = score match {
      case 0     => "SIMPLE"
      case 1     => "MODERATE"
      case _     => "COMPLEX"
    }
    Analysis(head, tables, joins, subqueries, aggs, complexity,
      hints(sql, tables, joins))
  }

  private def collectTables(plan: LogicalPlan): Seq[String] = {
    val direct = plan.collect {
      case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
    }
    // subquery plans hang off expressions, not the operator tree
    val nested = plan.collect { case p => p }
      .flatMap(_.expressions)
      .flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          collectTables(s.plan)
      })
      .flatten
    direct ++ nested
  }

  /** Advisory strings matching the reference's tone
    * (sql_parser_middleware.go:350-375) — returned, never applied. */
  private def hints(sql: String, tables: Seq[String], joins: Boolean): Seq[String] = {
    val upper = sql.toUpperCase
    Seq(
      if (upper.contains("SELECT *")) Some(
        "avoid SELECT * — project only needed columns so the scan can prune")
      else None,
      if (!upper.contains(" LIMIT ") && upper.startsWith("SELECT")) Some(
        "consider adding LIMIT for exploratory queries")
      else None,
      if (joins && !upper.contains(" WHERE ")) Some(
        "multi-table query without WHERE — verify the join predicate")
      else None
    ).flatten
  }
}
