package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine.MergeInto

/** Property tests for the MERGE dialect parser: generated statements
  * with every clause combination parse to the structure they were
  * rendered from, and the splitters respect strings/parens. */
class MergeParseSpec extends AnyFunSuite {

  private val ident = Gen.oneOf("t1", "db.tbl", "x_9")
  private val cond = Gen.oneOf(
    "t.id = s.id", "t.id = s.id AND t.k = s.k",
    "t.id = s.id AND s.v > 'a WHEN b'", // keyword inside a string
    "t.id = s.id AND (s.v > 1 OR s.v < (0))")
  private val matchedClause = Gen.oneOf(
    "WHEN MATCHED THEN UPDATE SET a = s.a, b = s.b + (1)",
    "WHEN MATCHED AND s.v > 2 THEN UPDATE SET a = s.a",
    "WHEN MATCHED AND t.a = 'WHEN' THEN DELETE",
    "WHEN MATCHED THEN DELETE")
  private val notMatchedClause = Gen.oneOf(
    "WHEN NOT MATCHED THEN INSERT VALUES (s.id, s.a, s.b)",
    "WHEN NOT MATCHED AND s.v >= 0 THEN INSERT (id, a) VALUES (s.id, concat(s.a, ')'))")
  private val source = Gen.oneOf(
    Left("src"), Left("db.src"),
    Right("(SELECT id, v FROM src WHERE v IN ('ON', 'WHEN'))"),
    Right("(VALUES (1, 'x'), (2, 'y'))"))

  test("every generated clause combination parses to its structure") {
    val stmt = for {
      t <- ident
      src <- source
      c <- cond
      ms <- Gen.listOfN(2, matchedClause).map(_.distinct)
      nms <- Gen.listOf(notMatchedClause).map(_.distinct.take(2))
      if ms.nonEmpty || nms.nonEmpty
    } yield {
      val srcSql = src match {
        case Left(tbl) => s"$tbl s"
        case Right(q) => s"$q AS s"
      }
      val sql = s"MERGE INTO $t AS t USING $srcSql ON $c " +
        (ms ++ nms).mkString(" ")
      (sql, t, src.isRight, c, ms, nms)
    }
    val cases = (1 to 300).flatMap(i =>
      stmt.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(cases.length > 200)
    cases.foreach { case (sql, t, isQuery, c, ms, nms) =>
      val p = MergeInto.parse(sql).get
      assert(p.table == t)
      assert(p.tAlias == "t")
      assert(p.sAlias == "s")
      assert(p.sourceIsQuery == isQuery)
      assert(p.onCond == c)
      assert(p.matched.length == ms.length)
      assert(p.notMatched.length == nms.length)
      // DELETE vs UPDATE classification preserved in order
      p.matched.zip(ms).foreach { case (m, rendered) =>
        assert(m.sets.isEmpty == rendered.contains("DELETE"))
        assert(m.cond.isDefined == rendered.contains(" AND "))
      }
      p.notMatched.zip(nms).foreach { case (nm, rendered) =>
        assert(nm.cols.nonEmpty == rendered.contains("INSERT (id, a)"))
      }
    }
  }

  test("non-MERGE statements return None; malformed MERGE throws") {
    assert(MergeInto.parse("SELECT 1").isEmpty)
    assert(MergeInto.parse("MERGEX INTO t USING s ON 1=1").isEmpty)
    intercept[IllegalArgumentException] {
      MergeInto.parse("MERGE INTO t USING s ON t.id = s.id") // no WHEN
    }
    intercept[IllegalArgumentException] {
      MergeInto.parse(
        "MERGE INTO t USING (SELECT 1) ON 1=1 WHEN MATCHED THEN DELETE")
    } // subquery source needs an alias
    intercept[IllegalArgumentException] {
      MergeInto.parse(
        "MERGE INTO t USING s ON t.id = s.id WHEN MATCHED THEN FROB")
    }
  }

  test("string literals hide keywords from the clause splitter") {
    val p = MergeInto.parse(
      """MERGE INTO t USING src s ON t.k = 'ON WHEN MATCHED'
        |WHEN MATCHED AND s.v = ' WHEN ' THEN UPDATE SET a = ' THEN '
        |WHEN NOT MATCHED THEN INSERT VALUES ('WHEN', s.b)""".stripMargin).get
    assert(p.onCond == "t.k = 'ON WHEN MATCHED'")
    assert(p.matched.length == 1)
    assert(p.matched.head.cond.contains("s.v = ' WHEN '"))
    assert(p.matched.head.sets.contains(Seq("a" -> "' THEN '")))
    assert(p.notMatched.length == 1)
    assert(p.notMatched.head.vals == Seq("'WHEN'", "s.b"))
  }
}
