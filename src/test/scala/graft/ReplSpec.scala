package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.server.Repl

class ReplSpec extends AnyFunSuite {
  test("table renderer aligns columns and handles nulls") {
    val out = Repl.renderTable(Seq("id", "name"),
      Seq(Seq(1L, "ann"), Seq(22L, null)))
    val lines = out.linesIterator.toSeq
    assert(lines.head == "+----+------+")
    assert(lines(1) == "| id | name |")
    assert(lines.contains("| 22 | NULL |"))
    assert(lines.count(_.startsWith("+")) == 3)
  }
}
