package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import graft.engine.QueryEngine

/** Concurrency soak: several isolated-session engines (the protocol
  * tiers' shape) run mixed DDL/DML/query workloads at once — private
  * tables per worker plus shared reads — and everything must succeed.
  * Catches cross-session races (conf toggles, current-database leaks,
  * catalog contention) that single-threaded specs cannot. */
class ConcurrencySoakSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("mixed workloads across isolated sessions all succeed") {
    val root = new QueryEngine(spark)
    root.execute("CREATE DATABASE IF NOT EXISTS soak")
    root.execute("DROP TABLE IF EXISTS soak.shared")
    root.execute("CREATE TABLE soak.shared (id int64, v int32) STORAGE filesystem")
    root.execute("INSERT INTO soak.shared VALUES (1, 1), (2, 2), (3, 3)")

    val workers = (1 to 6).map { w =>
      Future {
        val e = root.newConnectionEngine()
        val t = s"soak.w$w"
        e.execute(s"DROP TABLE IF EXISTS $t")
        e.execute(s"CREATE TABLE $t (id int64, n int32) STORAGE filesystem")
        (1 to 5).foreach { i =>
          e.execute(s"INSERT INTO $t VALUES ($i, ${i * 10})")
          // shared reads interleave with private DML
          val shared = e.execute("SELECT count(*) AS c FROM soak.shared")
          assert(shared.data.head.head.asInstanceOf[Long] >= 3L)
          if (i % 2 == 0)
            e.execute(s"UPDATE $t SET n = n + 1 WHERE id = $i")
          // system views under concurrency
          val sys = e.execute(
            s"SELECT count(*) AS c FROM system_tables WHERE database_name = 'soak'")
          assert(sys.data.head.head.asInstanceOf[Long] >= 1L)
        }
        val n = e.execute(s"SELECT count(*) AS c, sum(id) AS s FROM $t")
        assert(n.data.head == Seq(5L, 15L))
        e.execute(s"DROP TABLE $t")
        w
      }
    }
    val done = Await.result(Future.sequence(workers), 300.seconds)
    assert(done.sorted == (1 to 6))
    // shared table untouched by the soak
    assert(root.execute("SELECT count(*) AS c FROM soak.shared")
      .data.head.head == 3L)
    root.execute("DROP TABLE soak.shared")
  }
}
