package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.QueryEngine

class LifecycleSpec extends AnyFunSuite {
  lazy val engine = new QueryEngine(TestSpark.spark)

  test("cancel() interrupts a running query and records Cancelled") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    // a query that would run for a long time: wide crossJoin count
    val slow = Future {
      try engine.execute(
        """SELECT count(*) AS c FROM
          |  (SELECT explode(sequence(1, 100000)) AS a) x,
          |  (SELECT explode(sequence(1, 100000)) AS b) y""".stripMargin)
      catch { case e: Throwable => null }
    }
    // wait for it to register + start
    var info: Option[engine.executions.QueryInfo] = None
    val deadline = System.nanoTime() + 10_000_000_000L
    while (info.isEmpty && System.nanoTime() < deadline) {
      info = engine.executions.list().reverse
        .find(q => q.sql.contains("explode(sequence") &&
                   q.status == engine.executions.Running)
      Thread.sleep(50)
    }
    assert(info.nonEmpty, "slow query never reached Running")
    assert(engine.executions.cancel(info.get.id))
    Await.result(slow, 60.seconds)
    assert(engine.executions.get(info.get.id).get.status ==
      engine.executions.Cancelled)
  }

  test("HTTP API serves concurrent queries correctly") {
    import java.net.URI
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val api = new graft.server.HttpApi(engine).start()
    try {
      val client = HttpClient.newHttpClient()
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      val fs = (1 to 8).map { i =>
        Future {
          val req = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${api.boundPort}/query"))
            .POST(HttpRequest.BodyPublishers.ofString(
              s"""{"query": "SELECT $i * 10 AS v"}""")).build()
          client.send(req, HttpResponse.BodyHandlers.ofString()).body()
        }
      }
      val bodies = Await.result(Future.sequence(fs), 120.seconds)
      bodies.zipWithIndex.foreach { case (b, i) =>
        assert(b.contains(s""""data":[[${(i + 1) * 10}]]"""), b)
      }
    } finally api.stop()
  }
}
