package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lossless cross-process changefeed publish (round-16 verdict item 1):
  * TWO writer JVMs share one warehouse and hammer `Changefeed.emit`
  * concurrently, seeding their id sequences from the same (empty) log
  * so every id is contested. Round 15 made a collision non-corrupting
  * (raw-FS single rename); this spec pins the round-16 contract that a
  * collision cannot LOSE an event either: the atomic exclusive-create
  * id claim (`.claim-<id>`, O_EXCL) means an acked publish is never
  * renamed over by the other writer.
  *
  * Asserted, from the parent process walking the log directly:
  *  - the union of both writers' acked (tag, seq, id) triples is
  *    EXACTLY the surviving log — no acked event missing, none
  *    replaced (each file's payload matches the acker's tag+seq);
  *  - ids are contiguous 1..N (the monotonic-id gap check — no id is
  *    burned by a lost race in normal operation);
  *  - no claim markers survive (every claim is released). */
class ChangefeedLossSpec extends AnyFunSuite {

  private val PerWriter = 250

  private def launch(warehouse: String, tag: String): (Process, StringBuilder) = {
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq("java", "-Xmx2g") ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.CdcHammer", warehouse, PerWriter.toString, tag)).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(java.nio.file.Files.createTempDirectory(s"cdc_$tag").toFile)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new StringBuilder
    val pump = new Thread(() => {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var line = br.readLine()
      while (line != null) {
        out.synchronized { out ++= line += '\n' }
        line = br.readLine()
      }
    })
    pump.setDaemon(true); pump.start()
    (proc, out)
  }

  test("two colliding writer JVMs never lose or replace an acked event") {
    val wh = java.nio.file.Files.createTempDirectory("cdc_loss_wh")
    val (pa, oa) = launch(wh.toString, "A")
    val (pb, ob) = launch(wh.toString, "B")
    assert(pa.waitFor(300, java.util.concurrent.TimeUnit.SECONDS), "writer A timed out")
    assert(pb.waitFor(300, java.util.concurrent.TimeUnit.SECONDS), "writer B timed out")
    val (ta, tb) = (oa.synchronized(oa.toString), ob.synchronized(ob.toString))
    assert(pa.exitValue() == 0, s"writer A failed:\n${ta.takeRight(2000)}")
    assert(pb.exitValue() == 0, s"writer B failed:\n${tb.takeRight(2000)}")
    assert(ta.contains(s"CDC_HAMMER_DONE A $PerWriter"), ta.takeRight(300))
    assert(tb.contains(s"CDC_HAMMER_DONE B $PerWriter"), tb.takeRight(300))

    val AckRe = """ACK (\w) (\d+) (\d+)""".r
    val acks = (ta + tb).linesIterator.collect {
      case AckRe(tag, seq, id) => (tag, seq.toLong, id.toLong)
    }.toSeq
    assert(acks.length == 2 * PerWriter, s"expected ${2 * PerWriter} acks, got ${acks.length}")
    assert(acks.map(_._3).distinct.length == acks.length,
      "two acks shared one event id — exclusive claim violated")

    // walk the log directly (no Spark session needed to verify)
    val cdcDir = wh.resolve(".graft-cdc")
    val EvtRe = """evt-(\d+)\.json""".r
    val WriterRe = """"writer":"(\w)"""".r
    val SeqRe = """"seq":"(\d+)"""".r
    val files = java.nio.file.Files.list(cdcDir).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
    val events = files.flatMap { p =>
      p.getFileName.toString match {
        case EvtRe(id) =>
          val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          val w = WriterRe.findFirstMatchIn(txt).map(_.group(1))
          val s = SeqRe.findFirstMatchIn(txt).map(_.group(1).toLong)
          assert(w.isDefined && s.isDefined, s"torn/unparseable event $p: $txt")
          Some(id.toLong -> (w.get, s.get))
        case _ => None
      }
    }.toMap
    assert(events.size == 2 * PerWriter,
      s"log holds ${events.size} events for ${2 * PerWriter} acks — events lost")

    // every ack resolves to its OWN payload in the log (not replaced)
    acks.foreach { case (tag, seq, id) =>
      assert(events.get(id).contains((tag, seq)),
        s"acked event $id ($tag#$seq) is ${events.get(id).fold("MISSING")(e => s"REPLACED by $e")}")
    }
    // gap check: ids are contiguous — no id burned in normal operation
    val ids = events.keys.toSeq.sorted
    assert(ids == (1L to 2L * PerWriter), s"id gaps: ${ids.take(20)}...")
    // every claim marker was released
    val claims = files.filter(_.getFileName.toString.startsWith(".claim-"))
    assert(claims.isEmpty, s"leaked claim markers: $claims")
  }
}
