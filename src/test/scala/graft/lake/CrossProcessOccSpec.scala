package graft.lake

import java.io.{BufferedReader, InputStreamReader}
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/**
 * The claim protocol BETWEEN PROCESSES — the honesty check for the
 * "namenode-atomic create / conditional PUT" claim [[Versioned]]'s
 * scaladoc makes: OccSpec's same-JVM threads share the in-process claim
 * lock, so only separate JVMs exercise the filesystem-level primitive
 * (and its local-FS move-into-rename backstop). Two legs:
 *
 *  - two forked JVMs blind-publish concurrently onto one shared table
 *    dir: every publish lands, versions come out CONTIGUOUS with no
 *    number double-assigned (each worker's claim-retry loop rebases past
 *    the other's commits);
 *  - a derived publish (publishFrom a version read before ANOTHER
 *    process advanced the table) throws a loud
 *    [[Versioned.ConcurrentWriteException]] — never lands silently.
 */
class CrossProcessOccSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-xocc").toString

  // spawn a worker JVM inheriting this (forked, Spark-configured) test
  // JVM's classpath and module opens; small heap — the workers publish
  // kilobytes
  private def worker(args: String*): Process = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val inherited = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms"))
    val cmd = Seq(javaBin) ++ inherited ++ Seq("-Xmx1g", "-cp",
      System.getProperty("java.class.path"), "graft.tools.OccWorker") ++
      args
    new ProcessBuilder(cmd.asJava).redirectErrorStream(true).start()
  }

  private def drain(p: Process, timeoutSec: Long = 180L): Seq[String] = {
    val r = new BufferedReader(new InputStreamReader(p.getInputStream))
    val lines = Seq.newBuilder[String]
    var line = r.readLine()
    while (line != null) { lines += line; line = r.readLine() }
    assert(p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS),
      "worker did not exit")
    assert(p.exitValue() == 0, s"worker failed:\n${lines.result().mkString("\n")}")
    lines.result()
  }

  test("two processes blind-publishing one table: contiguous versions, " +
      "no double assignment") {
    val t = s"$root/shared"
    val w1 = worker("blind", t, "a", "4")
    val w2 = worker("blind", t, "b", "4")
    val out1 = drain(w1)
    val out2 = drain(w2)
    val pubs = (out1 ++ out2).filter(_.startsWith("OCC-PUB "))
      .map { l => val p = l.split(" "); (p(1), p(2).toLong) }
    assert(pubs.size == 8, s"expected 8 publishes, got $pubs")
    // every version number assigned exactly once, and the on-disk
    // history is the contiguous union of both workers' claims
    assert(pubs.map(_._2).sorted == (1L to 8L),
      s"versions double-assigned or skipped: $pubs")
    assert(Versioned.versions(spark, t) == (1L to 8L))
    assert(Versioned.currentVersion(spark, t).contains(8L))
    // the live manifest resolves to a readable snapshot
    assert(Versioned.read(spark, t).count() == 1L)
  }

  test("a derived publish from a version another PROCESS moved past " +
      "throws ConcurrentWriteException — never lands silently") {
    val t = s"$root/derived"
    Versioned.publish(Seq(("seed", 1L)).toDF("tag", "x"), t) // v1 (us)
    val go = s"$root/go-signal"
    val w = worker("derived", t, go)
    val r = new BufferedReader(new InputStreamReader(w.getInputStream))
    // wait for the worker to capture its base version...
    val lines = Seq.newBuilder[String]
    var held: Option[Long] = None
    var line = r.readLine()
    while (line != null && held.isEmpty) {
      lines += line
      if (line.startsWith("OCC-HOLD ")) held = Some(line.split(" ")(1).toLong)
      else line = r.readLine()
    }
    assert(held.contains(1L), s"worker never held: ${lines.result()}")
    // ...advance the table FROM THIS PROCESS, then signal
    Versioned.publish(Seq(("winner", 2L)).toDF("tag", "x"), t) // v2 (us)
    Files.write(java.nio.file.Paths.get(go), Array[Byte]())
    line = r.readLine()
    while (line != null) { lines += line; line = r.readLine() }
    assert(w.waitFor(180, java.util.concurrent.TimeUnit.SECONDS))
    val out = lines.result()
    assert(w.exitValue() == 0, s"worker failed:\n${out.mkString("\n")}")
    assert(out.contains("OCC-CONFLICT"),
      s"stale derived publish did not conflict loudly: $out")
    assert(!out.contains("OCC-PUBLISHED-STALE"))
    // the loser left no version behind; the winner's snapshot is live
    assert(Versioned.versions(spark, t) == Seq(1L, 2L))
    assert(Versioned.read(spark, t).select("tag").head().getString(0)
      == "winner")
  }
}
