package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Conf
import graft.lake.Versioned

/**
 * Cross-PROCESS OCC probe — the forked-JVM half of
 * `graft.lake.CrossProcessOccSpec`. Same-JVM concurrency specs (OccSpec)
 * share the in-process claim lock, so they cannot witness the part of
 * the claim protocol that must hold BETWEEN processes (the
 * namenode-atomic create / conditional-PUT primitive, backstopped on the
 * local FS by the move-into-rename described in [[Versioned]]'s
 * scaladoc). This main is spawned as separate JVMs against one shared
 * table dir:
 *
 *   blind <table> <workerId> <n>  — publish n blind versions (each a
 *                                   normal claim-commit with the
 *                                   built-in retry), printing
 *                                   `OCC-PUB <id> <v>` per publish;
 *   derived <table> <goFile>      — read the live version, print
 *                                   `OCC-HOLD <v>`, wait for the
 *                                   coordinator to create goFile (it
 *                                   publishes from ANOTHER process in
 *                                   between), then attempt
 *                                   publishFrom(live): the stale
 *                                   derived publish must throw
 *                                   [[Versioned.ConcurrentWriteException]]
 *                                   (printed as `OCC-CONFLICT`), never
 *                                   land (`OCC-PUBLISHED-STALE`).
 */
object OccWorker {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val table = args(1)
    val spark = Conf.local(SparkSession.builder(), 2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    mode match {
      case "blind" =>
        val id = args(2)
        val n = args(3).toInt
        (0 until n).foreach { i =>
          val v = Versioned.publish(
            Seq((s"$id-$i", i.toLong)).toDF("tag", "x"), table)
          println(s"OCC-PUB $id $v")
          Console.out.flush()
        }
      case "derived" =>
        val go = new java.io.File(args(2))
        val live = Versioned.currentVersion(spark, table).getOrElse(
          sys.error(s"no published version at $table"))
        println(s"OCC-HOLD $live")
        Console.out.flush()
        val deadline = System.currentTimeMillis() + 120000L
        while (!go.exists() && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        require(go.exists(), "coordinator never signalled go")
        try {
          Versioned.publishFrom(spark, table, live) { dir =>
            Seq(("stale", 0L)).toDF("tag", "x")
              .write.mode("overwrite").parquet(dir)
          }
          println("OCC-PUBLISHED-STALE")
        } catch {
          case _: Versioned.ConcurrentWriteException =>
            println("OCC-CONFLICT")
        }
      case other => sys.error(s"unknown mode $other")
    }
    Console.out.flush()
    spark.stop()
    println("OCC-DONE")
  }
}
