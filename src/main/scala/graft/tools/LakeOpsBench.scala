package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.{Forget, Upsert, Versioned}

/** Dev measurement main — not part of the library surface.
  * Puts NUMBERS behind the lake DML scale claim (SCALE.md "lake ops"):
  * Forget.purge / Upsert.applyCdc cost tracks the TOUCHED-FILE fraction,
  * not table size, while a naive full republish tracks table size.
  *
  * Usage: runMain graft.tools.LakeOpsBench [nRows] [nFiles] [nKeys] [stats]
  * Defaults: 4,000,000 rows x 64 files, 5-key changesets, stats=false.
  * With stats=true a [[graft.lake.StatsIndex]] manifest is built after
  * publish, so purge/merge prune from ONE manifest read instead of
  * nFiles footer opens — run both arms at a high nFiles to see the
  * metadata-round-trip cost the manifest removes. Prints one
  * human-readable table: publish / purge / merge / full-republish wall
  * seconds + files rewritten vs carried.
  */
object LakeOpsBench {
  def main(args: Array[String]): Unit = {
    val nRows = args.lift(0).map(_.toLong).getOrElse(4000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(64)
    val nKeys = args.lift(2).map(_.toInt).getOrElse(5)
    val useStats = args.lift(3).exists(_.toBoolean)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Conf.local(SparkSession.builder(), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("graft-lakeops").toString
    val t = s"$root/t"

    def timeS[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def partNames(v: Long): Set[String] =
      new java.io.File(s"$t/v=$v").listFiles()
        .filter(f => f.isFile && f.getName.startsWith("part-"))
        .map(_.getName).toSet

    val df = spark.range(nRows).select(col("id").as("k"),
      concat(lit("payload-"), col("id")).as("v"))
    val (_, tPub) = timeS(Forget.publishIndexed(df, t, nFiles, "k"))
    println(f"publish   $nRows%,d rows x $nFiles files: $tPub%.2f s")
    if (useStats) {
      val (_, tStats) = timeS(
        graft.lake.StatsIndex.build(spark, s"$t/v=1", "k"))
      println(f"stats manifest build: $tStats%.2f s")
    }

    val purgeKeys = (0 until nKeys).map(i => i.toLong * (nRows / nKeys) + 7)
    val (v2, tPurge) = timeS(Forget.purge(spark, t, "k", purgeKeys))
    val rewrote = partNames(v2).diff(partNames(v2 - 1)).size
    println(f"purge     $nKeys keys: $tPurge%.2f s  " +
      f"(rewrote $rewrote%d of $nFiles files, carried ${nFiles - rewrote}%d)")

    val changes = purgeKeys.map(k => ("I", k, s"restored-$k")) ++
      (0 until nKeys).map(i => ("U", i.toLong * 31 + 1, s"updated-$i"))
    import spark.implicits._
    val (v3, tMerge) = timeS(Upsert.applyCdc(spark, t, "k",
      changes.toDF("op", "k", "v")))
    val rewroteM = partNames(v3).diff(partNames(v3 - 1)).size
    println(f"merge     ${changes.size} I/U ops: $tMerge%.2f s  " +
      f"(rewrote $rewroteM%d of $nFiles files)")

    // the naive alternative: full-table anti-join republish, INCLUDING the
    // sidecar rebuild keeping the layout contract (what merge amortizes)
    val (v4, tFull) = timeS {
      val cur = Versioned.read(spark, t)
      val ch = changes.toDF("op", "k", "v").filter(col("op") =!= "D")
        .drop("op")
      Forget.publishIndexed(
        cur.join(ch.select(col("k")), Seq("k"), "left_anti").unionByName(ch),
        t, nFiles, "k")
    }
    println(f"republish full table (same changeset): $tFull%.2f s")
    println(f"targeted/full ratio: ${tMerge / tFull}%.2f  " +
      f"(versions $v2%d/$v3%d/$v4%d)")

    // the zero-copy arm: a deletion-vector purge rewrites NOTHING — cost
    // is the victim-locating scan of admitted files + one metadata write
    val dvKeys = (0 until nKeys).map(i => i.toLong * (nRows / nKeys) + 13)
    val (v5, tDv) = timeS(graft.lake.Dv.purge(spark, t, "k", dvKeys))
    val dvParts = Option(new java.io.File(s"$t/v=$v5").listFiles())
      .map(_.count(f => f.isFile && f.getName.startsWith("part-")))
      .getOrElse(0)
    println(f"dv purge  $nKeys keys (zero-copy): $tDv%.2f s  " +
      f"(wrote $dvParts%d data files; " +
      f"${graft.lake.Dv.deletedRows(spark, t, v5)}%d rows vectored)")
    val (_, tMat) = timeS(graft.lake.Clone.materialize(spark, t))
    println(f"materialize (DV compactor, full rewrite): $tMat%.2f s")
    spark.stop()
  }
}
