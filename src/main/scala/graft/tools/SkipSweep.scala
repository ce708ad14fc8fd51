package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.{Cluster, Dv, Forget, SkipScan, StatsIndex, Versioned}

/**
 * Empirical sweep for the PLAN-TIME skipping path ([[SkipScan]]) — the
 * measured twin of SCALE.md's "Plan-time file skipping at 100 TB" note:
 * build a range-clustered table of `rows` longs across `files` files,
 * then time (a) the plain full scan + filter and (b) the same predicate
 * through the manifest-backed FileIndex, for a ~1% key range. The
 * pruned arm's cost should track SELECTIVITY (files admitted), the full
 * arm the TABLE — and the gap should widen linearly with table size.
 *
 * `overlay` mode measures the round-18 leg instead: the table is a
 * VERSIONED publish that then takes one zero-copy CDC merge (DV'd old
 * rows + appended fresh rows — the normal production state), and the
 * arms compare [[Versioned.readVersion]] (plain overlay read: full
 * listing + DV anti-join) against [[SkipScan.readVersionAuto]] (pruned
 * listing + the same anti-join) — isolating what the manifest FileIndex
 * buys THROUGH the DML history.
 *
 * Usage: runMain graft.tools.SkipSweep [rows] [files] [overlay]
 * Prints one JSON line {"metric":"skip_sweep",...}.
 */
object SkipSweep {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val files = args.lift(1).map(_.toInt).getOrElse(64)
    val overlay = args.lift(2).contains("overlay")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Conf.local(SparkSession.builder(), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("graft-skipsweep").toString
    val d = s"$root/t"
    try {
      val src = spark.range(rows).select(col("id").as("k"),
        (col("id") % 97).as("g"),
        concat(lit("payload-"), col("id")).as("v"))
      def timeS[A](f: => A): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // ~1% of the key space, mid-table
      val lo = rows / 2
      val hi = lo + rows / 100
      val (fullArm, skipArm, probeDf) =
        if (!overlay) {
          Cluster.writeClustered(src, d, files, col("k"))
          StatsIndex.build(spark, d, "k")
          (() => spark.read.parquet(d)
             .filter(col("k") >= lo && col("k") <= hi)
             .agg(count(lit(1)), sum(col("g"))).collect(),
           () => SkipScan.scan(spark, d)
             .filter(col("k") >= lo && col("k") <= hi)
             .agg(count(lit(1)), sum(col("g"))).collect(),
           () => SkipScan.scan(spark, d)
             .filter(col("k") >= lo && col("k") <= hi))
        } else {
          Forget.publishClustered(src, d, files, keyCol = "k", stats = true)
          // one zero-copy CDC merge: update 5 in-range keys, delete 5 —
          // v2 = _ref + deletion vector + one appended file +
          // landing-minted stats, the post-first-landing table state
          import spark.implicits._
          val ups = (lo to lo + 4L)
            .map(k => (k, -1L, s"updated-$k", "U"))
            .toDF("k", "g", "v", "op")
          val dels = (lo + 10L to lo + 14L)
            .map(k => (k, 0L, "", "D")).toDF("k", "g", "v", "op")
          Dv.applyCdc(spark, d, "k", ups.unionByName(dels), opCol = "op")
          val live = Versioned.currentVersion(spark, d).get
          (() => Versioned.readVersion(spark, d, live)
             .filter(col("k") >= lo && col("k") <= hi)
             .agg(count(lit(1)), sum(col("g"))).collect(),
           () => SkipScan.readVersionAuto(spark, d, live)
             .filter(col("k") >= lo && col("k") <= hi)
             .agg(count(lit(1)), sum(col("g"))).collect(),
           () => SkipScan.readVersionAuto(spark, d, live)
             .filter(col("k") >= lo && col("k") <= hi))
        }
      fullArm(); skipArm() // warm (JIT + page cache) — both arms equally
      val tFull = timeS(fullArm())
      val tSkip = timeS(skipArm())
      val probe = probeDf()
      probe.collect()
      val admitted = SkipScan.scannedFileCount(probe)
      val mode = if (overlay) "overlay" else "plain"
      println(s"""{"metric":"skip_sweep","mode":"$mode","rows":$rows,""" +
        s""""files":$files,"admitted":$admitted,""" +
        s""""full_s":${f"$tFull%.3f"},"skip_s":${f"$tSkip%.3f"}}""")
    } finally {
      spark.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      ()
    }
  }
}
