package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.{Cluster, SkipScan, StatsIndex}

/**
 * Empirical sweep for the PLAN-TIME skipping path ([[SkipScan]]) — the
 * measured twin of SCALE.md's "Plan-time file skipping at 100 TB" note:
 * build a range-clustered table of `rows` longs across `files` files,
 * then time (a) the plain full scan + filter and (b) the same predicate
 * through the manifest-backed FileIndex, for a ~1% key range. The
 * pruned arm's cost should track SELECTIVITY (files admitted), the full
 * arm the TABLE — and the gap should widen linearly with table size.
 *
 * Usage: runMain graft.tools.SkipSweep [rows] [files]
 * Prints one JSON line {"metric":"skip_sweep",...}.
 */
object SkipSweep {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val files = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Conf.local(SparkSession.builder(), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("graft-skipsweep").toString
    val d = s"$root/t"
    try {
      Cluster.writeClustered(
        spark.range(rows).select(col("id").as("k"),
          (col("id") % 97).as("g"),
          concat(lit("payload-"), col("id")).as("v")),
        d, files, col("k"))
      StatsIndex.build(spark, d, "k")
      def timeS[A](f: => A): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // ~1% of the key space, mid-table
      val lo = rows / 2
      val hi = lo + rows / 100
      def fullArm() = spark.read.parquet(d)
        .filter(col("k") >= lo && col("k") <= hi)
        .agg(count(lit(1)), sum(col("g"))).collect()
      def skipArm() = SkipScan.scan(spark, d)
        .filter(col("k") >= lo && col("k") <= hi)
        .agg(count(lit(1)), sum(col("g"))).collect()
      fullArm(); skipArm() // warm (JIT + page cache) — both arms equally
      val tFull = timeS(fullArm())
      val tSkip = timeS(skipArm())
      val probe = SkipScan.scan(spark, d)
        .filter(col("k") >= lo && col("k") <= hi)
      probe.collect()
      val admitted = SkipScan.scannedFileCount(probe)
      println(s"""{"metric":"skip_sweep","rows":$rows,"files":$files,""" +
        s""""admitted":$admitted,"full_s":${f"$tFull%.3f"},""" +
        s""""skip_s":${f"$tSkip%.3f"}}""")
    } finally {
      spark.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      ()
    }
  }
}
