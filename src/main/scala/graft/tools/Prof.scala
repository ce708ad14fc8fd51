package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Throwaway profiling main for the minhash pipeline. */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.lake.Tables.documents(spark, "/root/testdata/sf0.1")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s ($n rows)")
    }
    // warm up the session (codegen, classloading)
    time("warmup-count")(d.count())
    time("warm-count-2")(d.count())
    val r = d.repartition(col("doc_id"))
    time("repart-count")(r.count())
    val sh = r.select(col("doc_id"), explode(TextOps.shingles(TextOps.tokens(col("text")))).as("sh"))
    time("explode")(sh.count())
    time("explode-2")(sh.count())
    val h = sh.select(col("doc_id"), TextOps.h32(col("sh")).as("h"))
    time("h32-sum")(h.agg(sum("h")).count())
    time("h32-sum-2")(h.agg(sum("h")).count())
    val justMd5 = sh.select(md5(col("sh")).as("m")).agg(count(col("m")))
    time("just-md5")(justMd5.count())
    val mins = (0 until 8).map { i =>
      min((col("h") * TextOps.A(i) + TextOps.B(i)) % TextOps.P).as(s"mh$i")
    }
    val agg8 = h.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    time("agg8")(agg8.count())
    time("agg8-2")(agg8.count())
    val bands = TextOps.lshBands(d, "doc_id", "text")
    time("bands")(bands.count())
    val pairs = TextOps.candidatePairs(bands, "doc_id")
    time("pairs")(pairs.count())
    time("pairs-2")(pairs.count())
    spark.stop()
  }
}
