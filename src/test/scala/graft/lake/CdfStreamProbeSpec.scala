package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Pins the two Spark file-source behaviors
  * [[graft.streaming.CdfStream]] is built on: a parquet FILE STREAM over
  * the glob `table/v=star/_changes` (a) sees files under underscore dirs
  * when the glob names them explicitly (hidden-path filtering applies
  * below roots, not to them), and (b) RE-RESOLVES the glob between
  * micro-batches, so version dirs published after the stream starts are
  * discovered. If a Spark upgrade breaks either, this fails before the
  * CdfStream specs do — pointing at the assumption, not the feature. */
class CdfStreamProbeSpec extends SparkSpec {

  import spark.implicits._

  test("file stream discovers new glob-matched _changes dirs") {
    val root = Files.createTempDirectory("graft-cdfprobe").toString
    val t = s"$root/t"
    // v=1 and v=2 changes exist before the stream starts
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$t/v=1/_changes")
    Seq((2L, "b")).toDF("k", "v").write.parquet(s"$t/v=2/_changes")
    val seen = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val q = spark.readStream
      .schema(Seq((1L, "a")).toDF("k", "v").schema)
      .option("maxFilesPerTrigger", 100)
      .parquet(s"$t/v=*/_changes")
      .select($"k", $"v", input_file_name().as("f"))
      .writeStream
      .trigger(Trigger.ProcessingTime(300))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= df.collect().map(r =>
            (r.getLong(0), r.getString(1), r.getString(2)))
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val afterStart = seen.synchronized(seen.size)
      info(s"initial files delivered: $afterStart rows: " +
        seen.synchronized(seen.toList).toString)
      // now a NEW version dir appears
      Seq((3L, "c")).toDF("k", "v").write.parquet(s"$t/v=3/_changes")
      q.processAllAvailable()
      val all = seen.synchronized(seen.toList)
      info(s"after new dir: ${all.size} rows: $all")
      assert(all.map(_._1).toSet == Set(1L, 2L, 3L),
        s"expected 1,2,3 got ${all.map(_._1).sorted}")
    } finally q.stop()
  }
}
