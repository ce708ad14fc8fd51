package graft.lake

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/**
 * Schema-drift contract for [[Tables.events]].
 *
 * The driver's testdata generator has shipped `events.ts` in two on-disk
 * shapes over time — INT64 TIMESTAMP(NANOS) and plain `timestamp[us]` — and
 * a regen once silently flipped between them, erroring every events query.
 * This spec pins the loader's contract: WHATEVER the footer says, the loaded
 * frame is a microsecond `TimestampType` column with identical values, so
 * the next regen is a red spec, not a red round.
 */
class TablesSpec extends SparkSpec {

  // (event_id, epoch nanos, user_id, event_type, value, props). The nanos
  // values carry sub-µs digits on purpose: both shapes must agree on the
  // µs-truncated instant (the oracle's CAST(ts AS TIMESTAMP) semantics).
  private val rows = Seq(
    (1L, 1704067200123456789L, 10L, "view", 1.5, """{"a":1}"""),
    (2L, 1704067201987654321L, 10L, "click", 2.5, """{"b":2}"""),
    (3L, 1704153599999999999L, 11L, "purchase", 9.99, "{}")
  )

  private def expectedMicros: Set[(Long, Long)] =
    rows.map { case (id, ns, _, _, _, _) => (id, ns / 1000L) }.toSet

  private def loadedMicros(dir: String): Set[(Long, Long)] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType, s"ts dtype from $dir")
    df.select(col("event_id"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
  }

  private lazy val tmpRoot = Files.createTempDirectory("graft-tables-spec").toString

  /** Write the legacy shape: a real INT64 TIMESTAMP(NANOS, utc) footer via
    * parquet-mr (Spark cannot author this shape itself). */
  private lazy val nanosDir: String = {
    val dir = s"$tmpRoot/nanos"
    val schema: MessageType = Types
      .buildMessage()
      .addField(Types.required(INT64).named("event_id"))
      .addField(
        Types
          .required(INT64)
          .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS))
          .named("ts"))
      .addField(Types.required(INT64).named("user_id"))
      .addField(
        Types.required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type"))
      .addField(Types.required(DOUBLE).named("value"))
      .addField(Types.required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props"))
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withType(schema)
      .build()
    val factory = new SimpleGroupFactory(schema)
    rows.foreach { case (id, ns, uid, et, v, props) =>
      val g = factory.newGroup()
      g.add("event_id", id)
      g.add("ts", ns)
      g.add("user_id", uid)
      g.add("event_type", et)
      g.add("value", v)
      g.add("props", props)
      writer.write(g)
    }
    writer.close()
    dir
  }

  /** Write the current shape: timestamp[us] with isAdjustedToUTC=false
    * (what pyarrow's timestamp[us] becomes), i.e. Spark TimestampNTZType. */
  private lazy val microsNtzDir: String = {
    val dir = s"$tmpRoot/micros-ntz"
    eventsDf(TimestampNTZType).write.parquet(s"$dir/events.parquet")
    dir
  }

  /** And the tz-adjusted micros shape (TIMESTAMP(MICROS, utc) footer). */
  private lazy val microsTzDir: String = {
    val dir = s"$tmpRoot/micros-tz"
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try eventsDf(TimestampType).write.parquet(s"$dir/events.parquet")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    dir
  }

  private def eventsDf(tsType: DataType) = {
    import spark.implicits._
    rows
      .toDF("event_id", "ts_ns", "user_id", "event_type", "value", "props")
      // timestamp_micros yields TimestampType; cast routes the NTZ variant.
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")).cast(tsType))
      .drop("ts_ns")
  }

  test("events loader absorbs the legacy INT64 TIMESTAMP(NANOS) shape") {
    assert(loadedMicros(nanosDir) === expectedMicros)
  }

  test("events loader absorbs the current timestamp[us] (NTZ) shape") {
    assert(loadedMicros(microsNtzDir) === expectedMicros)
  }

  test("events loader absorbs a tz-adjusted TIMESTAMP(MICROS) shape") {
    assert(loadedMicros(microsTzDir) === expectedMicros)
  }

  test("all shapes yield byte-identical frames") {
    val a = loadedMicros(nanosDir)
    assert(loadedMicros(microsNtzDir) === a)
    assert(loadedMicros(microsTzDir) === a)
  }

  test("nanos-footer detection keys on the error CONDITION, not the message") {
    // a Spark release rewording the message must not disable the fallback:
    // the stable PARQUET_TYPE_ILLEGAL condition alone has to match
    val reworded = new Exception("completely new wording, no keywords here")
      with org.apache.spark.SparkThrowable {
      override def getCondition: String = "PARQUET_TYPE_ILLEGAL"
    }
    assert(Tables.isNanosFooterError(reworded))
    // ...including when a non-Spark wrapper buries it in the cause chain
    assert(Tables.isNanosFooterError(
      new RuntimeException("wrapper", new RuntimeException("mid", reworded))))
    // and an unrelated failure (even a SparkThrowable) must NOT match
    val unrelated = new Exception("file not found")
      with org.apache.spark.SparkThrowable {
      override def getCondition: String = "PATH_NOT_FOUND"
    }
    assert(!Tables.isNanosFooterError(unrelated))
    assert(!Tables.isNanosFooterError(new RuntimeException("plain failure")))
  }

  test("embeddings loader absorbs float64 vectors and int32 ids") {
    import spark.implicits._
    val dir = s"$tmpRoot/emb64"
    Seq((1, Seq(0.25d, -1.5d), 0), (2, Seq(3.0d, 0.125d), 1))
      .toDF("vec_id", "embedding", "label")
      .withColumn("vec_id", col("vec_id").cast("int"))
      .write.parquet(s"$dir/embeddings.parquet")
    val df = Tables.embeddings(spark, dir)
    assert(df.schema("vec_id").dataType === LongType)
    assert(df.schema("embedding").dataType === ArrayType(FloatType, containsNull = true))
    val got = df.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toMap
    // exactly-representable doubles survive the narrowing bit-for-bit
    assert(got(1L) === Seq(0.25f, -1.5f) && got(2L) === Seq(3.0f, 0.125f))
  }

  test("documents loader absorbs int32 doc ids") {
    import spark.implicits._
    val dir = s"$tmpRoot/docs32"
    Seq((7, "alpha", "en", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("doc_id", col("doc_id").cast("int"))
      .write.parquet(s"$dir/documents.parquet")
    val df = Tables.documents(spark, dir)
    assert(df.schema("doc_id").dataType === LongType)
    assert(df.select("doc_id").as[Long].collect().toSeq === Seq(7L))
  }

  test("events loader rejects an unusable ts type") {
    val dir = s"$tmpRoot/bad"
    import spark.implicits._
    rows
      .toDF("event_id", "ts_ns", "user_id", "event_type", "value", "props")
      .withColumn("ts", lit("not-a-timestamp"))
      .drop("ts_ns")
      .write
      .parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported"))
  }
}
