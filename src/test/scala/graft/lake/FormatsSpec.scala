package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class FormatsSpec extends SparkSpec {

  private def roundTrip(df: DataFrame, format: String): DataFrame = {
    val dir = Files.createTempDirectory(s"graft-fmt-$format").toString + "/t"
    Formats.write(df, dir, format)
    Formats.read(spark, dir, format, df.schema)
  }

  private def assertSame(a: DataFrame, b: DataFrame): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

  test("orders round-trips value-identical through csv and json") {
    val orders = Tables.load(spark, sf001, "orders")
    assertSame(orders, roundTrip(orders, "csv"))
    assertSame(orders, roundTrip(orders, "json"))
  }

  test("documents (commas, quotes, unicode in text) survive csv quoting") {
    val docs = Tables.documents(spark, sf001)
    assertSame(docs, roundTrip(docs, "csv"))
    assertSame(docs, roundTrip(docs, "json"))
  }

  test("embeddings (array column) round-trip through json; csv refuses loudly") {
    val emb = Tables.embeddings(spark, sf001)
    assertSame(emb, roundTrip(emb, "json"))
    val e = intercept[IllegalArgumentException](roundTrip(emb, "csv"))
    assert(e.getMessage.contains("embedding"))
  }

  test("orc round-trips value-identical, nested arrays included") {
    val orders = Tables.load(spark, sf001, "orders")
    assertSame(orders, roundTrip(orders, "orc"))
    val docs = Tables.documents(spark, sf001)
    assertSame(docs, roundTrip(docs, "orc"))
    // the columnar formats must agree with each other bit-for-bit too
    val emb = Tables.embeddings(spark, sf001)
    assertSame(roundTrip(emb, "orc"), roundTrip(emb, "parquet"))
  }

  test("orc reads push filters down like parquet (pruned scan)") {
    val dir = Files.createTempDirectory("graft-fmt-orcpd").toString + "/t"
    Formats.write(Tables.load(spark, sf001, "orders"), dir, "orc")
    val schema = Tables.load(spark, sf001, "orders").schema
    val plan = Formats.read(spark, dir, "orc", schema)
      .filter(org.apache.spark.sql.functions.col("o_orderkey") === 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)"),
      s"no pushed filter in:\n$plan")
  }

  test("a corrupt json line fails the read loudly instead of null-filling") {
    import java.nio.charset.StandardCharsets
    val dir = Files.createTempDirectory("graft-fmt-bad").toString
    Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      """{"doc_id": 1, "n": 2}
        |{"doc_id": oops not json
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, n BIGINT")
    val e = intercept[Exception] {
      Formats.read(spark, dir, "json", schema).collect()
    }
    assert(e.getMessage != null)
    // PERMISSIVE would have returned 2 rows with nulls; FAILFAST must throw
  }

  test("quarantine ingest splits good rows from verbatim bad lines (json)") {
    import java.nio.charset.StandardCharsets
    val dir = Files.createTempDirectory("graft-fmt-q").toString
    Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      """{"doc_id": 1, "n": 2}
        |{"doc_id": oops not json
        |{"doc_id": 3, "n": 4}
        |{"doc_id": "not a number", "n": 5}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, n BIGINT")
    val (good, bad) = Formats.readWithQuarantine(spark, dir, "json", schema)
    import spark.implicits._
    val goodRows = good.as[(Long, Long)].collect().toSet
    val badLines = bad.as[String].collect().toSet
    assert(goodRows == Set((1L, 2L), (3L, 4L)))
    assert(badLines == Set("{\"doc_id\": oops not json",
      "{\"doc_id\": \"not a number\", \"n\": 5}"))
    // reconciliation invariant: nothing silently dropped
    assert(goodRows.size + badLines.size == 4)
  }

  test("quarantine ingest splits good rows from verbatim bad lines (csv)") {
    import java.nio.charset.StandardCharsets
    val dir = Files.createTempDirectory("graft-fmt-qc").toString
    Files.write(java.nio.file.Paths.get(dir, "part-0.csv"),
      """doc_id,n
        |1,2
        |3,banana
        |5,6
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, n BIGINT")
    val (good, bad) = Formats.readWithQuarantine(spark, dir, "csv", schema)
    import spark.implicits._
    assert(good.as[(Long, Long)].collect().toSet == Set((1L, 2L), (5L, 6L)))
    assert(bad.as[String].collect().toSet == Set("3,banana"))
  }
}
