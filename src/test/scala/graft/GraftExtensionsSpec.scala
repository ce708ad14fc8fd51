package graft

/** The custom expressions are registered as SQL functions via
  * SparkSessionExtensions, and the SQL path agrees with the Column API. */
class GraftExtensionsSpec extends SparkSpec {

  import spark.implicits._

  test("minhash_bands / trigram_hashes resolve in SQL and match the Column API") {
    val viaSql = spark.sql(
      "SELECT minhash_bands('a b c d e') AS b, trigram_hashes('a b c d e') AS t")
      .head()
    val viaCol = Seq("a b c d e").toDF("s")
      .select(graft.functions.minhash_bands($"s").as("b"),
        graft.functions.trigram_hashes($"s").as("t"))
      .head()
    assert(viaSql.getSeq[Long](0) == viaCol.getSeq[Long](0))
    assert(viaSql.getSeq[Long](1) == viaCol.getSeq[Long](1))
    assert(viaSql.getSeq[Long](0).size == 4)  // 8 hashes / 2 per band
    assert(viaSql.getSeq[Long](1).size == 3)  // 5 tokens -> 3 trigrams
  }

  test("top_bigram_count / hyperplane_bands resolve in SQL and match the Column API") {
    val viaSql = spark.sql(
      "SELECT top_bigram_count('x y x y z') AS c, " +
        "hyperplane_bands(array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT))) AS h")
      .head()
    val viaCol = Seq(("x y x y z", Array(1.0f, -2.0f))).toDF("s", "v")
      .select(graft.functions.top_bigram_count($"s").as("c"),
        graft.functions.hyperplane_bands($"v").as("h"))
      .head()
    assert(viaSql.getLong(0) == 2L && viaCol.getLong(0) == 2L) // "x y" twice
    assert(viaSql.getSeq[Long](1) == viaCol.getSeq[Long](1))
    assert(viaSql.getSeq[Long](1).size == graft.functions.HyperplaneLsh.Bands)
    // the 3-arg scale dial is reachable from SQL too
    val wide = spark.sql(
      "SELECT hyperplane_bands(array(CAST(1.0 AS FLOAT)), 6, 16) AS h")
      .head().getSeq[Long](0)
    assert(wide.size == 6)
  }

  test("type checking rejects non-string input") {
    val e = intercept[Exception](spark.sql("SELECT minhash_bands(42)").collect())
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
