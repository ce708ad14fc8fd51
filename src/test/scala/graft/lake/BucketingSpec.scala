package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("join of two same-bucketed tables runs exchange-free") {
    val wh = Files.createTempDirectory("graft-bucketed").toString
    Bucketing.writeBucketed(
      Tables.load(spark, sf001, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumnRenamed("o_custkey", "custkey"),
      "orders_b", "custkey", nBuckets = 4, s"$wh/orders_b")
    Bucketing.writeBucketed(
      Tables.load(spark, sf001, "customer").select("c_custkey", "c_name")
        .withColumnRenamed("c_custkey", "custkey"),
      "customer_b", "custkey", nBuckets = 4, s"$wh/customer_b")
    // force a sort-merge join so the exchange elision is what's under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b").join(spark.table("customer_b"), "custkey")
      assert(Bucketing.isExchangeFree(joined), joined.queryExecution.executedPlan.toString)
      // and it still computes the right thing
      val plain = Tables.load(spark, sf001, "orders")
        .join(Tables.load(spark, sf001, "customer"),
          col("o_custkey") === col("c_custkey"))
      assert(joined.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
