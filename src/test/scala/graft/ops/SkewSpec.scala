package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Tables

class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("saltedJoin == plain join (multiset), and spreads the hot key") {
    val orders = Tables.load(spark, sf001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.load(spark, sf001, "customer")
      .select("c_custkey", "c_name").withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(cust, "o_custkey")
    val salted = Skew.saltedJoin(orders, cust, "o_custkey", nSalts = 8)
      .select(plain.columns.toIndexedSeq.map(col): _*)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin left-outer keeps unmatched big rows exactly once") {
    val orders = Tables.load(spark, sf001, "orders")
      .select("o_orderkey", "o_custkey")
    // small side missing most keys: only customers below 50
    val cust = Tables.load(spark, sf001, "customer")
      .filter($"c_custkey" < 50)
      .select($"c_custkey".as("o_custkey"), $"c_name")
    val plain = orders.join(cust, Seq("o_custkey"), "left")
    val salted = Skew.saltedJoin(orders, cust, "o_custkey", nSalts = 8, "left")
      .select(plain.columns.toIndexedSeq.map(col): _*)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assertThrows[IllegalArgumentException](
      Skew.saltedJoin(orders, cust, "o_custkey", 8, "right_outer"))
  }

  test("saltedSum == plain grouped sum") {
    val li = Tables.load(spark, sf001, "lineitem")
    val plain = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("sum_l_quantity"))
    val salted = Skew.saltedSum(li, Seq("l_returnflag"), "l_quantity", nSalts = 8)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hotKeys surfaces keys above the share threshold") {
    val df = (Seq.fill(90)("hot") ++ (1 to 10).map(i => s"cold$i")).toDF("k")
    val hot = Skew.hotKeys(df, "k", minShare = 0.5).as[(String, Long)].collect()
    assert(hot.sameElements(Array(("hot", 90L))))
  }

  test("hotKeys distinguishes a genuinely-null hot key from the rollup total") {
    val df = (Seq.fill(60)(null: String) ++ Seq.fill(40)("x")).toDF("k")
    val hot = Skew.hotKeys(df, "k", minShare = 0.5).as[(String, Long)].collect()
    assert(hot.sameElements(Array((null: String, 60L))))
  }

  test("hotKeys is single-pass: total branch reuses the counts exchange") {
    val df = (Seq.fill(90)("hot") ++ (1 to 10).map(i => s"cold$i")).toDF("k")
    val hot = Skew.hotKeys(df, "k", minShare = 0.5)
    hot.collect() // AQE materializes exchange reuse in the FINAL plan
    val plan = hot.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("StageReuse")
      || plan.contains("TableCacheQueryStage"),
      s"expected the total branch to reuse the counts exchange:\n$plan")
  }
}
