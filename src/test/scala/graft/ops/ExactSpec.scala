package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Tables

/** The core Exact claim: decimal-staged sums are bit-identical under ANY
  * partitioning (plain double sums are not — accumulation order drifts). */
class ExactSpec extends SparkSpec {

  import spark.implicits._

  test("sumMoney is invariant across repartitionings, to the last bit") {
    val li = Tables.load(spark, sf001, "lineitem")
    def total(parts: Int): Double =
      li.repartition(parts)
        .groupBy($"l_returnflag")
        .agg(Exact.sumMoney($"l_extendedprice").as("s"))
        .agg(sum($"s")).head().getDouble(0)
    val ref = total(1)
    Seq(2, 7, 32).foreach(p => assert(total(p) == ref, s"parts=$p drifted"))
  }

  test("dec4/dec6 recover exact rationals of 2dp products") {
    val row = Seq((19.99, 0.05, 0.08)).toDF("price", "disc", "tax")
      .select(
        Exact.dec4($"price" * (lit(1.0) - $"disc")).as("d4"),
        Exact.dec6($"price" * (lit(1.0) - $"disc") * (lit(1.0) + $"tax")).as("d6"))
      .head()
    assert(row.getDecimal(0).toPlainString == "18.9905")
    assert(row.getDecimal(1).toPlainString == "20.509740")
  }
}
