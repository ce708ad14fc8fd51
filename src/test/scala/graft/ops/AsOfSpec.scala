package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Tables

class AsOfSpec extends SparkSpec {

  import spark.implicits._

  test("asofJoin == per-row correlated max (strict prior) on the events table") {
    val e = Tables.events(spark, sf001)
      .select($"event_id", $"user_id", $"ts")
    val p = Tables.events(spark, sf001)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pts"), unix_micros($"ts").as("p_us"))
    val viaAsof = AsOf.asofJoin(e, p, key = "user_id",
        leftTs = "ts", rightTs = "pts", payloadCols = Seq("p_us"), strict = true)
      .select($"event_id", $"asof_p_us")
    // reference: expand all prior purchases per event, take the max time
    val viaJoin = e.join(p, e("user_id") === p("user_id") && p("pts") < e("ts"), "left")
      .groupBy(e("event_id")).agg(max($"p_us").as("asof_p_us"))
    assert(viaAsof.exceptAll(viaJoin).isEmpty && viaJoin.exceptAll(viaAsof).isEmpty)
  }

  test("asofJoin matches the oracle-checked join_asof_last_purchase query") {
    val e = Tables.events(spark, sf001)
      .select($"event_id", unix_micros($"ts").as("ts_us"), $"user_id", $"event_type", $"ts")
    val p = Tables.events(spark, sf001)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pts"), unix_micros($"ts").as("p_us"))
    val viaOp = AsOf.asofJoin(e, p, "user_id", "ts", "pts", Seq("p_us"))
      .select($"event_id", $"ts_us", $"user_id", $"event_type",
        $"asof_p_us".as("last_purchase_us"))
      .orderBy($"event_id")
    val viaCatalog = graft.SparkEntry.queries("join_asof_last_purchase")(spark, sf001)
    assert(viaOp.exceptAll(viaCatalog).isEmpty && viaCatalog.exceptAll(viaOp).isEmpty)
  }

  test("non-strict ties match; strict ties do not") {
    val l = Seq((1L, 10L, "L")).toDF("k", "t", "side")
    val r = Seq((1L, 10L, 99L)).toDF("k", "rt", "v")
    val strictRow = AsOf.asofJoin(l, r, "k", "t", "rt", Seq("v"), strict = true).head()
    assert(strictRow.isNullAt(strictRow.fieldIndex("asof_v")))
    val laxRow = AsOf.asofJoin(l, r, "k", "t", "rt", Seq("v"), strict = false).head()
    assert(laxRow.getAs[Long]("asof_v") == 99L)
  }
}
