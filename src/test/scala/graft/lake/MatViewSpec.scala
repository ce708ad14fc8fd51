package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Incrementally-maintained materialized views ([[MatView]]): every refresh
 * from a CDC batch leaves the view exactly equal to a full groupBy
 * recompute of the live source — across randomized multi-round churn with
 * group migrations, emptied groups, and brand-new groups; the watermark
 * travels atomically with the view version (replayed refreshes no-op, a
 * skipped batch rejects loudly); averages derive at read.
 */
class MatViewSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-matview").toString

  private def fullRecompute(src: String): Seq[(String, Long, BigDecimal)] =
    Versioned.read(spark, src)
      .groupBy($"grp")
      .agg(count(lit(1)).as("n"),
        sum($"amount".cast("decimal(38,6)")).as("s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDecimal(2)).setScale(6)))
      .toSeq.sortBy(_._1)

  private def viewRows(view: String): Seq[(String, Long, BigDecimal)] =
    Versioned.read(spark, view).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("n_rows"),
        BigDecimal(r.getAs[java.math.BigDecimal]("sum_amount")).setScale(6)))
      .toSeq.sortBy(_._1)

  private def mkSource(name: String, n: Int): String = {
    val t = s"$root/$name"
    val df = (0 until n).map { k =>
      (k.toLong, s"g${k % 7}", BigDecimal(k * 13 % 997) / 100)
    }.toDF("k", "grp", "amount")
    Forget.publishIndexed(df, t, nFiles = 8, keyCol = "k", stats = true)
    t
  }

  test("create equals the full recompute; averages derive at read") {
    val src = mkSource("base", 5000)
    val view = s"$root/base_view"
    assert(MatView.create(spark, src, "k", view, Seq("grp"),
      Seq("amount")) == 1L)
    assert(viewRows(view) == fullRecompute(src))
    val avg = MatView.readWithAverages(spark, view)
      .filter($"grp" === "g0")
      .select(($"sum_amount" / $"n_rows").cast("double"), $"avg_amount")
      .head()
    assert(avg.getDouble(0) == avg.getDouble(1))
  }

  test("randomized churn: refresh per batch == recompute, rounds of I/U/D") {
    val src = mkSource("churn", 4000)
    val view = s"$root/churn_view"
    MatView.create(spark, src, "k", view, Seq("grp"), Seq("amount"))
    val rnd = new scala.util.Random(4242)
    var nextKey = 4000L
    for (round <- 1 to 6) {
      val liveKeys = Versioned.read(spark, src)
        .select($"k").as[Long].collect().toSeq
      // deletes, updates (some migrating groups), inserts (some new groups)
      val dels = rnd.shuffle(liveKeys).take(120).toSet
      val upds = rnd.shuffle(liveKeys.filterNot(dels)).take(150)
      val batch =
        dels.toSeq.map(k => (k, "", BigDecimal(0), "D")) ++
          upds.map { k =>
            val g = if (rnd.nextBoolean()) s"g${rnd.nextInt(7)}"
                    else s"h${rnd.nextInt(3)}" // migration to new groups
            (k, g, BigDecimal(rnd.nextInt(100000)) / 100, "U")
          } ++
          (0 until 80).map { _ =>
            nextKey += 1
            (nextKey, s"g${rnd.nextInt(9)}",
              BigDecimal(rnd.nextInt(100000)) / 100, "I")
          }
      val bdf = rnd.shuffle(batch)
        .toDF("k", "grp", "amount", "op")
        .withColumn("grp", when($"op" === "D", lit(null: String))
          .otherwise($"grp"))
        .withColumn("amount", when($"op" === "D", lit(null: String)
          .cast("decimal(38,18)")).otherwise($"amount"))
      Upsert.applyCdc(spark, src, "k", bdf)
      MatView.refresh(spark, view, bdf)
      assert(viewRows(view) == fullRecompute(src),
        s"view != recompute after round $round")
    }
  }

  test("groups empty out and vanish; replay no-ops; skipped batch rejects") {
    val t = s"$root/vanish"
    val df = Seq((1L, "a", BigDecimal(1)), (2L, "a", BigDecimal(2)),
      (3L, "b", BigDecimal(3))).toDF("k", "grp", "amount")
    Forget.publishIndexed(df, t, nFiles = 2, keyCol = "k", stats = true)
    val view = s"$root/vanish_view"
    MatView.create(spark, t, "k", view, Seq("grp"), Seq("amount"))
    // delete ALL of group a
    val batch = Seq((1L, "D"), (2L, "D")).toDF("k", "op")
      .withColumn("grp", lit(null: String))
      .withColumn("amount", lit(null: String).cast("decimal(38,18)"))
      .select($"k", $"grp", $"amount", $"op")
    Upsert.applyCdc(spark, t, "k", batch)
    val v2 = MatView.refresh(spark, view, batch)
    assert(viewRows(view) == Seq(("b", 1L, BigDecimal(3).setScale(6))))
    // replayed refresh (source hasn't moved): no-op, same version
    assert(MatView.refresh(spark, view, batch) == v2)
    // two source DMLs without a refresh: loud reject, recreate catches up
    Upsert.applyCdc(spark, t, "k",
      Seq((10L, "c", BigDecimal(5), "I")).toDF("k", "grp", "amount", "op"))
    Upsert.applyCdc(spark, t, "k",
      Seq((11L, "c", BigDecimal(6), "I")).toDF("k", "grp", "amount", "op"))
    val e = intercept[IllegalArgumentException] {
      MatView.refresh(spark, view,
        Seq((11L, "c", BigDecimal(6), "I")).toDF("k", "grp", "amount", "op"))
    }
    assert(e.getMessage.contains("recreate"))
    MatView.recreate(spark, view)
    assert(viewRows(view) == fullRecompute(t))
    // and the spec watermark now matches the live source
    assert(MatView.spec(spark, view).synced ==
      Versioned.currentVersion(spark, t).get)
  }

  test("MIN/MAX leg: touched-group recompute stays exact through churn") {
    val src = mkSource("minmax", 3000)
    val view = s"$root/minmax_view"
    MatView.create(spark, src, "k", view, Seq("grp"), Seq("amount"),
      minMaxCols = Seq("amount"))

    def mmRecompute(): Seq[(String, Long, BigDecimal, BigDecimal, BigDecimal)] =
      Versioned.read(spark, src).groupBy($"grp")
        .agg(count(lit(1)), sum($"amount".cast("decimal(38,6)")),
          min($"amount"), max($"amount"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          BigDecimal(r.getDecimal(2)).setScale(6),
          BigDecimal(r.getDecimal(3)), BigDecimal(r.getDecimal(4))))
        .toSeq.sortBy(_._1)
    def mmView(): Seq[(String, Long, BigDecimal, BigDecimal, BigDecimal)] =
      Versioned.read(spark, view).collect()
        .map(r => (r.getAs[String]("grp"), r.getAs[Long]("n_rows"),
          BigDecimal(r.getAs[java.math.BigDecimal]("sum_amount")).setScale(6),
          BigDecimal(r.getAs[java.math.BigDecimal]("min_amount")),
          BigDecimal(r.getAs[java.math.BigDecimal]("max_amount"))))
        .toSeq.sortBy(_._1)

    assert(mmView() == mmRecompute())

    def applyAndRefresh(batch: DataFrame, budget: Int = 200000): Unit = {
      Upsert.applyCdc(spark, src, "k", batch)
      MatView.refresh(spark, view, batch, maxDriverKeys = budget)
      assert(mmView() == mmRecompute())
    }

    // 1. delete the CURRENT MAX row of g0 — the runner-up must surface
    //    (exactly what least/greatest alone cannot do)
    val g0max = Versioned.read(spark, src).filter($"grp" === "g0")
      .orderBy($"amount".desc, $"k").select($"k").as[Long].head()
    applyAndRefresh(Seq((g0max, "", BigDecimal(0), "D"))
      .toDF("k", "grp", "amount", "op"))

    // 2. an update that LOWERS a group's max in place
    val g1max = Versioned.read(spark, src).filter($"grp" === "g1")
      .orderBy($"amount".desc, $"k").select($"k").as[Long].head()
    applyAndRefresh(Seq((g1max, "g1", BigDecimal(-7.5), "U"))
      .toDF("k", "grp", "amount", "op"))

    // 3. migration: the min row of g2 moves to a BRAND-NEW group
    val g2min = Versioned.read(spark, src).filter($"grp" === "g2")
      .orderBy($"amount".asc, $"k").select($"k").as[Long].head()
    applyAndRefresh(Seq((g2min, "brandnew", BigDecimal(123.45), "U"))
      .toDF("k", "grp", "amount", "op"))

    // 4. empty that new group out entirely — it must vanish
    applyAndRefresh(Seq((g2min, "", BigDecimal(0), "D"))
      .toDF("k", "grp", "amount", "op"))
    assert(!mmView().exists(_._1 == "brandnew"))

    // 5. pure inserts extend min/max incrementally (no recompute needed,
    //    but the result must be identical either way)
    applyAndRefresh(
      Seq((90001L, "g3", BigDecimal(99999), "I"),
        (90002L, "g3", BigDecimal(-99999), "I"))
        .toDF("k", "grp", "amount", "op"))

    // 6. randomized churn rounds, one forced onto the semi-join regime
    val rnd = new scala.util.Random(77)
    for (round <- 1 to 3) {
      val liveKeys = Versioned.read(spark, src)
        .select($"k").as[Long].collect().toSeq
      val dels = rnd.shuffle(liveKeys).take(100).toSet
      val upds = rnd.shuffle(liveKeys.filterNot(dels)).take(120)
      val batch =
        dels.toSeq.map(k => (k, "", BigDecimal(0), "D")) ++
          upds.map(k => (k, s"g${rnd.nextInt(7)}",
            BigDecimal(rnd.nextInt(200000) - 100000) / 100, "U")) ++
          (0 until 60).map(i => (100000L + round * 1000 + i,
            s"g${rnd.nextInt(7)}", BigDecimal(rnd.nextInt(9999)) / 100, "I"))
      applyAndRefresh(batch.toDF("k", "grp", "amount", "op"),
        budget = if (round == 2) 1 else 200000)
    }

    // replay still no-ops; recreate preserves the min/max definition
    val vNow = Versioned.currentVersion(spark, view).get
    assert(MatView.refresh(spark, view,
      Seq((1L, "g0", BigDecimal(1), "U")).toDF("k", "grp", "amount", "op"))
      == vNow)
    MatView.recreate(spark, view)
    assert(mmView() == mmRecompute())
    assert(MatView.spec(spark, view).minMaxCols == Seq("amount"))
  }

  test("past the driver-key budget the refresh semi-joins: still recompute-exact") {
    val src = mkSource("budget", 3000)
    val view = s"$root/budget_view"
    MatView.create(spark, src, "k", view, Seq("grp"), Seq("amount"))
    // a batch whose key count exceeds a tiny budget: deletes, migrating
    // updates, and inserts — refreshed via the distributed minus side
    val batch = (
      (0L until 200L).map(k => (k, "", BigDecimal(0), "D")) ++
        (200L until 500L).map(k =>
          (k, s"h${k % 3}", BigDecimal(k) / 10, "U")) ++
        (3000L until 3100L).map(k =>
          (k, s"g${k % 7}", BigDecimal(k) / 100, "I")))
      .toDF("k", "grp", "amount", "op")
    Upsert.applyCdc(spark, src, "k", batch, maxDriverKeys = 16)
    MatView.refresh(spark, view, batch, maxDriverKeys = 16)
    assert(viewRows(view) == fullRecompute(src))
  }

  test("an I op on an EXISTING key (upsert semantics) stays recompute-exact") {
    val t = s"$root/iexist"
    val df = Seq((1L, "a", BigDecimal(10)), (2L, "b", BigDecimal(20)))
      .toDF("k", "grp", "amount")
    Forget.publishIndexed(df, t, nFiles = 2, keyCol = "k", stats = true)
    val view = s"$root/iexist_view"
    MatView.create(spark, t, "k", view, Seq("grp"), Seq("amount"))
    // applyCdc treats I as a full upsert — key 1 exists and migrates
    // group: the view must subtract the old (a, 10) row
    val batch = Seq((1L, "c", BigDecimal(99), "I"))
      .toDF("k", "grp", "amount", "op")
    Upsert.applyCdc(spark, t, "k", batch)
    MatView.refresh(spark, view, batch)
    assert(viewRows(view) == fullRecompute(t))
    assert(viewRows(view) == Seq(
      ("b", 1L, BigDecimal(20).setScale(6)),
      ("c", 1L, BigDecimal(99).setScale(6))))
  }

  test("catchUp bridges a multi-version span from the change feed; " +
      "recompute only when unbridgeable") {
    val t = mkSource("catchup", 3000)
    val view = s"$root/catchup_view"
    MatView.create(spark, t, "k", view, Seq("grp"), Seq("amount"))
    // three source DMLs without a refresh — including churn on ONE key
    // across versions (the last-op-per-key reduction must win)
    Upsert.applyCdc(spark, t, "k", Seq((5000L, "g1", BigDecimal(9), "I"))
      .toDF("k", "grp", "amount", "op"))
    Upsert.applyCdc(spark, t, "k", Seq(
      (5000L, "g2", BigDecimal(11), "U"),
      (7L, "g0", BigDecimal(42), "U")).toDF("k", "grp", "amount", "op"))
    Upsert.applyCdc(spark, t, "k", Seq((3L, "D"))
      .toDF("k", "op").withColumn("grp", lit(null: String))
      .withColumn("amount", lit(null: String).cast("decimal(38,18)"))
      .select($"k", $"grp", $"amount", $"op"))
    // the single-step refresh rejects this span; catchUp bridges it
    val e = intercept[IllegalArgumentException] {
      MatView.refresh(spark, view, Seq((3L, "D")).toDF("k", "op")
        .withColumn("grp", lit(null: String))
        .withColumn("amount", lit(null: String).cast("decimal(38,18)")))
    }
    assert(e.getMessage.contains("catchUp"))
    MatView.catchUp(spark, view)
    assert(viewRows(view) == fullRecompute(t))
    assert(MatView.spec(spark, view).synced ==
      Versioned.currentVersion(spark, t).get)
    // idempotent: a second catchUp no-ops at the same version
    val vNow = Versioned.currentVersion(spark, view).get
    assert(MatView.catchUp(spark, view) == vNow)
    // maintenance-only span: compaction bridges to zero changes, the
    // watermark still advances
    Compact.compactVersion(spark, t, "k")
    MatView.catchUp(spark, view)
    assert(viewRows(view) == fullRecompute(t))
    assert(MatView.spec(spark, view).synced ==
      Versioned.currentVersion(spark, t).get)
    // unbridgeable: a wholesale replace breaks the feed — catchUp falls
    // back to the full recompute instead of guessing
    Forget.publishIndexed(
      (0 until 100).map(k => (k.toLong, s"g${k % 3}",
        BigDecimal(k))).toDF("k", "grp", "amount"),
      t, nFiles = 2, keyCol = "k", stats = true)
    MatView.catchUp(spark, view)
    assert(viewRows(view) == fullRecompute(t))
    // unbridgeable: the SYNCED version's data dir was vacuumed (the span
    // needs it as its minus side) — recompute, not a loud vacuum error
    Upsert.applyCdc(spark, t, "k", Seq((200L, "g0", BigDecimal(1), "I"))
      .toDF("k", "grp", "amount", "op"))
    Upsert.applyCdc(spark, t, "k", Seq((201L, "g1", BigDecimal(2), "I"))
      .toDF("k", "grp", "amount", "op"))
    Versioned.vacuum(spark, t, keep = 0) // drops the synced version's dir
    MatView.catchUp(spark, view)
    assert(viewRows(view) == fullRecompute(t))
  }

  test("view versions time-travel; watermark is atomic with the data") {
    val src = mkSource("travel", 1000)
    val view = s"$root/travel_view"
    MatView.create(spark, src, "k", view, Seq("grp"), Seq("amount"))
    val before = viewRows(view)
    val batch = Seq((0L, "D")).toDF("k", "op")
      .withColumn("grp", lit(null: String))
      .withColumn("amount", lit(null: String).cast("decimal(38,18)"))
      .select($"k", $"grp", $"amount", $"op")
    Upsert.applyCdc(spark, src, "k", batch)
    val v2 = MatView.refresh(spark, view, batch)
    assert(v2 == 2L)
    // v1 still reads as the pre-refresh snapshot
    val v1rows = Versioned.readVersion(spark, view, 1L).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("n_rows"),
        BigDecimal(r.getAs[java.math.BigDecimal]("sum_amount")).setScale(6)))
      .toSeq.sortBy(_._1)
    assert(v1rows == before)
    // each version dir carries ITS OWN watermark
    def synced(v: Long): Long = {
      val f = new org.apache.hadoop.fs.Path(view).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val j = Versioned.readSmallFile(f,
        new org.apache.hadoop.fs.Path(s"$view/v=$v/_matview")).get
      """"synced":(\d+)""".r.findFirstMatchIn(j).get.group(1).toLong
    }
    assert(synced(1L) == 1L && synced(2L) == 2L)
  }

  test("EXPRESSION group keys compose with the MIN/MAX leg: deletes " +
      "drive the touched-group recompute on the DERIVED column") {
    val t = s"$root/exprmm"
    val df = (0 until 60).map { k =>
      (k.toLong, k.toLong * 3,
        java.sql.Date.valueOf(s"${2020 + k % 3}-03-0${1 + k % 9}"))
    }.toDF("k", "amt", "d")
    Forget.publishIndexed(df, t, nFiles = 4, keyCol = "k", stats = true)
    val view = s"$root/exprmm_view"
    MatView.create(spark, t, "k", view, Seq("year_d"), Seq("amt"),
      minMaxCols = Seq("amt"), groupExprs = Seq("year_d" -> "year(d)"))
    def recompute(): Set[(Int, Long, Long, Long)] =
      Versioned.read(spark, t)
        .groupBy(year($"d").as("year_d"))
        .agg(count(lit(1)).as("n"), min($"amt").as("lo"),
          max($"amt").as("hi"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    def fromView(): Set[(Int, Long, Long, Long)] =
      Versioned.read(spark, view).collect()
        .map(r => (r.getAs[Int]("year_d"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("min_amt"), r.getAs[Long]("max_amt"))).toSet
    assert(fromView() == recompute())
    // delete each year's current MAX row — the insert-monotone merge
    // cannot express this; the touched-group recompute must fire on the
    // DERIVED year bucket and find the runner-up exactly
    val maxKeys = Versioned.read(spark, t)
      .withColumn("_y", year($"d"))
      .groupBy($"_y").agg(max(struct($"amt", $"k")).as("m"))
      .select($"m.k").collect().map(_.getLong(0)).toSeq
    assert(maxKeys.size == 3)
    val dels = maxKeys.toDF("k")
      .withColumn("amt", lit(null: String).cast("long"))
      .withColumn("d", lit(null: String).cast("date"))
      .withColumn("op", lit("D"))
      .select($"k", $"amt", $"d", $"op")
    Upsert.applyCdc(spark, t, "k", dels)
    MatView.refresh(spark, view, dels)
    assert(fromView() == recompute(),
      "derived-bucket touched-group recompute diverged from the base")
    // and an UPDATE that migrates a row ACROSS buckets (the date moves
    // to another year) keeps both buckets exact
    val moved = Versioned.read(spark, t).filter($"k" === 1L)
      .withColumn("d", lit(java.sql.Date.valueOf("2022-12-25")))
      .withColumn("op", lit("U"))
      .select($"k", $"amt", $"d", $"op")
    Upsert.applyCdc(spark, t, "k", moved)
    MatView.refresh(spark, view, moved)
    assert(fromView() == recompute(),
      "cross-bucket migration diverged from the base")
  }
}
