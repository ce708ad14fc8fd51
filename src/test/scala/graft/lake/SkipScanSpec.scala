package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * [[SkipScan]]: plan-time automatic file skipping. A plain
 * `.filter`/SQL predicate over [[SkipScan.scan]]'s frame prunes files
 * at PLANNING time from the committed manifests (no special read API in
 * the query), the result always equals the full scan + filter, and
 * every not-understood shape degrades to admit-all — slow, never wrong.
 */
class SkipScanSpec extends SparkSpec {

  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft-skipscan").toString

  // 8 range-clustered files over k = 0..799, _stats manifest (self-named)
  private lazy val rangeDir: String = {
    val d = s"$root/range"
    Cluster.writeClustered(
      (0L until 800L).map(k => (k, s"v$k", k % 7)).toDF("k", "v", "g"),
      d, nFiles = 8, col("k"))
    StatsIndex.build(spark, d, "k")
    d
  }

  private def prove(df: DataFrame, expectFiles: Long,
                    oracle: DataFrame): Unit = {
    val got = df.collect().toSeq
    assert(SkipScan.scannedFileCount(df) == expectFiles,
      s"expected $expectFiles files scanned")
    assert(got.toSet == oracle.collect().toSet)
  }

  test("a plain DataFrame range filter prunes files at planning time; " +
      "result equals the full scan") {
    val full = spark.read.parquet(rangeDir)
    // 0..799 over 8 files => ~100 keys/file
    prove(SkipScan.scan(spark, rangeDir).filter($"k" >= 250 && $"k" <= 310),
      expectFiles = 2, full.filter($"k" >= 250 && $"k" <= 310))
    prove(SkipScan.scan(spark, rangeDir).filter($"k" === 512L),
      expectFiles = 1, full.filter($"k" === 512L))
    // no predicate: every file
    prove(SkipScan.scan(spark, rangeDir), 8, full)
  }

  test("SQL over a temp view prunes the same way; OR unions intervals; " +
      "IN admits per member") {
    SkipScan.scan(spark, rangeDir).createOrReplaceTempView("skipscan_t")
    val full = spark.read.parquet(rangeDir)
    val orQ = spark.sql(
      "SELECT * FROM skipscan_t WHERE k < 50 OR k > 760")
    prove(orQ, 2, full.filter($"k" < 50 || $"k" > 760))
    val inQ = spark.sql(
      "SELECT * FROM skipscan_t WHERE k IN (5, 405, 406)")
    prove(inQ, 2, full.filter($"k".isin(5L, 405L, 406L)))
  }

  test("uncovered columns and fractional literals stay conservative — " +
      "never a missing row") {
    val full = spark.read.parquet(rangeDir)
    // g is not in any manifest: admit everything, filter at row level
    prove(SkipScan.scan(spark, rangeDir).filter($"g" === 3L), 8,
      full.filter($"g" === 3L))
    // fractional bound: floor/ceil admission over the truncated stats
    prove(SkipScan.scan(spark, rangeDir)
        .filter($"k" > lit(399.5) && $"k" < lit(410.5)),
      1, full.filter($"k" > 399.5 && $"k" < 410.5))
  }

  test("an all-NULL-key file is excluded PRECISELY: comparisons skip it, " +
      "IS NULL reads only it") {
    val d = s"$root/nulls"
    val rows = (1L to 10L).map(k => (Some(k), s"v$k")) ++
      (0 until 10).map(i => (None, s"n$i"))
    Cluster.writeClustered(
      rows.toDF("k", "v"), d, nFiles = 2, col("k"))
    StatsIndex.build(spark, d, "k")
    val full = spark.read.parquet(d)
    prove(SkipScan.scan(spark, d).filter($"k" === 5L), 1,
      full.filter($"k" === 5L))
    prove(SkipScan.scan(spark, d).filter($"k".isNull), 1,
      full.filter($"k".isNull))
    // IS NOT NULL excludes the all-null file PRECISELY (its non-null
    // count is 0 in the manifest) — Spark injects this predicate on
    // every comparison, so the exclusion compounds with range admission
    prove(SkipScan.scan(spark, d).filter($"k".isNotNull), 1,
      full.filter($"k".isNotNull))
    // IN admits per member: both named keys live in the non-null file
    prove(SkipScan.scan(spark, d).filter($"k".isin(3L, 9L)), 1,
      full.filter($"k".isin(3L, 9L)))
    // `<=> NULL` selects exactly the NULL rows — it must read the
    // all-null file (the opposite of "="'s nn==0 exclusion), never
    // route through the equality path and skip it
    prove(SkipScan.scan(spark, d).filter($"k" <=> lit(null)), 1,
      full.filter($"k" <=> lit(null)))
    // non-null `<=>` behaves as equality admission
    prove(SkipScan.scan(spark, d).filter($"k" <=> 5L), 1,
      full.filter($"k" <=> 5L))
  }

  test("a stale manifest (file landed after build) degrades to the full " +
      "scan — the new file's rows are never missing") {
    val d = s"$root/stale"
    Cluster.writeClustered(
      (0L until 100L).map(k => (k, s"v$k")).toDF("k", "v"),
      d, nFiles = 4, col("k"))
    StatsIndex.build(spark, d, "k")
    // land a file the manifest never saw (raw append — the Versioned DML
    // paths rebuild manifests; this simulates an out-of-band writer)
    Seq((1000L, "late")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(d)
    val df = SkipScan.scan(spark, d).filter($"k" >= 1000L)
    assert(df.collect().map(_.getString(1)).toSeq == Seq("late"))
    assert(SkipScan.scannedFileCount(df) == 5) // full scan: no pruning
  }

  test("a REGISTERED clustered lake table prunes ad-hoc SQL at planning " +
      "time; a zero-copy merge version KEEPS pruning through the overlay " +
      "(landing-minted stats cover the appends)") {
    val d = s"$root/registered"
    Forget.publishClustered(
      (0L until 400L).map(k => (k, s"v$k")).toDF("k", "v"),
      d, nFiles = 4, keyCol = "k", stats = true)
    graft.Sql.registerTable(spark, "skipreg_t", d)
    val q = spark.sql("SELECT v FROM skipreg_t WHERE k BETWEEN 210 AND 230")
    assert(q.collect().map(_.getString(0)).sorted.toSeq
      == (210L to 230L).map(k => s"v$k").sorted)
    assert(SkipScan.scannedFileCount(q) == 1,
      "registered-table SQL did not prune at planning")
    // zero-copy merge -> the live version is a ref + appended file: the
    // rebind routes through the overlay FileIndex — the append's
    // landing-minted stats admit ONLY it for k >= 1000, the base's
    // manifest skips all 4 base files (the +vector scan is the _dv read)
    Dv.merge(spark, d, "k", Seq((1000L, "late")).toDF("k", "v"))
    graft.Sql.registerTable(spark, "skipreg_t", d)
    val q2 = spark.sql("SELECT v FROM skipreg_t WHERE k >= 1000")
    assert(q2.collect().map(_.getString(0)).toSeq == Seq("late"))
    // EXACTLY the appended file — 0 base files, and the fresh-key
    // merge's EMPTY vector wrote no data file for its scan to read
    assert(SkipScan.scannedFileCount(q2) == 1,
      "overlay read did not prune: base files were opened")
    // the base range still prunes to one base file through the overlay
    val q3 = spark.sql("SELECT v FROM skipreg_t WHERE k BETWEEN 10 AND 20")
    assert(q3.collect().map(_.getString(0)).sorted.toSeq
      == (10L to 20L).map(k => s"v$k").sorted)
    assert(SkipScan.scannedFileCount(q3) == 1) // 1 base, empty-dv scan 0
  }

  test("a DV purge version prunes AND hides the deleted rows — the " +
      "overlay read equals readVersion exactly") {
    val d = s"$root/dvoverlay"
    Forget.publishClustered(
      (0L until 400L).map(k => (k, s"v$k")).toDF("k", "v"),
      d, nFiles = 4, keyCol = "k", stats = true)
    Dv.purge(spark, d, "k", Seq(215L, 220L))                       // v2
    graft.Sql.registerTable(spark, "skipdv_t", d)
    val q = spark.sql("SELECT v FROM skipdv_t WHERE k BETWEEN 210 AND 230")
    assert(q.collect().map(_.getString(0)).sorted.toSeq ==
      (210L to 230L).filterNot(k => k == 215L || k == 220L)
        .map(k => s"v$k").sorted)
    // EXACTLY 1 admitted data file + the deletion-vector sidecar read
    assert(SkipScan.scannedFileCount(q) == 2,
      "DV overlay did not prune the base files")
    // full parity with the plain overlay reader
    assert(SkipScan.readVersionAuto(spark, d, 2L).collect().toSet ==
      Versioned.readVersion(spark, d, 2L).collect().toSet)
  }

  test("a RENAMED (column-mapped) version prunes through the overlay; " +
      "logical names resolve and the key range still skips") {
    val d = s"$root/renoverlay"
    Forget.publishClustered(
      (0L until 400L).map(k => (k, s"v$k")).toDF("k", "v"),
      d, nFiles = 4, keyCol = "k", stats = true)
    Evolve.renameColumn(spark, d, "v", "label", "k")               // v2
    graft.Sql.registerTable(spark, "skipren_t", d)
    val q = spark.sql(
      "SELECT label FROM skipren_t WHERE k BETWEEN 100 AND 110")
    assert(q.collect().map(_.getString(0)).sorted.toSeq ==
      (100L to 110L).map(k => s"v$k").sorted)
    assert(SkipScan.scannedFileCount(q) == 1,
      "column-mapped overlay did not prune")
    assert(SkipScan.readVersionAuto(spark, d, 2L).columns.toSeq ==
      Seq("k", "label"))
  }

  test("Bloom point admission prunes a HASH-distributed layout where " +
      "intervals admit everything; ranges stay conservative; OR and IN " +
      "compose per-probe") {
    val d = s"$root/hashbloom"
    // hash layout: every file spans ~the full key domain — min/max is
    // useless here, the per-file Bloom is the only skipping dimension
    Forget.publishIndexed(
      (0L until 800L).map(k => (k, s"v$k")).toDF("k", "v"),
      d, nFiles = 8, keyCol = "k")
    val v1 = s"$d/v=1"
    val full = spark.read.parquet(v1)
    val eq = SkipScan.scan(spark, v1).filter($"k" === 123L)
    prove(eq, 1, full.filter($"k" === 123L)) // fpp slack could add files;
    // 800 keys at fpp 0.01 make a false positive unlikely across 7 files
    val in = SkipScan.scan(spark, v1).filter($"k".isin(123L, 456L))
    assert(in.collect().map(_.getLong(0)).sorted.toSeq == Seq(123L, 456L))
    assert(SkipScan.scannedFileCount(in) <= 3)
    // a range cannot use the Bloom: every file admits (conservative)
    prove(SkipScan.scan(spark, v1).filter($"k" >= 100L && $"k" <= 110L),
      8, full.filter($"k" >= 100L && $"k" <= 110L))
    // OR composes per-arm: an uncovered-column arm admits everything
    prove(SkipScan.scan(spark, v1).filter($"k" === 123L || $"v" === "v5"),
      8, full.filter($"k" === 123L || $"v" === "v5"))
    // registered-table SQL drives the same admission
    graft.Sql.registerTable(spark, "skiphb_t", d)
    val q = spark.sql("SELECT v FROM skiphb_t WHERE k = 700")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("v700"))
    assert(SkipScan.scannedFileCount(q) <= 2)
  }

  test("Bloom and interval admission INTERSECT on a clustered+bloomed " +
      "layout: an in-range key the file cannot hold is skipped") {
    val d = s"$root/clusterbloom"
    // clustered on k, Blooms over the SAME files: file 2 covers
    // [200, 300) — a probe for k=250 admits by interval AND bloom (the
    // key exists); k=5000 admits by NO file
    Cluster.writeClustered(
      (0L until 800L).map(k => (k, s"v$k")).toDF("k", "v"),
      d, nFiles = 8, col("k"))
    StatsIndex.build(spark, d, "k")
    BloomIndex.indexExisting(spark, d, "k")
    val full = spark.read.parquet(d)
    prove(SkipScan.scan(spark, d).filter($"k" === 250L), 1,
      full.filter($"k" === 250L))
    val none = SkipScan.scan(spark, d).filter($"k" === 5000L)
    assert(none.collect().isEmpty)
    assert(SkipScan.scannedFileCount(none) == 0)
  }

  test("string equality, ranges and LIKE-prefix predicates prune " +
      "through the _strstats manifest") {
    val d = s"$root/strings"
    val names = ('a' to 'h').flatMap(c =>
      (0 until 25).map(i => f"$c%c-item-$i%02d"))
    Cluster.writeClustered(
      names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
        .toDF("k", "name"),
      d, nFiles = 4, col("name"))
    StrStats.build(spark, d, Seq("name"))
    val full = spark.read.parquet(d)
    // 8 letters over 4 files => 2 letters/file
    prove(SkipScan.scan(spark, d).filter($"name" === "f-item-10"), 1,
      full.filter($"name" === "f-item-10"))
    prove(SkipScan.scan(spark, d).filter($"name" > "g"), 1,
      full.filter($"name" > "g"))
    SkipScan.scan(spark, d).createOrReplaceTempView("skipstr_t")
    val like = spark.sql("SELECT * FROM skipstr_t WHERE name LIKE 'c-%'")
    prove(like, 1, full.filter($"name".startsWith("c-")))
    // a prefix no file's interval can hold reads nothing
    val none = spark.sql("SELECT * FROM skipstr_t WHERE name LIKE 'z%'")
    assert(none.collect().isEmpty)
    assert(SkipScan.scannedFileCount(none) == 0)
    // conservative: LIKE with a non-prefix pattern admits everything
    prove(spark.sql("SELECT * FROM skipstr_t WHERE name LIKE '%item-03'"),
      4, full.filter($"name".endsWith("item-03")))
  }

  test("fractional Decimal literals at double-ulp-losing magnitudes " +
      "(epoch micros) bound EXACTLY — the boundary file is never skipped") {
    val d = s"$root/micros"
    // file 0 tops out at exactly 1_700_000_000_000_000 (the satisfying
    // row); a toDouble-rounded bound (1699999999999999.9 → whole 1.7e15)
    // would tighten `>` to >= 1.7e15+1 and skip it silently
    val base = 1700000000000000L
    val keys = (base - 10L to base) ++ (base + 1L to base + 10L)
    Cluster.writeClustered(keys.map(k => (k, s"v$k")).toDF("k", "v"),
      d, nFiles = 2, col("k"))
    StatsIndex.build(spark, d, "k")
    SkipScan.scan(spark, d).createOrReplaceTempView("skipmicros_t")
    val q = spark.sql("SELECT k FROM skipmicros_t " +
      "WHERE k > 1699999999999999.9 AND k < 1700000000000000.5")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(base),
      "the boundary row went missing — Decimal bounds are not exact")
    assert(SkipScan.scannedFileCount(q) == 1)
    // magnitude past Long admits rather than excluding
    val big = spark.sql("SELECT k FROM skipmicros_t " +
      "WHERE k < 99999999999999999999999999.5")
    assert(big.count() == keys.size.toLong)
  }

  test("COPY INTO landings keep pruning with no ANALYZE in between; " +
      "time-travel views (VERSION AS OF) prune like the live one") {
    val d = s"$root/copyprune"
    Forget.publishClustered(
      (0L until 400L).map(k => (k, s"v$k")).toDF("k", "v"),
      d, nFiles = 4, keyCol = "k", stats = true)
    // stage a source file and land it zero-copy (CopyInto -> Dv.merge)
    val srcDir = s"$root/copyprune-src"
    (2000L to 2009L).map(k => (k, s"late$k")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    CopyInto.load(spark, d, "k", srcDir)
    graft.Sql.registerTable(spark, "skipcp_t", d)
    // the landed file's rows prune IN (its landing-minted stats admit
    // it alone) and the base files prune OUT — no ANALYZE ran
    val q = spark.sql("SELECT v FROM skipcp_t WHERE k = 2004")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("late2004"))
    // exactly the landed file (the fresh-key landing's empty vector
    // scans no data file)
    assert(SkipScan.scannedFileCount(q) == 1,
      "landing degraded pruning until an ANALYZE")
    // a pinned VERSION AS OF view of the indexed base version prunes too
    graft.Sql.registerAsOf(spark, "skipcp_v1", d, 1L)
    val q1 = spark.sql("SELECT v FROM skipcp_v1 WHERE k BETWEEN 110 AND 130")
    assert(q1.collect().map(_.getString(0)).sorted.toSeq ==
      (110L to 130L).map(k => s"v$k").sorted)
    assert(SkipScan.scannedFileCount(q1) == 1,
      "the as-of view did not prune at planning")
  }

  test("a Hive-partitioned tree composes DIRECTORY pruning with " +
      "manifest file skipping; the partition filter is exact (no row " +
      "leaks — Spark drops it from the residual)") {
    val d = s"$root/hive"
    val rows = (0L until 600L).map(k => (k, s"v$k", s"g${k % 3}"))
    rows.toDF("k", "v", "p")
      .repartitionByRange(12, col("p"), col("k"))
      .sortWithinPartitions(col("p"), col("k"))
      .write.partitionBy("p").parquet(d)
    StatsIndex.buildPartitionedTree(spark, d, "k")
    val total = SkipScan.scanPartitioned(spark, d).inputFiles.length
    assert(total >= 9, s"fixture too small: $total files")
    SkipScan.scanPartitioned(spark, d).createOrReplaceTempView("skippt_t")
    val full = spark.read.parquet(d)
    // partition filter alone: only g1's dir is listed
    val p1 = spark.sql("SELECT k, v FROM skippt_t WHERE p = 'g1'")
    assert(p1.count() == 200L)
    assert(SkipScan.scannedFileCount(p1) <= total / 2)
    // compound: one dir AND one key-range file within it
    val q = spark.sql("SELECT v FROM skippt_t " +
      "WHERE p = 'g1' AND k BETWEEN 100 AND 140")
    assert(q.collect().map(_.getString(0)).sorted.toSeq ==
      full.filter($"p" === "g1" && $"k" >= 100 && $"k" <= 140)
        .select("v").collect().map(_.getString(0)).sorted.toSeq)
    assert(SkipScan.scannedFileCount(q) <= 2,
      "partition + manifest pruning did not compose")
    // exactness of partition admission: != and IN shapes return exactly
    // the full scan's rows (a leaked group would show extra rows here)
    val ne = spark.sql(
      "SELECT k FROM skippt_t WHERE p != 'g1' AND k < 30")
    assert(ne.collect().map(_.getLong(0)).sorted.toSeq ==
      full.filter($"p" =!= "g1" && $"k" < 30)
        .select("k").collect().map(_.getLong(0)).sorted.toSeq)
    val in = spark.sql(
      "SELECT count(*) AS c FROM skippt_t WHERE p IN ('g0', 'g2')")
    assert(in.head().getLong(0) == 400L)
  }

  test("partition VALUES match spark.read's semantics: escaped dir " +
      "names decode, the Hive null sentinel reads back as NULL") {
    val d = s"$root/hiveesc"
    val rows = Seq((1L, Some("a b")), (2L, Some("a b")), (3L, None),
      (4L, Some("x:y")))
    rows.toDF("k", "p").write.partitionBy("p").parquet(d)
    val mine = SkipScan.scanPartitioned(spark, d)
    val ref = spark.read.parquet(d)
    // value parity with Spark's own partition inference, row for row
    assert(mine.select($"k", $"p").collect().toSet ==
      ref.select($"k", $"p".cast("string")).collect().toSet)
    // NULL-partition predicates behave identically
    mine.createOrReplaceTempView("skipesc_t")
    assert(spark.sql("SELECT k FROM skipesc_t WHERE p IS NULL")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(spark.sql("SELECT k FROM skipesc_t WHERE p = 'a b'")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // the null dir is pruned OUT by an equality and IN by IS NULL
    val eq = spark.sql("SELECT k FROM skipesc_t WHERE p = 'x:y'")
    assert(eq.collect().map(_.getLong(0)).toSeq == Seq(4L))
    assert(SkipScan.scannedFileCount(eq) == 1)
  }

  test("the z-order _boxstats manifest drives multi-column pruning " +
      "through plain predicates") {
    val d = s"$root/zbox"
    Versioned.publish(
      (0L until 4000L).map(k => (k, k % 64, (k * 37) % 1000))
        .toDF("k", "a", "b"), d)
    ZOrder.cluster(spark, d, Seq("a", "b"), keyCol = "k",
      targetBytes = 12L * 1024)
    val v2 = s"$d/v=2"
    val total = Versioned.dataFilePaths(spark, v2).size.toLong
    assert(total >= 4, s"fixture too small: $total files")
    val full = spark.read.parquet(v2)
    val df = SkipScan.scan(spark, v2)
      .filter($"a" >= 8 && $"a" <= 18 && $"b" >= 100 && $"b" <= 260)
    val got = df.collect().toSet
    val n = SkipScan.scannedFileCount(df)
    assert(n < total, s"box probe did not prune: $n of $total")
    assert(got == full.filter($"a" >= 8 && $"a" <= 18 &&
      $"b" >= 100 && $"b" <= 260).collect().toSet)
  }

  test("runtime dynamic partition pruning composes with the partitioned " +
      "FileIndex: a broadcast dim join on the partition column reads " +
      "only the matching dirs' admitted files at execution") {
    val d = s"$root/dpp"
    val rows = (0L until 1200L).map(k => (k, s"v$k", s"g${k % 6}"))
    rows.toDF("k", "v", "p")
      .repartitionByRange(24, col("p"), col("k"))
      .sortWithinPartitions(col("p"), col("k"))
      .write.partitionBy("p").parquet(d)
    StatsIndex.buildPartitionedTree(spark, d, "k")
    SkipScan.scanPartitioned(spark, d).createOrReplaceTempView("skipdpp_t")
    val total = SkipScan.scanPartitioned(spark, d).inputFiles.length
    assert(total >= 18, s"fixture too small: $total files")
    // the selective filter lives in a FILE-BACKED dim's rows — nothing
    // in the query text statically names a partition (a LocalRelation
    // dim would constant-fold before the DPP rule sees the join)
    val dimDir = s"$root/dppdim"
    Seq(("g1", "keep"), ("g0", "drop"), ("g2", "drop"), ("g3", "drop"),
      ("g4", "drop"), ("g5", "drop")).toDF("p", "tag")
      .coalesce(1).write.parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("skipdpp_dim")
    val q = spark.sql(
      "SELECT t.v FROM skipdpp_t t JOIN skipdpp_dim d ON t.p = d.p " +
        "WHERE d.tag = 'keep' AND t.k BETWEEN 100 AND 140")
    val full = spark.read.parquet(d)
    assert(q.collect().map(_.getString(0)).sorted.toSeq ==
      full.filter($"p" === "g1" && $"k".between(100, 140))
        .select("v").collect().map(_.getString(0)).sorted.toSeq)
    // without DPP the key range admits ~1 file in EACH of the 6 dirs
    // (+1 dim file); with it only g1's dir survives to execution
    val n = SkipScan.scannedFileCount(q)
    assert(n <= 3, s"dynamic partition pruning did not fire: $n files")
  }

  test("DML victim location rides the manifests: every table-scale scan " +
      "inside a DELETE/UPDATE WHERE on the indexed key opens only " +
      "admitted files, observed via a QueryExecutionListener") {
    val d = s"$root/dml"
    Forget.publishClustered(
      (0L until 800L).map(k => (k, s"v$k")).toDF("k", "v"),
      d, nFiles = 8, keyCol = "k", stats = true)
    graft.SqlDml.register(spark, "skipdml_t", d, "k")
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        counts.add(SkipScan.scannedFileCount(qe.executedPlan))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    // the listener bus is async: wait until the count stream goes quiet
    def settle(): Seq[Long] = {
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var last = -1
      while (System.nanoTime() < deadline &&
          (counts.size != last || counts.isEmpty)) {
        last = counts.size
        Thread.sleep(300)
      }
      import scala.jdk.CollectionConverters._
      counts.asScala.toSeq
    }
    spark.listenerManager.register(listener)
    try {
      // zero-copy DELETE on a plain clustered v1: the victim count, the
      // key collect and the purge's own victim-locating pass each admit
      // 1 of 8 files (a regression to the unindexed read scans all 8)
      graft.SqlDml.execute(spark,
        "DELETE FROM skipdml_t WHERE k BETWEEN 210 AND 214",
        zeroCopyDelete = true)
      val del = settle()
      assert(del.nonEmpty && del.max <= 2,
        s"a DELETE-internal scan read past the admitted files: $del")
      counts.clear()
      // UPDATE through the resulting OVERLAY (ref + deletion vector)
      // version: victim scans compose pruned listing + the _dv sidecar
      // read — still never the 8-file base
      graft.SqlDml.execute(spark,
        "UPDATE skipdml_t SET v = 'patched' WHERE k BETWEEN 300 AND 304")
      val upd = settle()
      assert(upd.nonEmpty && upd.max <= 3,
        s"an UPDATE-internal scan read past the admitted files: $upd")
      counts.clear()
      // MERGE with a STATIC target-side ON conjunct: Catalyst pushes
      // `t.k BETWEEN 400 AND 410` below the left-outer join into the
      // target's scan, where the FileIndex admits 1 of 8 base files.
      // By now the overlay carries TWO deletion vectors and the
      // UPDATE's appended file, so a pruned pass still touches up to
      // 4 (1 admitted base + sidecars); the unindexed regression
      // signature is the 8-file base, i.e. >= 9
      graft.SqlDml.execute(spark,
        "MERGE INTO skipdml_t t USING (SELECT 405 AS k, 'merged' AS v) " +
          "s ON t.k = s.k AND t.k BETWEEN 400 AND 410 " +
          "WHEN MATCHED THEN UPDATE SET v = s.v")
      val mrg = settle()
      assert(mrg.nonEmpty && mrg.max <= 4,
        s"a MERGE-internal scan read past the admitted files: $mrg")
    } finally spark.listenerManager.unregister(listener)
    // result parity: the DML landed exactly its rows
    val live = spark.sql(
      "SELECT v FROM skipdml_t WHERE k BETWEEN 208 AND 216 ORDER BY k")
    assert(live.collect().map(_.getString(0)).toSeq ==
      Seq("v208", "v209", "v215", "v216"))
    assert(spark.sql("SELECT v FROM skipdml_t WHERE k = 302")
      .collect().map(_.getString(0)).toSeq == Seq("patched"))
    assert(spark.sql("SELECT v FROM skipdml_t WHERE k = 405")
      .collect().map(_.getString(0)).toSeq == Seq("merged"))
    assert(spark.sql("SELECT count(*) FROM skipdml_t").head().getLong(0)
      == 795L)
  }
}
