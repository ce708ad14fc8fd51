package graft.vectors

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Tables
import graft.ops.VectorOps

class IvfIndexSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001)
  private lazy val dir = {
    val d = Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(emb, d, k = 8, iters = 2)
    d
  }

  private def queries = emb.filter($"vec_id" < 3)
    .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))

  test("build persists k centroids and a complete hive-partitioned posting file") {
    assert(IvfIndex.centroids(spark, dir).count() == 8)
    val assigned = spark.read.parquet(s"$dir/assignments")
    assert(assigned.count() == emb.count())
    assert(assigned.select("vec_id").distinct().count() == emb.count())
    assert(assigned.columns.contains("centroid_id"))
    // deterministic rebuild: same assignment for every vector
    val dir2 = Files.createTempDirectory("graft-ivf2").toString
    IvfIndex.build(emb, dir2, k = 8, iters = 2)
    val a1 = assigned.select("vec_id", "centroid_id")
    val a2 = spark.read.parquet(s"$dir2/assignments").select("vec_id", "centroid_id")
    assert(a1.exceptAll(a2).isEmpty && a2.exceptAll(a1).isEmpty)
  }

  test("probing all clusters == brute force; pruning hits the partition column") {
    val viaIndex = IvfIndex.search(spark, dir, queries, nProbes = 8, k = 10)
      .select("q_id", "vec_id", "cos_sim", "rn")
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id")
    val brute = emb.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        VectorOps.cosine($"q_emb", $"embedding").as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 10)
    assert(viaIndex.exceptAll(brute).isEmpty && brute.exceptAll(viaIndex).isEmpty)
  }

  test("large query batches fall back to a shuffle join with identical results") {
    val viaBroadcast = IvfIndex.search(spark, dir, queries, nProbes = 2, k = 10)
    val viaShuffle = IvfIndex.search(spark, dir, queries, nProbes = 2, k = 10,
      maxBroadcastProbes = 0L)
    assert(viaShuffle.exceptAll(viaBroadcast).isEmpty
      && viaBroadcast.exceptAll(viaShuffle).isEmpty)
  }

  test("pre-norm-format index fails with a clear rebuild message, not analysis") {
    val old = Files.createTempDirectory("graft-ivf-old").toString
    IvfIndex.centroids(spark, dir).drop("c_nrm")
      .write.parquet(s"$old/centroids")
    spark.read.parquet(s"$dir/assignments").drop("nrm")
      .write.partitionBy("centroid_id").parquet(s"$old/assignments")
    val e = intercept[IllegalArgumentException] {
      IvfIndex.search(spark, old, queries, nProbes = 2, k = 10)
    }
    assert(e.getMessage.contains("rebuild"))
    assert(e.getMessage.contains(old))
  }

  test("Lloyd iterations do not lose recall vs the label-seed centroids") {
    // same probe budget, same k: recall@10 against brute truth must not
    // drop when the centroids are refined from the vec_id%k seed by k-means
    val probes = 2
    val qs = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val w = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"vec_id")
    val truth = emb.crossJoin(broadcast(qs))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        VectorOps.cosine($"q_emb", $"embedding").as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 10)
      .select($"q_id", $"vec_id")
    def recall(indexDir: String): Double = {
      val got = IvfIndex.search(spark, indexDir, qs, nProbes = probes, k = 10)
        .select($"q_id", $"vec_id")
      got.join(truth, Seq("q_id", "vec_id")).count().toDouble / truth.count()
    }
    val seedDir = Files.createTempDirectory("graft-ivf-seed").toString
    IvfIndex.build(emb, seedDir, k = 8, iters = 0)
    val lloydRecall = recall(dir) // built with iters = 2
    val seedRecall = recall(seedDir)
    assert(lloydRecall >= seedRecall,
      s"Lloyd recall $lloydRecall < seed recall $seedRecall")
    // absolute floor is loose: synthetic embeddings are near-uniform, so
    // 2-of-8 probes legitimately sits near 0.5 recall@10
    assert(lloydRecall > 0.3, s"Lloyd recall degenerate: $lloydRecall")
  }

  test("index carries a format-version marker; mismatched versions fail fast") {
    val p = new org.apache.hadoop.fs.Path(dir, "ivf_format_version")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(p))
    // tamper: an index stamped with a different version must demand a rebuild
    val tampered = Files.createTempDirectory("graft-ivf-tamper").toString
    IvfIndex.build(emb, tampered, k = 4, iters = 0)
    val tp = new org.apache.hadoop.fs.Path(tampered, "ivf_format_version")
    val out = fs.create(tp, true)
    try out.writeBytes("1") finally out.close()
    val e = intercept[IllegalArgumentException] {
      IvfIndex.search(spark, tampered, queries, nProbes = 2, k = 10)
    }
    assert(e.getMessage.contains("rebuild") && e.getMessage.contains("format 1"))
  }

  test("probing 2 clusters only returns vectors from the probed partitions") {
    val out = IvfIndex.search(spark, dir, queries, nProbes = 2, k = 10)
    val assigned = spark.read.parquet(s"$dir/assignments")
      .select($"vec_id", $"centroid_id")
    // every hit's vector must live in one of its query's probed clusters
    val cents = IvfIndex.centroids(spark, dir)
    val probeW = Window.partitionBy($"q_id").orderBy($"ccos".desc, $"centroid_id")
    val probed = queries.crossJoin(broadcast(cents))
      .select($"q_id", $"centroid_id",
        VectorOps.cosine($"q_emb", $"cemb", scale = 6).as("ccos"))
      .withColumn("rn", row_number().over(probeW))
      .filter($"rn" <= 2)
      .select($"q_id", $"centroid_id")
    val bad = out.join(assigned, "vec_id")
      .join(probed, Seq("q_id", "centroid_id"), "left_anti")
    assert(bad.isEmpty)
    assert(out.count() > 0)
    // and the scan itself is partition-pruned to the probed directories
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters: [centroid_id"),
      planStr.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
  }
}
