package graft.vectors

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/**
 * Persisted IVF (inverted-file) vector index: the build/persist/probe
 * lifecycle behind the `ann_cosine_topk_ivf` catalog query, as a reusable
 * component. Layout:
 *
 *   {dir}/centroids             k rows (centroid_id, cemb: array<double>, c_nrm)
 *   {dir}/assignments           hive-partitioned by centroid_id; each row
 *                               carries its vector AND its precomputed L2
 *                               norm (`nrm`) — cosine at search time is one
 *                               dot product per candidate, norms come from
 *                               the index bytes
 *
 * Probing N clusters therefore reads ONLY those partition directories —
 * Catalyst partition pruning does the "inverted file" part, which is
 * exactly how a 100 TB corpus avoids touching 1-nProbes/k of its files.
 *
 * Determinism: centroids initialize from `vec_id % k` (no RNG), every
 * mean is rounded to 6dp, ties break on ids — same index bytes on every
 * build over the same corpus.
 */
object IvfIndex {

  /** On-disk format version. v2 = norm-carrying layout (`nrm` on
    * assignments, `c_nrm` on centroids). Bump when the layout changes so a
    * stale index fails fast with a rebuild message instead of an
    * UNRESOLVED_COLUMN error deep in analysis. */
  val FormatVersion = 2
  private val VersionFile = "ivf_format_version"

  /** Mean vectors in ONE hash aggregate via the [[graft.functions.VectorSum]]
    * elementwise-sum UDAF (map-side partials, one shuffle of k×dim partial
    * sums) — same arithmetic as avg (sum/count, round(6) absorbs
    * accumulation-order ulps). Replaces the posexplode → groupBy(centroid,
    * pos) → regroup build, which materialized dim× the rows and shuffled
    * twice. */
  private def centroidsOf(assigned: DataFrame): DataFrame = {
    val vsum = udaf(new graft.functions.VectorSum)
    assigned
      .groupBy(col("centroid_id"))
      .agg(vsum(col("embedding").cast("array<double>")).as("vs"),
        count(col("embedding")).as("cnt"))
      .select(col("centroid_id"),
        transform(col("vs"), x => round(x / col("cnt"), 6)).as("cemb"))
      .withColumn("c_nrm", VectorOps.norm(col("cemb")))
  }

  /** `emb` must carry (vec_id, embedding, nrm); output keeps all three plus
    * the winning centroid_id. Norms come precomputed from both sides — one
    * dot product per (vector, centroid) pair. */
  private def assignTo(emb: DataFrame, centroids: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("centroid_id"))
    emb.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("centroid_id"),
        VectorOps.cosinePre(col("embedding"), col("cemb"),
          col("nrm"), col("c_nrm"), scale = 6).as("ccos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("centroid_id"))
  }

  /** Build the index with `iters` Lloyd iterations from the deterministic
    * `vec_id % k` seed, and persist it under `dir`. Vector norms are
    * computed once here and stored in the posting lists. */
  def build(emb: DataFrame, dir: String, k: Int, iters: Int = 2): Unit = {
    require(k > 0 && iters >= 0)
    val embN = emb.select(col("vec_id"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"))
    var assigned = embN.withColumn("centroid_id",
      pmod(col("vec_id"), lit(k)).cast("int"))
    var cents = centroidsOf(assigned)
    (0 until iters).foreach { _ =>
      assigned = assignTo(embN, cents)
      cents = centroidsOf(assigned)
    }
    cents.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    assigned.write.partitionBy("centroid_id").mode("overwrite")
      .parquet(s"$dir/assignments")
    writeVersion(emb.sparkSession, dir)
  }

  private def writeVersion(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, VersionFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.writeBytes(FormatVersion.toString) finally out.close()
  }

  /** Fail fast on an index written by an older build: read the version
    * marker (absent on pre-v2 indexes) and demand the current format. */
  private def requireVersion(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, VersionFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val found =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim.toInt)
        finally in.close()
      }
    require(found.contains(FormatVersion),
      s"IVF index at $dir has format ${found.getOrElse("<none>")} but this " +
        s"library reads format $FormatVersion; rebuild it with IvfIndex.build")
  }

  def centroids(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/centroids")

  /** The on-disk format gained precomputed norms (`nrm` on assignments,
    * `c_nrm` on centroids). An index persisted by an older build would
    * otherwise fail deep in analysis with UNRESOLVED_COLUMN — detect the
    * missing columns up front and say what to do about it. */
  private def requireNormFormat(df: DataFrame, col: String, dir: String): Unit =
    require(df.columns.contains(col),
      s"IVF index at $dir predates the norm-carrying format (missing '$col'); " +
        "rebuild it with IvfIndex.build")

  /**
   * Probe: score queries against the (broadcast) centroids, keep each
   * query's top `nProbes` clusters, then scan ONLY those assignment
   * partitions and return the exact top-`k` within them. With
   * `nProbes = number of clusters` this equals brute force.
   *
   * The probe plan (crossJoin + cosine + window) is materialized ONCE via
   * `localCheckpoint` — blocks live on the executors, never the driver —
   * and both consumers derive from it: the join side, and the static
   * partition-prune literals via a distinct-ids collect that is bounded by
   * the number of CLUSTERS (index metadata, not data; ≤ k values regardless
   * of query count). The probe side is broadcast only while the probe-row
   * count is small (`maxBroadcastProbes`); past that the q_emb payload
   * would strain driver/broadcast limits, so a big query batch takes the
   * shuffled hash join on centroid_id instead.
   *
   * `queries`: (q_id, q_emb). Returns (q_id, vec_id, cos_sim, rn).
   */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
             nProbes: Int, k: Int,
             maxBroadcastProbes: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireVersion(spark, dir)
    val cents = centroids(spark, dir)
    requireNormFormat(cents, "c_nrm", dir)
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("ccos").desc, col("centroid_id"))
    val probes = queries
      .withColumn("q_nrm", VectorOps.norm(col("q_emb")))
      .crossJoin(broadcast(cents))
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("centroid_id"),
        VectorOps.cosinePre(col("q_emb"), col("cemb"),
          col("q_nrm"), col("c_nrm"), scale = 6).as("ccos"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbes)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("centroid_id"))
      .localCheckpoint(true)
    // Static partition pruning: filter the hive partition column with
    // literals — the scan then LISTS only the probed directories,
    // guaranteed, rather than relying on runtime dynamic pruning. Only the
    // ≤ k distinct cluster ids cross to the driver, read off the
    // checkpointed blocks (the probe subplan does not re-execute).
    val probedIds = probes.select(col("centroid_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val assignments = spark.read.parquet(s"$dir/assignments")
      .filter(col("centroid_id").isin(probedIds: _*))
    requireNormFormat(assignments, "nrm", dir)
    // count() is a cheap checkpointed-block scan, not a probe re-plan
    val probeSide =
      if (probes.count() <= maxBroadcastProbes) broadcast(probes) else probes
    val scored = assignments.join(probeSide, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        VectorOps.cosinePre(col("q_emb"), col("embedding"),
          col("q_nrm"), col("nrm")).as("cos_sim"))
    VectorOps.topK(scored, "q_id", "vec_id", "cos_sim", k)
      .orderBy(col("q_id"), col("rn"))
  }
}
