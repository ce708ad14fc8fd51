package graft.lake

import java.io.ByteArrayOutputStream

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.ops.TextOps

/**
 * Per-file TOKEN Bloom sidecars — [[BloomIndex]]'s text twin: file
 * skipping for keyword search over a document table. Key Blooms answer
 * "might this file contain key k"; these answer "might this file contain
 * token t", which turns a conjunctive keyword search over 100 TB of text
 * into a metadata probe (every query token must admit) followed by a scan
 * of only the surviving files — the lake-level leg under the catalog's
 * query-side search family (`search_conjunctive` scans and filters;
 * [[search]] here reads the same semantics off a pruned file list).
 *
 * Layout: `<dir>/_tokbloom/<file>.bloom`, one serialized
 * `org.apache.spark.util.sketch.BloomFilter` of the file's DISTINCT
 * normalized tokens per data file, plus a `_tokbloom/_meta` marker
 * recording the indexed text column and fpp — what lets every later
 * MAINTENANCE pass rebuild the index without being told how it was built.
 *
 * Maintenance contract (the same path the key-Bloom twin rides): layout
 * rewrites ([[Compact.compactVersion]], [[ZOrder.cluster]]) rebuild the
 * whole index via [[rebuildIfIndexed]]; file-targeted DML
 * ([[Upsert]]/[[Forget.purge]]) byte-copies untouched files' sidecars
 * alongside the files, carries the `_meta` marker, and re-indexes ONLY the
 * rewritten files ([[indexMissing]]) — so index maintenance cost tracks
 * the touched fraction, exactly like `_bloom`/`_stats`.
 *
 * Build shape: one (file, token)-distinct shuffle (per-file vocabularies
 * are Heaps-bounded — far smaller than token occurrences), each group
 * folding executor-side into a filter; only finished bitsets reach the
 * driver. Read shape: sidecars probe driver-side; a file passes only if
 * EVERY query token might be present (a missing sidecar admits — the
 * index is advisory). False positives cost one extra file scan; false
 * negatives are impossible for the INDEXED tokenization: the residual
 * filter re-applies exact token membership, so the pruned read equals the
 * full scan bitwise.
 *
 * Tokenization contract: index and query probe must normalize alike —
 * both go through [[tokensOf]] ([[TextOps.normalize]] + whitespace split),
 * and [[search]] normalizes the probe tokens itself so a caller cannot
 * accidentally query the raw-cased spelling of an indexed token.
 */
object TokenBloom {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bloomDir(dir: String) = new Path(s"$dir/_tokbloom")

  /** One data file's token-Bloom sidecar path (for byte-copy carries —
    * [[Forget.copyUntouched]]'s token twin of `BloomIndex.sidecar`). */
  private[lake] def sidecar(dir: String, fileName: String): Path =
    new Path(bloomDir(dir), s"$fileName.bloom")

  private def metaPath(dir: String) = new Path(bloomDir(dir), "_meta")

  /** The index's build recipe — (textCol, fpp) from `_tokbloom/_meta`.
    * None when `dir` was never token-indexed (or the index predates the
    * marker — then maintenance can't know the text column and the index
    * degrades advisorily, as before). */
  def meta(spark: SparkSession, dir: String): Option[(String, Double)] =
    Versioned.readSmallFile(fs(spark, dir), metaPath(dir)).map { s =>
      val lines = s.linesIterator.toSeq
      (lines.head, lines.lift(1).flatMap(_.toDoubleOption).getOrElse(0.01))
    }

  private def writeMeta(f: FileSystem, dir: String, textCol: String,
                        fpp: Double): Unit = {
    require(!textCol.contains("\n"), s"unsafe column name $textCol")
    val out = f.create(metaPath(dir), true)
    try out.write(s"$textCol\n$fpp"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Carry the `_meta` recipe from `oldDir`'s index into `newDir` (after a
    * file-targeted rewrite byte-copied some sidecars there) so a LATER
    * full rebuild still knows the text column. No-op when `oldDir` carries
    * no marker. */
  private[lake] def carryMeta(spark: SparkSession, oldDir: String,
                              newDir: String): Unit =
    meta(spark, oldDir).foreach { case (c, fpp) =>
      writeMeta(fs(spark, newDir), newDir, c, fpp)
    }

  /** Rebuild the token index of `newDir` when `oldDir` carried one (and a
    * `_meta` recipe saying how) — the maintenance hook
    * [[Compact.compactVersion]] / [[ZOrder.cluster]] call so a layout
    * rewrite doesn't silently degrade keyword search to full scans. */
  private[lake] def rebuildIfIndexed(spark: SparkSession, oldDir: String,
                                     newDir: String): Unit =
    meta(spark, oldDir).foreach { case (c, fpp) =>
      index(spark, newDir, c, fpp)
    }

  /** The indexed tokenization: normalized text, whitespace-split, empties
    * dropped. One definition serves the build, the probe, and the
    * residual filter. */
  def tokensOf(text: Column): Column =
    array_remove(TextOps.tokens(TextOps.normalize(text)), "")

  private def normalizeProbe(spark: SparkSession,
                             tokens: Seq[String]): Seq[String] = {
    import spark.implicits._
    require(tokens.nonEmpty, "no probe tokens")
    val probe = tokens.toDF("t")
      .select(explode(tokensOf(col("t"))).as("t"))
      .as[String].collect().toSeq.distinct
    require(probe.nonEmpty,
      s"probe tokens $tokens normalized to nothing (punctuation-only?) — " +
        "no indexed token could ever match them")
    probe
  }

  private def partFiles(f: FileSystem, dir: String): Seq[Path] =
    f.listStatus(new Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath)

  /** Build one token-Bloom sidecar per `part-*` file already in `dir`,
    * and record the (textCol, fpp) recipe in `_tokbloom/_meta` so layout
    * maintenance can rebuild. `fpp` trades sidecar size against
    * false-positive file scans. */
  def index(spark: SparkSession, dir: String, textCol: String,
            fpp: Double = 0.01): Unit = {
    val f = fs(spark, dir)
    writeMeta(f, dir, textCol, fpp)
    buildFor(spark, dir, textCol, fpp, partFiles(f, dir))
  }

  /** Build sidecars for ONLY the data files of `dir` that lack one — the
    * touched-fraction maintenance hook for file-targeted DML: untouched
    * files' sidecars byte-copied alongside them, rewritten files
    * re-indexed here, recipe from the carried `_meta`. No-op when the dir
    * carries no recipe (never indexed) or nothing is missing. */
  private[lake] def indexMissing(spark: SparkSession, dir: String): Unit =
    meta(spark, dir).foreach { case (textCol, fpp) =>
      val f = fs(spark, dir)
      val missing = partFiles(f, dir)
        .filterNot(p => f.exists(sidecar(dir, p.getName)))
      if (missing.nonEmpty) buildFor(spark, dir, textCol, fpp, missing)
    }

  private def buildFor(spark: SparkSession, dir: String, textCol: String,
                       fpp: Double, files: Seq[Path]): Unit = {
    import spark.implicits._
    if (files.isEmpty) return
    val df = Versioned.readFiles(spark, dir, files.map(_.toString))
    // (file, token) DISTINCT pairs: the shuffle carries per-file
    // vocabularies, not token occurrences
    val pairs = df
      .select(input_file_name().as("f"),
        explode(tokensOf(col(textCol))).as("t"))
      .distinct()
    pairs.persist()
    try {
      // size filters from the LARGEST per-file vocabulary so fpp holds
      // for every file (a global-average sizing would under-provision the
      // biggest files exactly where collisions hurt most); an all-NULL /
      // all-empty corpus yields zero pairs — nothing to index, and max()
      // returns NULL (the getAs-Option guard), not a crash
      val maxVocab = math.max(1000L,
        Option(pairs.groupBy(col("f")).count()
          .agg(max(col("count"))).head().getAs[java.lang.Long](0))
          .map(_.longValue).getOrElse(0L))
      val perFile = pairs.as[(String, String)]
        .groupByKey(_._1)
        .mapGroups { (f, it) =>
          val bf = BloomFilter.create(maxVocab, fpp)
          it.foreach(x => bf.putString(x._2))
          val bos = new ByteArrayOutputStream()
          bf.writeTo(bos)
          (f, bos.toByteArray)
        }
        .collect() // nFiles finished bitsets — metadata-sized
      val f = fs(spark, dir)
      perFile.foreach { case (file, bytes) =>
        val name = new Path(file).getName
        val out = f.create(new Path(bloomDir(dir), s"$name.bloom"), true)
        try out.write(bytes) finally out.close()
      }
    } finally { pairs.unpersist(); () }
  }

  /** Does `file`'s sidecar admit EVERY probe token? (Conjunctive search:
    * a file missing any token cannot hold a matching document.) Missing
    * sidecar = true — advisory index. */
  private def mightContainAll(f: FileSystem, dir: String, fileName: String,
                              tokens: Seq[String]): Boolean = {
    val side = new Path(bloomDir(dir), s"$fileName.bloom")
    !f.exists(side) || {
      val in = f.open(side)
      try {
        val bf = BloomFilter.readFrom(in)
        tokens.forall(bf.mightContainString)
      } finally in.close()
    }
  }

  // the probe-normalized core — callers that already normalized skip the
  // (Spark-action) normalization pass
  private def candidates(spark: SparkSession, dir: String,
                         probe: Seq[String]): Seq[String] = {
    val f = fs(spark, dir)
    f.listStatus(new Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath)
      .filter(p => mightContainAll(f, dir, p.getName, probe))
      .map(_.toString)
  }

  /** Data files whose sidecars admit every (normalized) probe token. */
  def candidateFiles(spark: SparkSession, dir: String,
                     tokens: Seq[String]): Seq[String] =
    candidates(spark, dir, normalizeProbe(spark, tokens))

  /** Conjunctive keyword search reading ONLY Bloom-admitted files; the
    * residual filter re-applies exact token membership, so the result is
    * exactly the full scan's. Honors an evolved dir's schema marker
    * ([[Versioned.readFiles]]). */
  def search(spark: SparkSession, dir: String, textCol: String,
             tokens: Seq[String]): DataFrame = {
    val probe = normalizeProbe(spark, tokens) // ONE normalization pass
    val files = candidates(spark, dir, probe)
    val residual = probe
      .map(t => array_contains(tokensOf(col(textCol)), t))
      .reduce(_ && _)
    if (files.isEmpty)
      Versioned.readDataDir(spark, dir).filter(lit(false)) // schema-stable
    else Versioned.readFiles(spark, dir, files).filter(residual)
  }
}
