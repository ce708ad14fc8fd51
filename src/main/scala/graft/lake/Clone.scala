package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Shallow clone of a [[Versioned]] table — Delta's `CLONE ... SHALLOW` on
 * this layout: the clone's published version is a one-file `_ref` POINTER
 * at the source's live data directory, so cloning a 100 TB table costs one
 * metadata write, not a copy. Readers resolve the pointer transparently
 * ([[Versioned.dataDir]]); the clone then versions INDEPENDENTLY — a
 * republish/materialize on the clone writes real data dirs on top and the
 * source never sees it.
 *
 * Contract (the same one Delta's shallow clones carry):
 *  - the pointer names the source's RESOLVED data dir, so cloning a clone
 *    still points at real data — refs never chain;
 *  - a ref version owns no data: file-targeted DML ([[Upsert]],
 *    [[Forget.purge]], [[Compact.compactVersion]]) REJECTS it loudly —
 *    [[materialize]] first (copy-on-write escalation), then merge away;
 *  - VACUUMING THE SOURCE breaks clones that still reference the vacuumed
 *    version dir. Keep source retention ≥ clone lifetime, or materialize
 *    the clone before reclaiming the source.
 *
 * Reference provenance: the reference pipeline re-uploads whole day
 * partitions to stage experiments (`s3_loader.py`); a shallow clone is the
 * zero-copy version of that staging story (dev/test sandboxes over prod
 * data, experiment pinning, blue/green cutover).
 */
object Clone {

  /** Publish the source's LIVE snapshot as the next version of `dst` —
    * zero data movement. Returns the clone's new version. */
  def shallow(spark: SparkSession, src: String, dst: String): Long = {
    val srcV = Versioned.currentVersion(spark, src).getOrElse(
      throw new IllegalStateException(s"no published version at $src"))
    // resolve through any existing ref so the pointer is always one hop
    val dataDir = Versioned.dataDir(spark, src, srcV)
    require(new Path(dataDir).isAbsolute,
      s"shallow clone needs an absolute source path, got $dataDir")
    Versioned.publishWith(spark, dst) { dir =>
      val f = new Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      f.mkdirs(new Path(dir))
      val out = f.create(new Path(s"$dir/_ref"), true)
      try out.write(dataDir.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Copy-on-write escalation: republish the clone's live snapshot as REAL
    * data files, after which DML applies and the source can be vacuumed
    * freely. No-op (returns the live version) when already materialized. */
  def materialize(spark: SparkSession, table: String): Long = {
    val live = Versioned.currentVersion(spark, table).getOrElse(
      throw new IllegalStateException(s"no published version at $table"))
    if (!Versioned.isShallowRef(spark, table, live)) live
    else Versioned.publish(Versioned.readVersion(spark, table, live), table)
  }
}
