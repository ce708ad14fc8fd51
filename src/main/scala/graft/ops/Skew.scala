package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for shuffle operations (SURVEY §2 scale posture; the
 * 100 TB concern: one hot key floods one reducer).
 *
 * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) handles most cases
 * at runtime; these explicit forms cover what AQE cannot: a hot key inside
 * a single un-splittable reduction (final aggregation of a monster group)
 * and engines/plans where the runtime re-plan is unavailable.
 *
 * Both transforms are pure refactorings — result multisets are identical to
 * the unsalted originals (spec-checked).
 */
object Skew {

  /**
   * Salted equi-join: the big (skewed) side gets a per-row salt; the small
   * side is replicated once per salt value; the join key becomes
   * (key, salt), so a hot key's rows spread over `nSalts` reducers.
   * Small-side cost: nSalts x rows — keep it for genuinely small dims.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 nSalts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0)
    // right/full outer would emit one null-extended row PER SALT COPY for an
    // unmatched small-side key — only joins that preserve the big side (or
    // filter by it) keep the unsalted multiset
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "semi", "left_anti", "leftanti", "anti")
        .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins of the big side, not $joinType")
    // any row->salt assignment is correct; hashing the whole row keeps it
    // deterministic for tests without coordinating with the key distribution
    val bigS = big.withColumn("_salt",
      pmod(hash(struct(big.columns.toIndexedSeq.map(col): _*)), lit(nSalts)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    bigS.join(smallS, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /**
   * Two-stage (salted) aggregation for algebraic aggregates: partial
   * groupBy on (keys, salt), final on keys. Splits the reduction tree of a
   * hot key across `nSalts` reducers before the (now tiny) final combine.
   */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                nSalts: Int = 16): DataFrame = {
    val salt = pmod(hash(struct(df.columns.toIndexedSeq.map(col): _*)), lit(nSalts))
    df.withColumn("_salt", salt)
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
  }

  /** Top-`frac` hot keys of `key` by frequency — the monitoring half of skew
    * handling (decide WHICH keys need salting before paying for it).
    *
    * Single pass over `df`: the grand total is summed FROM the per-key
    * counts (no separate `count()` action re-scanning the input, no global
    * window funneling every distinct key through one reducer). Both
    * branches hang off the identical groupBy exchange, so exchange reuse
    * runs the scan+shuffle once; the 1-row total is broadcast back. */
  def hotKeys(df: DataFrame, key: String, minShare: Double): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).cast("double").as("_total"))
    counts.crossJoin(broadcast(total))
      .filter(col("n") >= lit(minShare) * col("_total"))
      .select(col(key), col("n"))
      .orderBy(col("n").desc, col(key))
  }
}
