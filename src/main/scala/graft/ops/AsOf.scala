package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Generic as-of join: for every left row, attach the most recent right row
 * with the same key at-or-before (or strictly-before) the left row's time.
 *
 * Implementation is the merge-carry formulation, NOT a per-row range join:
 * union both sides tagged, ONE window over (key, time) carries the latest
 * right payload forward, then keep the left rows. Cost = one shuffle on the
 * key + an in-partition sort — the same sort a sort-merge join would do,
 * with no quadratic row-pair expansion; this is the 100 TB-safe shape for
 * "price as of trade time" / "last touch before event" joins.
 *
 * Tie policy: `strict = false` lets a right row at exactly the left time
 * match; `strict = true` requires it to be strictly earlier. Among right
 * rows at the same instant the largest payload wins (deterministic).
 */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, payloadCols: Seq[String],
               strict: Boolean = true): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one right payload column")
    val (rightTag, leftTag) = if (strict) (1, 0) else (0, 1)
    val payloadType = StructType(
      right.select(payloadCols.map(col): _*).schema.fields)
    val rowType = StructType(left.schema.fields)
    val l = left.select(
      col(key).as("_k"), col(leftTs).as("_ts"), lit(leftTag).as("_tag"),
      lit(null).cast(payloadType).as("_payload"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("_row"))
    // SQL join semantics: a NULL key matches nothing — without this filter
    // the window's null partition would hand null-key left rows a payload
    val r = right.filter(col(key).isNotNull).select(
      col(key).as("_k"), col(rightTs).as("_ts"), lit(rightTag).as("_tag"),
      struct(payloadCols.map(col): _*).as("_payload"),
      lit(null).cast(rowType).as("_row"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_tag"), col("_payload"))
      .rowsBetween(Window.unboundedPreceding, -1)
    l.unionByName(r)
      .withColumn("_asof",
        last(when(col("_tag") === rightTag, col("_payload")), ignoreNulls = true)
          .over(w))
      .filter(col("_tag") === leftTag)
      .select(col("_row.*") +:
        payloadCols.map(c => col("_asof").getField(c).as(s"asof_$c")): _*)
  }
}
