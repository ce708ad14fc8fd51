package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kneser-Ney bigram model invariants the oracle can't see from the
  * top-100 cut alone. */
class LmKnSpec extends SparkSpec {
  import spark.implicits._

  test("KN closure: per context w1, probability mass sums to exactly 1") {
    // interpolated KN is a proper conditional distribution over the WHOLE
    // vocabulary: observed continuations carry num = max(4*c12-3,0)*T +
    // 3*n_after*n_before, and every unseen continuation w2 carries the
    // pure interpolation mass 3*n_after*n_before(w2). Since the
    // continuation-count total over all w2 types equals T (each bigram
    // type contributes once), per context:
    //   sum_observed(num) + 3*n_after*(T - sum_observed(n_before)) == den
    // — checked on exact integer columns, no IEEE anywhere.
    val t = Lm.knTableFull(spark, sf001).localCheckpoint()
    val bad = t.groupBy($"w1")
      .agg(sum($"kn_num").as("s"), first($"kn_den").as("d"),
        first($"n_after").as("na"), sum($"n_before").as("nbs"),
        first($"n_types").as("tt"))
      .filter($"s" + lit(3L) * $"na" * ($"tt" - $"nbs") =!= $"d")
    assert(bad.isEmpty, bad.limit(5).collect().mkString(", "))
  }

  test("every probability is in (0, 1] and the context max dominates") {
    val t = Lm.knTableFull(spark, sf001)
    val range = t.agg(min($"p_kn").as("mn"), max($"p_kn").as("mx"))
      .as[(Double, Double)].head()
    assert(range._1 > 0.0 && range._2 <= 1.0, range.toString)
  }
}
