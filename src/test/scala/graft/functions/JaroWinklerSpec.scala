package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/**
 * Kernel checks for [[JaroWinklerImpl]]: the textbook Winkler-1990 vectors,
 * the DuckDB empty-string convention the oracle twin imposes, a
 * straight-line reference re-derivation on adversarial shapes, and the
 * Column-API path through a real session (interpreted AND codegen'd plans
 * agree).
 */
class JaroWinklerSpec extends graft.SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook vectors (Winkler 1990)") {
    // martha/marhta: m=6, t=1, jaro=0.944..., prefix 3 -> 0.9611...
    assert(jw("martha", "marhta") == 0.9611111111111111)
    // dixon/dicksonx: m=4, t=0, jaro=0.7666..., prefix 2 -> 0.8133...
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(jw("abc", "abc") == 1.0)
  }

  test("DuckDB conventions: empty strings and no-match score 0") {
    assert(jw("", "") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "xyz") == 0.0)
  }

  test("no Winkler boost at or below the 0.7 threshold") {
    // jaro exactly (1/3)(m/l1+m/l2+(m-t)/m): find a <=0.7 case with shared
    // prefix — 'ab'/'abcdefgh': m=2, t=0 -> (1 + 2/8 + 1)/3 = 0.75 > 0.7
    // gets boost; 'ab'/'abcdefghij' win=4, m=2 -> (1+0.2+1)/3 = 0.733 boost;
    // 'a'/'abcdefgh' win=3, m=1 -> (1+1/8+1)/3 = 0.7083 boost. Use a
    // transposed tail to push under: 'abcdxx'/'abdcyy' m=4,t=1 ->
    // (4/6+4/6+3/4)/3 = 0.694 -> NO boost despite 2-char prefix.
    val v = jw("abcdxx", "abdcyy")
    assert(math.abs(v - (4.0 / 6 + 4.0 / 6 + 3.0 / 4) / 3) < 1e-15)
  }

  test("matches a straight-line reference on adversarial shapes") {
    def ref(s1: String, s2: String): Double = {
      val (l1, l2) = (s1.length, s2.length)
      if (l1 == 0 || l2 == 0) return 0.0
      val win = math.max(math.max(l1, l2) / 2 - 1, 0)
      val used = Array.fill(l2)(false)
      val pairs = for {
        i <- 0 until l1
        j <- (math.max(0, i - win) to math.min(l2 - 1, i + win))
          .find(j => !used(j) && s1(i) == s2(j)).toSeq
      } yield { used(j) = true; (i, j) }
      val m = pairs.length
      if (m == 0) return 0.0
      val right = pairs.map(_._2).sorted
      val t = pairs.map(_._2).zip(right).count { case (a, b) => s2(a) != s2(b) } / 2
      val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
      if (jaro <= 0.7) jaro
      else {
        val p = s1.zip(s2).take(4).takeWhile { case (a, b) => a == b }.length
        jaro + p * 0.1 * (1.0 - jaro)
      }
    }
    val rnd = new scala.util.Random(42)
    val words = Vector("spark", "scan", "agg", "row", "table", "batch")
    for (_ <- 1 to 500) {
      val a = Vector.fill(rnd.nextInt(6))(words(rnd.nextInt(words.length))).mkString(" ")
      val b = Vector.fill(rnd.nextInt(6))(words(rnd.nextInt(words.length))).mkString(" ")
      assert(jw(a, b) == ref(a, b), s"mismatch on '$a' vs '$b'")
    }
  }

  test("Column API: codegen and interpreted plans agree") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("", ""),
      ("key agg row", "key row agg")).toDF("a", "b")
    val expected = df.collect().map(r =>
      jw(r.getString(0), r.getString(1))).toSeq
    val viaExpr = df.select(jaro_winkler(org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b"))).collect().map(_.getDouble(0)).toSeq
    assert(viaExpr == expected)
    // force the interpreted path too (wholeStage off)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(jaro_winkler(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b"))).collect().map(_.getDouble(0)).toSeq
      assert(interp == expected)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
