package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * CountMinSketch: the mergeable frequency sketch must (a) never
 * underestimate, (b) be EXACT when the width eliminates collisions,
 * (c) merge across arbitrary partitionings to the same grid as one pass
 * (the property that lets day-grain sketches union into a month), and
 * (d) agree with the catalog query's rows-held-as-cells formulation.
 */
class CmsSpec extends SparkSpec {

  import spark.implicits._

  private val depth = 4

  private def sketchOf(keys: Seq[Long], width: Int): Seq[Long] = {
    val cms = udaf(new CountMinSketch(depth, width))
    keys.toDF("k")
      .select(CountMinSketch.cells($"k", depth, width).as("cells"))
      .agg(cms($"cells"))
      .as[Seq[Long]].head()
  }

  // deterministic skewed keys: key i appears ~97/i times (Zipf-ish head)
  private val keys: Seq[Long] =
    (1L to 40L).flatMap(i => Seq.fill((97 / i).toInt)(i))

  test("estimates never underestimate; exact at collision-free width") {
    val width = 1 << 16 // 40 distinct keys: collision odds ~ 40^2/2^17 ≈ 1%
    val sk = sketchOf(keys, width)
    assert(sk.length == depth * width)
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = keys.distinct.toDF("k")
      .select($"k", CountMinSketch.estimate(
        typedLit(sk), $"k", depth, width).as("est"))
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"key $k underestimated: ${est(k)} < $c")
    }
    // at this width the whole head must be collision-free
    assert(exact.count { case (k, c) => est(k) == c } == exact.size)
  }

  test("narrow width overestimates by the collision mass, never under") {
    val width = 8
    val sk = sketchOf(keys, width)
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = keys.distinct.toDF("k")
      .select($"k", CountMinSketch.estimate(
        typedLit(sk), $"k", depth, width).as("est"))
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (k, c) => assert(est(k) >= c) }
    // every cell sum is bounded by the total mass
    assert(est.values.max <= keys.size.toLong)
    // 40 keys in 8 cells: collisions are certain somewhere
    assert(exact.exists { case (k, c) => est(k) > c })
  }

  test("partition-split sketches merge to the single-pass grid") {
    val width = 64
    val one = sketchOf(keys, width)
    // same rows forced through many partials: merge() must reassemble
    val cms = udaf(new CountMinSketch(depth, width))
    val many = keys.toDF("k").repartition(13)
      .select(CountMinSketch.cells($"k", depth, width).as("cells"))
      .agg(cms($"cells"))
      .as[Seq[Long]].head()
    assert(one == many)
    // grid mass: every row lands once per depth row
    assert(one.sum == keys.size.toLong * depth)
  }

  test("malformed cell vectors are rejected") {
    val agg = new CountMinSketch(depth, 16)
    val e1 = intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, Seq(1, 2)) // wrong depth
    }
    assert(e1.getMessage.contains("expected 4"))
    val e2 = intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, Seq(1, 2, 3, 99)) // cell out of width
    }
    assert(e2.getMessage.contains("out of"))
  }

  test("NULL keys are skipped, never hashed onto a phantom key") {
    // without the null guard, concat_ws drops the NULL and hashes the
    // bare row index — every null row would inflate one fixed cell per
    // grid row and the collision mass of any key sharing those cells
    val width = 1 << 10
    val cms = udaf(new CountMinSketch(depth, width))
    val withNulls = (keys.map(Some(_)) ++ Seq.fill(500)(None))
      .toDF("k")
    val sketch = withNulls
      .select(CountMinSketch.cells($"k", depth, width).as("cells"))
      .agg(cms($"cells")).as[Seq[Long]].head()
    // grid total per row == number of NON-NULL keys exactly
    (0 until depth).foreach { j =>
      assert(sketch.slice(j * width, (j + 1) * width).sum == keys.size)
    }
    assert(sketch == sketchOf(keys, width)) // nulls changed nothing
    // estimate of a NULL key is NULL, not a phantom count
    val est = Seq(Tuple1(sketch)).toDF("s")
      .select(CountMinSketch.estimate($"s", lit(null).cast("long"),
        depth, width).as("e"))
      .head()
    assert(est.isNullAt(0))
  }
}
