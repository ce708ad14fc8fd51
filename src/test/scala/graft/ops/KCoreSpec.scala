package graft.ops

import graft.SparkSpec

class KCoreSpec extends SparkSpec {

  import spark.implicits._

  test("one peel strips a tail; the triangle core survives") {
    // triangle 1-2-3 with a tail 3-4
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val out = KCore.coreDegrees(e, k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("k above the densest core empties the graph") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    assert(KCore.peelEdges(e, k = 3, rounds = 1).isEmpty)
  }

  test("peeling cascades: each round can expose new low-degree nodes") {
    // a path 1-2-3-4-5: k=2 peels endpoints each round, two rounds in
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val r1 = KCore.peelEdges(e, 2, 1).as[(Long, Long)].collect().toSet
    val r2 = KCore.peelEdges(e, 2, 2).as[(Long, Long)].collect().toSet
    assert(r1 == Set((2L, 3L), (3L, 4L)))
    assert(r2 == Set.empty[(Long, Long)])
  }

  test("edge set shrinks monotonically across rounds") {
    val e = (0 until 200)
      .map(i => (i.toLong % 23, (i.toLong * 7 + 1) % 23))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
      .toDF("u", "v")
    val sizes = (1 to 4).map(r => KCore.peelEdges(e, 3, r).count())
    assert(sizes.zip(sizes.tail).forall { case (a, b) => b <= a })
  }

  test("surviving nodes all meet the degree floor within the final subgraph minus one round") {
    // after the LAST peel every reported degree was >= k in the round that
    // admitted it; degrees in the final edge set may dip below k only for
    // nodes that would be removed by a further round — verify one more
    // round removes exactly those
    val e = (0 until 300)
      .map(i => ((i.toLong * 13) % 40, (i.toLong * 29 + 3) % 40))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
      .toDF("u", "v")
    val d3 = KCore.coreDegrees(e, 3, 3).as[(Long, Long)].collect().toMap
    val d4 = KCore.coreDegrees(e, 3, 4).as[(Long, Long)].collect().toMap
    val removed = d3.keySet.diff(d4.keySet)
    assert(removed.forall(n => d3(n) < 3))
  }
}
