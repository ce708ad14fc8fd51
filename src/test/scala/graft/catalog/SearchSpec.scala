package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic checks for the retrieval family — value-level parity with the
  * DuckDB oracle is tools/compare.py; this pins the retrieval invariants a
  * hash compare can't express. */
class SearchSpec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf001)

  test("phrase matches agree with a driver-side token scan") {
    val got = q("search_phrase").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val t = r.getString(1).split(" ")
        val n = t.indices.dropRight(1)
          .count(i => t(i) == "slow" && t(i + 1) == "query")
        r.getLong(0) -> n.toLong
      }
      .filter(_._2 > 0).toMap
    assert(got == want)
  }

  test("conjunctive hits contain every query term") {
    val hits = q("search_conjunctive").collect().map(_.getLong(0)).toSet
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    assert(hits.nonEmpty)
    hits.foreach { id =>
      assert(Seq("spark", "merge", "dup").forall(docs(id).contains),
        s"doc $id missing a query term")
    }
    // and no non-hit doc has all three
    docs.filterNot(d => hits(d._1)).foreach { case (id, toks) =>
      assert(!Seq("spark", "merge", "dup").forall(toks.contains),
        s"doc $id has all terms but was not returned")
    }
  }

  test("postings positions are 1-based, sorted, and count-consistent") {
    q("search_postings").collect().foreach { r =>
      val positions = r.getString(4).split(",").map(_.toLong)
      assert(positions.length == r.getLong(2))
      assert(positions.head == r.getLong(3))
      assert(positions.sameElements(positions.sorted))
      assert(positions.head >= 1)
    }
  }

  test("bm25: the rare term dominates a common term at equal tf") {
    // idf(dup) >> idf(spark); for any returned doc holding both terms,
    // per-occurrence contribution of 'dup' must exceed 'spark''s.
    val rows = q("search_bm25_topk").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse), "not rank-ordered")
    rows.filter(r => r.getDouble(4) > 0 && r.getDouble(2) > 0)
      .foreach { r => assert(r.getDouble(4) > r.getDouble(2)) }
    // fixed-order row-wise sum: score == s_spark + s_merge + s_dup exactly
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2) + r.getDouble(3) + r.getDouble(4))
    }
  }

  test("known-item ranks agree with a driver-side intersection ranking") {
    val corpus = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")
        .groupBy(identity).view.mapValues(_.length.toLong).toMap).toMap
    val df = corpus.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val rows = q("search_known_item_rank").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val probe = r.getAs[Long]("q_doc")
      assert(probe % 97 == 0)
      val qTerms = corpus(probe).keys.toSeq
        .sortBy(t => (df(t), t)).take(10)
        .map(t => t -> corpus(probe)(t))
      val ranked = corpus.toSeq.map { case (d, tf) =>
        val shared = qTerms.count { case (t, _) => tf.contains(t) }
        val mass = qTerms.map { case (t, qtf) =>
          math.min(tf.getOrElse(t, 0L), qtf)
        }.sum
        (d, shared, mass)
      }.filter(_._2 > 0)
        .sortBy { case (d, s, m) => (-s, -m, d) }
      val rank = ranked.indexWhere(_._1 == probe) + 1
      assert(r.getAs[Long]("self_rank") == rank.toLong)
      val rr = r.getAs[Long]("rr_2520")
      if (rank <= 10) assert(rr * rank == 2520L) // exact lcm scaling
      else assert(rr == 0L)
    }
  }
}
