package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the training-corpus export family beyond the oracle's
  * value-parity gate: chunk coverage/overlap invariants, decontamination
  * set algebra, masking irreversibility, shard balance + determinism. */
class CorpusSpec extends SparkSpec {

  import spark.implicits._

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf001)

  test("chunk_overlap: chunks cover every token and adjacent chunks overlap") {
    val docs = graft.lake.Tables.documents(spark, sf001)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .as[(Long, Int)].collect().toMap
    val chunks = q("chunk_overlap")
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"))
      .as[(Long, Long, Long)].collect()
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet.filter(docs(_) > 0))
    for ((docId, cs) <- byDoc) {
      val n = docs(docId)
      val sorted = cs.sortBy(_._2)
      // starts are 1 + 30*k while <= n: chunk count is ceil(n / 30)
      assert(sorted.length == (n + 29) / 30, s"doc $docId chunk count")
      // every chunk but the last is full-width or end-clamped
      for (((_, k, len), i) <- sorted.zipWithIndex) {
        val start = 1 + 30 * k
        val expect = math.min(40, n - start + 1)
        assert(len == expect, s"doc $docId chunk $k length")
        assert(i == k, s"doc $docId chunk ids must be dense")
      }
      // coverage: last chunk reaches the last token
      val (_, lastK, lastLen) = sorted.last
      assert(1 + 30 * lastK + lastLen - 1 == n, s"doc $docId coverage")
    }
  }

  test("decontam_overlap: flagged docs share a shingle with the eval set; eval docs never appear") {
    val out = q("decontam_overlap")
      .select(col("doc_id"), col("n_overlap"), col("n_shingles"))
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty, "synthetic corpus has heavy 3-gram overlap")
    for ((id, nOv, nSh) <- out) {
      assert(id % 97 != 0, "eval docs must not be reported as contaminated")
      assert(nOv >= 1 && nOv <= nSh)
    }
  }

  test("pii_mask_customers: masked output carries no digits and tokens are stable") {
    val out = q("pii_mask_customers")
      .select(col("name_masked"), col("name_token")).as[(String, String)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (m, _) => !m.exists(_.isDigit) })
    // pseudonym is deterministic: same input -> same token across runs
    val again = q("pii_mask_customers")
      .select(col("name_token")).as[String].collect()
    assert(out.map(_._2).sameElements(again))
  }

  test("shard_assign: a permutation, dense per-shard positions, no shard > 2x mean") {
    val out = q("shard_assign")
      .select(col("doc_id"), col("shard"), col("pos"))
      .as[(Long, Long, Int)].collect()
    val nDocs = graft.lake.Tables.documents(spark, sf001).count()
    assert(out.length == nDocs, "every doc gets exactly one shard slot")
    assert(out.map(_._1).distinct.length == out.length)
    for ((shard, rows) <- out.groupBy(_._2)) {
      val ps = rows.map(_._3).sorted
      assert(ps.head == 1 && ps.last == rows.length,
        s"shard $shard positions must be dense 1..n")
      assert(rows.length <= 2 * nDocs / 8 + 1, s"shard $shard is hot")
    }
  }

  /** Brute-force per-source distinct 8-token span sets from the raw text. */
  private lazy val spansBySource: Map[String, Set[String]] =
    graft.lake.Tables.documents(spark, sf001)
      .select(col("source"), col("text")).as[(String, String)].collect()
      .groupBy(_._1).map { case (src, ds) =>
        src -> ds.flatMap { case (_, text) =>
          text.split(" ").sliding(8).filter(_.length == 8).map(_.mkString(" "))
        }.toSet
      }

  test("dedup_source_span_matrix equals brute-force pairwise intersections") {
    val got = q("dedup_source_span_matrix")
      .select(col("source_a"), col("source_b"), col("n_shared_spans"))
      .as[(String, String, Long)].collect().toSeq.sorted
    val srcs = spansBySource.keys.toSeq.sorted
    val expect = (for {
      a <- srcs; b <- srcs if a < b
      n = (spansBySource(a) & spansBySource(b)).size.toLong if n > 0
    } yield (a, b, n)).sorted
    assert(got == expect)
  }

  test("profile_source_gini equals the literal rank formula") {
    val masses = graft.lake.Tables.documents(spark, sf001)
      .groupBy(col("source")).agg(sum(col("n_chars")).as("m"))
      .select(col("m")).as[Long].collect()
    val sorted = masses.sorted // ties permute freely — sum is invariant
    val n = sorted.length.toLong
    val tot = sorted.sum
    val num2 = sorted.zipWithIndex.map { case (x, i) => 2L * (i + 1) * x }.sum
    val row = q("profile_source_gini").collect().head
    assert(row.getAs[Long]("n_sources") == n)
    assert(row.getAs[Long]("total_chars") == tot)
    assert(row.getAs[Double]("gini") ==
      (num2 - (n + 1) * tot).toDouble / (n * tot))
  }

  test("dedup_source_overlap_kmv: sketch estimate from true per-source minima") {
    def hv(s: String): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(15), 16)
    val sketches = spansBySource.view
      .mapValues(_.toSeq.map(hv).distinct.sorted.take(128)).toMap
    val rows = q("dedup_source_overlap_kmv").collect()
    val srcs = sketches.keys.toSeq.sorted
    assert(rows.length == srcs.size * (srcs.size - 1) / 2)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(a < b)
      val (ska, skb) = (sketches(a).toSet, sketches(b).toSet)
      val unionK = (ska ++ skb).toSeq.sorted.take(128)
      val c = unionK.count(h => ska(h) && skb(h)).toLong
      assert(r.getAs[Long]("k") == unionK.size.toLong)
      assert(r.getAs[Long]("c") == c)
      assert(r.getAs[Double]("jaccard_est") == c.toDouble / unionK.size)
      val (sa, sb) = (spansBySource(a), spansBySource(b))
      val shared = (sa & sb).size.toLong
      assert(r.getAs[Double]("jaccard_exact") ==
        shared.toDouble / (sa.size + sb.size - shared))
    }
  }

  test("agg_kmv_distinct_spans: estimate from the true k-th minimum hash") {
    val allSpans = spansBySource.values.flatten.toSet
    val hvs = allSpans.toSeq.map { s =>
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(15), 16)
    }.sorted
    val row = q("agg_kmv_distinct_spans").collect().head
    val k = math.min(256, hvs.size)
    assert(row.getAs[Long]("k") == k)
    assert(row.getAs[Long]("kth_hash") == hvs(k - 1))
    assert(row.getAs[Long]("exact_distinct") == hvs.size.toLong)
    val est = (k - 1).toDouble * 1152921504606846976L / hvs(k - 1)
    assert(row.getAs[Double]("est_distinct") == est)
    // sanity of the estimator itself on this corpus: within 3x of truth
    // (k=256 gives ~6% stderr at large n; tiny sf0.001 spans are looser)
    assert(est > hvs.size / 3.0 && est < hvs.size * 3.0)
  }
}
