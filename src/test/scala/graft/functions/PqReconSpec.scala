package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Tables
import graft.ops.VectorOps

/** The pq_recon codegen kernel must replay the explode → broadcast-join →
  * min(struct) hash-aggregate formulation it replaced BITWISE — same
  * round(Σ(x−y)², 6) fold, same lowest-code ties, same concatenation. */
class PqReconSpec extends SparkSpec {

  import spark.implicits._

  private val m = 8; private val k = 32; private val subDim = 8

  // frozen-seed codebooks (ann_pq_seeded's rule) over the sf0.001 corpus
  private lazy val u = Tables.embeddings(spark, sf001)
    .withColumn("nrm", VectorOps.norm(col("embedding")))
    .withColumn("emb_d",
      transform(col("embedding").cast("array<double>"), x => x / col("nrm")))
    .select(col("vec_id"), col("emb_d"))
  private lazy val cents: Array[Array[Array[Double]]] = {
    val seeds = u
      .select(col("emb_d"), md5(col("vec_id").cast("string")).as("h"))
      .orderBy(col("h")).limit(k)
      .collect().map(_.getSeq[Double](0).toArray)
    Array.tabulate(m, k)((mi, ki) =>
      seeds(ki).slice(mi * subDim, (mi + 1) * subDim))
  }

  test("kernel reconstruction is bitwise-equal to the aggregate formulation") {
    val cbRows = for { mi <- 0 until m; ki <- 0 until k }
      yield (mi.toLong, ki.toLong, cents(mi)(ki).toSeq)
    val cb = cbRows.toDF("m", "code", "sub")
    val ms = explode(sequence(lit(0), lit(m - 1))).as("m")
    val sv = u.select(col("vec_id"), ms, col("emb_d"))
      .select(col("vec_id"), col("m").cast("long").as("m"),
        slice(col("emb_d"), col("m") * subDim + 1, lit(subDim)).as("subv"))
    val codes = sv.join(broadcast(cb), Seq("m"))
      .select(col("vec_id"), col("m"), struct(
        round(aggregate(zip_with(col("subv"), col("sub"),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, z) => acc + z), 6).as("d"),
        col("code")).as("dc"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(col("dc")).getField("code").as("code"))
    val oldRecon = codes.join(broadcast(cb), Seq("m", "code"))
      .groupBy(col("vec_id"))
      .agg(flatten(transform(
        sort_array(collect_list(struct(col("m"), col("sub")))),
        x => x.getField("sub"))).as("old"))
    val rows = u
      .select(col("vec_id"), pq_recon(col("emb_d"), cents).as("kern"))
      .join(oldRecon, Seq("vec_id"))
      .as[(Long, Seq[Double], Seq[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, kern, old) =>
      assert(kern.length == old.length, s"vec $id width")
      kern.zip(old).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a) ==
          java.lang.Double.doubleToRawLongBits(b), s"vec $id diverged")
      }
    }
  }

  test("malformed input fails fast; NULL rows propagate NULL") {
    val short2 = Seq(Seq(1.0, 2.0)).toDF("emb_d")
    val ex = intercept[Exception] {
      short2.select(pq_recon(col("emb_d"), cents)).collect()
    }
    def rootMsg(t: Throwable): String = {
      val msg = Option(t.getMessage).getOrElse("")
      if (msg.contains("pq_recon") || t.getCause == null) msg
      else rootMsg(t.getCause)
    }
    assert(rootMsg(ex).contains("expected 64"), s"got: ${rootMsg(ex)}")
    val nullRow = Seq(Option.empty[Seq[Double]]).toDF("emb_d")
    assert(nullRow.select(pq_recon(col("emb_d"), cents))
      .collect().head.isNullAt(0))
  }

  test("structurally equal codebooks canonicalize equal (CSE-visible)") {
    // two pq_recon expressions built from DISTINCT but element-equal
    // codebook arrays: case-class equality on Array is reference-based,
    // so without the structural override these never compare equal and
    // Catalyst's subexpression elimination misses the dedup
    val copy: Array[Array[Array[Double]]] =
      cents.map(_.map(_.clone()))
    assert(!(copy eq cents))
    val child =
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("emb_d")
    val a = PqRecon(child, cents)
    val b = PqRecon(child, copy)
    assert(a == b)
    assert(a.hashCode() == b.hashCode())
    assert(a.semanticEquals(b))
    // and a genuinely different codebook still distinguishes
    val tweaked = cents.map(_.map(_.clone()))
    tweaked(0)(0)(0) += 1.0
    assert(a != PqRecon(child, tweaked))
  }
}
