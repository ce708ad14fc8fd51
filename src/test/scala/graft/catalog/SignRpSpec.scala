package graft.catalog

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Sign-random-projection (ann_signrp_topk) invariants: the projection is
  * exactly the frozen ±1 matrix, and the reduced-space top-10 retains a
  * usable fraction of the exact full-dimension top-10 (the dial a deployment
  * tunes with RpDims; the catalog pins 16 of 64). */
class SignRpSpec extends SparkSpec {
  import spark.implicits._

  test("projecting the i-th basis vector reads out matrix column i") {
    val i = 13 // arbitrary source dimension
    val basis = Seq(Seq.tabulate(64)(d => if (d == i) 1.0f else 0.0f))
      .toDF("embedding")
    val out = basis.select(Vectors.rpProject(col("embedding")).as("p"))
      .as[Seq[Double]].head()
    val expected = (0 until Vectors.RpDims).map(j => Vectors.rpSigns(j)(i).toDouble)
    assert(out == expected)
  }

  test("kernel projection is bitwise-equal to the chained-expression form") {
    // the round-11 codegen kernel replaced a 16x64-term Catalyst tree;
    // this pins the exact left-to-right accumulation it must replay
    val chained = array((0 until Vectors.RpDims).map { j =>
      (0 until 64).map { i =>
        element_at(col("embedding"), i + 1).cast("double") *
          lit(Vectors.rpSigns(j)(i).toDouble)
      }.reduceLeft(_ + _)
    }: _*)
    val rows = graft.lake.Tables.embeddings(spark, sf001)
      .select(Vectors.rpProject(col("embedding")).as("k"), chained.as("c"))
      .as[(Seq[Double], Seq[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, c) =>
      assert(k.zip(c).forall { case (a, b) =>
        java.lang.Double.doubleToRawLongBits(a) ==
          java.lang.Double.doubleToRawLongBits(b)
      }, "kernel diverged from the chained accumulation")
    }
  }

  test("malformed embeddings fail fast instead of projecting silently") {
    // a short embedding must not silently truncate (the chained element_at
    // form propagated NULL; the kernel's output type forbids null — so the
    // contract is an explicit error, never a wrong projection)
    val short2 = Seq(Seq(1.0f, 2.0f)).toDF("embedding")
    val ex = intercept[Exception] {
      short2.select(Vectors.rpProject(col("embedding"))).collect()
    }
    def rootMsg(t: Throwable): String = {
      val m = Option(t.getMessage).getOrElse("")
      if (m.contains("sign_rp_project") || t.getCause == null) m
      else rootMsg(t.getCause)
    }
    assert(rootMsg(ex).contains("expected 64"), s"got: ${rootMsg(ex)}")

    // null ELEMENT inside a full-width embedding: same fail-fast contract
    val holey = Seq(Seq.tabulate(64)(i => if (i == 7) null
      else java.lang.Double.valueOf(i.toDouble))).toDF("embedding")
    val ex2 = intercept[Exception] {
      holey.select(Vectors.rpProject(col("embedding"))).collect()
    }
    assert(rootMsg(ex2).contains("null element"), s"got: ${rootMsg(ex2)}")

    // a NULL embedding row still propagates NULL (nullSafeEval path)
    val nullRow = Seq(Option.empty[Seq[Float]]).toDF("embedding")
    val out = nullRow.select(Vectors.rpProject(col("embedding")).as("p"))
      .collect()
    assert(out.head.isNullAt(0))
  }

  test("matrix is balanced enough to carry signal (no degenerate rows)") {
    // a row of all-same signs would make that coordinate a plain sum — still
    // valid JL but a red flag for the hash; expect every row mixed
    for (j <- 0 until Vectors.RpDims) {
      val pos = Vectors.rpSigns(j).count(_ > 0)
      assert(pos >= 16 && pos <= 48, s"row $j unbalanced: $pos positives")
    }
  }

  test("recall harness agrees with an independent intersection (sf0.001)") {
    val brute = SparkEntry.queries("ann_cosine_topk_brute")(spark, sf001)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rp = SparkEntry.queries("ann_signrp_topk")(spark, sf001)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val harness = SparkEntry.queries("ann_signrp_recall")(spark, sf001)
      .select($"q_id", $"n_hits").as[(Long, Long)].collect().toMap
    for ((q, bset) <- brute) {
      val expect = bset.intersect(rp.getOrElse(q, Set.empty)).size.toLong
      assert(harness(q) == expect, s"q=$q harness=${harness(q)} expect=$expect")
    }
    // the measured dial on THIS corpus (documented in the scaladoc): the
    // synthetic embeddings have no wide-margin neighbor structure, so the
    // 16-dim sketch ranks near chance — the harness exists to SHOW that
    val mean = harness.values.sum.toDouble / (10.0 * harness.size)
    assert(mean <= 0.5, f"corpus grew margin structure? recall $mean%.2f — " +
      "revisit the scaladoc's honesty note")
  }
}
