package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{HyperplaneBands, MinHashBands, NormalizeText, RollingFingerprint, SimHash60, TopBigramCount, TrigramHashes, VectorDot}

/**
 * Session extension registering graft's custom Catalyst expressions as SQL
 * functions, so `spark.sql("SELECT minhash_bands(text) ...")` works next to
 * the Column API (graft.functions). Activate with either
 * `.withExtensions(new GraftExtensions)` on the builder or
 * `spark.sql.extensions=graft.GraftExtensions` in config.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def oneArg(name: String, implClass: Class[_],
                     build: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(implClass.getName, name),
      { children: Seq[Expression] =>
        require(children.size == 1, s"$name expects exactly one argument")
        build(children.head)
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(oneArg("minhash_bands", classOf[MinHashBands], MinHashBands(_)))
    ext.injectFunction(oneArg("trigram_hashes", classOf[TrigramHashes], TrigramHashes))
    ext.injectFunction(oneArg("rolling_fingerprint", classOf[RollingFingerprint],
      RollingFingerprint))
    ext.injectFunction(oneArg("simhash60", classOf[SimHash60], SimHash60))
    ext.injectFunction(oneArg("normalize_text", classOf[NormalizeText], NormalizeText))
    ext.injectFunction(oneArg("top_bigram_count", classOf[TopBigramCount],
      TopBigramCount))
    // 1-3 args: hyperplane_bands(emb [, bands, bitsPerBand]) — the SQL
    // surface must reach the same scale dial the Column API exposes
    ext.injectFunction((FunctionIdentifier("hyperplane_bands"),
      new ExpressionInfo(classOf[HyperplaneBands].getName, "hyperplane_bands"),
      { children: Seq[Expression] =>
        def intLit(e: Expression, name: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"hyperplane_bands: $name must be an integer literal, got $other")
        }
        children match {
          case Seq(emb) => HyperplaneBands(emb)
          case Seq(emb, b, r) => HyperplaneBands(emb,
            intLit(b, "bands"), intLit(r, "bitsPerBand"))
          case _ => throw new IllegalArgumentException(
            "hyperplane_bands expects (emb) or (emb, bands, bitsPerBand)")
        }
      }))
    ext.injectFunction((FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      { children: Seq[Expression] =>
        require(children.size == 2, "vector_dot expects exactly two arguments")
        VectorDot(children.head, children(1))
      }))
  }
}
