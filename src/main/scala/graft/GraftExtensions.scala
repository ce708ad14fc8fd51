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
    ext.injectFunction(oneArg("hyperplane_bands", classOf[HyperplaneBands],
      HyperplaneBands(_)))
    ext.injectFunction((FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      { children: Seq[Expression] =>
        require(children.size == 2, "vector_dot expects exactly two arguments")
        VectorDot(children.head, children(1))
      }))
  }
}
