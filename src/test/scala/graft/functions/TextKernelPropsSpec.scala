package graft.functions

import java.security.MessageDigest

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/**
 * Pure-JVM property checks of the codegen kernels against straight-line
 * reference implementations of their SQL formulations (java.util.regex IS
 * what Spark's regexp_replace runs; UTF8String.toLowerCase IS lower()) —
 * random unicode input probes edges the corpus never hits.
 */
object TextKernelPropsSpec extends Properties("functions.TextHashing") {

  private val genText: Gen[String] = Gen.frequency(
    4 -> Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.oneOf('!', ',', '-', '\t', 'Ü', 'ß', '中'))).map(_.mkString),
    1 -> Gen.asciiPrintableStr,
    1 -> arbitraryUnicode)

  private def arbitraryUnicode: Gen[String] =
    Gen.listOf(Gen.choose(1, 0xFFFD).map(_.toChar)).map(_.mkString)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString

  property("normalizeText == lower+strip+collapse+trim regex chain") =
    forAll(genText) { s =>
      val lowered = UTF8String.fromString(s).toLowerCase.toString
      val expected = lowered
        .replaceAll("[^a-z0-9 ]", "")
        .replaceAll(" +", " ")
        .trim
      TextHashing.normalizeText(UTF8String.fromString(s)).toString == expected
    }

  property("trigramHashes == h32 of every 'a b c' shingle of split(' ', -1)") =
    forAll(genText) { s =>
      val toks = s.split(" ", -1)
      val expected = (0 until math.max(toks.length - 2, 0)).map { i =>
        val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
        java.lang.Long.parseLong(md5hex(sh).take(8), 16)
      }
      TextHashing.trigramHashes(UTF8String.fromString(s))
        .toLongArray.toSeq == expected
    }

  property("minhashBands == pairwise-packed mins of permuted trigram hashes") =
    forAll(genText) { s =>
      val hs = TextHashing.trigramHashes(UTF8String.fromString(s)).toLongArray
      val got = Option(TextHashing.minhashBands(UTF8String.fromString(s), 8, 2))
        .map(_.toLongArray.toSeq)
      if (hs.isEmpty) got.isEmpty
      else {
        val mins = (0 until 8).map(i =>
          hs.map(h => (h * TextHashing.A(i) + TextHashing.B(i)) % TextHashing.P).min)
        got.contains((0 until 4).map(j =>
          mins(2 * j) * TextHashing.P + mins(2 * j + 1)))
      }
    }

  property("rollingFingerprint == fold of md5-16bit token prefixes") =
    forAll(genText) { s =>
      val expected = s.split(" ", -1).foldLeft(0L) { (acc, t) =>
        (acc * 31 + java.lang.Long.parseLong(md5hex(t).take(4), 16)) % TextHashing.P
      }
      TextHashing.rollingFingerprint(UTF8String.fromString(s)) == expected
    }

  property("simhash60 == per-bit majority vote over distinct-token md5 nibbles") =
    forAll(genText) { s =>
      val hexes = s.split(" ", -1).distinct.map(md5hex)
      val expected = (0 until 60).map { bit =>
        val votes = hexes.map { h =>
          val nib = Integer.parseInt(h.charAt(bit / 4).toString, 16)
          2 * ((nib >> (3 - bit % 4)) & 1) - 1
        }.sum
        if (votes > 0) 1L << bit else 0L
      }.sum
      TextHashing.simhash60(UTF8String.fromString(s)) == expected
    }

  property("spanHashes8 == distinct md5 of every 8-token span, first-seen order") =
    forAll(genText) { s =>
      val toks = s.split(" ", -1)
      val expected =
        if (toks.length < 8) Seq.empty[String]
        else toks.sliding(8).map(sp => md5hex(sp.mkString(" "))).toSeq.distinct
      TextHashing.spanHashes8(UTF8String.fromString(s))
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq == expected
    }

  property("phrasePositions == 1-based adjacent-match positions") =
    forAll(genText, Gen.oneOf("a", "b", "the"), Gen.oneOf("a", "b", "the")) {
      (s, f, sec) =>
        val toks = s.split(" ", -1)
        val expected = (0 until math.max(toks.length - 1, 0))
          .filter(i => toks(i) == f && toks(i + 1) == sec).map(_ + 1)
        TextHashing.phrasePositions(UTF8String.fromString(s), f, sec)
          .toIntArray.toSeq == expected
    }

  property("adjacentBigrams == sliding(2) space-joined, duplicates kept") =
    forAll(genText) { s =>
      val toks = s.split(" ", -1)
      val expected =
        if (toks.length < 2) Seq.empty[String]
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      TextHashing.adjacentBigrams(UTF8String.fromString(s))
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq == expected
    }

  property("topBigramCount == max groupBy count over adjacent bigrams") =
    forAll(genText) { s =>
      val toks = s.split(" ", -1)
      val expected =
        if (toks.length < 2) 0L
        else toks.sliding(2).map(_.mkString(" ")).toSeq
          .groupBy(identity).values.map(_.size).max.toLong
      TextHashing.topBigramCount(UTF8String.fromString(s)) == expected
    }
}
