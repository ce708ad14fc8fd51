package graft.bronze

import java.time.LocalDate

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Pure set-algebra / path-codec laws of the bronze lake (SURVEY.md §5.2). */
object LakePropsSpec extends Properties("bronze.Lake") {

  private val genDate: Gen[String] =
    Gen.choose(0L, 20000L).map(LocalDate.ofEpochDay(_).toString)

  private val genDates: Gen[List[String]] = Gen.listOf(genDate)

  property("missingDates == sorted set difference") =
    forAll(genDates, genDates) { (src, sink) =>
      val m = Lake.missingDates(src, sink)
      m == (src.toSet -- sink.toSet).toSeq.sorted &&
        m.isEmpty == src.toSet.subsetOf(sink.toSet)
    }

  property("partitionPath round-trips and stays fixed-width") =
    forAll(genDate) { d =>
      val p = Lake.partitionPath(d)
      val Array(y, m, dd) = p.split("/").map(_.split("=")(1))
      s"$y-$m-$dd" == d && p.length == "year=YYYY/month=MM/day=DD".length
    }

  property("dateRange inclusive, contiguous, sized datediff+1") =
    forAll(Gen.choose(0L, 20000L), Gen.choose(0L, 400L)) { (s, len) =>
      val a = LocalDate.ofEpochDay(s)
      val b = a.plusDays(len)
      val r = Runner.dateRange(a.toString, b.toString)
      Prop(r.size == len + 1 && r.head == a.toString && r.last == b.toString &&
        r == r.sorted)
    }
}
