package graft.sources

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the changefeed log's wire format: arbitrary
  * strings (tabs, newlines, backslashes, the NULL marker, unicode)
  * must survive the escape → TSV segment → parse round-trip exactly,
  * and segment names must agree with their contents' range. */
object ChangefeedLogProps extends Properties("ChangefeedLog") {

  private val trickyChar: Gen[Char] = Gen.frequency(
    5 -> Gen.alphaNumChar,
    1 -> Gen.oneOf('\t', '\n', '\r', '\\', 'N', ' ', '"', '{', '}'),
    1 -> Gen.oneOf('é', '中', ' '))

  private val trickyString: Gen[String] =
    Gen.listOf(trickyChar).map(_.mkString)

  private val record: Gen[ChangefeedLog.Record] = for {
    us <- Gen.chooseNum(0L, Long.MaxValue / 4)
    tbl <- Gen.option(trickyString)
    key <- Gen.option(trickyString)
    value <- trickyString
  } yield ChangefeedLog.Record(us, tbl, key, value)

  property("esc/unesc round-trips any string") = forAll(trickyString) { s =>
    ChangefeedLog.unesc(ChangefeedLog.esc(s)) == s
  }

  property("segment write/read round-trips records exactly") =
    forAll(Gen.nonEmptyListOf(record)) { recs =>
      val dir = Files.createTempDirectory("cflog-prop").toString
      val path = ChangefeedLog.writeSegment(dir, recs)
      val back = ChangefeedLog.readSegment(path).toList
      val want = recs.sortBy(r => (r.sortUs, r.key.getOrElse("")))
      // blank-line filtering in readSegment makes an empty-value record
      // with nothing else on the line unrepresentable ONLY if the whole
      // line is empty — which fmt never produces (sort_us is always
      // present), so equality must be exact
      Prop(back == want) :| s"got $back want $want"
    }

  property("listSegments reports the exact [first,last] range") =
    forAll(Gen.nonEmptyListOf(record)) { recs =>
      val dir = Files.createTempDirectory("cflog-prop").toString
      ChangefeedLog.writeSegment(dir, recs)
      val seg = ChangefeedLog.listSegments(dir).head
      seg.firstUs == recs.map(_.sortUs).min && seg.lastUs == recs.map(_.sortUs).max
    }

  property("negative sort_us is rejected (it would be unlistable)") =
    forAll(Gen.chooseNum(Long.MinValue, -1L)) { us =>
      val dir = Files.createTempDirectory("cflog-prop").toString
      Prop.throws(classOf[IllegalArgumentException]) {
        ChangefeedLog.writeSegment(dir,
          Seq(ChangefeedLog.Record(us, None, None, "v")))
      }
    }
}
