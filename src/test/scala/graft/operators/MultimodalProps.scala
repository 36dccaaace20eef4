package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure-JVM audio codec and segmenter: the
  * WAV wire format round-trips arbitrary PCM exactly, stereo mixdown
  * is the per-frame integer mean, and `segmentVoiced`'s output
  * satisfies its structural invariants on ARBITRARY clips — not just
  * the crafted silence patterns the example spec plants. */
object MultimodalProps extends Properties("Multimodal") {

  private def wav16(rate: Int, channels: Int,
      frames: Seq[Seq[Int]]): Array[Byte] = TestWav.wav(rate, 16, channels, frames)

  private val sample: Gen[Int] = Gen.chooseNum(-32768, 32767)
  private val rateGen: Gen[Int] = Gen.oneOf(8000, 16000, 44100)

  property("16-bit mono WAV round-trips every sample exactly") =
    forAll(rateGen, Gen.nonEmptyListOf(sample)) { (rate, samples) =>
      Multimodal.decodeWav(wav16(rate, 1, samples.map(Seq(_)))) match {
        case Some((1, r, mono)) => r == rate && mono.toSeq == samples
        case _ => false
      }
    }

  property("stereo mixdown is the per-frame integer mean") =
    forAll(Gen.nonEmptyListOf(Gen.zip(sample, sample))) { frames =>
      Multimodal.decodeWav(
        wav16(8000, 2, frames.map { case (l, r) => Seq(l, r) })) match {
        case Some((2, _, mono)) =>
          mono.toSeq == frames.map { case (l, r) => (l + r) / 2 }
        case _ => false
      }
    }

  property("segmentVoiced: ordered, disjoint, in-bounds, above-threshold segments") =
    forAll(rateGen, Gen.listOf(sample)) { (rate, clip) =>
      val mono = clip.toArray
      val segs = Multimodal.segmentVoiced(rate, mono)
      val durMs = mono.length.toLong * 1000L / rate
      val peak = if (mono.isEmpty) 0L else mono.map(v => math.abs(v.toLong)).max
      val structural = segs.forall { case (s, e, _) => s < e && s >= 0 && e <= durMs } &&
        segs.sliding(2).forall {
          case Seq((_, e1, _), (s2, _, _)) => e1 <= s2
          case _ => true
        }
      // every segment's mean window RMS clears the voicing threshold
      // (each constituent window did, and a mean preserves the floor)
      val voiced = segs.forall { case (_, _, rms) => rms * 10L >= peak }
      val silent = peak != 0L || segs.isEmpty
      structural && voiced && silent
    }

  property("PPM P6 round-trips every RGB plane exactly") =
    forAll(Gen.chooseNum(1, 24), Gen.chooseNum(1, 24), Gen.long) { (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val blob = s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
      Multimodal.decodePpm(blob) match {
        case Some((dw, dh, px)) => dw == w && dh == h && px.sameElements(rgb)
        case None => false
      }
    }

  property("BMP bottom-up and top-down encodings decode to the same plane") =
    forAll(Gen.chooseNum(1, 16), Gen.chooseNum(1, 16), Gen.long) { (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      def bmp(topDown: Boolean): Array[Byte] = {
        val rowBytes = (w * 3 + 3) & ~3
        val bb = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
          .putInt(0).putInt(54).putInt(40).putInt(w)
          .putInt(if (topDown) -h else h)
          .putShort(1).putShort(24).putInt(0).putInt(rowBytes * h)
          .putInt(2835).putInt(2835).putInt(0).putInt(0)
        for (row <- 0 until h) {
          val srcRow = if (topDown) row else h - 1 - row
          for (x <- 0 until w) {
            val s = (srcRow * w + x) * 3
            bb.put(rgb(s + 2)).put(rgb(s + 1)).put(rgb(s))
          }
          for (_ <- w * 3 until rowBytes) bb.put(0.toByte)
        }
        bb.array()
      }
      val up = Multimodal.decodeBmp(bmp(topDown = false))
      val down = Multimodal.decodeBmp(bmp(topDown = true))
      up.isDefined && down.isDefined &&
        up.get._3.sameElements(rgb) && down.get._3.sameElements(rgb)
    }

  property("resampleLinear: length formula holds, output stays within input bounds") =
    forAll(rateGen, rateGen, Gen.nonEmptyListOf(sample)) { (r1, r2, clip) =>
      val mono = clip.toArray
      val out = Multimodal.resampleLinear(r1, r2, mono)
      val lenOk = out.length == (mono.length.toLong * r2 / r1).toInt ||
        (r1 == r2 && out.length == mono.length)
      // linear interpolation is a convex combination: bounds preserved
      val lo = mono.min; val hi = mono.max
      lenOk && out.forall(v => v >= lo && v <= hi)
    }

  property("NO decoder ever throws on arbitrary bytes — untrusted blobs stub, not crash") =
    forAll(Gen.oneOf(
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray),
      // adversarial: real magic bytes followed by garbage — the parsers
      // must bail to None on truncation/corruption past the sniff
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(junk =>
        "P6\n".getBytes("US-ASCII") ++ junk.toArray),
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(junk =>
        Array('B'.toByte, 'M'.toByte) ++ junk.toArray),
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(junk =>
        Array(0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ junk.toArray),
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(junk =>
        "RIFF".getBytes("US-ASCII") ++ junk.toArray),
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(junk =>
        "YUV4MPEG2 ".getBytes("US-ASCII") ++ junk.toArray))) { blob =>
      // every decoder returns an Option (or stub tuple) — never throws
      Multimodal.decodePpm(blob)
      Multimodal.decodeBmp(blob)
      Multimodal.decodeJavax(blob)
      Multimodal.decodeY4m(blob)
      Multimodal.decodeWav(blob)
      Multimodal.decodeAny(blob)
      Multimodal.grayPixels(blob)
      true
    }

  property("a constant loud clip is ONE segment spanning the whole clip") =
    forAll(rateGen, Gen.chooseNum(1, 5000), Gen.chooseNum(1000, 32767)) {
      (rate, n, amp) =>
        val segs = Multimodal.segmentVoiced(rate, Array.fill(n)(amp))
        segs.map(s => (s._1, s._2)) ==
          Seq((0L, n.toLong * 1000L / rate)) || n.toLong * 1000L / rate == 0L
    }
}
