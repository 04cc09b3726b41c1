package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Semantics of the multimodal pipeline pieces that have no SQL
  * spelling: the real ImageIO codec boundary (PNG/BMP grayscale
  * round trips), the batched decode shape, and the JVM blockhash.
  * Checked-in fixture files (src/test/resources/graft/fixtures,
  * written by tools/ImageFixtureGen) pin the decoded-pixel goldens
  * against real on-disk images. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("PNG and BMP grayscale round trips are lossless (full byte sweep)") {
    // every 8-bit value once, non-square dims to catch w/h swaps
    val w = 32; val h = 8
    val px = Array.tabulate(w * h)(_.toByte)
    for (fmt <- Seq("png", "bmp")) {
      val enc = Multimodal.encodeGray(px, w, h, fmt)
      val (dw, dh, out) = Multimodal.decodeGray(enc)
      assert((dw, dh) == (w, h), s"$fmt dims")
      assert(out.toSeq == px.toSeq, s"$fmt pixel round trip must be exact")
    }
  }

  test("checked-in image fixtures decode to their golden pixels") {
    for ((name, expected) <- Seq(
        "gradient_16x16.png" -> Array.tabulate(256)(_.toByte),
        "gradient_16x16.bmp" -> Array.tabulate(256)(_.toByte),
        "checker_16x16.png" -> Array.tabulate(256)(i =>
          (if ((i / 16 + i % 16) % 2 == 0) 0 else 255).toByte))) {
      val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
      assert(in != null, s"missing fixture $name")
      val bytes = in.readAllBytes(); in.close()
      val (w, h, px) = Multimodal.decodeGray(bytes)
      assert((w, h) == (16, 16))
      assert(px.toSeq == expected.toSeq, s"$name golden pixels")
    }
  }

  test("fixture blockhash goldens are stable across codec and format") {
    // the same pixels through PNG and BMP must hash identically —
    // the hash sees decoded pixels, never encoded bytes
    def hashOf(name: String): Seq[Long] = {
      val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
      val bytes = in.readAllBytes(); in.close()
      val (w, h, px) = Multimodal.decodeGray(bytes)
      Multimodal.blockhash256(px, w, h).toSeq
    }
    assert(hashOf("gradient_16x16.png") == hashOf("gradient_16x16.bmp"))
    assert(hashOf("gradient_16x16.png") != hashOf("checker_16x16.png"))
  }

  test("blockhash is deterministic and structural") {
    val w = 64; val h = 64
    // uniform image: no block mean exceeds the band median -> all zero
    val flat = Array.fill(w * h)(100.toByte)
    val hf = Multimodal.blockhash256(flat, w, h)
    assert(hf.toSeq == Seq(0L, 0L, 0L, 0L))

    // left-dark / right-bright: in every 16-block band row the bright
    // half is above the band median -> per-16-bit rows pattern 0x00FF
    val split = Array.tabulate(w * h)(i => if (i % w < w / 2) 10.toByte else 200.toByte)
    val hs = Multimodal.blockhash256(split, w, h)
    hs.foreach { word =>
      // each 64-bit word holds 4 rows of 16 blocks: 0x00ff00ff00ff00ff
      assert(word == 0x00ff00ff00ff00ffL, f"word=$word%016x")
    }

    // determinism + sensitivity: same input equal, one pixel flipped
    // changes at most a few bits
    val again = Multimodal.blockhash256(split.clone(), w, h)
    assert(again.toSeq == hs.toSeq)
    val tweaked = split.clone()
    tweaked(0) = 250.toByte
    val ht = Multimodal.blockhash256(tweaked, w, h)
    val dist = hs.zip(ht).map { case (a, b) =>
      java.lang.Long.bitCount(a ^ b) }.sum
    assert(dist <= 17, s"one-pixel change flipped $dist bits")
  }

  test("batched feature extraction decodes real PNGs with ids intact") {
    val packed = Multimodal.packImages(
      Tables.documents(spark, sf), "doc_id", "text")
    val feats = Multimodal.extractFeatures(packed, batchSize = 16)
    val rows = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[Int]("w"); val h = r.getAs[Int]("h")
      val hist = r.getAs[collection.Seq[Float]]("feature")
      assert(hist.sum.toInt == w * h, "histogram mass == decoded pixels")
      assert(hist.length == 8)
    }
    assert(feats.select("doc_id").distinct().count() ==
      Tables.documents(spark, sf).count())
  }

  test("packImages payloads are genuine PNG files") {
    val packed = Multimodal.packImages(
      Tables.documents(spark, sf), "doc_id", "text").limit(5).collect()
    packed.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      // PNG magic: 89 50 4E 47
      assert((payload(0) & 0xff) == 0x89 && payload(1) == 'P' &&
        payload(2) == 'N' && payload(3) == 'G', "payload must be real PNG")
      val meta = r.getStruct(2)
      assert(meta.getAs[Int]("n_bytes") == payload.length)
      assert(meta.getAs[String]("kind") == "image/png")
    }
  }

  test("resizeGray mean-pools blocks with exact integer rounding") {
    // 32×32 quadrant image: TL=0, TR=100, BL=200, BR=40 → 2×2 thumb
    val w = 32
    val img = Array.tabulate(w * w) { i =>
      val (y, x) = (i / w, i % w)
      (if (y < 16) { if (x < 16) 0 else 100 }
       else { if (x < 16) 200 else 40 }).toByte
    }
    val t = Multimodal.resizeGray(img, w, w, 2, 2).map(_ & 0xff)
    assert(t.toSeq == Seq(0, 100, 200, 40))
    // non-divisible target: 3×3 pooling still covers every pixel once
    val t3 = Multimodal.resizeGray(img, w, w, 3, 3)
    assert(t3.length == 9)
    // thumbnails flow through the frame with ids intact, decoded from
    // real PNGs; means mirrors the binary thumb exactly
    val packed = Multimodal.packImages(
      Tables.documents(spark, sf), "doc_id", "text")
    val thumbs = Multimodal.resizeThumbs(packed, 4, 4).collect()
    assert(thumbs.forall(_.getAs[Array[Byte]]("thumb").length == 16))
    thumbs.foreach { r =>
      val bin = r.getAs[Array[Byte]]("thumb").map(_ & 0xff).toSeq
      assert(r.getAs[collection.Seq[Int]]("means").toSeq == bin)
    }
  }

  test("frame reel: fixed-size real BMP stills slice and decode exactly") {
    import spark.implicits._
    val text = ('a' to 'z').mkString * 10 // 260 bytes → 5 frames of 64
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val reel = Multimodal.packFrameReel(docs, "doc_id", "text")
    val frameBytes = Multimodal.encodedFrameSize(64, "bmp")
    // payload is exactly nFrames fixed-size encoded stills
    val payload = reel.collect()(0).getAs[Array[Byte]]("payload")
    assert(payload.length == 5 * frameBytes)
    // each still is a real BMP ("BM" magic)
    (0 until 5).foreach { f =>
      assert(payload(f * frameBytes) == 'B' && payload(f * frameBytes + 1) == 'M')
    }
    val all = Multimodal.decodeFrameText(
        Multimodal.frameSample(reel, frameBytes, 1))
      .orderBy("frame_idx").collect()
    assert(all.length == 5)
    // frame content is hex bytes (round 14, byte-exact for arbitrary
    // UTF-8); decoding the glued hex must restore the source text
    val glued = all.map(_.getAs[String]("frame_hex")).mkString
    assert(glued.length % 2 == 0)
    val bytes = glued.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(new String(bytes, "UTF-8") == text,
      "decoding every frame restores the text")
    assert(all.map(_.getAs[Int]("frame_len")).sum * 2 == glued.length)
    val sampled = Multimodal.decodeFrameText(
      Multimodal.frameSample(reel, frameBytes, 2)).collect()
    assert(sampled.map(_.getLong(1)).sorted.toSeq == Seq(0L, 2L, 4L))
  }

  test("audioFrames matches an independently computed golden") {
    import spark.implicits._
    // 300 bytes → one full 256-sample frame + one 44-sample tail;
    // golden values computed outside the JVM (python reimplementation
    // of the centering arithmetic)
    val text = ("the quick brown fox " * 20).take(300)
    val docs = Seq((5L, text)).toDF("doc_id", "text")
    val got = Multimodal.audioFrames(Multimodal.packBinary(docs, "doc_id", "text"))
      .orderBy("frame_idx").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4), r.getInt(5)))
      .toSeq
    assert(got == Seq(
      (0, 256, 1389518L, 128, 124),
      (1, 44, 241455L, 125, 22)))
  }

  test("WAV PCM16 pack→parse round trip is lossless, header included") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog " * 7
    val docs = Seq((9L, text)).toDF("doc_id", "text")
    val packed = Multimodal.packWav(docs, "doc_id", "text").collect().head
    val payload = packed.getAs[Array[Byte]](1)
    // a genuine RIFF container: magic + WAVE form type
    assert(new String(payload.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(payload.slice(8, 12), "US-ASCII") == "WAVE")
    val (rate, bits, samples) = Multimodal.parseWav(payload)
    assert((rate, bits) == (8000, 16))
    val expected = text.getBytes("UTF-8").zipWithIndex
      .map { case (b, i) => Multimodal.pcm16Sample(b, i) }
    assert(samples.toSeq == expected.toSeq,
      "parsed samples must equal the derivation bit-for-bit")
  }

  test("pcm16Sample spans exactly the int16 range (container-safe)") {
    val all = for (b <- 0 to 255; i <- 0 to 255)
      yield Multimodal.pcm16Sample(b.toByte, i)
    assert(all.min >= Short.MinValue.toInt && all.max <= Short.MaxValue.toInt)
    assert(all.min == -32768 && all.max == 32512) // c8·256 endpoints
  }

  test("checked-in WAV fixture parses to its golden samples") {
    val in = getClass.getResourceAsStream("/graft/fixtures/ramp_pcm16.wav")
    assert(in != null, "missing fixture ramp_pcm16.wav")
    val bytes = in.readAllBytes(); in.close()
    val (rate, bits, samples) = Multimodal.parseWav(bytes)
    assert((rate, bits) == (8000, 16))
    val wavText = "graft wav fixture 0123456789"
    val expected = wavText.getBytes("UTF-8").zipWithIndex
      .map { case (b, i) => Multimodal.pcm16Sample(b, i) }
    assert(samples.toSeq == expected.toSeq)
    // literal spot goldens (hand-computed, independent of pcm16Sample):
    // 'g'(103): (103·31+0)%256=121 → −7·256 = −1792
    // 'r'(114): (114·31+7)%256=213 → 85·256 = 21760
    assert(samples(0) == -1792 && samples(1) == 21760)
  }

  test("wavFrames features equal audioFrames features scaled by 256") {
    import spark.implicits._
    val text = ("lorem ipsum dolor sit amet " * 12).take(300)
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val u8 = Multimodal.audioFrames(Multimodal.packBinary(docs, "doc_id", "text"))
      .orderBy("frame_idx").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4), r.getInt(5)))
    val w16 = Multimodal.wavFrames(Multimodal.packWav(docs, "doc_id", "text"))
      .orderBy("frame_idx").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4), r.getInt(5)))
    assert(w16.length == u8.length)
    u8.zip(w16).foreach { case ((fi, n, ssq, peak, zc), (fi2, n2, ssq2, peak2, zc2)) =>
      assert(fi2 == fi && n2 == n)
      assert(ssq2 == ssq * 65536L, "energy scales by 256²")
      assert(peak2 == peak * 256, "peak scales by 256")
      assert(zc2 == zc, "zero crossings are scale-invariant")
    }
  }

  test("identical payloads produce identical blockhashes through the frame") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog " * 8
    val docs = Seq((1L, text), (2L, text), (3L, text.reverse))
      .toDF("doc_id", "text")
    val rows = Multimodal.blockhashes(
        Multimodal.packImages(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(rows(1L) == rows(2L), "equal payloads -> equal hashes")
    assert(rows(1L) != rows(3L), "different payloads -> different hashes")
  }
}
