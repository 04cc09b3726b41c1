package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Semantics of the multimodal pipeline pieces that have no SQL
  * spelling: the batched decode boundary and the JVM blockhash. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("decodeStub histogram counts every byte exactly once") {
    val bytes = Array.tabulate(256)(_.toByte)
    val h = Multimodal.decodeStub(bytes)
    assert(h.sum == 256f)
    assert(h.forall(_ == 32f), "uniform byte sweep -> 32 per bucket")
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

  test("batched feature extraction preserves ids and byte counts") {
    val packed = Multimodal.packBinary(
      Tables.documents(spark, sf), "doc_id", "text")
    val feats = Multimodal.extractFeatures(packed, batchSize = 16)
    val rows = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Int]("n_bytes")
      val hist = r.getAs[collection.Seq[Float]]("feature")
      assert(hist.sum.toInt == n, "histogram mass == payload bytes")
    }
    assert(feats.select("doc_id").distinct().count() ==
      Tables.documents(spark, sf).count())
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
    // thumbnails flow through the frame with ids intact
    val packed = Multimodal.packBinary(
      Tables.documents(spark, sf), "doc_id", "text")
    val thumbs = Multimodal.resizeThumbs(packed, 4, 4).collect()
    assert(thumbs.forall(_.getAs[Array[Byte]]("thumb").length == 16))
  }

  test("frameSample slices exact frames and reconstructs the payload") {
    import spark.implicits._
    val text = ('a' to 'z').mkString * 10 // 260 bytes → 5 frames of 64
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val packed = Multimodal.packBinary(docs, "doc_id", "text")
    val all = Multimodal.frameSample(packed, 64, 1)
      .orderBy("frame_idx").collect()
    assert(all.length == 5)
    val glued = all.map(r => new String(r.getAs[Array[Byte]]("frame"), "UTF-8"))
      .mkString
    assert(glued == text, "concatenating every frame restores the payload")
    val sampled = Multimodal.frameSample(packed, 64, 2).collect()
    assert(sampled.map(_.getLong(1)).sorted.toSeq == Seq(0L, 2L, 4L))
  }

  test("audioFrames matches an independently computed golden") {
    import spark.implicits._
    // 300 bytes → one full 256-sample frame + one 44-sample tail;
    // golden values computed outside the JVM (python reimplementation
    // of the stub codec arithmetic)
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

  test("identical payloads produce identical blockhashes through the frame") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog " * 8
    val docs = Seq((1L, text), (2L, text), (3L, text.reverse))
      .toDF("doc_id", "text")
    val rows = Multimodal.blockhashes(
        Multimodal.packBinary(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(rows(1L) == rows(2L), "equal payloads -> equal hashes")
    assert(rows(1L) != rows(3L), "different payloads -> different hashes")
  }
}
