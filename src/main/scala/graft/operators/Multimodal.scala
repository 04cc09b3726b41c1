package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads travel as opaque
  * `binary` columns with a typed metadata struct, and decode /
  * feature-extract runs batch-at-a-time per partition.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * container): [[decodeStub]] produces a deterministic fake feature
  * vector from the bytes. Everything around it — the schema, the
  * binary packing, the partition-batched execution shape (the Scala
  * analogue of `mapInPandas`: one buffer of rows per call, not one
  * call per row), and the tests — is real, so swapping a codec in
  * changes ONE function. At 100 TB the payload column stays out of
  * every shuffle until after feature extraction because the plumbing
  * projects it away eagerly.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", IntegerType),
      StructField("kind", StringType))))))

  /** Pack a text column as the opaque media payload (the testdata has
    * no real media; the bytes are treated as opaque from here on). */
  def packBinary(docs: DataFrame, idCol: String, textCol: String,
                 kind: String = "text/plain"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        length(encode(col(textCol), "UTF-8")).cast("int").as("n_bytes"),
        lit(kind).as("kind")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** Deterministic fake "decode": an 8-bucket byte histogram as the
    * feature vector. Stands in for `???` image/audio decoding. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val h = new Array[Float](8)
    var i = 0
    while (i < payload.length) { h((payload(i) & 0xff) >> 5) += 1f; i += 1 }
    h
  }

  /** Batched per-partition decode — the mapInPandas-shaped boundary.
    * Rows are pulled through a fixed-size buffer so a real codec gets
    * amortized batches; the iterator never materializes the partition. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("doc_id", "payload", "meta.n_bytes")
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // a real decoder would process `batch` as one codec call
          batch.map { r =>
            Row(r.getLong(0), r.getInt(2), decodeStub(r.getAs[Array[Byte]](1)).toSeq)
          }
        }
      }(enc)
  }

  val audioFrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("energy_ssq", LongType),
    StructField("peak", IntegerType),
    StructField("n_zero_cross", IntegerType)))

  /** Audio-path plumbing (the third modality beside image and video):
    * the payload is treated as unsigned-8-bit mono PCM and reduced
    * per fixed-size frame to the classic audio features — energy
    * (sum of squared centered samples), peak amplitude, zero
    * crossings. The "codec" is the stub in the loop (a deterministic
    * bipolar waveform derived from byte value and position, since
    * ASCII payloads are unipolar); a real PCM decoder replaces that
    * ONE line. Batched per partition like [[extractFeatures]];
    * integer-only output so the oracle compare is exact. */
  def audioFrames(media: DataFrame, frameSize: Int = 256): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioFrameSchema)
    media.select("doc_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val doc = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val nFrames = (bytes.length + frameSize - 1) / frameSize
          (0 until nFrames).iterator.map { f =>
            val start = f * frameSize
            val end = math.min(start + frameSize, bytes.length)
            var ssq = 0L; var peak = 0; var zc = 0
            var prev = 0; var first = true
            var i = start
            while (i < end) {
              // stub codec: centered sample from byte value + position
              val c = (((bytes(i) & 0xff) * 31 + i * 7) % 256) - 128
              ssq += c.toLong * c
              if (math.abs(c) > peak) peak = math.abs(c)
              if (!first && c * prev < 0) zc += 1
              prev = c; first = false; i += 1
            }
            Row(doc, f, end - start, ssq, peak, zc)
          }
        }
      }(enc)
  }

  /** Block-mean downscale of a row-major grayscale image (the resize
    * step of the media path; same block partitioning rule as
    * [[blockhash256]], so a thumb's blocks match the hash's blocks).
    * Deterministic integer arithmetic — mean rounded half-up. */
  def resizeGray(pixels: Array[Byte], w: Int, h: Int,
                 tw: Int, th: Int): Array[Byte] = {
    val sums = new Array[Long](tw * th)
    val counts = new Array[Long](tw * th)
    var y = 0
    while (y < h) {
      val by = math.min(y * th / h, th - 1)
      var x = 0
      while (x < w) {
        val bx = math.min(x * tw / w, tw - 1)
        val i = by * tw + bx
        sums(i) += pixels(y * w + x) & 0xffL
        counts(i) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(tw * th) { i =>
      if (counts(i) == 0) 0.toByte
      else ((sums(i) + counts(i) / 2) / counts(i)).toByte
    }
  }

  /** Square-tile the payload as a grayscale image (the stub codec, as
    * in [[blockhashes]]) and emit a tw×th thumbnail — the batched
    * partition-level resize shape. */
  def resizeThumbs(media: DataFrame, tw: Int, th: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("w", IntegerType),
      StructField("h", IntegerType), StructField("thumb", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select("doc_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val side = math.max(16, math.ceil(math.sqrt(bytes.length.toDouble)).toInt)
          val pixels = java.util.Arrays.copyOf(bytes, side * side)
          Row(r.getLong(0), side, side, resizeGray(pixels, side, side, tw, th))
        }
      }(enc)
  }

  /** Frame sampling over an opaque media payload (the video-path
    * plumbing shape): the payload is a sequence of fixed-size frames;
    * every `everyNth` frame becomes its own row. Pure Column
    * expressions (sequence → explode → substring), so the op stays in
    * whole-stage codegen and the payload bytes are never pulled into
    * JVM row objects. */
  def frameSample(media: DataFrame, frameBytes: Int, everyNth: Int): DataFrame =
    media
      // empty payloads yield zero frames; without the guard the
      // sequence upper bound is -1, which sequence() rejects at runtime
      .filter(col("meta.n_bytes") > 0)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0L),
          expr(s"(meta.n_bytes + ${frameBytes - 1}) div $frameBytes") - 1,
          lit(everyNth.toLong))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)")
          .as("frame"))

  // ---- blockhash -----------------------------------------------------

  /** 256-bit blockhash (the published block-mean perceptual hash the
    * reference shells out to python for,
    * `matching/analyser/PictureHashAnalyser2.scala:48,71-125`): the
    * grayscale image is cut into 16×16 blocks; the hash has one bit
    * per block, set iff the block's mean exceeds the median of its
    * horizontal band (4 bands of 64 blocks — the banded median makes
    * the hash robust to global brightness shifts). JVM-pure, no
    * per-row subprocess. `pixels` is a row-major w×h grayscale byte
    * array; returns 4 longs (64 bits each, block order, MSB first). */
  def blockhash256(pixels: Array[Byte], w: Int, h: Int): Array[Long] = {
    val grid = 16
    val sums = new Array[Long](grid * grid)
    val counts = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      val by = math.min(y * grid / h, grid - 1)
      var x = 0
      while (x < w) {
        val bx = math.min(x * grid / w, grid - 1)
        val i = by * grid + bx
        sums(i) += pixels(y * w + x) & 0xffL
        counts(i) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(grid * grid)(i =>
      if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i))
    val bits = new Array[Int](grid * grid)
    var band = 0
    while (band < 4) {
      val slice = means.slice(band * 64, band * 64 + 64).sorted
      val median = (slice(31) + slice(32)) / 2.0
      var i = band * 64
      while (i < band * 64 + 64) {
        bits(i) = if (means(i) > median) 1 else 0
        i += 1
      }
      band += 1
    }
    Array.tabulate(4) { word =>
      var acc = 0L
      var i = word * 64
      while (i < word * 64 + 64) { acc = (acc << 1) | bits(i); i += 1 }
      acc
    }
  }

  /** "Decode" the opaque payload as a square grayscale image (the
    * stubbed codec step: bytes tiled into the smallest square that
    * fits) and blockhash it. Output: doc_id, w, h, hash words h0..h3. */
  def blockhashes(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("w", IntegerType),
      StructField("h", IntegerType), StructField("h0", LongType),
      StructField("h1", LongType), StructField("h2", LongType),
      StructField("h3", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select("doc_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val side = math.max(16, math.ceil(math.sqrt(bytes.length.toDouble)).toInt)
          val pixels = java.util.Arrays.copyOf(bytes, side * side)
          val hash = blockhash256(pixels, side, side)
          Row(r.getLong(0), side, side, hash(0), hash(1), hash(2), hash(3))
        }
      }(enc)
  }
}
