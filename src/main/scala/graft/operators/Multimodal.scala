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
}
