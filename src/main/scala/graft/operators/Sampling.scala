package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data
  * pipelines. `df.sample()` is unusable there: its output depends on
  * partitioning and RNG state, so a re-run (or a different engine
  * re-deriving the same split) selects different rows. Hashing a
  * stable key instead gives a sample that is (a) reproducible across
  * runs, engines and partition layouts, (b) a pure map-side filter —
  * no shuffle, no driver state, trivially parallel at 100 TB — and
  * (c) monotone: the 10% sample is a subset of the 20% sample, so
  * growing a training set never discards already-processed rows.
  *
  * The bucket is the first two hex chars of `md5(salt || key)`:
  * 256 equal-probability buckets, compared as fixed-width lowercase
  * hex strings (lexicographic == numeric), which any engine with an
  * md5 function reproduces bit-for-bit. The salt decorrelates
  * independent samples drawn from the same key space.
  */
object Sampling {

  /** 256-bucket hash of a key column; threshold "40" keeps 25%. */
  def bucket(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 2)

  /** Uniform sample: keep rows whose bucket < thresholdHex. The
    * threshold must be two lowercase hex chars — anything else (one
    * char, uppercase) would silently select a wrong fraction under the
    * lexicographic comparison (ADVICE r3). */
  def deterministicSample(df: DataFrame, key: Column,
                          thresholdHex: String, salt: String): DataFrame = {
    require(thresholdHex.matches("[0-9a-f]{2}"),
      s"thresholdHex must match [0-9a-f]{2}, got '$thresholdHex'")
    df.filter(bucket(key, salt) < lit(thresholdHex))
  }

  /** Stratified sample: per-row threshold (e.g. a `when` over a
    * stratum column) so each stratum keeps its own fraction. */
  def stratifiedSample(df: DataFrame, key: Column,
                       threshold: Column, salt: String): DataFrame =
    df.filter(bucket(key, salt) < threshold)
}
