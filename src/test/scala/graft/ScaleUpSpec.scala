package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integrity of the key-shifted replication that backs the >sf0.1
  * scale probes (tools/ScaleUp, BASELINE.md scale points): counts
  * multiply, referential integrity survives the shift, and replica
  * documents are near- but not byte-duplicates. A broken replicator
  * would silently invalidate every scale measurement derived from it. */
class ScaleUpSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val dst = {
    val out = java.nio.file.Files.createTempDirectory("graft_scaleup").toString
    graft.tools.ScaleUp.replicate(spark, sf, out, reps = 2)
    out
  }

  test("fact tables double, dimension tables stay") {
    for (t <- Seq("orders", "lineitem", "events", "documents", "embeddings")) {
      val base = spark.read.parquet(s"$sf/$t.parquet").count()
      val rep = spark.read.parquet(s"$dst/$t.parquet").count()
      assert(rep == 2 * base, s"$t: $base -> $rep")
    }
    for (t <- Seq("region", "nation")) {
      val base = spark.read.parquet(s"$sf/$t.parquet").count()
      val rep = spark.read.parquet(s"$dst/$t.parquet").count()
      assert(rep == base, s"$t: $base -> $rep")
    }
  }

  test("key shifts preserve referential integrity and never collide") {
    val cust = spark.read.parquet(s"$dst/customer.parquet")
    val orders = spark.read.parquet(s"$dst/orders.parquet")
    val dangling = orders.join(cust,
      orders("o_custkey") === cust("c_custkey"), "left_anti").count()
    assert(dangling == 0, s"$dangling orders reference a missing customer")
    val dupKeys = cust.groupBy("c_custkey").count()
      .filter(col("count") > 1).count()
    assert(dupKeys == 0, "replica customer keys collide")
  }

  test("replica documents are near-duplicates, not byte clones") {
    val S = 100000000L
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    val base = docs.filter(col("doc_id") < S)
      .select(col("doc_id"), col("text").as("t0"))
    val rep1 = docs.filter(col("doc_id") >= S)
      .select((col("doc_id") - S).as("doc_id"), col("text").as("t1"))
    val clones = base.join(rep1, Seq("doc_id"))
      .filter(col("t0") === col("t1")).count()
    assert(clones == 0,
      "replica texts must differ from their originals (unique suffix)")
    // n_chars must match the suffixed text, or length-based operators
    // (quality scoring, token shards) diverge between replicas
    val badLen = docs.filter(length(col("text")) =!= col("n_chars")).count()
    assert(badLen == 0, s"$badLen docs have stale n_chars")
  }
}
