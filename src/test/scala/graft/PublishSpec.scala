package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Publish

/** S8 atomic publish: a stable view is repointed at versioned
  * snapshot tables; an in-flight (unpublished) write never changes
  * what readers see, and the swap is one catalog operation. */
class PublishSpec extends AnyFunSuite {
  import TestSpark._

  test("view swap publishes snapshots atomically") {
    spark.sql("DROP VIEW IF EXISTS match_pub")
    Seq("match_pub_v1", "match_pub_v2").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a previously-crashed run can leave the managed location behind
      // without a metastore entry; saveAsTable then refuses the name
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }

    Publish.publishSnapshot(spark, "match_pub", 1L,
      spark.range(5).select(col("id"), lit("r1").as("run")))
    assert(spark.table("match_pub").count() == 5)

    // a new snapshot being written does NOT affect readers of the view
    spark.range(9).select(col("id"), lit("r2").as("run"))
      .write.mode("overwrite").saveAsTable("match_pub_v2")
    assert(spark.table("match_pub").count() == 5,
      "readers must stay on the published version until the swap")
    assert(spark.table("match_pub").select("run").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("r1"))

    // the swap is one catalog op
    spark.sql("CREATE OR REPLACE VIEW match_pub AS SELECT * FROM match_pub_v2")
    assert(spark.table("match_pub").count() == 9)
    assert(spark.table("match_pub").select("run").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("r2"))
  }
}
