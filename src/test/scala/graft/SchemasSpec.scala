package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The per-stage schema validation rule (name + dataType, nullability
  * ignored) against the real pipeline frames and synthetic
  * mismatches. */
class SchemasSpec extends AnyFunSuite {
  import TestSpark._

  test("pipeline frames match their declared schemas") {
    val cands = SparkEntry.queries("q13_entity_candidates")(spark, sf)
    Schemas.validate(cands, Schemas.candidatePairs, "cands")
    val scores = SparkEntry.queries("q14_entity_scores")(spark, sf)
    Schemas.validate(scores, Schemas.matchScores, "scores")
  }

  test("validate ignores nullability but rejects name/type drift") {
    import spark.implicits._
    val ok = Seq((1L, 2L)).toDF("doc_id", "entity_id")
    Schemas.validate(ok, Schemas.entities, "ok") // non-nullable cols pass
    val wrongName = ok.withColumnRenamed("entity_id", "entity")
    val e1 = intercept[IllegalArgumentException] {
      Schemas.validate(wrongName, Schemas.entities, "renamed")
    }
    assert(e1.getMessage.contains("entity"))
    val wrongType = ok.withColumn("entity_id", col("entity_id").cast("int"))
    val e2 = intercept[IllegalArgumentException] {
      Schemas.validate(wrongType, Schemas.entities, "retyped")
    }
    assert(e2.getMessage.contains("int"))
    val extraCol = ok.withColumn("extra", lit(1))
    intercept[IllegalArgumentException] {
      Schemas.validate(extraCol, Schemas.entities, "extra")
    }
  }
}
