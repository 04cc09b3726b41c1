package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{PorterStemmer, StemExpression}

/** The native `graft_stem` Catalyst expression: same results as the
  * UDF (both wrap the published Porter algorithm), resolvable from
  * SQL via GraftExtensions, and codegen-capable (doGenCode path). */
class StemSpec extends AnyFunSuite {

  // the shared TestSpark session registers GraftExtensions
  private lazy val spark: SparkSession = TestSpark.spark

  // Golden cases from the algorithm description (Porter 1980).
  private val golden = Seq(
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat", "feed" -> "feed",
    "agreed" -> "agre", "plastered" -> "plaster", "motoring" -> "motor",
    "sing" -> "sing", "conflated" -> "conflat", "troubling" -> "troubl",
    "sized" -> "size", "hopping" -> "hop", "falling" -> "fall",
    "happy" -> "happi", "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "digitizer" -> "digit", "operator" -> "oper",
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electricity" -> "electr", "hopefulness" -> "hope", "goodness" -> "good",
    "revival" -> "reviv", "adjustment" -> "adjust", "adoption" -> "adopt",
    "activate" -> "activ", "probate" -> "probat", "controlling" -> "control")

  test("expression matches the pure function and the UDF on golden cases") {
    import spark.implicits._
    val df = golden.map(_._1).toDF("w")
      .withColumn("expr_stem", StemExpression.stem(col("w")))
      .withColumn("udf_stem", PorterStemmer.stemUdf(col("w")))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2))).toSeq
    rows.foreach { case (w, e, u) =>
      val want = golden.toMap.apply(w)
      assert(e == want, s"expression stem($w)")
      assert(u == want, s"udf stem($w)")
      assert(PorterStemmer.stem(w) == want, s"fn stem($w)")
    }
  }

  test("graft_stem resolves from SQL through the session extension") {
    import spark.implicits._
    Seq("motoring", "ponies").toDF("w").createOrReplaceTempView("stem_in")
    val got = spark.sql("SELECT graft_stem(w) AS s FROM stem_in ORDER BY s")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("motor", "poni"))
  }

  test("expression keeps the projection inside WholeStageCodegen") {
    val plan = spark.range(100)
      .select(concat(lit("motoring"), col("id")).as("w"))
      .select(StemExpression.stem(col("w")).as("s"))
      .queryExecution.executedPlan.toString
    // codegen'd operators print with a `*(stageId)` prefix
    assert(plan.contains("*(1) Project"), s"no codegen span in:\n$plan")
  }
}
