package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Declared schemas for the engine's inter-stage relations, with the
  * runtime validation the reference applies after every pipeline stage
  * (`matching/pipepline/Pipeline.scala:193-201` +
  * `DataFrameValidator.scala:21-56` — name and dataType are checked
  * column-by-column, nullability deliberately ignored; the reference's
  * `SchemaStorage.scala:20-205` is the registry role).
  *
  * Spark-first difference: validation is a zero-cost assertion on
  * `df.schema` (driver-side metadata), not a data pass, so guarding
  * every stage costs nothing at any scale.
  */
object Schemas {

  /** (doc, entity) input to the inverted-index matcher —
    * `entitiesByIdSchema`, reference `SchemaStorage.scala:34-37`. */
  val entities: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("entity_id", LongType)))

  /** Candidate pairs out of `EntityMatching.candidatePairs` (J1/A1/A2:
    * tf/doc-entity-count/idf per shared entity). */
  val candidatePairs: StructType = StructType(Seq(
    StructField("entity_id", LongType),
    StructField("doc1", LongType),
    StructField("doc2", LongType),
    StructField("tf1", LongType),
    StructField("tf2", LongType),
    StructField("cnt1", LongType),
    StructField("cnt2", LongType),
    StructField("idf_micro", LongType)))

  /** Scored pairs out of `EntityMatching.scorePairs` — the
    * match-candidate relation (reference `SchemaStorage.scala:60-70`,
    * minus the minted surrogate id, which SURVEY §7.4-2 replaces with
    * the natural (doc1, doc2, score_type) key). */
  val matchScores: StructType = StructType(Seq(
    StructField("doc1", LongType),
    StructField("doc2", LongType),
    StructField("score_type", StringType),
    StructField("item_count", LongType),
    StructField("score", DoubleType)))

  /** Flagship output: match scores + the percentile-normalised score
    * (`NormalisationStage` output shape). */
  val rankedMatches: StructType = StructType(
    matchScores.fields :+ StructField("norm_score", DoubleType))

  /** Validate name + dataType column-by-column (nullability ignored,
    * exactly the reference's rule); returns `df` so stages chain:
    * `validate(stage(df), Schemas.x, "stage")`. Fails fast with every
    * mismatch listed, not just the first. */
  def validate(df: DataFrame, expected: StructType, stage: String): DataFrame = {
    val got = df.schema
    val errs = Seq.newBuilder[String]
    if (got.length != expected.length)
      errs += s"column count ${got.length} != expected ${expected.length}"
    got.fields.zip(expected.fields).foreach { case (g, e) =>
      if (g.name != e.name) errs += s"column '${g.name}' != expected '${e.name}'"
      else if (g.dataType != e.dataType)
        errs += s"column '${g.name}': ${g.dataType.simpleString} != expected ${e.dataType.simpleString}"
    }
    val es = errs.result()
    require(es.isEmpty, s"[$stage] schema mismatch: ${es.mkString("; ")}")
    df
  }
}
