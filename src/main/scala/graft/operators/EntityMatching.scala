package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exact

/** TF-IDF entity-overlap candidate generation and scoring.
  *
  * Semantics follow the reference's inverted-index matcher and scorer
  * (`matching/matcher/EntitiesMatcherV2.scala:38-101`,
  * `matching/scorer/EntitiesScorer.scala:38-79`): documents sharing an
  * entity become candidate pairs; each shared entity contributes
  * `(tf1 + tf2) * idf` with `idf = log10(N / df)`; pair score is
  * `sum * (1 + scoreFactor * teamFactor)` with
  * `teamFactor = n_shared * (0.5/count1 + 0.5/count2)`.
  *
  * The *implementation* is deliberately not the reference's: instead of
  * `groupBy(collect_list(struct))` followed by `explode` on both join
  * sides (which materialises postings arrays only to immediately
  * re-flatten them), we keep everything as flat relations and let
  * Catalyst plan plain shuffled equi-joins on `entity_id`. At cluster
  * scale the only shuffles are: one hash-aggregate per grouping key and
  * one shuffle of the postings relation on `entity_id` reused by both
  * sides of the self-join (Spark reuses the exchange). Skew is bounded
  * by the frequency guards, which are *semantic* (the reference applies
  * them too, `EntitiesMatcherV2.scala:45-53`): a hot entity shared by
  * f docs would otherwise emit f² pairs.
  *
  * IDF is quantized to integer micro-units (`idf_micro`) so pair-score
  * sums are exact integers — see [[graft.functions.Exact]].
  */
object EntityMatching {

  /** Frequency guards + score factor (reference defaults:
    * safe-mode fraction 1/20, scoreFactor from config). */
  final case class Config(
      safeModeFraction: Option[Double] = Some(1.0 / 20),
      maxOccurrence: Option[Long] = None,
      minSharedEntities: Long = 1L,
      scoreFactor: Double = 10.0)

  /** Per-(doc, entity) term frequency; duplicate input rows are the
    * term count, as in the reference. Input columns: doc_id, entity_id. */
  def termFrequencies(entities: DataFrame): DataFrame =
    entities.groupBy("doc_id", "entity_id").agg(count(lit(1)).as("tf"))

  /** Candidate pairs with per-entity TF-IDF contributions.
    *
    * Output: doc1, doc2 (doc1 < doc2), entity_id, tf1, tf2, cnt1, cnt2,
    * idf_micro (= round(log10(N/df)*1e6), exact integer).
    */
  def candidatePairs(entities: DataFrame, cfg: Config = Config()): DataFrame = {
    // N = distinct documents, as a 1-row broadcast frame (lazy, no
    // driver-side action; at 100 TB this is a metadata-cheap agg).
    val nDocs = entities.agg(countDistinct("doc_id").as("n_docs"))

    // Safe-mode / cap guards count raw rows per entity (reference
    // counts duplicates too, EntitiesMatcherV2.scala:46-50).
    val rawFreq = entities.groupBy("entity_id").agg(count(lit(1)).as("raw_freq"))
    val guarded = (cfg.safeModeFraction, cfg.maxOccurrence) match {
      case (None, None) => entities
      case (frac, cap) =>
        val keep = rawFreq
          .crossJoin(broadcast(nDocs))
          .filter(
            frac.map(f => col("raw_freq") < col("n_docs") * f).getOrElse(lit(true)) &&
            cap.map(c => col("raw_freq") <= c).getOrElse(lit(true)))
          .select("entity_id")
        entities.join(keep, Seq("entity_id"), "left_semi")
    }

    val tf = termFrequencies(guarded)
    val docCounts = guarded.groupBy("doc_id").agg(count(lit(1)).as("doc_entity_count"))
    // df = distinct docs per entity; idf = log10(N/df), micro-quantized.
    val idf = tf.groupBy("entity_id").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_micro",
        round(log10(col("n_docs").cast("double") / col("df")) * 1e6).cast("long"))
      .select("entity_id", "idf_micro")

    val postings = tf
      .join(docCounts, "doc_id")
      .select(col("doc_id"), col("entity_id"), col("tf"), col("doc_entity_count"))

    val a = postings.select(
      col("entity_id"),
      col("doc_id").as("doc1"), col("tf").as("tf1"),
      col("doc_entity_count").as("cnt1"))
    val b = postings.select(
      col("entity_id"),
      col("doc_id").as("doc2"), col("tf").as("tf2"),
      col("doc_entity_count").as("cnt2"))

    a.join(b, Seq("entity_id"))
      .filter(col("doc1") < col("doc2"))
      .join(idf, Seq("entity_id"))
  }

  /** Roll candidate pairs up to scored matches (reference
    * `EntitiesScorer.score`). Output: doc1, doc2, score_type,
    * item_count, score_micro (exact), score (double, 6-dp rounded). */
  def scorePairs(cands: DataFrame, scoreType: String,
                 cfg: Config = Config()): DataFrame = {
    // cnt1/cnt2 are functionally dependent on doc1/doc2 — aggregating
    // them (instead of grouping by all four) leaves the output
    // hash-partitioned on exactly (doc1, doc2), so every downstream
    // pair-keyed groupBy/join runs shuffle-free off the cached frame
    // (HashPartitioning on a grouping-key subset would NOT satisfy the
    // four-column grouping the other way around).
    val rolled = cands
      .groupBy("doc1", "doc2")
      .agg(
        max("cnt1").as("cnt1"),
        max("cnt2").as("cnt2"),
        sum((col("tf1") + col("tf2")) * col("idf_micro")).as("sum_micro"),
        count(lit(1)).as("item_count"))
      .filter(col("item_count") >= cfg.minSharedEntities)
    rolled
      .withColumn("team_factor",
        col("item_count") * (lit(0.5) / col("cnt1") + lit(0.5) / col("cnt2")))
      .withColumn("score", Exact.r6(
        (col("sum_micro") / 1e6) * (lit(1.0) + lit(cfg.scoreFactor) * col("team_factor"))))
      .withColumn("score_type", lit(scoreType))
      .select("doc1", "doc2", "score_type", "item_count", "score")
  }
}
