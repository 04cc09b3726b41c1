package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Exact.cents
import graft.operators.{Cleaning, GraphComponents}

/** Entity-deduplication family (reference `deduplication/` apps):
  * cleaning UDF bank, blocked self-join pair generation (J8), and
  * connected-components cluster assignment (M7) expressed as iterative
  * DataFrame min-label propagation instead of GraphX.
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  /** M7: near-dup LSH pairs as edges; every document gets the min
    * reachable doc_id as its cluster id (isolated docs: themselves). */
  def q36ConnectedComponents(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val edges = Shared.dupPairs(s, dir)
      .select(col("doc1").as("src"), col("doc2").as("dst"))
    GraphComponents.connectedComponents(
        docs.select(col("doc_id").as("node")), edges)
      .select(col("node").as("doc_id"), col("comp").as("component"))
      .orderBy("doc_id")
  }

  /** J8: blocked dedup self-join — customers in the same nation block
    * with the same segment and account balances within $50 are
    * duplicate suspects. The blocking key bounds the quadratic blowup
    * exactly like the reference's `first_lastname` block
    * (`deduplication/PersonDeduplicationStage.scala:129-144`); the
    * segment/balance rule plays the pair-predicate role. */
  def q37BlockedDedup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(
      col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
      cents(col("c_acctbal")).as("bal_cents"))
    val a = c.select(col("c_nationkey"),
      col("c_custkey").as("id1"), col("c_mktsegment").as("seg1"),
      col("bal_cents").as("bal1"))
    val b = c.select(col("c_nationkey"),
      col("c_custkey").as("id2"), col("c_mktsegment").as("seg2"),
      col("bal_cents").as("bal2"))
    a.join(b, Seq("c_nationkey"))
      .filter(col("id1") < col("id2") &&
        abs(col("bal1") - col("bal2")) < 5000L)
      .select(col("id1"), col("id2"), col("c_nationkey"),
        (col("seg1") === col("seg2")).as("same_segment"),
        abs(col("bal1") - col("bal2")).as("bal_diff_cents"))
      .orderBy("id1", "id2")
  }

  /** Cleaning bank (PersonCleanerStage analogue): normalized text,
    * embedded-id extraction, consistency check against the key. */
  def q38NameClean(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        Cleaning.cleanText(col("c_name")).as("clean_name"),
        Cleaning.embeddedId(col("c_name")).as("name_id"),
        Cleaning.cleanText(col("c_mktsegment")).as("clean_segment"))
      .withColumn("id_consistent", col("name_id") === col("c_custkey"))
      .orderBy("c_custkey")

  val queries: Map[String, Q] = Map(
    "q36_connected_components" -> (q36ConnectedComponents _),
    "q37_blocked_dedup" -> (q37BlockedDedup _),
    "q38_name_clean" -> (q38NameClean _))

  val oracles: Map[String, String] = Map(
    "q36_connected_components" ->
      s"""WITH RECURSIVE ${TextQueries.lshDupPairsCtes},
         e2 AS (SELECT doc1 AS a, doc2 AS b FROM dup_pairs
                UNION SELECT doc2, doc1 FROM dup_pairs),
         n(x) AS (SELECT doc_id FROM documents),
         reach(a, b) AS (
           SELECT x, x FROM n
           UNION
           SELECT r.a, e2.b FROM reach r JOIN e2 ON r.b = e2.a)
         SELECT a AS doc_id, min(b) AS component
         FROM reach GROUP BY a ORDER BY doc_id""",
    "q37_blocked_dedup" ->
      """WITH c AS (SELECT c_custkey, c_nationkey, c_mktsegment,
           CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents FROM customer)
         SELECT a.c_custkey AS id1, b.c_custkey AS id2,
           a.c_nationkey,
           a.c_mktsegment = b.c_mktsegment AS same_segment,
           abs(a.bal_cents - b.bal_cents) AS bal_diff_cents
         FROM c a JOIN c b
           ON a.c_nationkey = b.c_nationkey
          AND a.c_custkey < b.c_custkey
         WHERE abs(a.bal_cents - b.bal_cents) < 5000
         ORDER BY id1, id2""",
    "q38_name_clean" ->
      """SELECT c_custkey,
         trim(regexp_replace(regexp_replace(lower(c_name), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean_name,
         CAST(nullif(regexp_extract(c_name, '([0-9]+)', 1), '') AS BIGINT) AS name_id,
         trim(regexp_replace(regexp_replace(lower(c_mktsegment), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean_segment,
         CAST(nullif(regexp_extract(c_name, '([0-9]+)', 1), '') AS BIGINT) = c_custkey AS id_consistent
         FROM customer ORDER BY c_custkey""")
}
