package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphComponents

/** Large-star/small-star connected components: identical labels to the
  * min-propagation baseline, and convergence far below the graph
  * diameter on an adversarial path graph (the case where
  * min-propagation's O(diameter) rounds degrade). */
class StarSpec extends AnyFunSuite {
  import TestSpark._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("star labels equal min-propagation labels on the dup-pair graph") {
    val docs = Tables.documents(spark, sf).select(col("doc_id").as("node"))
    val edges = queries.Shared.dupPairs(spark, sf)
      .select(col("doc1").as("src"), col("doc2").as("dst"))
    val base = labelsOf(GraphComponents.connectedComponents(docs, edges))
    val star = labelsOf(GraphComponents.connectedComponentsStar(docs, edges))
    assert(star === base)
    queries.Shared.clear()
  }

  test("a 256-node path converges well under its diameter") {
    val nodes = spark.range(0, 256).select(col("id").as("node"))
    val edges = spark.range(0, 255)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    // maxIter 15 << diameter 255: correct labels prove the squaring
    // behaviour (min-propagation would silently stop short here)
    val star = labelsOf(
      GraphComponents.connectedComponentsStar(nodes, edges, maxIter = 15))
    assert(star === (0L until 256L).map(n => (n, 0L)).toSet)
  }
}
