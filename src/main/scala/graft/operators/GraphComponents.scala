package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a DataFrame edge list — the dedup
  * clustering step (reference: GraphX `connectedComponents` in
  * `deduplication/PersonDeduplicationStage.scala:150-159`).
  *
  * Instead of crossing the RDD/GraphX boundary we run iterative
  * min-label propagation with joins: each round every node adopts the
  * smallest component id among itself and its neighbours; fixpoint in
  * O(graph diameter) rounds. Each round is one equi-join + one hash
  * aggregate, both shuffling on the node id, so AQE reuses the
  * partitioning; `localCheckpoint` truncates the growing lineage so
  * plan size stays constant across iterations.
  *
  * Dedup graphs are huge forests of tiny clusters — diameters of 2-5 —
  * so rounds stay in single digits even at 100 TB. (For adversarial
  * long-chain graphs the known fix is the large-star/small-star
  * algorithm, which squares path lengths per round; not needed for the
  * dedup workload.)
  */
object GraphComponents {

  /** nodes: (node); edges: (src, dst). Returns (node, component) with
    * component = min node id reachable. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 30): DataFrame = {
    val undirected = edges.select("src", "dst")
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_ONLY)

    var labels = nodes.select(col("node"), col("node").as("comp"))
      .localCheckpoint()
    // Convergence detection is a byproduct of the label aggregation
    // itself, not a second job: min-propagation only ever DECREASES
    // labels, so the label multiset changed iff sum(comp) strictly
    // decreased. The sum rides the checkpoint action via observe()
    // (decimal accumulator — immune to long overflow at any node
    // count), halving the job count per iteration (VERDICT r3).
    var prevSum: java.math.BigDecimal = null
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      val neighbourComp = undirected
        .join(labels, undirected("src") === labels("node"))
        .select(undirected("dst").as("node"), col("comp"))
      val obs = org.apache.spark.sql.Observation(s"cc_round_$i")
      val next = labels.union(neighbourComp)
        .groupBy("node").agg(min("comp").as("comp"))
        .observe(obs, sum(col("comp").cast("decimal(38,0)")).as("label_sum"))
        .localCheckpoint()
      val curSum = obs.get("label_sum").asInstanceOf[java.math.BigDecimal]
      converged = prevSum != null && prevSum.compareTo(curSum) == 0
      prevSum = curSum
      labels = next
      i += 1
    }
    undirected.unpersist()
    labels
  }
}
