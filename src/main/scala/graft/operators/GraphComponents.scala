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

  /** Run `body` with the session's shuffle-partition count pinned to
    * the STATE-sized value the CC round frames need (round 18, guide
    * §2.2 "fewer, larger reduce partitions"): every per-round frame is
    * graph-sized — labels + edges, kilobytes to megabytes — while the
    * session conf is sized for corpus-scale shuffles, so each of the
    * O(rounds) tiny exchanges otherwise fans out into
    * `spark.sql.shuffle.partitions` near-empty tasks whose scheduling
    * overhead dominates the round (the q178/EventStream drainSized
    * rationale, measured ~2.5× on q178 in round 16). The pin is
    * scoped to the loop: the conf is restored before the result's
    * consumers plan their own corpus-sized shuffles. */
  private def withStatePartitions[T](df: DataFrame)(body: => T): T = {
    val s = df.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    val pinned = math.min(8, prev.toInt).max(1).toString
    s.conf.set(key, pinned)
    try body finally s.conf.set(key, prev)
  }

  /** nodes: (node); edges: (src, dst). Returns (node, component) with
    * component = min node id reachable. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 30): DataFrame =
    withStatePartitions(nodes) {
      connectedComponentsLoop(nodes, edges, maxIter)
    }

  private def connectedComponentsLoop(nodes: DataFrame, edges: DataFrame,
                                      maxIter: Int): DataFrame = {
    val undirected = edges.select("src", "dst")
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = nodes.select(col("node"), col("node").as("comp"))
      .localCheckpoint()
    // Convergence detection is a byproduct of the label aggregation
    // itself, not a second job: min-propagation only ever DECREASES
    // labels, so the label multiset changed iff sum(comp) strictly
    // decreased. The sum rides the checkpoint action via observe()
    // (decimal accumulator — immune to long overflow at any node
    // count), halving the job count per iteration (VERDICT r3).
    var prevSum: String = null
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
      // string repr so the empty relation ("null" sum every round)
      // also reaches the prev == cur fixpoint instead of spinning
      val curSum = String.valueOf(obs.get("label_sum"))
      converged = prevSum != null && prevSum == curSum
      prevSum = curSum
      labels = next
      i += 1
    }
    undirected.unpersist()
    labels
  }

  /** Alternating large-star/small-star connected components (Kiveris
    * et al., "Connected Components in MapReduce and Beyond") — the
    * known fix for min-propagation's O(diameter) rounds: each
    * iteration squares path lengths, so even adversarial long-chain
    * graphs converge in O(log² n) rounds. Kept as an alternative to
    * [[connectedComponents]] (whose single-join rounds win on the
    * tiny-diameter dedup forests this engine actually builds);
    * StarSpec asserts both produce identical labels and that a
    * 256-node path converges well under its diameter.
    *
    * Edge state is the canonical (hi, lo) pair set. Per round:
    * large-star hangs every larger neighbor of u onto u's minimum
    * neighborhood label; small-star re-hangs the smaller neighbors
    * (and u itself) onto it. Convergence = (count, hash-sum) checksum
    * of the canonical edge set unchanged — one aggregate per round. */
  def connectedComponentsStar(nodes: DataFrame, edges: DataFrame,
                              maxIter: Int = 50): DataFrame =
    withStatePartitions(nodes) {
      connectedComponentsStarLoop(nodes, edges, maxIter)
    }

  private def connectedComponentsStarLoop(nodes: DataFrame,
                                          edges: DataFrame,
                                          maxIter: Int): DataFrame = {
    def canon(df: DataFrame): DataFrame =
      df.filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"),
          least(col("a"), col("b")).as("v"))
        .distinct()

    var e = canon(edges.select(col("src").as("a"), col("dst").as("b")))
      .localCheckpoint()
    var prev: (Long, String) = (-1L, "")
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // large-star over the symmetric adjacency
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val minsL = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val large = canon(sym.join(minsL, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b")))
      // small-star over the canonical (hi, lo) orientation: all
      // neighbors v of u satisfy v <= u, so m = min neighbor
      val minsS = large.groupBy("u").agg(min("v").as("m"))
      val small = canon(
        large.join(minsS, "u").select(col("v").as("a"), col("m").as("b"))
          .union(minsS.select(col("u").as("a"), col("m").as("b"))))
        .localCheckpoint()
      val sig = small
        .agg(count(lit(1)).cast("long").as("n"),
          // decimal accumulator: a long sum of 64-bit hashes overflows
          // under ANSI semantics
          coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
            lit(0).cast("decimal(38,0)")).as("h"))
        .head()
      val cur = (sig.getLong(0), String.valueOf(sig.getDecimal(1)))
      converged = cur == prev
      prev = cur
      e = small
      i += 1
    }
    // fixed point is a star forest: (node, root) plus self-rooted rest.
    // The min-aggregate keeps the output one-row-per-node even if
    // maxIter expired before the edge set contracted to stars (a
    // plain join would multiply rows for still-multi-edge nodes).
    nodes.select(col("node"))
      .join(e.groupBy(col("u").as("node")).agg(min(col("v")).as("comp")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("comp"), col("node")).as("comp"))
  }
}
