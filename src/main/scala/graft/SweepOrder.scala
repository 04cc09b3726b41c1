package graft

/** Family-clustered sweep order for multi-query harnesses (Bench,
  * Verify).
  *
  * The round-14 sf10 run measured WHY order matters: the ~31 GiB
  * matchPairs/partScores family exceeds any reasonable cache budget
  * together with the other memo families, and its consumers were
  * scattered across the alphabetical sweep (q13…q20, then q43/q44,
  * then q72, then q159–161, then q199–203) — so the budget evicted
  * and the consumers rebuilt it ~15 times (101 evictions, 2.54×
  * like-for-like). Running each memo family's consumers CONTIGUOUSLY
  * bounds rebuilds to at most one per family regardless of budget,
  * which is exactly how a user would schedule a multi-query session
  * over shared intermediates.
  *
  * The group assignment below is GENERATED, not guessed: a discovery
  * sweep (SPARK_GRAFT_TOUCH_REPORT=1, sf0.001, 2026-08-16) recorded
  * which queries touch which memo key via [[queries.Shared]]'s touch
  * log; each group is the consumer set of one cache-family cluster.
  * Queries touching no memo run last (their transients are retired
  * per-query, so they exert no cache pressure on anyone).
  *
  * Group order runs the most expensive family FIRST, straight after
  * the warm pass builds it, so the big frames are consumed while
  * fresh and can be evicted (cheapest-per-byte first) once their
  * cluster ends.
  */
object SweepOrder {

  // consumers of the quadratic match family (partCands, partScores,
  // partSuppScores, pivotedScores, pairScores3, pairScores6, k6walk)
  private val matchFamily = Set(
    13, 14, 15, 16, 17, 18, 19, 20, 43, 44, 71, 72, 94,
    159, 160, 161, 199, 200, 203)

  // consumers of the text-dedup families (dupPairs, simhashes,
  // shingleTf3) — overlapping consumer sets (q59, q93, q111, q197
  // touch two of the three), so they schedule as one block
  private val textFamily = Set(
    26, 27, 36, 45, 49, 50, 59, 81, 93, 105, 111, 123, 129, 153,
    190, 193, 197, 204)

  // consumers of the vector families (lshBuckets, kmeans8, pqCodebook/
  // pqCodes, ivfpqBook/ivfpqCodes, mmrCands/mmrSims, cosineWeights,
  // mlMinhashTf) — plus q30, the brute-force truth the recall graders
  // recompute inline
  private val vectorFamily = Set(
    29, 30, 31, 57, 74, 82, 106, 118, 158, 162, 163, 164, 168, 171,
    172, 173, 174, 178, 186, 187, 194)

  // consumers of the small graph/vocab families (prEdges, bpeVocab)
  private val graphFamily = Set(119, 121, 131, 182)

  private def numericId(name: String): Int =
    name.drop(1).takeWhile(_.isDigit).toInt

  /** Sort key: (family group, numeric id). Ties inside a group run in
    * numeric order; queries touching no memo family run last. */
  def key(name: String): (Int, Int) = {
    val id = numericId(name)
    val group =
      if (matchFamily(id)) 0
      else if (textFamily(id)) 1
      else if (vectorFamily(id)) 2
      else if (graphFamily(id)) 3
      else 4
    (group, id)
  }

  def sort[T](qs: Seq[(String, T)]): Seq[(String, T)] =
    qs.sortBy { case (n, _) => key(n) }
}
