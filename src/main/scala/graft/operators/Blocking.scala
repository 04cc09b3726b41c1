package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked self-join guards (reference:
  * `deduplication/PersonDeduplicationStage.scala:116-144`, which
  * repartitions by blocking key precisely because block size bounds the
  * quadratic pair blowup; `matching/EntitiesMatcherV2.scala:46-50`
  * applies the same idea as per-entity occurrence caps).
  *
  * A blocked dedup self-join is only scale-safe if (a) the number of
  * blocks grows with the data — a constant-cardinality key makes every
  * block O(n) and the join O(n²) — and (b) a hot block (a common
  * surname, a default value) cannot blow up alone. (a) is the caller's
  * key choice; (b) is [[capBlocks]].
  */
object Blocking {

  /** Drop all rows of blocks larger than `cap` members before a
    * blocked self-join — the within-block occurrence guard. One
    * map-side-combined count per key plus a left-semi join that reuses
    * the same hash partitioning the pair join needs next. The input
    * feeds BOTH sides of that semi join, so an unpersisted lineage
    * would be computed twice — it is persisted here (and tracked for
    * session cleanup) exactly like percentileNormalise's input. */
  def capBlocks(df: DataFrame, keys: Seq[String], cap: Long): DataFrame = {
    val in =
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        graft.queries.Shared.track(p)
        p
      } else df
    val small = in.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__block_n"))
      .filter(col("__block_n") <= cap)
      .select(keys.map(col): _*)
    in.join(small, keys, "left_semi")
  }

  /** The matching DuckDB oracle fragment: CTE text selecting the
    * under-cap keys of `rel`, to semi-join against. */
  def sqlCapKeys(rel: String, keys: Seq[String], cap: Long): String =
    s"SELECT ${keys.mkString(", ")} FROM $rel " +
      s"GROUP BY ${keys.mkString(", ")} HAVING count(*) <= $cap"
}
