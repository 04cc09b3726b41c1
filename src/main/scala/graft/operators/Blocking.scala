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

  /** Multi-probe expansion (Lv et al. 2007's 1-step probe set): one
    * row per (input row, flipped bit), with `keyCol` XOR'd by each
    * single bit below `bits`. This is the query-side recall lever
    * every banded prefilter shares — q194 probes its LSH band keys,
    * q207 its fingerprint words — extracted here so the next banded
    * prefilter gets it (and the one spelling) for free. Emits ONLY the
    * flipped rows: callers union the originals back when the exact
    * bucket should also be probed, and keep the hot-bucket cap on the
    * probe side ([[capBlocks]]) because a probe landing in a hot
    * bucket blows up the candidate join exactly like an exact hit. */
  def bitFlipProbes(df: DataFrame, keyCol: String, bits: Int): DataFrame =
    df.withColumn(keyCol, explode(expr(
      s"transform(sequence(0, ${bits - 1}), " +
        s"b -> $keyCol ^ shiftleft(CAST(1 AS BIGINT), b))")))

  /** The matching DuckDB oracle fragment: CTE text selecting the
    * under-cap keys of `rel`, to semi-join against. */
  def sqlCapKeys(rel: String, keys: Seq[String], cap: Long): String =
    s"SELECT ${keys.mkString(", ")} FROM $rel " +
      s"GROUP BY ${keys.mkString(", ")} HAVING count(*) <= $cap"
}
