package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key mitigation for shuffled joins.
  *
  * The reference bounds skew semantically (frequency caps,
  * `matching/matcher/EntitiesMatcherV2.scala:45-53`) — those guards are
  * reproduced in [[EntityMatching]] because they change results. This
  * operator covers the remaining case: a join that must keep the hot
  * keys. Two mechanisms, in preference order:
  *
  *  1. AQE skew-join (`spark.sql.adaptive.skewJoin.*`): free, runtime,
  *     splits oversized partitions of a sort-merge join. SkewSpec
  *     asserts it actually fires on a hot-key join.
  *  2. Salting — for the shapes AQE cannot rescue (e.g. the hot side
  *     of a shuffled-hash join, or when one logical key must fan out
  *     across many reducers): append a salt in [0, buckets) to the big
  *     side's key, replicate the small side once per salt value, join
  *     on (key, salt). The replication factor is explicit and bounded.
  */
object Skew {

  /** Salted equi-join: `big ⋈ small` on `key`, with the big side's
    * rows scattered over `buckets` reducers per key and the small side
    * replicated `buckets`×. Output columns = join output minus the
    * salt. Use when a single join key carries a disproportionate share
    * of `big` (the classic 100 TB hot-key: one document matching
    * everything). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // deterministic salt (hash of the whole row modulo buckets), not
    // rand(): repeatable runs hash-compare against the oracle
    val salted = big.withColumn("_salt",
      pmod(hash(big.columns.map(col): _*), lit(buckets)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
