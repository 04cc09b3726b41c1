package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the single most recent right
  * row with `right.ts` STRICTLY before `left.ts` on the same key
  * (event attribution, slowly-changing-dimension lookup, last-quote
  * pricing). The reference has no time-series joins (SURVEY §1.1
  * "Streams: none"), but a complete analytics engine needs one.
  *
  * Spark has no native as-of join, and the naive encodings do not
  * survive scale: a range join (`l.key = r.key AND r.ts < l.ts`)
  * materialises every prior-event candidate pair (O(n·m) per key, then
  * a max-per-left reduction), and a broadcast of the right side caps
  * at driver memory. This implementation is the single-shuffle union
  * encoding instead: tag both sides, union them (columns each side
  * lacks are null-padded), hash-partition by key, sort each partition
  * once by (ts, side), and carry the latest right payload forward with
  * a running `last(_, ignoreNulls)` window. Cost is one shuffle of
  * n+m rows and one sort — the same lower bound as a sort-merge equi
  * join — with zero intermediate pair blow-up, so the plan holds at
  * any per-key event density.
  *
  * Strictness: left rows sort BEFORE right rows at equal `ts` (side 0
  * vs 1), so a right row at exactly `left.ts` is outside the running
  * frame — `<`, not `<=`. Right rows must be unique per (key, ts) for
  * a deterministic result (true of the events table; callers with
  * duplicate instants should pre-reduce the right side).
  */
object AsofJoin {

  /** `payload`: right-side columns to attach (null when no prior right
    * row exists — left-join semantics). `right` must contain
    * `key :: ts :: payload`; all other right columns are dropped.
    *
    * The payload travels as ONE struct (null on left-side rows), so
    * the attached columns always come from the SAME right row — a
    * per-column `last(_, ignoreNulls)` would stitch a legitimately-
    * null payload field together with an older right row's value. */
  def asofPrior(left: DataFrame, right: DataFrame,
                key: String, ts: String,
                payload: Seq[String]): DataFrame = {
    val leftOnly = left.columns.toSeq.filterNot(c => c == key || c == ts)
    // guard the reserved working columns and output-name collisions —
    // without these a left frame already containing __side/__p, or a
    // payload column shadowing a left column, silently yields
    // duplicate/ambiguous output columns (ADVICE r3)
    val reserved = Seq("__side", "__p")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"asofPrior reserves columns ${reserved.mkString(", ")}")
    require(payload.intersect(leftOnly :+ key :+ ts).isEmpty,
      s"payload columns ${payload.intersect(leftOnly :+ key :+ ts).mkString(", ")} " +
        "collide with left-side output columns (alias them on the right first)")
    val pStruct = struct(payload.map(col): _*)
    val l = left.select(
      Seq(col(key), col(ts), lit(0).as("__side")) ++
        leftOnly.map(col) :+
        lit(null).cast(right.select(pStruct).schema.head.dataType).as("__p"): _*)
    val r = right.select(
      Seq(col(key), col(ts), lit(1).as("__side")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        pStruct.as("__p"): _*)
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select((Seq(key, ts) ++ leftOnly).map(col) ++
        payload.map(c => col("__p").getField(c).as(c)): _*)
  }
}
