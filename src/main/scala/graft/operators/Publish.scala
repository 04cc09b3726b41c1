package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic publish (reference S8: `utils/database/DbManager.scala:636-648`
  * publishes a run by a 3-way `ALTER SCHEMA RENAME` swap so readers
  * never see a half-written snapshot).
  *
  * Warehouse equivalent: each run writes a NEW versioned table and
  * then repoints a stable view at it with one catalog operation
  * (`CREATE OR REPLACE VIEW`). Readers resolve the view at query
  * start; the swap never mutates data a reader is scanning, and a
  * failed run leaves the view on the previous version. */
object Publish {

  /** Write `df` as `<view>_v<version>` and repoint `view` at it.
    * Returns the versioned table name. */
  def publishSnapshot(spark: SparkSession, view: String, version: Long,
                      df: DataFrame): String = {
    val table = s"${view}_v$version"
    df.write.mode("overwrite").saveAsTable(table)
    spark.sql(s"CREATE OR REPLACE VIEW $view AS SELECT * FROM $table")
    table
  }
}
