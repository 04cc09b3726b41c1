package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Source/sink format coverage (SURVEY §2.1): the reference reads
  * JDBC subqueries, flat files from a shared FS (S3,
  * `matching/datasource/FileDataSource.scala:37-61`) and tab-separated
  * text resources (S6, `analyser/DocumentWordSpecAnalyser2.scala:57-61`),
  * and writes every artifact to a warehouse (S7). Re-expressed
  * Spark-first: each query round-trips a testdata table through a
  * non-parquet format (csv / json lines / tab-separated text /
  * hive-partitioned parquet) with an explicit schema on the read side,
  * then computes an aggregate the DuckDB oracle reproduces straight
  * from the parquet table — proving the format hop is lossless.
  *
  * Writes land under /tmp keyed by the sf dir, overwritten per run
  * (idempotent). At cluster scale the same code targets a shared
  * object store; the format-hop semantics are identical.
  */
object SourceQueries {

  type Q = (SparkSession, String) => DataFrame

  private def ioDir(dir: String, leaf: String): String =
    s"/tmp/graft_io/${dir.replaceAll("[^A-Za-z0-9.]+", "_")}/$leaf"

  /** S6-shaped CSV hop: nation → csv with header → schema'd read →
    * broadcast-join region → per-region name roll-up. */
  def q62CsvSource(s: SparkSession, dir: String): DataFrame = {
    val path = ioDir(dir, "nation_csv")
    Tables.nation(s, dir).write.mode("overwrite")
      .option("header", "true").csv(path)
    val schema = StructType(Seq(
      StructField("n_nationkey", LongType),
      StructField("n_name", StringType),
      StructField("n_regionkey", LongType)))
    val nation = s.read.schema(schema).option("header", "true").csv(path)
    nation.join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"))
      .agg(count(lit(1)).as("n_nations"),
        array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
      .orderBy("region")
  }

  /** JSON-lines hop: customer → json → schema'd read → per-segment
    * totals in exact cents. */
  def q63JsonSource(s: SparkSession, dir: String): DataFrame = {
    val path = ioDir(dir, "customer_json")
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      .write.mode("overwrite").json(path)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_mktsegment", StringType),
      StructField("bal_cents", LongType)))
    s.read.schema(schema).json(path)
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum("bal_cents").as("sum_bal_cents"),
        min("c_custkey").as("min_key"), max("c_custkey").as("max_key"))
      .orderBy("segment")
  }

  /** S6 exactly: tab-separated text resource → `spark.read.text` →
    * split("\t") parse → frequency roll-up (the reference's
    * word-frequency file pattern). */
  def q64TextSource(s: SparkSession, dir: String): DataFrame = {
    val path = ioDir(dir, "doc_lang_txt")
    Tables.documents(s, dir)
      .select(concat_ws("\t", col("doc_id"), col("lang"), col("source"))
        .as("value"))
      .write.mode("overwrite").text(path)
    val parts = split(col("value"), "\t")
    s.read.text(path)
      .select(parts.getItem(0).cast("long").as("doc_id"),
        parts.getItem(1).as("lang"), parts.getItem(2).as("source"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_checksum"))
      .orderBy("lang", "source")
  }

  /** S7 + partition pruning: orders → parquet partitioned by status →
    * filtered read (the scan only touches the `O` directory —
    * PartitionFilters in the plan) → yearly roll-up. */
  def q65PartitionedSink(s: SparkSession, dir: String): DataFrame = {
    val path = ioDir(dir, "orders_by_status")
    Tables.orders(s, dir).write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(path)
    s.read.parquet(path)
      .filter(col("o_orderstatus") === "O")
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
      .orderBy("yr")
  }

  /** S3 exactly (`matching/datasource/FileDataSource.scala:37-61`): a
    * (doc_id, file_path) TABLE drives which files' contents are loaded
    * on executors — the reference reads the path list from JDBC, then
    * each worker fetches its files from the shared FS. Re-expressed
    * Spark-first: the corpus is laid out one file per document
    * (`partitionBy(doc_id)` text write — each doc is a single row, so
    * exactly one file); the path table selects HALF the documents (even
    * ids), and the loader is `spark.read.text` over the corpus root +
    * a join ON THE FILE PATH (scheme-stripped `input_file_name()`
    * prefix vs the table's file_path) — contents flow only through
    * executors, the driver sees paths, and the path column is the
    * actual join key, not decoration. The join proves the fetch is
    * table-DRIVEN (odd-id files exist on disk but are never emitted).
    * The md5 roll-up proves the file hop is byte-lossless vs the
    * parquet original. Requires newline-free documents (a text file
    * holds lines, not documents) — SourceSpec pins that invariant. */
  def q95PathDrivenSource(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // Fixture prep, not the operator under test: a real S3-backed
    // corpus already exists on the shared FS. Laying out one file per
    // document costs ~1 min of local-FS metadata ops at sf0.1, so the
    // (deterministic) layout is created once and reused. The dir name
    // carries a corpus fingerprint so a regenerated/edited documents
    // table gets a fresh layout instead of silently reusing staleness.
    // the crc32 sum makes the fingerprint content-sensitive: a
    // regenerated corpus that preserves row count, ids, and per-doc
    // lengths but changes text still invalidates the cached layout
    val fp = docs.agg(count(lit(1)).as("n"), sum("doc_id").as("ids"),
      sum(length(col("text"))).as("len"),
      sum(crc32(col("text"))).as("crc")).head()
    val path = ioDir(dir,
      s"doc_files_${fp.getLong(0)}_${fp.getLong(1)}_${fp.getLong(2)}_${fp.getLong(3)}")
    val marker = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      docs.select(col("doc_id"), col("text").as("value"))
        .write.mode("overwrite").partitionBy("doc_id").text(path)
    }
    // the driving path table (the reference's JDBC-sourced list):
    // half the corpus, keyed by the file path
    val pathTable = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"),
        concat(lit(path + "/doc_id="), col("doc_id")).as("file_path"))
    // normalize the URI scheme (file:/ vs file:///) to a bare absolute
    // path, then keep the directory prefix up to the partition value
    val barePath =
      regexp_replace(input_file_name(), "^[a-z]+:/+", "/")
    val loaded = s.read.text(path)
      .select(col("value").as("text"),
        regexp_extract(barePath, "^(.*/doc_id=\\d+)", 1).as("file_path"))
    loaded.join(pathTable, Seq("file_path"))
      .select(col("doc_id"), length(col("text")).as("text_len"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  private val shardBytes = 65536L   // compaction target per shard

  /** Fingerprint-cached build of the compacted corpus store: documents
    * packed into ~[[shardBytes]]-sized text-carrying parquet shards by
    * running byte count (q92's TWO-PHASE distributed cumulative sum —
    * the only global sort is over n/1000 bucket rows), plus a small
    * doc→shard manifest. Built once per corpus fingerprint (same
    * content-sensitive key as q95's layout) and shared by q98
    * (inventory round-trip) and q99 (serving reads). Returns
    * (storePath, manifestPath). */
  /** The two-phase distributed cumsum shard assignment (the q92
    * scheme): global doc_id-order running byte count div
    * [[shardBytes]], computed WITHOUT a global sort over the corpus —
    * per-bucket window sums plus a broadcast of n/1000 bucket offsets.
    * `offset` shifts the whole assignment past existing shards (the
    * append path). Returns (doc_id, n_bytes, text, shard_id). */
  private[graft] def shardAssign(docs: DataFrame, offset: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(col("doc_id"), col("text"),
      length(col("text")).cast("long").as("n_bytes"),
      expr("doc_id div 1000").as("bucket"))
    val offsets = d.groupBy("bucket").agg(sum("n_bytes").as("bt"))
      .withColumn("boff", coalesce(
        sum("bt").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "boff")
    val wIn = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum", sum("n_bytes").over(wIn) + col("boff"))
      .withColumn("shard_id",
        expr(s"(cum - n_bytes) div $shardBytes") + lit(offset))
      .select("doc_id", "n_bytes", "text", "shard_id")
  }

  private[graft] def compactedStore(s: SparkSession, dir: String): (String, String) = {
    val docs = Tables.documents(s, dir)
    val fp = docs.agg(count(lit(1)).as("n"), sum("doc_id").as("ids"),
      sum(length(col("text"))).as("len"),
      sum(crc32(col("text"))).as("crc")).head()
    // shardBytes is part of the key: retuning the shard size must
    // invalidate the cached store, same as a content change
    val base = ioDir(dir,
      s"compacted_${shardBytes}_${fp.getLong(0)}_${fp.getLong(1)}_${fp.getLong(2)}_${fp.getLong(3)}")
    val storePath = s"$base/shards"
    val manifestPath = s"$base/manifest"
    val marker = new org.apache.hadoop.fs.Path(base, "_DONE")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      shardAssign(docs, 0L)
        .write.mode("overwrite").partitionBy("shard_id").parquet(storePath)
      // Derive the manifest from the WRITTEN store instead of
      // re-evaluating the cumsum pipeline: column pruning reads only
      // the three small columns, never the text bytes
      s.read.parquet(storePath).select("doc_id", "shard_id", "n_bytes")
        .write.mode("overwrite").parquet(manifestPath)
      fs.create(marker, true).close()
    }
    (storePath, manifestPath)
  }

  /** q98: small-file compaction — the operational remedy for the
    * file-per-document corpus q95 reads (5000 file opens cost ~12 s at
    * sf0.1 even locally; on an object store, per-request latency makes
    * uncompacted corpora unusable). The per-shard inventory is computed
    * by READING THE STORE BACK — so the oracle (which re-derives the
    * shard assignment relationally) verifies the round trip, not just
    * the math. */
  def q98CompactedStore(s: SparkSession, dir: String): DataFrame = {
    val (storePath, _) = compactedStore(s, dir)
    s.read.parquet(storePath)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_bytes").as("shard_bytes"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("shard_id")
  }

  /** q99: q95's path-driven fetch SERVED FROM the q98 compacted store —
    * the remedy demonstrably remedying the cost it was built for. The
    * same request table (the even-id half of the corpus) resolves
    * through the doc→shard manifest to the shards that hold its
    * documents; the store read is joined to that (broadcast) shard
    * list — Spark's dynamic partition pruning skips unrequested shards
    * at runtime — then semi-joined to the request ids. Identical output
    * to q95 (same oracle: per-doc length + md5), but ~n_docs/400 file
    * opens instead of one per document. An id-localized fetch prunes
    * further: shards are id-ordered, so a range request touches only
    * its shard range (SourceSpec asserts the pruned plan). */
  def q99StoreFetch(s: SparkSession, dir: String): DataFrame = {
    val (storePath, manifestPath) = compactedStore(s, dir)
    val requests = Tables.documents(s, dir)
      .filter(col("doc_id") % 2 === 0).select("doc_id")
    val wanted = s.read.parquet(manifestPath)
      .join(requests, Seq("doc_id"))
      .select("shard_id").distinct()
    s.read.parquet(storePath)
      .join(broadcast(wanted), Seq("shard_id"))
      .join(requests, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), length(col("text")).as("text_len"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** q101: incremental APPEND to the compacted store — the ingestion
    * path q98's one-shot build needs at scale. Yesterday's corpus
    * (doc_id % 4 ≠ 3) is sharded and written once; today's batch
    * (doc_id % 4 = 3) gets the same cumsum assignment OFFSET past the
    * existing max shard id and lands as append-only partitions — no
    * existing shard file is rewritten, and readers of the store see
    * old + new without coordination (each parquet partition dir is
    * immutable once written). Output: per-shard inventory of the
    * COMBINED store read back, tagged with the batch it arrived in;
    * the oracle re-derives both assignments and the offset
    * relationally. */
  def q101StoreAppend(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val fp = docs.agg(count(lit(1)).as("n"), sum("doc_id").as("ids"),
      sum(length(col("text"))).as("len"),
      sum(crc32(col("text"))).as("crc")).head()
    val base = ioDir(dir,
      s"appendstore_${shardBytes}_${fp.getLong(0)}_${fp.getLong(1)}_${fp.getLong(2)}_${fp.getLong(3)}")
    val storePath = s"$base/shards"
    val marker = new org.apache.hadoop.fs.Path(base, "_DONE")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      shardAssign(docs.filter(col("doc_id") % 4 =!= 3), 0L)
        .write.mode("overwrite").partitionBy("shard_id").parquet(storePath)
      // driver-side scalar (S9 pattern, bounded): the append offset =
      // one past the base store's max shard. cast("long") because a
      // read-back partition column may infer as int
      val off = s.read.parquet(storePath)
        .agg(max(col("shard_id").cast("long"))).head().getLong(0) + 1L
      shardAssign(docs.filter(col("doc_id") % 4 === 3), off)
        .write.mode("append").partitionBy("shard_id").parquet(storePath)
      fs.create(marker, true).close()
    }
    // batch provenance is recoverable from content (appended shards
    // hold only doc_id % 4 = 3 docs), so a reader needs no side state
    s.read.parquet(storePath)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_bytes").as("shard_bytes"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .withColumn("batch",
        when(col("min_doc") % 4 === 3, lit(1L)).otherwise(lit(0L)))
      .orderBy("shard_id")
  }

  /** S1/S2 at bench scale (the reference's primary source,
    * `matching/datasource/SqlDataSource.scala:34-58`): the orders
    * table round-trips through embedded Derby — JDBC batch write, a
    * driver-side min/max bounds query, then the PARTITIONED read
    * (16 stride partitions on the key) with the status predicate
    * pushed down to the database — so the whole S1 path has a
    * measured cost at sf0.1, not just JdbcSpec's API proof. The
    * roll-up matches the parquet-side oracle, proving the hop is
    * lossless. At cluster scale the same code points at a warehouse
    * JDBC endpoint; numPartitions becomes the reference's 2048. */
  def q100JdbcSource(s: SparkSession, dir: String): DataFrame = {
    val dbDir = ioDir(dir, "derby_db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"),
        year(col("o_orderdate")).as("o_year"))
      .write.mode("overwrite")
      // Derby maps StringType to CLOB (not comparable, no pushdown);
      // declare VARCHAR explicitly
      .option("createTableColumnTypes", "o_orderstatus VARCHAR(4)")
      // default batchsize is 1000; larger batches cut the per-round-trip
      // overhead that dominates an embedded-Derby bulk load
      .option("batchsize", "10000")
      .jdbc(url, "orders_bench", props)
    // S1's driver-side scalar bounds query — pushed to the database as
    // a derived table so Derby computes the two scalars (a plain
    // .jdbc().agg() would stream the whole table through one
    // connection just to find min/max)
    // (Spark's JDBC writer quotes column names, so Derby holds them
    // case-sensitively lowercase — quote them here too)
    val bounds = s.read.jdbc(url,
      "(SELECT MIN(\"o_orderkey\") AS mn, MAX(\"o_orderkey\") AS mx " +
        "FROM orders_bench) b", props).head()
    val part = s.read
      .option("partitionColumn", "o_orderkey")
      .option("lowerBound", bounds.getLong(0).toString)
      .option("upperBound", (bounds.getLong(1) + 1).toString)
      .option("numPartitions", "16")
      .jdbc(url, "orders_bench", props)
    part.filter(col("o_orderstatus") =!= "F")   // pushed to Derby
      .groupBy("o_year", "o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), sum("price_cents").as("sum_cents"))
      .orderBy("o_year", "o_orderstatus")
  }

  /** q138: Z-order layout audit — the multi-dimensional clustering
    * math behind Delta/Iceberg OPTIMIZE ZORDER, as a measurable
    * query: orders map to a 64-cell Z-curve over (order date octile,
    * total-price octile) with bit interleaving done in plain integer
    * arithmetic, each cell reporting the min/max per-dimension stats
    * a file footer would carry, plus — for a concrete box query
    * (year-1997 AND ≥ $50 k) — whether the cell's stats overlap the
    * box and how many rows inside it actually match. The pruning
    * claim becomes a number: non-overlapping cells are skipped
    * entirely, and because the Z-curve keeps both dimensions local,
    * the overlap set stays near the box's true volume where a
    * single-column sort would leave every file overlapping on the
    * second dimension.
    *
    * Scale shape: the cell id is a pure map-side expression; the
    * audit is ONE combinable groupBy over 64 cells. The write path
    * this audits is `repartitionByRange(col("z"))` + sortWithinPartitions
    * — no shuffle beyond the range partitioner that any clustered
    * write pays. */
  def q138ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(
        datediff(to_date(col("o_orderdate")),
          lit("1995-01-01").cast("date")).cast("long").as("dnum"),
        graft.functions.Exact.cents(col("o_totalprice")).as("cents"))
      .withColumn("da", expr("CAST(least(greatest(dnum, 0) div 301, 7) AS INT)"))
      .withColumn("pb", expr("CAST(least(cents div 1320000, 7) AS INT)"))
      .withColumn("z", expr(
        """(da div 4) * 32 + (pb div 4) * 16 + ((da div 2) % 2) * 8
           + ((pb div 2) % 2) * 4 + (da % 2) * 2 + (pb % 2)"""))
    // box query: order date in 1997 (1995+1996 = 365+366 days, so
    // 1997-01-01 is dnum 731 and 1997-12-31 is dnum 1095), ≥ $50k
    val boxed = o.withColumn("in_box", expr(
      "dnum >= 731 AND dnum <= 1095 AND cents >= 5000000"))
    boxed.groupBy("z")
      .agg(count(lit(1)).as("n_rows"),
        min("dnum").as("min_dnum"), max("dnum").as("max_dnum"),
        min("cents").as("min_cents"), max("cents").as("max_cents"),
        sum(col("in_box").cast("long")).as("n_match"))
      .withColumn("overlaps_box", expr(
        "max_dnum >= 731 AND min_dnum <= 1095 AND max_cents >= 5000000"))
      .select("z", "n_rows", "min_dnum", "max_dnum", "min_cents",
        "max_cents", "overlaps_box", "n_match")
      .orderBy("z")
  }

  /** q140: incremental materialized-view maintenance — the identity
    * that lets an aggregate MV absorb a delta batch without touching
    * the base: per-source partial aggregates (n_docs, token mass) are
    * a monoid, so agg(base) ⊕ agg(delta) must equal agg(base ∪ delta)
    * cell-for-cell. The query computes BOTH sides — the maintained
    * path (two partial aggs merged by a sum-groupBy) and the direct
    * recompute — and emits a per-source `matches_direct` flag, so the
    * maintenance identity is verified as data, not asserted. The
    * delta is the q80 hash-sampler's ~10% slice (reproducible).
    *
    * Scale shape: at 100 TB only the DELTA is scanned (the base-side
    * partials are the stored MV; here they are recomputed only so the
    * identity is checkable); the merge is a groupBy over MV cells,
    * bounded by the source dimension. */
  def q140MvMaintain(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns
    val docs = Tables.documents(s, dir)
      .select(col("source"),
        when(graft.operators.Sampling.bucket(col("doc_id"), "graft-mv:")
          < "1a", lit("delta")).otherwise(lit("base")).as("part"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
    val partials = docs.groupBy("source", "part")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
    val merged = partials.groupBy("source")
      .agg(sum("n_docs").as("total_docs"), sum("n_tokens").as("total_tokens"),
        sum(when(col("part") === "base", col("n_docs")).otherwise(0L))
          .as("base_docs"),
        sum(when(col("part") === "delta", col("n_docs")).otherwise(0L))
          .as("delta_docs"))
    val direct = Tables.documents(s, dir)
      .select(col("source"), size(TextFns.tokens(col("text"))).cast("long")
        .as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("d_docs"), sum("n_tok").as("d_tokens"))
    merged.join(direct, Seq("source"))
      .withColumn("matches_direct",
        col("total_docs") === col("d_docs") &&
          col("total_tokens") === col("d_tokens"))
      .select("source", "base_docs", "delta_docs", "total_docs",
        "total_tokens", "matches_direct")
      .orderBy("source")
  }

  /** q156: corpus snapshot diff — the data-ops audit run before
    * promoting a refreshed corpus snapshot: which documents were
    * added, removed, or changed (content hash differs), summarized
    * per (source, status) with the byte-volume delta. The two
    * snapshots are derived deterministically from the corpus so both
    * engines diff identical inputs: OLD = `doc_id % 10 <> 7` (the
    * q110/q116 prior-snapshot convention), NEW = `doc_id % 17 <> 5`
    * (deletions) with `doc_id % 13 = 3` documents edited (a
    * deterministic suffix append).
    *
    * Scale shape: one keyed full-outer join on doc_id (the q146
    * join-health shape), md5 and lengths computed map-side before the
    * join, and the report groupBy is over (source × 4 status) cells —
    * at 100 TB both snapshot scans stay partition-local on a
    * doc_id-bucketed layout and nothing but the 80-cell summary is
    * ever collected. */
  def q156SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "source", "text")
    val old = d.filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"), col("source").as("old_source"),
        md5(col("text").cast("binary")).as("old_md5"),
        length(col("text")).cast("long").as("old_len"))
    val edited = when(col("doc_id") % 13 === 3,
      concat(col("text"), lit(" [rev2]"))).otherwise(col("text"))
    val nw = d.filter(col("doc_id") % 17 =!= 5)
      .select(col("doc_id"), col("source").as("new_source"),
        md5(edited.cast("binary")).as("new_md5"),
        length(edited).cast("long").as("new_len"))
    old.join(nw, Seq("doc_id"), "full_outer")
      .withColumn("status", expr(
        """CASE WHEN old_md5 IS NULL THEN 'added'
                WHEN new_md5 IS NULL THEN 'removed'
                WHEN old_md5 <> new_md5 THEN 'changed'
                ELSE 'unchanged' END"""))
      .withColumn("source", coalesce(col("new_source"), col("old_source")))
      .groupBy("source", "status")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("new_len"), lit(0L))
          - coalesce(col("old_len"), lit(0L))).as("chars_delta"))
      .orderBy("source", "status")
  }

  /** q198: EXPORT INTEGRITY MANIFEST — the (table, n_rows, checksum)
    * artifact a publish step ships next to the data (and a consumer
    * re-computes to verify the copy): per table, the exact row count
    * and an ORDER-INVARIANT content checksum — the sum of a 24-bit
    * md5-derived integer over each row's canonical key|content
    * string. Sum-of-row-hashes is the standard portable spelling: it
    * is partition- and order-independent (addition commutes), any
    * engine with md5 reproduces it bit-for-bit (the q80/q126 hex
    * discipline — no engine-specific hash function), and a single
    * flipped row moves it with probability 1 − 2⁻²⁴ per row. The
    * natural integrity companion to S8's atomic publish and q156's
    * snapshot diff.
    *
    * Scale shape: one combinable aggregate per table — the checksum
    * is map-side per row, the manifest is 3 rows at any data size. */
  def q198ExportManifest(s: SparkSession, dir: String): DataFrame = {
    def check(df: DataFrame, name: String,
        canon: org.apache.spark.sql.Column) = df
      .select(conv(substring(md5(canon.cast("binary")), 1, 6), 16, 10)
        .cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"), sum("h").as("checksum"))
      .select(lit(name).as("table_name"), col("n_rows"), col("checksum"))
    val docs = check(Tables.documents(s, dir), "documents",
      concat_ws("|", col("doc_id"), col("source"), col("lang"),
        col("n_chars"), col("text")))
    val cust = check(Tables.customer(s, dir), "customer",
      concat_ws("|", col("c_custkey"), col("c_name"), col("c_nationkey"),
        expr("CAST(round(c_acctbal*100) AS BIGINT)"), col("c_mktsegment")))
    val ord = check(Tables.orders(s, dir), "orders",
      concat_ws("|", col("o_orderkey"), col("o_custkey"),
        expr("CAST(round(o_totalprice*100) AS BIGINT)")))
    docs.unionByName(cust).unionByName(ord).orderBy("table_name")
  }

  val queries: Map[String, Q] = Map(
    "q198_export_manifest" -> (q198ExportManifest _),
    "q156_snapshot_diff" -> (q156SnapshotDiff _),
    "q140_mv_maintain" -> (q140MvMaintain _),
    "q138_zorder_layout" -> (q138ZorderLayout _),
    "q100_jdbc_source" -> (q100JdbcSource _),
    "q101_store_append" -> (q101StoreAppend _),
    "q98_compacted_store" -> (q98CompactedStore _),
    "q99_store_fetch" -> (q99StoreFetch _),
    "q95_path_driven_source" -> (q95PathDrivenSource _),
    "q62_csv_source" -> (q62CsvSource _),
    "q63_json_source" -> (q63JsonSource _),
    "q64_text_source" -> (q64TextSource _),
    "q65_partitioned_sink" -> (q65PartitionedSink _))

  /** 24-bit integer from the first 6 hex chars of md5 over `e` —
    * digit-for-digit the Spark conv(substring(md5)) expression (the
    * q126 bloom-position parsing pattern, widened to 6 digits). */
  private def md5Int24Sql(e: String): String =
    (0 until 6).map(i =>
      s"""(strpos('0123456789abcdef', substring(md5($e), ${i + 1}, 1)) - 1)
         * ${1L << (4 * (5 - i))}""").mkString("(", " + ", ")")

  val oracles: Map[String, String] = Map(
    "q198_export_manifest" ->
      s"""WITH d AS (SELECT ${md5Int24Sql(
           """doc_id || '|' || source || '|' || lang || '|' ||
              n_chars || '|' || text""")} AS h FROM documents),
         c AS (SELECT ${md5Int24Sql(
           """c_custkey || '|' || c_name || '|' || c_nationkey || '|' ||
              CAST(round(c_acctbal*100) AS BIGINT) || '|' ||
              c_mktsegment""")} AS h FROM customer),
         o AS (SELECT ${md5Int24Sql(
           """o_orderkey || '|' || o_custkey || '|' ||
              CAST(round(o_totalprice*100) AS BIGINT)""")} AS h
           FROM orders),
         m AS (
           SELECT 'documents' AS table_name,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(h) AS BIGINT) AS checksum FROM d
           UNION ALL
           SELECT 'customer', CAST(count(*) AS BIGINT),
             CAST(sum(h) AS BIGINT) FROM c
           UNION ALL
           SELECT 'orders', CAST(count(*) AS BIGINT),
             CAST(sum(h) AS BIGINT) FROM o)
         SELECT table_name, n_rows, checksum FROM m
         ORDER BY table_name""",
    "q156_snapshot_diff" ->
      """WITH old AS (SELECT doc_id, source AS old_source,
           md5(text) AS old_md5,
           CAST(length(text) AS BIGINT) AS old_len
           FROM documents WHERE doc_id % 10 <> 7),
         nw AS (SELECT doc_id, source AS new_source,
           md5(CASE WHEN doc_id % 13 = 3 THEN text || ' [rev2]'
             ELSE text END) AS new_md5,
           CAST(length(CASE WHEN doc_id % 13 = 3 THEN text || ' [rev2]'
             ELSE text END) AS BIGINT) AS new_len
           FROM documents WHERE doc_id % 17 <> 5),
         d AS (SELECT
             coalesce(nw.new_source, old.old_source) AS source,
             CASE WHEN old_md5 IS NULL THEN 'added'
                  WHEN new_md5 IS NULL THEN 'removed'
                  WHEN old_md5 <> new_md5 THEN 'changed'
                  ELSE 'unchanged' END AS status,
             coalesce(new_len, 0) - coalesce(old_len, 0) AS delta
           FROM old FULL OUTER JOIN nw ON old.doc_id = nw.doc_id)
         SELECT source, status, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(delta) AS BIGINT) AS chars_delta
         FROM d GROUP BY 1, 2 ORDER BY 1, 2""",
    "q140_mv_maintain" ->
      s"""WITH d AS (SELECT source,
           CASE WHEN substring(md5('graft-mv:'
               || CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
             THEN 'delta' ELSE 'base' END AS part,
           CAST(len(${graft.functions.TextFns.sqlTokens("text")}) AS BIGINT)
             AS n_tok
           FROM documents),
         p AS (SELECT source, part, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens
           FROM d GROUP BY 1, 2),
         m AS (SELECT source,
             CAST(sum(n_docs) AS BIGINT) AS total_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(sum(CASE WHEN part = 'base' THEN n_docs ELSE 0 END)
               AS BIGINT) AS base_docs,
             CAST(sum(CASE WHEN part = 'delta' THEN n_docs ELSE 0 END)
               AS BIGINT) AS delta_docs
           FROM p GROUP BY 1),
         dr AS (SELECT source, CAST(count(*) AS BIGINT) AS d_docs,
             CAST(sum(n_tok) AS BIGINT) AS d_tokens
           FROM d GROUP BY 1)
         SELECT m.source, base_docs, delta_docs, total_docs, total_tokens,
           (total_docs = d_docs AND total_tokens = d_tokens)
             AS matches_direct
         FROM m JOIN dr ON dr.source = m.source ORDER BY m.source""",
    "q138_zorder_layout" ->
      """WITH o AS (SELECT
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
             AS dnum,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         b AS (SELECT dnum, cents,
             CAST(least(greatest(dnum, 0) // 301, 7) AS INTEGER) AS da,
             CAST(least(cents // 1320000, 7) AS INTEGER) AS pb
           FROM o),
         zc AS (SELECT dnum, cents,
             (da // 4) * 32 + (pb // 4) * 16 + ((da // 2) % 2) * 8
               + ((pb // 2) % 2) * 4 + (da % 2) * 2 + (pb % 2) AS z,
             CASE WHEN dnum >= 731 AND dnum <= 1095
               AND cents >= 5000000 THEN 1 ELSE 0 END AS in_box
           FROM b)
         SELECT z, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(dnum) AS BIGINT) AS min_dnum,
           CAST(max(dnum) AS BIGINT) AS max_dnum,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents,
           max(dnum) >= 731 AND min(dnum) <= 1095
             AND max(cents) >= 5000000 AS overlaps_box,
           CAST(sum(in_box) AS BIGINT) AS n_match
         FROM zc GROUP BY z ORDER BY z""",
    "q100_jdbc_source" ->
      """SELECT year(o_orderdate) AS o_year, o_orderstatus,
         count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM orders WHERE o_orderstatus <> 'F'
         GROUP BY 1, 2 ORDER BY o_year, o_orderstatus""",
    "q101_store_append" ->
      s"""WITH base AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes
           FROM documents WHERE doc_id % 4 <> 3),
         bc AS (SELECT doc_id, n_bytes,
           CAST(sum(n_bytes) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum
           FROM base),
         bs AS (SELECT doc_id, n_bytes,
           CAST((cum - n_bytes) // $shardBytes AS BIGINT) AS shard_id
           FROM bc),
         off AS (SELECT max(shard_id) + 1 AS o FROM bs),
         nw AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes
           FROM documents WHERE doc_id % 4 = 3),
         nc AS (SELECT doc_id, n_bytes,
           CAST(sum(n_bytes) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum
           FROM nw),
         ns AS (SELECT doc_id, n_bytes,
           CAST((cum - n_bytes) // $shardBytes AS BIGINT)
             + (SELECT o FROM off) AS shard_id
           FROM nc),
         allx AS (SELECT * FROM bs UNION ALL SELECT * FROM ns)
         SELECT shard_id, count(*) AS n_docs,
           CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc,
           CAST(CASE WHEN min(doc_id) % 4 = 3 THEN 1 ELSE 0 END AS BIGINT)
             AS batch
         FROM allx GROUP BY 1 ORDER BY shard_id""",
    "q98_compacted_store" ->
      s"""WITH b AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes
           FROM documents),
         c AS (SELECT doc_id, n_bytes,
           CAST(sum(n_bytes) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum
           FROM b)
         SELECT CAST((cum - n_bytes) // $shardBytes AS BIGINT) AS shard_id,
           count(*) AS n_docs,
           CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM c GROUP BY 1 ORDER BY shard_id""",
    "q95_path_driven_source" ->
      """SELECT doc_id, length(text) AS text_len, md5(text) AS text_md5
         FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    // q99 serves the SAME fetch as q95 from the compacted store, so it
    // must reproduce the same relation — one oracle, two access paths
    "q99_store_fetch" ->
      """SELECT doc_id, length(text) AS text_len, md5(text) AS text_md5
         FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q62_csv_source" ->
      """SELECT r.r_name AS region, count(*) AS n_nations,
         string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
         FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY r.r_name ORDER BY region""",
    "q63_json_source" ->
      """SELECT c_mktsegment AS segment, count(*) AS n_customers,
         CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_bal_cents,
         min(c_custkey) AS min_key, max(c_custkey) AS max_key
         FROM customer GROUP BY 1 ORDER BY segment""",
    "q64_text_source" ->
      """SELECT lang, source, count(*) AS n_docs,
         CAST(sum(doc_id) AS BIGINT) AS id_checksum
         FROM documents GROUP BY 1, 2 ORDER BY lang, source""",
    "q65_partitioned_sink" ->
      """SELECT year(o_orderdate) AS yr, count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM orders WHERE o_orderstatus = 'O'
         GROUP BY 1 ORDER BY yr"""
  )
}
