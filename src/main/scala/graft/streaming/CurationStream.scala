package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.functions.Exact.r6
import graft.functions.TextFns
import graft.queries.TextQueries

/** The curation pipeline (q93's map-side stages) run as a STREAMING
  * ingest: documents arrive on a file stream and each micro-batch
  * emits per-document verdicts in append mode with no state at all —
  * language ID, quality score and repetition metrics are pure column
  * expressions, so the streaming plan is the batch plan with a stream
  * source, and stream/batch parity is exact (the DuckDB oracle is the
  * batch spelling). This is the shape a 100 TB ingest actually wants:
  * the corpus-level stages (near-dup, decontamination) run as periodic
  * batch compaction over the accumulated store (q98/q101), while the
  * per-document stages gate documents AT ingest, before they cost
  * storage.
  *
  * The reference has no streaming (SURVEY.md §2.10 green-field scope);
  * the stage semantics mirror `matching/analyser` filter stages the
  * same way q23/q24/q103 do.
  */
object CurationStream {

  private val runIdx = new AtomicInteger(0)

  /** The per-document curation verdict as pure map-side column
    * expressions over a (doc_id, text) frame — usable on a stream
    * (append mode, no watermark, no state) or a batch frame alike.
    * Stage semantics and thresholds are q93's lang/quality/repetition
    * legs; the language argmax replaces q23's window with an
    * `array_sort(struct(-hits, lang))` pick so the stream needs no
    * shuffle at all. */
  private[graft] def verdict(docs: DataFrame): DataFrame = {
    val langArr = array(TextQueries.langSets.map { case (lang, words) =>
      struct(
        (-size(filter(col("toks"), x =>
          array_contains(array(words.map(lit): _*), x)))).as("neg_hits"),
        lit(lang).as("lang"))
    }: _*)
    val en = TextQueries.langSets.toMap.apply("en")
    docs
      .withColumn("toks", TextFns.tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .withColumn("predicted_lang",
        element_at(array_sort(langArr), 1).getField("lang"))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("quality", r6(
        lit(0.3) * least(lit(1.0), col("n_tokens") / 50.0)
          + lit(0.4) * (size(filter(col("toks"), x =>
              array_contains(array(en.map(lit): _*), x))) / col("n_tokens"))
          + lit(0.3) * (length(regexp_replace(lower(col("text")), "[^a-z]", ""))
              / length(col("text")))))
      // q103's native one-pass repetition stats over the same
      // space-split tokens its batch leg uses
      .withColumn("r", TextFns.repStats(split(col("text"), " ")))
      .withColumn("top_bigram_milli", expr(
        "(1000 * element_at(r, 3)) div greatest(element_at(r, 1) - 1, 1)"))
      .withColumn("drop_reasons", concat_ws(",",
        when(col("predicted_lang") =!= "en", "lang"),
        when(col("quality") < 0.5, "quality"),
        when(col("top_bigram_milli") > 60, "repetition")))
      .withColumn("keep", col("drop_reasons") === "")
      .select("doc_id", "predicted_lang", "quality", "top_bigram_milli",
        "drop_reasons", "keep")
  }

  /** Run the document stream to completion and return the verdicts. */
  def curationOnce(s: SparkSession, dir: String): DataFrame = {
    val name = s"graft_stream_cur_${runIdx.incrementAndGet()}"
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    val stream = s.readStream.schema(schema)
      .parquet(StreamStage.monitoredPath(dir, "documents"))
    val q = verdict(stream.select("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name).orderBy("doc_id")
  }
}
