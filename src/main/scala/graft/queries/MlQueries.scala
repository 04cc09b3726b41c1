package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, VectorAssembler, Word2Vec}
import org.apache.spark.ml.classification.RandomForestClassifier
import graft.Tables
import graft.functions.{StemExpression, TextFns}

/** ML-adjacent operators from SURVEY.md §2.8-2.9 whose logic cannot be
  * expressed in DuckDB SQL (Porter stemming; seeded `spark.ml`
  * pipelines): Porter stem indexing (`analyser/TextEntitiesAnalyser
  * .scala:275-279`), the RandomForest mention classifier
  * (`analyser/AdvancedInstrumentAnalyser.scala:113-118,225-359` — M6),
  * and `MinHashLSH.approxSimilarityJoin` (`matcher/PictureMatcher
  * .scala:54-68` — M4/J9, here over text shingle sets).
  *
  * These are registered WITHOUT oracle SQL — the driver records a
  * rows-only check — and their semantics are asserted by MlSpec
  * (golden stem cases from the published algorithm; seeded-pipeline
  * determinism; LSH-pair containment in the exact-Jaccard pair set).
  */
object MlQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Stemmed vocabulary index: distinct token → Porter stem, with stem
    * group sizes. Uses the native `graft_stem` expression (codegen'd;
    * see StemExpression) on the distinct vocabulary — tiny relative to
    * the corpus, never per-token-occurrence. */
  def q55StemTokens(s: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(s, dir)
      .select(explode(TextFns.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    vocab.withColumn("stem", StemExpression.stem(col("token")))
      .withColumn("stem_group_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("stem")))
      .orderBy("token")
  }

  /** Seeded RandomForest classifier (M6 shape): predict the document's
    * `lang` label from token-statistics features, 0.7/0.3 split, and
    * report the confusion matrix. Deterministic via fixed seeds. */
  def q56RfClassifier(s: SparkSession, dir: String): DataFrame = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    val langSets = Map(
      "de" -> Seq("der", "die", "das", "und"),
      "en" -> Seq("the", "a", "is", "of", "to"),
      "es" -> Seq("el", "los", "las", "y"),
      "fr" -> Seq("le", "la", "les", "et"))
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("text"),
        TextFns.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
    val featured = langSets.foldLeft(base) { case (df, (l, words)) =>
      df.withColumn(s"hits_$l",
        (size(filter(col("toks"),
          x => array_contains(array(words.map(lit): _*), x)))
          / size(col("toks"))).cast("double"))
    }
      .withColumn("n_tokens", size(col("toks")).cast("double"))
      .withColumn("alpha_ratio",
        (length(regexp_replace(lower(col("text")), "[^a-z]", ""))
          / length(col("text"))).cast("double"))
      .withColumn("label",
        array_position(array(langs.map(lit): _*), col("lang")).cast("double") - 1)
    val features = new VectorAssembler()
      .setInputCols(Array("hits_de", "hits_en", "hits_es", "hits_fr",
        "n_tokens", "alpha_ratio"))
      .setOutputCol("features")
      .transform(featured)
    val Array(train, test) = features.randomSplit(Array(0.7, 0.3), seed = 42L)
    val model = new RandomForestClassifier()
      .setSeed(42L).setNumTrees(20).setMaxDepth(5)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(train)
    model.transform(test)
      .select(col("lang"),
        element_at(array(langs.map(lit): _*),
          (col("prediction") + 1).cast("int")).as("predicted_lang"))
      .groupBy("lang", "predicted_lang").agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted_lang")
  }

  /** `spark.ml` MinHashLSH approximate-similarity join (M4/J9) over
    * 5-shingle sets hashed into a sparse binary vector space — the
    * PictureMatcher shape with text shingles standing in for picture
    * blockhashes. Seeded, so the signature permutations are stable. */
  def q57MlMinhash(s: SparkSession, dir: String): DataFrame = {
    val shingled = Tables.documents(s, dir)
      .select(col("doc_id"),
        TextFns.shingles(TextFns.tokens(col("text")), 5).as("sh"))
      .filter(size(col("sh")) > 0)
    // memoized: approxSimilarityJoin consumes the frame on BOTH sides
    // of its self-join, which would otherwise recompute the whole
    // tokenize→shingle→HashingTF pipeline twice
    val tf = Shared.memoized(s, dir, "mlMinhashTf")(
      new HashingTF().setInputCol("sh").setOutputCol("features")
        .setNumFeatures(1 << 18).setBinary(true)
        .transform(shingled))
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("sig")
      .setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(tf)
    model.approxSimilarityJoin(tf, tf, 0.8, "jaccard_dist")
      .select(col("datasetA.doc_id").as("doc1"),
        col("datasetB.doc_id").as("doc2"),
        round(col("jaccard_dist"), 6).as("jaccard_dist"))
      .filter(col("doc1") < col("doc2"))
      .orderBy("doc1", "doc2")
  }

  /** Seeded Word2Vec featurization (M5 shape: `AdvancedInstrument
    * Analyser.scala:169-221` featurizes candidate sentences): 16-dim
    * embeddings over token sequences, then per-lang centroid norms —
    * deterministic under fixed seed + 1 partition for the tiny model. */
  def q66Word2vec(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), TextFns.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
    val model = new Word2Vec()
      .setInputCol("toks").setOutputCol("vec")
      .setVectorSize(16).setSeed(42L).setMinCount(2)
      .setNumPartitions(1).setMaxIter(1)
      .fit(docs)
    // vector_to_array + the native codegen dot replaces the scalar UDF
    // (the project standard — ADVICE r3): ||v|| = sqrt(v·v)
    model.transform(docs)
      .withColumn("varr", org.apache.spark.ml.functions.vector_to_array(col("vec")))
      .withColumn("vnorm", sqrt(graft.functions.VectorExpressions.dot(col("varr"), col("varr"))))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("vnorm"), 4).as("avg_norm"))
      .orderBy("lang")
  }

  val queries: Map[String, Q] = Map(
    "q55_stem_tokens" -> (q55StemTokens _),
    "q56_rf_classifier" -> (q56RfClassifier _),
    "q57_ml_minhash" -> (q57MlMinhash _),
    "q66_word2vec" -> (q66Word2vec _))

  /** q55's oracle joins the corpus vocabulary against a hand-derived
    * Porter-stem table: each stem below follows from the published
    * algorithm (Porter 1980) applied by hand — e.g. `key→kei` /
    * `query→queri` are rule 1c (y→i after a vowel-containing stem),
    * `merge→merg`/`table→tabl`/`value→valu` are 5a (drop final e when
    * the remainder is not *o with m=1), `customer→custom` is step 4
    * (-er with m>1) while `filter`/`order` keep -er because m=1, and
    * `line`/`the` keep their e (5a *o / m=0 guards). This is an
    * INDEPENDENT check of the StemExpression implementation, not a
    * dump of its output; an out-of-vocabulary token fails loudly via
    * the inner join (row-count mismatch). */
  private val stemValues: String = Seq(
    "a" -> "a", "agg" -> "agg", "batch" -> "batch", "big" -> "big",
    "column" -> "column", "customer" -> "custom", "data" -> "data",
    "dup" -> "dup", "fast" -> "fast", "filter" -> "filter",
    "group" -> "group", "hash" -> "hash", "join" -> "join",
    "key" -> "kei", "line" -> "line", "merge" -> "merg",
    "order" -> "order", "part" -> "part", "query" -> "queri",
    "row" -> "row", "scan" -> "scan", "slow" -> "slow",
    "small" -> "small", "sort" -> "sort", "spark" -> "spark",
    "stream" -> "stream", "table" -> "tabl", "the" -> "the",
    "value" -> "valu", "vector" -> "vector", "window" -> "window")
    .map { case (t, st) => s"('$t', '$st')" }.mkString(", ")

  /** Other ML queries (seeded spark.ml pipelines) have no DuckDB
    * oracles — driver records rows-only checks; MlSpec carries the
    * semantic assertions. */
  val oracles: Map[String, String] = Map(
    "q55_stem_tokens" ->
      s"""WITH toks AS (SELECT doc_id, ${TextFns.sqlTokens("text")} AS toks
           FROM documents),
         vocab AS (SELECT t AS token, count(*) AS freq
           FROM (SELECT unnest(toks) AS t FROM toks) GROUP BY 1),
         stems(token, stem) AS (VALUES $stemValues),
         j AS (SELECT v.token, v.freq, s.stem
           FROM vocab v JOIN stems s USING (token))
         SELECT token, freq, stem,
           count(*) OVER (PARTITION BY stem) AS stem_group_size
         FROM j ORDER BY token""")
}
