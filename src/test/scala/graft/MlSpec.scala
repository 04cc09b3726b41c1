package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PorterStemmer
import graft.queries.{MlQueries, TextQueries}

/** Semantic assertions for the oracle-less ML/NLP operators
  * (QueriesSpec only row-counts them). */
class MlSpec extends AnyFunSuite {
  import TestSpark._

  test("Porter stemmer matches the published algorithm's examples") {
    // Golden cases from M.F. Porter, "An algorithm for suffix
    // stripping" (1980), steps 1-5 examples.
    val golden = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc",
      "digitizer" -> "digit", "radicalli" -> "radic",
      "differentli" -> "differ", "vileli" -> "vile",
      "analogousli" -> "analog", "vietnamization" -> "vietnam",
      "predication" -> "predic", "operator" -> "oper",
      "feudalism" -> "feudal", "decisiveness" -> "decis",
      "hopefulness" -> "hope", "callousness" -> "callous",
      "formaliti" -> "formal", "sensitiviti" -> "sensit",
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "communism" -> "commun",
      "activate" -> "activ", "angulariti" -> "angular",
      "homologous" -> "homolog", "effective" -> "effect",
      "bowdlerize" -> "bowdler",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    val bad = golden.collect {
      case (w, want) if PorterStemmer.stem(w) != want =>
        s"$w: got ${PorterStemmer.stem(w)}, want $want"
    }
    assert(bad.isEmpty, s"${bad.size} mismatches:\n${bad.mkString("\n")}")
  }

  test("q55 stem groups are consistent") {
    val df = MlQueries.q55StemTokens(spark, sf).collect()
    assert(df.nonEmpty)
    // every token maps to a non-empty stem no longer than itself
    df.foreach { r =>
      val tok = r.getAs[String]("token"); val st = r.getAs[String]("stem")
      assert(st.nonEmpty && st.length <= tok.length, s"$tok -> $st")
    }
  }

  test("q56 RF classifier is seeded-deterministic and covers the test split") {
    val a = MlQueries.q56RfClassifier(spark, sf).collect()
    val b = MlQueries.q56RfClassifier(spark, sf).collect()
    assert(a.nonEmpty)
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted),
      "same seed must give the same confusion matrix")
    val total = a.map(_.getAs[Long]("n")).sum
    assert(total > 0)
  }

  test("q57 ml MinHashLSH pairs are within the distance threshold and " +
      "agree with the exact-Jaccard near-dup pairs") {
    val lsh = MlQueries.q57MlMinhash(spark, sf).collect()
    assert(lsh.nonEmpty, "expected near-dup pairs at sf0.001")
    lsh.foreach(r =>
      assert(r.getAs[Double]("jaccard_dist") <= 0.8))
    // LSH (jaccard distance <= 0.8 over 5-shingle sets) must find the
    // strong near-dups that the exact pipeline (similarity >= 0.2 =
    // distance <= 0.8) confirms; allow LSH misses (it is approximate)
    // but require substantial recall on this small fixture.
    val exact = TextQueries.q26LshDupPairs(spark, sf)
      .select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = lsh.map(r => (r.getAs[Long]("doc1"), r.getAs[Long]("doc2"))).toSet
    val recall = if (exact.isEmpty) 1.0
      else exact.count(got).toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall over ${exact.size} exact pairs")
  }

  test("instrument composite chains into a seeded mention classifier") {
    // the reference's AdvancedInstrumentAnalyser tail: candidate
    // windows become labelled feature rows for a seeded classifier
    // (M6). The deterministic stages are q86's oracle-checked output;
    // this asserts the ML hand-off on top of them.
    import org.apache.spark.ml.classification.RandomForestClassifier
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.sql.functions._
    def run(): Array[String] = {
      // one sorted partition: RF bagging samples rows in partition
      // order, so determinism needs a pinned layout (as q66 pins the
      // Word2Vec model partitions)
      val cands = graft.queries.PipelineQueries
        .q86InstrumentPipeline(spark, sf)
        .repartition(1)
        .sortWithinPartitions("doc_id", "code", "hit_pos")
        .withColumn("label",
          (col("score_milli") >= 200).cast("double"))
        .withColumn("hits_d", col("n_close").cast("double"))
        .withColumn("ctx_d", col("n_context").cast("double"))
      val feats = new VectorAssembler()
        .setInputCols(Array("hits_d", "ctx_d"))
        .setOutputCol("features").transform(cands)
      val model = new RandomForestClassifier()
        .setSeed(42L).setNumTrees(10).setMaxDepth(4)
        .setLabelCol("label").setFeaturesCol("features")
        .fit(feats)
      // predict driver-side: the candidate set is tiny here, and
      // model.transform would ship the model (whose training summary
      // pins the session) through a codegen closure
      feats.select(col("doc_id"), col("code"), col("hit_pos"), col("features"))
        .collect()
        .map { r =>
          val p = model.predict(r.getAs[org.apache.spark.ml.linalg.Vector](3))
          s"${r.getLong(0)}|${r.getString(1)}|${r.getInt(2)}|$p"
        }.sorted
    }
    val a = run()
    assert(a.nonEmpty)
    assert(a.sameElements(run()),
      "seeded classifier over q86 candidates must be deterministic")
  }

  test("q66 Word2Vec featurization is seeded-deterministic") {
    val a = MlQueries.q66Word2vec(spark, sf).collect()
    val b = MlQueries.q66Word2vec(spark, sf).collect()
    assert(a.nonEmpty)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "same seed + 1 model partition must give identical centroid norms")
    a.foreach(r => assert(r.getAs[Double]("avg_norm") > 0.0))
  }
}
