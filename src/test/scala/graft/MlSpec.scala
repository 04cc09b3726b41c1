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

  test("q56 frozen-forest prediction covers the test split") {
    val a = MlQueries.q56RfClassifier(spark, sf).collect()
    assert(a.nonEmpty)
    val total = a.map(_.getAs[Long]("n")).sum
    assert(total > 0)
  }

  test("RF training leg: seeded fit is deterministic and plurality " +
      "vote over the extracted forest agrees with model.transform") {
    import org.apache.spark.ml.classification.RandomForestClassifier
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.sql.functions._
    val feats = MlQueries.q56Features(spark, sf)
    val train = feats.filter(
      graft.operators.Sampling.bucket(col("doc_id"), MlQueries.splitSalt)
        >= MlQueries.testBucketHex)
    val assembled = new VectorAssembler()
      .setInputCols(MlQueries.q56FeatureNames.toArray)
      .setOutputCol("features").transform(train)
    def fit() = new RandomForestClassifier()
      .setSeed(42L).setNumTrees(20).setMaxDepth(5)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(assembled)
    val model = fit()
    val nodes = graft.queries.MlFixtures.extractForest(model)
    assert(nodes == graft.queries.MlFixtures.extractForest(fit()),
      "same seed must learn the same forest")
    // plurality vote over the extracted trees vs spark.ml's
    // probability-averaged transform, on the held-out split
    val test = feats.filter(
      graft.operators.Sampling.bucket(col("doc_id"), MlQueries.splitSalt)
        < MlQueries.testBucketHex)
    val trees = nodes.map(_.tree).distinct.sorted
      .map(t => graft.queries.MlFixtures.treeColumnOf(nodes, t))
    val voted = test.select(col("doc_id"),
      explode(array(trees: _*)).as("vote"))
      .groupBy("doc_id", "vote").agg(count(lit(1)).as("n_votes"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("n_votes").desc, col("vote"))))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("vote"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val mlPred = model.transform(new VectorAssembler()
      .setInputCols(MlQueries.q56FeatureNames.toArray)
      .setOutputCol("features").transform(test))
      .select(col("doc_id"), col("prediction"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1).toInt).toMap
    assert(voted.keySet == mlPred.keySet)
    val agree = voted.count { case (d, v) => mlPred(d) == v }
    assert(agree.toDouble / voted.size >= 0.9,
      s"plurality vote agrees on $agree/${voted.size} test docs")
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

  test("q57 frozen LSH coefficients match a fresh seeded fit and the " +
      "relational minhash signature equals model.transform's") {
    import org.apache.spark.ml.feature.MinHashLSH
    import org.apache.spark.sql.functions._
    import graft.queries.MlFixtures
    val tf = MlQueries.q57Tf(spark, sf)
    val model = new MinHashLSH().setInputCol("features").setOutputCol("sig")
      .setNumHashTables(4).setSeed(42L).fit(tf)
    // the frozen fixture IS the fitted model's coefficient table, and
    // the hard-coded prime matches the installed Spark's constant —
    // extracted via the same shared recipe the generator used
    val (coefs, prime) = MlFixtures.extractMinhash(model)
    assert(coefs == MlFixtures.minhashCoefs,
      "MlFixtures.minhashCoefs is stale — re-run graft.tools.MlFixtureGen")
    assert(prime == MlFixtures.minhashPrime)
    // relational replay of the signature (what the q57 oracle does)
    // must equal spark.ml's hash values doc-for-doc
    val sigCols = MlFixtures.minhashCoefs.zipWithIndex.map { case ((a, b), t) =>
      array_min(transform(col("idx"),
        i => ((lit(1L) + i) * a + b) % MlFixtures.minhashPrime)).as(s"k$t")
    }
    val rel = tf.select(col("doc_id") +: sigCols: _*).collect()
      .map(r => r.getLong(0) ->
        MlFixtures.minhashCoefs.indices.map(i => r.getLong(i + 1))).toMap
    val ml = model.transform(tf).select(col("doc_id"), col("sig")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.ml.linalg.Vector](1).map(_(0).toLong).toIndexedSeq)
      .toMap
    assert(rel.nonEmpty && rel == ml,
      "relational minhash signature diverges from spark.ml hashFunction")
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

  test("q66 frozen-embedding centroid distances are exact and non-negative") {
    val a = MlQueries.q66Word2vec(spark, sf).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0L)
      assert(r.getAs[Long]("avg_dist2") >= 0L)
      assert(r.getAs[Long]("max_dist2") >= r.getAs[Long]("avg_dist2"))
    }
  }

  test("Word2Vec training leg: seeded fit is deterministic (M5)") {
    import org.apache.spark.ml.feature.Word2Vec
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.TextFns.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
    def fit() = new Word2Vec()
      .setInputCol("toks").setOutputCol("vec")
      .setVectorSize(16).setSeed(42L).setMinCount(2)
      .setNumPartitions(1).setMaxIter(1)
      .fit(docs).getVectors.collect()
      .map(r => r.getString(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray.toSeq)
      .sortBy(_._1).toSeq
    val a = fit()
    assert(a.nonEmpty)
    assert(a == fit(), "same seed + 1 model partition must learn " +
      "identical embeddings")
  }
}
