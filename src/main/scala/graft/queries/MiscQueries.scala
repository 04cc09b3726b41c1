package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns


/** Remaining §2 parity shapes: the technique-probability model (P7,
  * `matching/filter/PersonTechniqueFilter.scala:25-93`), the Level-2
  * re-join that scores an expensive signal only for already-matched
  * pairs (J10, `matching/matcher/Level2PictureMatcher.scala:43-56` +
  * hamming scoring `scorer/PictureScorer.scala:45,75-92`), the
  * date-range document filter (P3, `matching/filter/
  * DateDocumentTypeFilter.scala:24-35`), and the training-extraction
  * OR-join rewritten as a union of two semi joins (J12,
  * `matching/stage/TrainingDataExtractionStage.scala:52` — SURVEY §2.3
  * prescribes the union rewrite so each leg stays an equi join).
  */
object MiscQueries {

  type Q = (SparkSession, String) => DataFrame

  /** P7: per-(customer, brand) purchase-probability model — two counts
    * and a ratio per key, then a histogram over 10% probability bands.
    * Ratio is micro-quantized so the distributed agg hashes exactly. */
  def q58TechniqueModel(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("o_custkey").as("custkey"), col("p_brand").as("brand"))
    val perKey = li.groupBy("custkey", "brand").agg(count(lit(1)).as("n"))
    val perCust = perKey.groupBy("custkey").agg(sum("n").as("total"))
    perKey.join(perCust, Seq("custkey"))
      .withColumn("ratio_micro",
        round(col("n") * 1000000.0 / col("total")).cast("long"))
      .withColumn("bucket", floor(col("ratio_micro") / 100000L).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct("custkey").as("n_custs"),
        sum("n").as("n_lines"))
      .orderBy("bucket")
  }

  /** J10 + hamming scoring: compute the expensive pairwise signal
    * (simhash hamming distance) ONLY for pairs already matched by the
    * cheap level-1 matcher (MinHash-LSH near-dup pairs) — the
    * incremental-compute shape that keeps level-2 signals affordable
    * at scale. `bit_count(xor)` replaces the reference's per-char
    * string hamming UDF (SURVEY §2.8). */
  def q59Level2Hamming(s: SparkSession, dir: String): DataFrame = {
    val matched = Shared.dupPairs(s, dir).select("doc1", "doc2")
    val sh = Shared.simhashes(s, dir)
    matched
      .join(sh.select(col("doc_id").as("doc1"), col("simhash").as("s1")), Seq("doc1"))
      .join(sh.select(col("doc_id").as("doc2"), col("simhash").as("s2")), Seq("doc2"))
      .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))))
      .withColumn("score",
        when(col("hamming") <= 8, lit(100.0)).otherwise(lit(0.0)))
      .select("doc1", "doc2", "hamming", "score")
      .orderBy("doc1", "doc2")
  }

  /** P3: restrict documents to a year window with when/otherwise
    * validity marking, then monthly roll-up of the kept rows. */
  def q60DateRange(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("yr", year(col("o_orderdate")))
      .withColumn("valid",
        when(col("yr").between(1995, 1996), lit(true)).otherwise(lit(false)))
      .filter(col("valid"))
      .groupBy(col("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
      .orderBy("yr", "mo")

  /** J12: training-pair extraction OR-join (`dv1 IN t OR dv2 IN t`)
    * as a union of two semi joins + distinct — each leg shuffles on
    * one equi key instead of forcing a nested-loop OR predicate. */
  def q61OrJoin(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(s, dir).select(
      col("l_orderkey").as("doc1"),
      (col("l_partkey") + 10000000L).as("doc2"))
    val train = pairs.select(explode(array(col("doc1"), col("doc2"))).as("tid"))
      .filter(col("tid") % 1000 === 0).distinct()
    pairs.join(train, col("doc1") === col("tid"), "left_semi")
      .unionByName(pairs.join(train, col("doc2") === col("tid"), "left_semi"))
      .distinct()
      .orderBy("doc1", "doc2")
  }

  /** Multi-level aggregation via rollup (SURVEY §2.4 notes the
    * reference lacks grouping sets entirely — a complete engine needs
    * them): per (status, year), per status, and grand total in one
    * pass, with grouping_id distinguishing the levels. */
  def q73Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("yr", year(col("o_orderdate")))
      .rollup("o_orderstatus", "yr")
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("o_orderstatus"), col("yr"))

  /** P6 InstrumentTechniqueFilter shape (`matching/filter/
    * InstrumentTechniqueFilter.scala:30-41`): semi join on a COMPOSITE
    * key — keep lineitems whose (partkey, suppkey) combination also
    * appears on a high-quantity open-order lineitem, then roll up per
    * supplier. */
  def q76CompositeSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val validCombos = li
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
        .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_quantity") > 45)
      .select("l_partkey", "l_suppkey").distinct()
    li.join(validCombos, Seq("l_partkey", "l_suppkey"), "left_semi")
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct("l_partkey").as("n_parts"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_cents"))
      .orderBy("suppkey")
  }

  /** Deterministic stratified sampling (see
    * [[graft.operators.Sampling]]): hash-bucket documents on doc_id
    * and keep 'en' at 50% ('80'/256 buckets) and every other language
    * at 25% ('40') — the reproducible train/eval-split primitive a
    * training-data pipeline needs instead of `df.sample`. */
  def q80HashSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    graft.operators.Sampling.stratifiedSample(
        docs, col("doc_id"),
        when(col("lang") === "en", "80").otherwise("40"), "graft-sample:")
      .withColumn("bucket",
        graft.operators.Sampling.bucket(col("doc_id"), "graft-sample:"))
      .select("doc_id", "lang", "source", "n_chars", "bucket")
      .orderBy("doc_id")
  }

  /** HLL bias-correction constant for m=64 buckets (0.7213/(1+1.079/m)
    * rounded) — one literal shared verbatim with the oracle so both
    * engines evaluate the same double. */
  private val HllAlpha64 = 0.709

  /** q120: mergeable distinct-count sketch — a relational HyperLogLog
    * (Flajolet et al. 2007) over per-source vocabularies, built
    * entirely from deterministic md5 bits so Spark and DuckDB compute
    * the SAME registers. m=64 buckets; bucket = first 8 hash bits
    * mod 64, rho = leading-zero count of the next 64 bits + 1;
    * register = max(rho) per (source, bucket). The per-source sketches
    * then MERGE into a global sketch by bucket-wise max — the whole
    * architectural point at 100 TB: per-shard sketches are 64 longs
    * each, merged associatively, no re-scan; a distinct COUNT over the
    * union would shuffle the full key space. Output compares each
    * estimate against the exact distinct count (err_milli = relative
    * error in thousandths; raw HLL estimate, no small-range
    * correction — m=64 keeps the expected error ~13%).
    *
    * Scale shape: one (source, word) distinct (map-side combinable),
    * one 64-row-per-source register agg with per-term micro
    * quantization so the 2^-M sum is exact integer arithmetic; the
    * exact-count legs exist only as the verification yardstick. */
  def q120HllSketch(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(s, dir)
      .select(col("source"), explode(TextFns.tokens(col("text"))).as("word"))
      .distinct()
    val rho = words
      .withColumn("h", md5(concat(lit("graft-hll:"), col("word"))))
      .withColumn("bucket", expr(
        """((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
           + instr('0123456789abcdef', substring(h, 2, 1)) - 1) % 64"""))
      .withColumn("t", expr("trim(LEADING '0' FROM substring(h, 3, 16))"))
      .withColumn("rho", expr(
        """CASE WHEN t = '' THEN 65
           ELSE (16 - length(t)) * 4
             + CASE WHEN substring(t, 1, 1) = '1' THEN 3
                 WHEN substring(t, 1, 1) IN ('2', '3') THEN 2
                 WHEN substring(t, 1, 1) IN ('4', '5', '6', '7') THEN 1
                 ELSE 0 END + 1 END"""))
    val regs = rho.groupBy("source", "bucket").agg(max("rho").as("register"))
    val global = regs.groupBy("bucket").agg(max("register").as("register"))
      .withColumn("source", lit("__all__"))
    val est = regs.unionByName(global.select("source", "bucket", "register"))
      .withColumn("term_micro",
        expr("CAST(round(power(2.0, -register) * 1e6) AS BIGINT)"))
      .groupBy("source")
      .agg(sum("term_micro").as("sum_micro"), count(lit(1)).as("n_buckets"))
      // standard small-range correction (linear counting): below
      // 2.5·m the raw harmonic-mean estimate is biased high and the
      // zero-bucket count is the better signal — with this corpus's
      // closed ~31-word vocabulary that regime is the one exercised,
      // and the correction brings the error from ~96% to single digits
      .withColumn("zeros", lit(64L) - col("n_buckets"))
      .withColumn("raw_est", expr(
        s"$HllAlpha64 * 64 * 64 / ((sum_micro + zeros * 1000000) / 1e6)"))
      .withColumn("est_milli", expr(
        """CASE WHEN raw_est <= 160.0 AND zeros > 0
           THEN CAST(round(64 * ln(64.0 / zeros) * 1000) AS BIGINT)
           ELSE CAST(round(raw_est * 1000) AS BIGINT) END"""))
    val exact = words.groupBy("source")
      .agg(count(lit(1)).as("exact_distinct"))
      .unionByName(words.select("word").distinct()
        .agg(count(lit(1)).as("exact_distinct"))
        .withColumn("source", lit("__all__")))
    est.join(exact, Seq("source"))
      .withColumn("err_milli",
        expr("abs(est_milli - exact_distinct * 1000) div exact_distinct"))
      .select("source", "exact_distinct", "est_milli", "err_milli")
      .orderBy("source")
  }

  /** q121: deterministic PageRank — the iterative link-analysis shape
    * web-corpus curation uses as a domain-quality signal (crawl
    * pipelines rank domains by centrality before sampling), run over
    * the customer↔supplier purchase graph (each distinct
    * customer–supplier trade is an edge in both directions, so no
    * dangling nodes). Three unrolled power iterations, damping 0.85,
    * ALL integer arithmetic: ranks live in 1e-12 units of total mass,
    * per-edge contributions are `rank div outdeg` — deterministic and
    * partition-independent, the property float PageRank lacks.
    *
    * Scale shape: the edge list is built once and each iteration is
    * one join on src + one map-side-combinable sum by dst — the edges
    * frame is persisted so iterations reuse the same partitioning
    * instead of rebuilding the orders⋈lineitem join three times. At
    * cluster scale both sides pre-partition by node id and the
    * per-iteration shuffle carries one row per edge, nothing more.
    *
    * The iteration count is a PARAMETER with bounded lineage
    * ([[pageRank]]): past [[PrCheckpointEvery]] iterations the rank
    * frame is `localCheckpoint`ed, truncating the logical plan — an
    * unrolled driver loop otherwise nests one join+agg subtree per
    * iteration, and at 30 iterations the analyzer/optimizer walk of
    * that tower (and the task-serialized lineage) grows linearly
    * until it dominates or overflows. The q121 oracle pins 3
    * iterations (below the checkpoint threshold, so the recorded
    * plan/hash are unchanged); NewQueryPlanSpec runs 12 and asserts
    * the truncation actually happened. */
  def q121PageRank(s: SparkSession, dir: String): DataFrame =
    pageRank(s, dir, iterations = 3)

  /** Checkpoint cadence for [[pageRank]]: every 5th iteration the
    * rank frame's lineage is cut. 5 plan-towers of one join+agg each
    * stay well inside analyzer limits while checkpoint I/O (a few
    * longs per node, executor-local) stays amortized. */
  private val PrCheckpointEvery = 5
  /** Exposed for the NewQueryPlanSpec lineage assertion. */
  private[graft] def prCheckpointCadence: Int = PrCheckpointEvery

  private[graft] def pageRank(s: SparkSession, dir: String,
                              iterations: Int): DataFrame = {
    val S = 100000000L // supplier-node offset (disjoint from custkeys)
    val trades = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
        Seq("o_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + S).as("p"))
      .distinct()
    // hash-partitioned by src before caching: every iteration joins on
    // src, so the cached layout satisfies the join's distribution and
    // only the tiny rank frame shuffles per iteration
    val edges = Shared.memoized(s, dir, "prEdges", Seq("src"))(
      trades.select(col("c").as("src"), col("p").as("dst"))
        .unionByName(trades.select(col("p").as("src"), col("c").as("dst"))))
    // outdeg is node-count-sized and read by EVERY iteration (plus the
    // init and final projections) — persist it once instead of
    // re-aggregating the edge cache per iteration (round 17, guide
    // §2.4); the count() both forces it and serves the S9 scalar
    val outdeg = Shared.track(edges.groupBy("src")
      .agg(count(lit(1)).as("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = outdeg.count() // driver scalar (S9 shape): node count
    val base = 1000000000000L / n * 15L / 100L
    var ranks = outdeg.select(col("src").as("node"),
      lit(1000000000000L / n).as("r"))
    for (i <- 1 to iterations) {
      // per-edge contribution c = r div outdeg is a function of the
      // NODE alone: compute it on the node-sized ranks ⋈ outdeg frame
      // first, then join the edge cache ONCE — the previous spelling
      // joined the edge-expanded rows against outdeg a second time,
      // doubling the edge-sized join work per iteration (round 17)
      val contrib = ranks
        .join(outdeg, ranks("node") === outdeg("src"))
        .select(col("src"), expr("r div outdeg").as("c"))
        .join(edges, Seq("src"))
        .select(col("dst").as("node"), col("c"))
        .groupBy("node").agg(sum("c").as("in_sum"))
      ranks = contrib.select(col("node"),
        (lit(base) + expr("in_sum * 85 div 100")).as("r"))
      // bounded lineage: cut the plan tower periodically (values are
      // integer and partition-independent, so truncation cannot
      // change the result — only the plan depth)
      if (i % PrCheckpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    ranks.filter(col("node") >= S)
      .join(outdeg.withColumnRenamed("src", "node"), Seq("node"))
      .select((col("node") - S).as("s_suppkey"), col("outdeg"),
        col("r").as("rank_pico"))
      .orderBy("s_suppkey")
  }

  /** q184: QUALITY-SIGNAL CORRELATION MATRIX — pairwise Pearson
    * correlation across the document quality signals (token count,
    * char count, alphabetic chars, stopword hits): the feature-
    * redundancy ANALYZE a quality-classifier pipeline (q56/q167) runs
    * before it picks inputs — two signals correlated at 0.99 carry
    * one signal's information, and a near-zero column is dead weight.
    * Completes the profiling family: q127 profiles columns alone,
    * q169 profiles embedding dimensions alone, this measures how the
    * scalar signals co-vary. Moments are EXACT integers (the q169
    * discipline — sums in BIGINT, cross/square sums in
    * DECIMAL(38,0)), the final Pearson is one sqrt on exactly-agreed
    * integers, micro-rounded (q136 ln precedent); a constant signal
    * (zero variance) yields NULL, not a division error.
    *
    * Scale shape: one map-side melt of each doc into 4 (signal,
    * value) rows, one doc-keyed self-join (4×4 fan-out per doc,
    * map-side combinable straight after), one 16-row aggregate —
    * corpus traffic is the melt, nothing else grows with n. */
  def q184SignalCorr(s: SparkSession, dir: String): DataFrame = {
    val en = Seq("the", "a", "is", "of", "to")
    val sigs = Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.functions.TextFns.tokens(col("text")).as("toks"),
        col("text"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), array(
        struct(lit("n_tokens").as("sig"),
          size(col("toks")).cast("long").as("v")),
        struct(lit("n_chars").as("sig"),
          length(col("text")).cast("long").as("v")),
        struct(lit("alpha_chars").as("sig"),
          length(regexp_replace(lower(col("text")), "[^a-z]", ""))
            .cast("long").as("v")),
        struct(lit("stop_hits").as("sig"),
          size(filter(col("toks"),
            x => array_contains(array(en.map(lit): _*), x))).cast("long")
            .as("v"))
        ).as("m"))
      .select(col("doc_id"), explode(col("m")).as("sv"))
      .select(col("doc_id"), col("sv.sig").as("sig"), col("sv.v").as("v"))
    val joined = sigs
      .join(sigs.select(col("doc_id"), col("sig").as("sig_b"),
        col("v").as("vb")), Seq("doc_id"))
      .filter(col("sig") <= col("sig_b"))
    joined.groupBy(col("sig").as("sig_a"), col("sig_b"))
      .agg(count(lit(1)).as("n"),
        sum("v").as("sa"), sum("vb").as("sb"),
        sum(col("v").cast("decimal(38,0)") * col("vb")).as("sab"),
        sum(col("v").cast("decimal(38,0)") * col("v")).as("saa"),
        sum(col("vb").cast("decimal(38,0)") * col("vb")).as("sbb"))
      .withColumn("corr_micro", expr(
        """CASE WHEN (n * saa - CAST(sa AS DECIMAL(38,0)) * sa) = 0
                  OR (n * sbb - CAST(sb AS DECIMAL(38,0)) * sb) = 0
           THEN NULL ELSE
             CAST(round(CAST(n * sab - CAST(sa AS DECIMAL(38,0)) * sb
                 AS DOUBLE)
               / sqrt(CAST(n * saa - CAST(sa AS DECIMAL(38,0)) * sa
                 AS DOUBLE))
               / sqrt(CAST(n * sbb - CAST(sb AS DECIMAL(38,0)) * sb
                 AS DOUBLE)) * 1e6) AS BIGINT) END"""))
      .select("sig_a", "sig_b", "n", "corr_micro")
      .orderBy("sig_a", "sig_b")
  }

  /** q182: PERSONALIZED PAGERANK / TrustRank (Gyöngyi, Garcia-Molina
    * & Pedersen 2004) — q121's link analysis with the teleport mass
    * restricted to a trusted SEED SET (customers in the BUILDING
    * segment): the signal web-corpus curation uses to propagate
    * domain trust from a hand-verified whitelist into the whole crawl
    * graph before sampling training data. Same integer discipline as
    * q121 — ranks in 1e-12 units of total mass, per-edge contribution
    * `r div outdeg`, damping in integer percent — so the trust
    * distribution is partition-independent and hash-stable; the
    * teleport base is `CASE seed` instead of uniform, which is the
    * entire delta from q121 (asserted by sharing its memoized
    * src-partitioned edge cache, so the two rankers also share one
    * build at bench time).
    *
    * Scale shape: identical to q121 — one join on src + one
    * combinable sum by dst per iteration over the cached edges; the
    * seed flag rides in a broadcast. */
  def q182TrustRank(s: SparkSession, dir: String): DataFrame = {
    val S = 100000000L
    val trades = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
        Seq("o_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + S).as("p"))
      .distinct()
    val edges = Shared.memoized(s, dir, "prEdges", Seq("src"))(
      trades.select(col("c").as("src"), col("p").as("dst"))
        .unionByName(trades.select(col("p").as("src"), col("c").as("dst"))))
    // persisted node-sized outdeg + single edge join per iteration —
    // same round-17 restructure as q121 (see pageRank)
    val outdeg = Shared.track(edges.groupBy("src")
      .agg(count(lit(1)).as("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val seeds = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("node"))
    val nSeeds = seeds.count() // driver scalar (S9 shape)
    var ranks = outdeg.select(col("src").as("node"))
      .join(broadcast(seeds.withColumn("is_seed", lit(1L))), Seq("node"),
        "left")
      .select(col("node"),
        when(col("is_seed") === 1L, lit(1000000000000L / nSeeds))
          .otherwise(lit(0L)).as("r"),
        coalesce(col("is_seed"), lit(0L)).as("is_seed"))
    val seedBase = 1000000000000L / nSeeds * 15L / 100L
    for (_ <- 1 to 3) {
      val contrib = ranks
        .join(outdeg, ranks("node") === outdeg("src"))
        .select(col("src"), expr("r div outdeg").as("c"))
        .join(edges, Seq("src"))
        .select(col("dst").as("node"), col("c"))
        .groupBy("node").agg(sum("c").as("in_sum"))
      ranks = contrib
        .join(broadcast(seeds.withColumn("is_seed", lit(1L))), Seq("node"),
          "left")
        .select(col("node"),
          (when(col("is_seed") === 1L, lit(seedBase)).otherwise(lit(0L))
            + expr("in_sum * 85 div 100")).as("r"),
          coalesce(col("is_seed"), lit(0L)).as("is_seed"))
    }
    ranks.filter(col("node") >= S)
      .join(outdeg.withColumnRenamed("src", "node"), Seq("node"))
      .select((col("node") - S).as("s_suppkey"), col("outdeg"),
        col("r").as("trust_pico"))
      .orderBy("s_suppkey")
  }

  /** q122: Count-Min sketch (Cormode & Muthukrishnan 2005) — the
    * mergeable heavy-hitter counter: d=4 hash rows × w=256 buckets of
    * summed token counts, point estimate = min over the 4 rows.
    * Like q120's HLL the buckets come from deterministic md5 bits, so
    * both engines build the identical sketch; unlike a exact
    * frequency table the sketch is 1024 longs regardless of
    * vocabulary, and shard sketches merge by cell-wise SUM — the
    * monoid a 100 TB token-frequency monitor actually ships around.
    * Output: the top-10 true-frequency tokens with exact vs estimated
    * count and the relative overestimate (CMS never underestimates).
    *
    * Scale shape: one map-side-combinable token groupBy (the exact
    * table doubles as the verification yardstick), a 4× explode of
    * the Zipf-bounded vocab into cells, and a 1024-row sketch agg. */
  def q122CmsSketch(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(s, dir)
      .select(explode(TextFns.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val withB = tf
      .select(col("token"), col("cnt"),
        explode(array((0 to 3).map(lit(_)): _*)).as("j"))
      .withColumn("h", md5(concat(lit("graft-cms:"), col("j"),
        lit(":"), col("token"))))
      .withColumn("bucket", expr(
        """(instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
           + instr('0123456789abcdef', substring(h, 2, 1)) - 1"""))
      .select("token", "cnt", "j", "bucket")
    val cells = withB.groupBy("j", "bucket").agg(sum("cnt").as("cell"))
    val top = tf.orderBy(col("cnt").desc, col("token")).limit(10)
    top.join(withB.select("token", "j", "bucket"), Seq("token"))
      .join(cells, Seq("j", "bucket"))
      .groupBy("token", "cnt").agg(min("cell").as("est_cnt"))
      .withColumn("overest_milli",
        expr("(est_cnt - cnt) * 1000 div cnt"))
      .select(col("token"), col("cnt").as("exact_cnt"),
        col("est_cnt"), col("overest_milli"))
      .orderBy("token")
  }

  /** q126: blocked Bloom-filter runtime join pruning — the small-side
    * runtime filter a 100 TB engine pushes into the fact-table scan,
    * in the BLOCKED form production filters use (a fixed-size Bloom
    * array per key-range block) so the false-positive rate stays
    * constant as data grows: a monolithic m-bit array saturates once
    * the key count passes ~m/10 (measured here: urgent orders
    * saturated a single 4096-bit array at sf0.1 — all bits set, zero
    * pruning), while blocks of 1024 keys hold ~205 urgent keys each
    * at every scale factor, keeping the per-block load — and the FP
    * rate (~0.3%) — scale-invariant. Each block's 4096 bits live in
    * 64 longs; the k=3 positions are hex digits 1-3, 4-6, 7-9 of ONE
    * md5 (independent uniform 12-bit draws, a third of the hashing),
    * so both engines index the identical array. A fact row passes only
    * if its block exists (free block-range pruning) and all 3 bits
    * are set; the exact semi-join afterwards removes the false
    * positives. Output: one summary row proving the contract —
    * pass-set ⊇ true-set, the measured FP rate, and a revenue total
    * over the bloom-then-exact path that a plain semi-join would
    * also produce (the filter changed the plan, not the answer).
    *
    * Scale shape: the filter is BUILT distributed (per-block
    * groupBy on the dim side, no driver collect), shipped as a
    * broadcast of ~4 KB per 1024-key block, and evaluated map-side:
    * one md5 per hash row hoisted into a named column, then O(1)
    * integer bit tests — the fact table is never shuffled to be
    * pruned. Block bitmaps merge by bitwise OR (the same monoid
    * family as q120/q122), so shard-built filters combine without a
    * rescan. This is the manual spelling of what DPP/runtime filters
    * do, with deterministic hashes so the oracle can replay it.
    *
    * The report's instrumentation legs (n_rows / n_bloom_pass over
    * ALL rows) deliberately re-scan the fact side once more than a
    * production filter+join would — the measured pass-rate is the
    * point of the query; the operator itself (bloom filter → semi
    * join) reads the fact table once. */
  def q126BloomPrune(s: SparkSession, dir: String): DataFrame = {
    val B = 1024L // keys per block; FP stays ~0.3% at every sf
    // all 3 positions come from ONE md5: hex digits 1-3, 4-6, 7-9 —
    // independent uniform 12-bit draws, a third of the hashing
    def withPositions(df: DataFrame, keyCol: String): DataFrame =
      (0 to 2).foldLeft(
        df.withColumn("block", expr(s"$keyCol div $B"))
          .withColumn("h",
            md5(concat(lit("graft-bloom:"), col(keyCol).cast("string"))))) {
        (d, j) =>
          d.withColumn(s"p$j", expr(
            s"""(instr('0123456789abcdef', substring(h, ${3*j+1}, 1)) - 1) * 256
               + (instr('0123456789abcdef', substring(h, ${3*j+2}, 1)) - 1) * 16
               + instr('0123456789abcdef', substring(h, ${3*j+3}, 1)) - 1"""))
      }
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val blocks = withPositions(urgent, "o_orderkey")
      .select(col("block"),
        explode(array(col("p0"), col("p1"), col("p2"))).as("p"))
      .distinct()
      .groupBy("block").agg(collect_set("p").as("ps"))
      .withColumn("bits", expr(
        """transform(sequence(0, 63), w -> aggregate(
             filter(ps, p -> p div 64 = w), 0L,
             (a, p) -> a | shiftleft(1L, CAST(p % 64 AS INT))))"""))
      .select("block", "bits")
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        graft.functions.Exact.cents(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))).as("rev_cents"))
    def bitSet(p: String) = expr(
      s"(shiftright(element_at(bits, CAST($p div 64 AS INT) + 1), " +
        s"CAST($p % 64 AS INT)) & 1) = 1")
    val tagged = withPositions(li, "l_orderkey")
      .join(broadcast(blocks), Seq("block"), "left")
      .withColumn("bloom_pass",
        coalesce(bitSet("p0") && bitSet("p1") && bitSet("p2"), lit(false)))
      .select("l_orderkey", "rev_cents", "bloom_pass")
    val candidates = tagged.filter(col("bloom_pass"))
    val matched = candidates
      .join(urgent, candidates("l_orderkey") === urgent("o_orderkey"),
        "left_semi")
    matched.agg(
        count(lit(1)).as("n_matched_rows"),
        sum("rev_cents").as("urgent_rev_cents"))
      .crossJoin(broadcast(tagged.agg(
        count(lit(1)).as("n_rows"),
        sum(col("bloom_pass").cast("long")).as("n_bloom_pass"))))
      .crossJoin(broadcast(urgent.agg(
        count(lit(1)).as("n_urgent_orders"))))
      .withColumn("false_pos_milli", expr(
        "(n_bloom_pass - n_matched_rows) * 1000 div greatest(n_matched_rows, 1)"))
      .select("n_urgent_orders", "n_rows", "n_bloom_pass", "n_matched_rows",
        "false_pos_milli", "urgent_rev_cents")
  }

  /** q127: one-pass column profiling — the ANALYZE-style data-quality
    * report an ingest pipeline runs on every new batch: per column,
    * row count, null count, and exact distinct cardinality, emitted in
    * long format (one row per column). A single aggregate computes all
    * columns in one scan (Spark plans the multi-count-distinct via one
    * Expand — ncols× the rows map-side, never ncols scans); at 100 TB
    * the exact count-distincts would swap to approx_count_distinct
    * (the q120 HLL is the mergeable version), but the SHAPE — one
    * scan, long-format report — is the production one. */
  def q127ColumnProfile(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        sum(isnull(col(c)).cast("long")).as(s"nulls_$c"),
        countDistinct(col(c)).as(s"dist_$c")))
    val one = docs.agg(aggs.head, aggs.tail: _*)
    one.select(col("n_rows"), explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(s"nulls_$c").as("n_nulls"),
          col(s"dist_$c").as("n_distinct"))): _*)).as("m"))
      .select(col("m.col_name"), col("n_rows"), col("m.n_nulls"),
        col("m.n_distinct"))
      .orderBy("col_name")
  }

  /** q128: mergeable quantile sketch — fixed-width histogram
    * percentiles over order totals, the global-sort-free way a 100 TB
    * engine answers "p99 of 10¹² values": each shard (here: order
    * priority) builds a $100-wide bucket histogram map-side, shards
    * merge by bucket-wise SUM (the same monoid as q120/q122), and the
    * percentile reads the merged cumulative curve — the estimate is
    * the bucket's upper edge, so its error is bounded by the bucket
    * width, never the data size. Output per percentile: target rank,
    * the estimate, the exact count at/below it (= the cumulative
    * count, reported so the overshoot is measured, not asserted), and
    * that overshoot in thousandths. The only non-map-side work is a
    * window over the BUCKETS (bounded by value range / $100), not the
    * rows. */
  def q128QuantileSketch(s: SparkSession, dir: String): DataFrame = {
    val W = 10000L // bucket width: $100 in cents
    val cents = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("shard"),
        graft.functions.Exact.cents(col("o_totalprice")).as("v"))
    val shardHists = cents
      .groupBy(col("shard"), expr(s"v div $W").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val merged = shardHists.groupBy("b").agg(sum("cnt").as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("b")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = merged.withColumn("cum", sum("cnt").over(w))
      .crossJoin(broadcast(merged.agg(sum("cnt").as("n"))))
    val pcts = s.range(1).select(explode(
      array(lit(500), lit(900), lit(990))).as("pct"))
    pcts.join(cum,
        col("cum") >= expr("(pct * n + 999) div 1000"))
      .groupBy("pct", "n")
      .agg(min(struct(col("b"), col("cum"))).as("sel"))
      .withColumn("target_rank", expr("(pct * n + 999) div 1000"))
      .withColumn("est_cents", expr(s"(sel.b + 1) * $W - 1"))
      .withColumn("n_at_or_below", col("sel.cum"))
      .withColumn("overshoot_milli", expr("sel.cum * 1000 div n - pct"))
      .select("pct", "n", "target_rank", "est_cents", "n_at_or_below",
        "overshoot_milli")
      .orderBy("pct")
  }

  /** q134: trailing 7-day rolling revenue — the RANGE-frame window
    * (`rangeBetween(-6, 0)` over a day number) that a daily-metrics
    * dashboard reads; unlike a ROWS frame it is correct across gaps
    * (a missing day still ages out of the trailing week). The corpus
    * collapses to one row per day FIRST (map-side-combinable
    * groupBy), so the global window runs over the bounded date
    * dimension, never the orders — the only single-partition stage
    * is proportional to days, the same discipline as q128's
    * bucket-window. */
  def q134RollingRevenue(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .select(to_date(col("o_orderdate")).as("day"),
        graft.functions.Exact.cents(col("o_totalprice")).as("cents"))
      .groupBy("day").agg(sum("cents").as("day_cents"),
        count(lit(1)).as("n_orders"))
      .withColumn("dnum",
        datediff(col("day"), lit("1990-01-01").cast("date")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("dnum").rangeBetween(-6, 0)
    daily.withColumn("rolling7_cents", sum("day_cents").over(w))
      .withColumn("rolling7_orders", sum("n_orders").over(w))
      .select("day", "day_cents", "n_orders", "rolling7_cents",
        "rolling7_orders")
      .orderBy("day")
  }

  /** q137: per-group OLS regression — price-vs-quantity slope and
    * intercept per brand from the closed-form normal equations,
    * computed ENTIRELY from five combinable integer moments (n, Σx,
    * Σy, Σxy, Σx²): aggregate-only ML, the shape that fits a million
    * segment models in one groupBy at 100 TB (no per-group solver, no
    * iteration — the same exact-integer-moments discipline as q18/
    * q112). The numerator/denominator products are evaluated in
    * DECIMAL(38,0) — n·Σxy overflows a long at sf1 — and the final
    * slope/intercept are r6-rounded doubles of those exact integers,
    * so both engines divide identical numbers. */
  def q137GroupedOls(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        col("l_quantity").cast("long").as("x"),
        graft.functions.Exact.cents(col("l_extendedprice")).as("y"))
    li.groupBy("brand")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("num", expr(graft.functions.Fit.num))
      .withColumn("den", expr(graft.functions.Fit.den))
      // den = 0 (constant x within a brand) → NULL, not NaN: Spark
      // would silently cast NaN to 0 under non-ANSI while the oracle's
      // CAST(round(NaN)) errors — the guard is identical in both
      .withColumn("slope_cents_r6", graft.functions.Exact.r6(
        expr("CASE WHEN den = 0 THEN NULL ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END")))
      .withColumn("icept_cents_r6", graft.functions.Exact.r6(expr(
        """CASE WHEN den = 0 THEN NULL ELSE
           CAST(CAST(sy AS DECIMAL(38,0)) * den - num * sx AS DOUBLE)
           / CAST(CAST(n AS DECIMAL(38,0)) * den AS DOUBLE) END""")))
      .select("brand", "n", "sx", "sy", "slope_cents_r6", "icept_cents_r6")
      .orderBy("brand")
  }

  /** q142: skyline (Pareto frontier) per order priority — the orders
    * no other order of the same priority strictly dominates on
    * (total price ↑, order recency ↑): the multi-objective "best
    * trade-offs" report. The 2-D skyline reduces to a sort-free
    * window identity: collapse to distinct price levels keeping each
    * level's best date (one combinable groupBy), then a price-level
    * is on the frontier iff its date beats the running max over all
    * STRICTLY higher price levels. Because levels are UNIQUE per
    * (priority, cents), that suffix-max is an incremental ROWS frame
    * over descending cents (`rows unbounded preceding → 1 preceding`)
    * — O(levels); the equivalent RANGE BETWEEN 1 FOLLOWING AND
    * UNBOUNDED FOLLOWING spelling plans as Spark's
    * UnboundedFollowingWindowFunctionFrame, which RECOMPUTES the
    * aggregate per row — measured O(n²): 74.6 s at sf1 vs sub-second
    * for the ROWS spelling. The window still runs over price levels,
    * not orders (the q134 discipline). Strict dominance: level ties
    * already collapsed, so dominated ⇔ a higher-priced level has an
    * equal-or-later date.
    *
    * Scale shape: one groupBy (orders → levels) + one per-priority
    * window over levels. At 100 TB with adversarially many distinct
    * prices the window degrades to a per-priority sort of LEVELS —
    * the standard grid-prune refinement (q138's cells, prune
    * cell-dominated cells first) applies; real price domains are
    * far coarser than row counts. */
  def q142Skyline(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("priority"),
        graft.functions.Exact.cents(col("o_totalprice")).as("cents"),
        datediff(to_date(col("o_orderdate")),
          lit("1990-01-01").cast("date")).cast("long").as("dnum"))
    val levels = o.groupBy("priority", "cents")
      .agg(max("dnum").as("best_dnum"), count(lit(1)).as("n_orders"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("priority").orderBy(col("cents").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    levels
      .withColumn("dom_dnum", max("best_dnum").over(w))
      .filter(col("dom_dnum").isNull || col("best_dnum") > col("dom_dnum"))
      .select("priority", "cents", "best_dnum", "n_orders")
      .orderBy("priority", "cents")
  }

  /** q146: join-health report — the pre-join diagnostic a 100 TB
    * engine runs before committing to an expensive join: per-side
    * key cardinalities, key overlap and orphan counts, the EXACT
    * join output size (Σ left×right multiplicity over common keys)
    * and the hottest key's contribution — the numbers that decide
    * broadcast vs shuffle vs salt before any fact-table bytes move.
    * Two map-side-combinable per-key counts + one full-outer join of
    * KEY-cardinality frames + one closing agg; the fact tables are
    * read once each and never joined to each other. */
  def q146JoinHealth(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.orders(s, dir)
      .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("lc"))
    val r = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("rc"))
    val both = col("lc").isNotNull && col("rc").isNotNull
    l.join(r, Seq("k"), "full_outer")
      .agg(
        sum(coalesce(col("lc"), lit(0L))).as("rows_left"),
        sum(coalesce(col("rc"), lit(0L))).as("rows_right"),
        sum(when(col("lc").isNotNull, 1L).otherwise(0L)).as("keys_left"),
        sum(when(col("rc").isNotNull, 1L).otherwise(0L)).as("keys_right"),
        sum(when(both, 1L).otherwise(0L)).as("keys_common"),
        sum(when(col("lc").isNotNull && col("rc").isNull, 1L).otherwise(0L))
          .as("keys_left_only"),
        sum(when(col("lc").isNull && col("rc").isNotNull, 1L).otherwise(0L))
          .as("keys_right_only"),
        sum(when(both, col("lc") * col("rc")).otherwise(0L)).as("join_rows"),
        max(when(both, col("lc") * col("rc")).otherwise(0L))
          .as("max_key_rows"))
  }

  /** q150: per-group ship-latency percentiles — p50/p90/p99 of
    * (ship date − order date) PER PRIORITY, the SLA report, computed
    * with the q128 histogram discipline but grouped: latencies are
    * small integers (days), so the day itself is the bucket, the
    * per-(priority, day) histogram is one combinable groupBy over
    * the join, and each priority's cumulative curve is a window over
    * its ≤ hundreds of day rows — the percentile is EXACT at day
    * granularity, and nothing ever sorts the fact rows. The
    * lineitem⋈orders join is the only fact-sized operation (keyed,
    * AQE-broadcastable at small sf). */
  def q150LatencyPercentiles(s: SparkSession, dir: String): DataFrame = {
    val lat = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"))
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey").as("l_orderkey"),
          to_date(col("o_orderdate")).as("odate"),
          col("o_orderpriority").as("priority")),
        Seq("l_orderkey"))
      .select(col("priority"),
        datediff(col("ship"), col("odate")).cast("long").as("d"))
    val hist = lat.groupBy("priority", "d").agg(count(lit(1)).as("cnt"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy("priority").orderBy("d")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("priority")
    val cum = hist.withColumn("cum", sum("cnt").over(wc))
      .withColumn("n", sum("cnt").over(wn))
    val pcts = s.range(1).select(explode(
      array(lit(500), lit(900), lit(990))).as("pct"))
    pcts.join(cum, col("cum") >= expr("(pct * n + 999) div 1000"))
      .groupBy("priority", "pct", "n")
      .agg(min(struct(col("d"), col("cum"))).as("sel"))
      .withColumn("target_rank", expr("(pct * n + 999) div 1000"))
      .withColumn("latency_days", col("sel.d"))
      .withColumn("n_at_or_below", col("sel.cum"))
      .select("priority", "pct", "n", "target_rank", "latency_days",
        "n_at_or_below")
      .orderBy("priority", "pct")
  }

  val queries: Map[String, Q] = Map(
    "q150_latency_percentiles" -> (q150LatencyPercentiles _),
    "q146_join_health" -> (q146JoinHealth _),
    "q142_skyline" -> (q142Skyline _),
    "q137_grouped_ols" -> (q137GroupedOls _),
    "q134_rolling_revenue" -> (q134RollingRevenue _),
    "q126_bloom_prune" -> (q126BloomPrune _),
    "q127_column_profile" -> (q127ColumnProfile _),
    "q128_quantile_sketch" -> (q128QuantileSketch _),
    "q122_cms_sketch" -> (q122CmsSketch _),
    "q121_pagerank" -> (q121PageRank _),
    "q182_trustrank" -> (q182TrustRank _),
    "q184_signal_corr" -> (q184SignalCorr _),
    "q120_hll_sketch" -> (q120HllSketch _),
    "q58_technique_model" -> (q58TechniqueModel _),
    "q59_level2_hamming" -> (q59Level2Hamming _),
    "q60_date_range" -> (q60DateRange _),
    "q61_or_join" -> (q61OrJoin _),
    "q73_rollup" -> (q73Rollup _),
    "q76_composite_semi_join" -> (q76CompositeSemiJoin _),
    "q80_hash_sample" -> (q80HashSample _))

  /** One unrolled PageRank iteration over `prev(node, r)` — mirrors
    * q121PageRank's integer update exactly (sum of floor-divided
    * contributions, then damping in integer percent). */
  /** MATERIALIZED: without the hint DuckDB inlines each CTE per
    * reference, re-evaluating the trades join for every iteration's
    * edges/outdeg uses — the q160/q161 exponential-replay lesson; at
    * sf3 the un-hinted chain exceeded 66 G of temp disk. */
  private def prIterSql(i: Int, prev: String): String =
    s"""it$i AS MATERIALIZED (SELECT e.dst AS node,
         (1000000000000 // nn.n * 15 // 100)
           + CAST(sum(r.r // o.outdeg) AS BIGINT) * 85 // 100 AS r
       FROM $prev r
       JOIN edges e ON r.node = e.src
       JOIN outdeg o ON o.src = e.src
       CROSS JOIN nn
       GROUP BY e.dst, nn.n)"""

  /** DuckDB spelling of the q126 Bloom position for hash row `j` over
    * key column `k` — hex digits 3j+1..3j+3 of one md5 as a 0..4095
    * index, digit-for-digit the Spark expression. */
  private def bloomPosSql(j: Int, k: String): String =
    s"""((strpos('0123456789abcdef', substring(md5('graft-bloom:'
         || CAST($k AS VARCHAR)), ${3 * j + 1}, 1)) - 1) * 256
       + (strpos('0123456789abcdef', substring(md5('graft-bloom:'
         || CAST($k AS VARCHAR)), ${3 * j + 2}, 1)) - 1) * 16
       + strpos('0123456789abcdef', substring(md5('graft-bloom:'
         || CAST($k AS VARCHAR)), ${3 * j + 3}, 1)) - 1)"""

  val oracles: Map[String, String] = Map(
    "q150_latency_percentiles" ->
      """WITH lat AS (SELECT o.o_orderpriority AS priority,
           CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
             CAST(l.l_shipdate AS DATE)) AS BIGINT) AS d
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         h AS (SELECT priority, d, CAST(count(*) AS BIGINT) AS cnt
           FROM lat GROUP BY 1, 2),
         c AS (SELECT *, CAST(sum(cnt) OVER (PARTITION BY priority
             ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY priority) AS BIGINT) AS n
           FROM h),
         pcts AS (SELECT unnest([500, 900, 990]) AS pct),
         sel AS (SELECT c.priority, p.pct, c.n, min(c.d) AS sd
           FROM pcts p, c
           WHERE c.cum >= (p.pct * c.n + 999) // 1000
           GROUP BY 1, 2, 3)
         SELECT s.priority, s.pct, s.n,
           (s.pct * s.n + 999) // 1000 AS target_rank,
           s.sd AS latency_days, c.cum AS n_at_or_below
         FROM sel s JOIN c ON c.priority = s.priority AND c.d = s.sd
         ORDER BY s.priority, s.pct""",
    "q146_join_health" ->
      """WITH l AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS lc
           FROM orders GROUP BY 1),
         r AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS rc
           FROM lineitem GROUP BY 1),
         m AS (SELECT l.lc, r.rc FROM l FULL OUTER JOIN r ON l.k = r.k)
         SELECT
           CAST(sum(coalesce(lc, 0)) AS BIGINT) AS rows_left,
           CAST(sum(coalesce(rc, 0)) AS BIGINT) AS rows_right,
           CAST(sum(CASE WHEN lc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS keys_left,
           CAST(sum(CASE WHEN rc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS keys_right,
           CAST(sum(CASE WHEN lc IS NOT NULL AND rc IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS keys_common,
           CAST(sum(CASE WHEN lc IS NOT NULL AND rc IS NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS keys_left_only,
           CAST(sum(CASE WHEN lc IS NULL AND rc IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS keys_right_only,
           CAST(sum(CASE WHEN lc IS NOT NULL AND rc IS NOT NULL
             THEN lc * rc ELSE 0 END) AS BIGINT) AS join_rows,
           CAST(max(CASE WHEN lc IS NOT NULL AND rc IS NOT NULL
             THEN lc * rc ELSE 0 END) AS BIGINT) AS max_key_rows
         FROM m""",
    "q142_skyline" ->
      """WITH o AS (SELECT o_orderpriority AS priority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
             AS dnum
           FROM orders),
         lv AS (SELECT priority, cents,
             CAST(max(dnum) AS BIGINT) AS best_dnum,
             CAST(count(*) AS BIGINT) AS n_orders
           FROM o GROUP BY 1, 2),
         d AS (SELECT *, max(best_dnum) OVER (PARTITION BY priority
             ORDER BY cents DESC ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING) AS dom_dnum
           FROM lv)
         SELECT priority, cents, best_dnum, n_orders
         FROM d WHERE dom_dnum IS NULL OR best_dnum > dom_dnum
         ORDER BY priority, cents""",
    "q137_grouped_ols" ->
      s"""WITH li AS (SELECT p.p_brand AS brand,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS y
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
         m AS (SELECT brand, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
           FROM li GROUP BY brand),
         d AS (SELECT *,
             ${graft.functions.Fit.sqlNum} AS num,
             ${graft.functions.Fit.sqlDen} AS den
           FROM m)
         SELECT brand, n, sx, sy,
           CASE WHEN den = 0 THEN NULL ELSE
             CAST(round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1e6)
               AS BIGINT) / 1e6 END AS slope_cents_r6,
           CASE WHEN den = 0 THEN NULL ELSE
             CAST(round(CAST(CAST(sy AS HUGEINT) * den - num * sx AS DOUBLE)
               / CAST(CAST(n AS HUGEINT) * den AS DOUBLE) * 1e6)
               AS BIGINT) / 1e6 END AS icept_cents_r6
         FROM d ORDER BY brand""",
    "q134_rolling_revenue" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         d AS (SELECT day, CAST(sum(cents) AS BIGINT) AS day_cents,
             CAST(count(*) AS BIGINT) AS n_orders,
             date_diff('day', DATE '1990-01-01', day) AS dnum
           FROM o GROUP BY day)
         SELECT day, day_cents, n_orders,
           CAST(sum(day_cents) OVER (ORDER BY dnum
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS rolling7_cents,
           CAST(sum(n_orders) OVER (ORDER BY dnum
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS rolling7_orders
         FROM d ORDER BY day""",
    "q126_bloom_prune" ->
      s"""WITH urgent AS (SELECT o_orderkey FROM orders
           WHERE o_orderpriority = '1-URGENT'),
         upos AS (SELECT DISTINCT o_orderkey // 1024 AS block, CASE j
             WHEN 0 THEN ${bloomPosSql(0, "o_orderkey")}
             WHEN 1 THEN ${bloomPosSql(1, "o_orderkey")}
             ELSE ${bloomPosSql(2, "o_orderkey")} END AS p
           FROM urgent, range(0, 3) t(j)),
         li AS (SELECT l_orderkey,
             CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               AS rev_cents
           FROM lineitem),
         keys AS (SELECT DISTINCT l_orderkey FROM li),
         kp AS (SELECT l_orderkey, j, l_orderkey // 1024 AS block, CASE j
             WHEN 0 THEN ${bloomPosSql(0, "l_orderkey")}
             WHEN 1 THEN ${bloomPosSql(1, "l_orderkey")}
             ELSE ${bloomPosSql(2, "l_orderkey")} END AS p
           FROM keys, range(0, 3) t(j)),
         kpass AS (SELECT l_orderkey FROM kp
           WHERE EXISTS (SELECT 1 FROM upos u
             WHERE u.block = kp.block AND u.p = kp.p)
           GROUP BY l_orderkey HAVING count(*) = 3),
         stats AS (SELECT
             (SELECT CAST(count(*) AS BIGINT) FROM urgent)
               AS n_urgent_orders,
             (SELECT CAST(count(*) AS BIGINT) FROM li) AS n_rows,
             (SELECT CAST(count(*) AS BIGINT) FROM li
               WHERE l_orderkey IN (SELECT l_orderkey FROM kpass))
               AS n_bloom_pass,
             (SELECT CAST(count(*) AS BIGINT) FROM li
               WHERE l_orderkey IN (SELECT o_orderkey FROM urgent))
               AS n_matched_rows,
             (SELECT CAST(sum(rev_cents) AS BIGINT) FROM li
               WHERE l_orderkey IN (SELECT o_orderkey FROM urgent))
               AS urgent_rev_cents)
         SELECT n_urgent_orders, n_rows, n_bloom_pass, n_matched_rows,
           (n_bloom_pass - n_matched_rows) * 1000
             // greatest(n_matched_rows, 1) AS false_pos_milli,
           urgent_rev_cents
         FROM stats""",
    "q127_column_profile" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      cols.map(c =>
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
           FROM documents""").mkString("", " UNION ALL ",
        " ORDER BY col_name")
    },
    "q128_quantile_sketch" ->
      """WITH cents AS (SELECT o_orderpriority AS shard,
           CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
         sh AS (SELECT shard, v // 10000 AS b,
             CAST(count(*) AS BIGINT) AS cnt
           FROM cents GROUP BY 1, 2),
         m AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS cnt FROM sh GROUP BY 1),
         c AS (SELECT b, cnt, CAST(sum(cnt) OVER
             (ORDER BY b ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM m),
         nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM m),
         pcts AS (SELECT unnest([500, 900, 990]) AS pct),
         sel AS (SELECT pct, nn.n, min(c.b) AS est_b
           FROM pcts, nn, c
           WHERE c.cum >= (pct * nn.n + 999) // 1000
           GROUP BY 1, 2)
         SELECT sel.pct, sel.n, (sel.pct * sel.n + 999) // 1000
             AS target_rank,
           (sel.est_b + 1) * 10000 - 1 AS est_cents,
           c.cum AS n_at_or_below,
           c.cum * 1000 // sel.n - sel.pct AS overshoot_milli
         FROM sel JOIN c ON c.b = sel.est_b ORDER BY sel.pct""",
    "q122_cms_sketch" ->
      s"""WITH tf AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM
           (SELECT unnest(${TextFns.sqlTokens("text")}) AS token
            FROM documents) GROUP BY token),
         withb AS (SELECT token, cnt, j,
             (strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
               + strpos('0123456789abcdef', substring(h, 2, 1)) - 1
               AS bucket
           FROM (SELECT token, cnt, j,
               md5('graft-cms:' || CAST(j AS VARCHAR) || ':' || token) AS h
             FROM tf, range(0, 4) t(j))),
         cells AS (SELECT j, bucket, CAST(sum(cnt) AS BIGINT) AS cell
           FROM withb GROUP BY j, bucket),
         top AS (SELECT token, cnt FROM tf
           ORDER BY cnt DESC, token LIMIT 10),
         est AS (SELECT t.token, t.cnt,
             CAST(min(c.cell) AS BIGINT) AS est_cnt
           FROM top t
           JOIN withb w ON w.token = t.token
           JOIN cells c ON c.j = w.j AND c.bucket = w.bucket
           GROUP BY t.token, t.cnt)
         SELECT token, cnt AS exact_cnt, est_cnt,
           (est_cnt - cnt) * 1000 // cnt AS overest_milli
         FROM est ORDER BY token""",
    "q184_signal_corr" ->
      s"""WITH d AS (SELECT doc_id, text,
           ${TextFns.sqlTokens("text")} AS toks FROM documents
           WHERE len(${TextFns.sqlTokens("text")}) > 0),
         m AS (
           SELECT doc_id, 'n_tokens' AS sig,
             CAST(len(toks) AS BIGINT) AS v FROM d
           UNION ALL SELECT doc_id, 'n_chars',
             CAST(length(text) AS BIGINT) FROM d
           UNION ALL SELECT doc_id, 'alpha_chars',
             CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
               AS BIGINT) FROM d
           UNION ALL SELECT doc_id, 'stop_hits',
             CAST(len(list_filter(toks,
               x -> list_contains(['the','a','is','of','to'], x)))
               AS BIGINT) FROM d),
         j AS (SELECT a.sig AS sig_a, b.sig AS sig_b, a.v AS va, b.v AS vb
           FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.sig <= b.sig),
         g AS (SELECT sig_a, sig_b, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(va) AS HUGEINT) AS sa, CAST(sum(vb) AS HUGEINT) AS sb,
             sum(CAST(va AS HUGEINT) * vb) AS sab,
             sum(CAST(va AS HUGEINT) * va) AS saa,
             sum(CAST(vb AS HUGEINT) * vb) AS sbb
           FROM j GROUP BY 1, 2)
         SELECT sig_a, sig_b, CAST(n AS BIGINT) AS n,
           CASE WHEN (n * saa - sa * sa) = 0 OR (n * sbb - sb * sb) = 0
           THEN NULL ELSE
             CAST(round(CAST(n * sab - sa * sb AS DOUBLE)
               / sqrt(CAST(n * saa - sa * sa AS DOUBLE))
               / sqrt(CAST(n * sbb - sb * sb AS DOUBLE)) * 1e6) AS BIGINT)
           END AS corr_micro
         FROM g ORDER BY sig_a, sig_b""",
    "q182_trustrank" -> {
      def iterSql(i: Int, prev: String): String =
        s"""it$i AS MATERIALIZED (SELECT e.dst AS node,
             (CASE WHEN e.dst IN (SELECT node FROM seeds)
               THEN 1000000000000 // ns.n * 15 // 100 ELSE 0 END)
               + CAST(sum(r.r // o.outdeg) AS BIGINT) * 85 // 100 AS r
           FROM $prev r
           JOIN edges e ON r.node = e.src
           JOIN outdeg o ON o.src = e.src
           CROSS JOIN ns
           GROUP BY e.dst, ns.n)"""
      s"""WITH trades AS MATERIALIZED (SELECT DISTINCT o_custkey AS c,
           l_suppkey + 100000000 AS p
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         edges AS MATERIALIZED (SELECT c AS src, p AS dst FROM trades
           UNION ALL SELECT p, c FROM trades),
         outdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT)
           AS outdeg FROM edges GROUP BY src),
         seeds AS (SELECT c_custkey AS node FROM customer
           WHERE c_mktsegment = 'BUILDING'),
         ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM seeds),
         r0 AS (SELECT src AS node,
             CASE WHEN src IN (SELECT node FROM seeds)
               THEN 1000000000000 // ns.n ELSE 0 END AS r
           FROM outdeg CROSS JOIN ns),
         ${iterSql(1, "r0")},
         ${iterSql(2, "it1")},
         ${iterSql(3, "it2")}
         SELECT node - 100000000 AS s_suppkey, outdeg,
           CAST(r AS BIGINT) AS trust_pico
         FROM it3 JOIN outdeg ON it3.node = outdeg.src
         WHERE node >= 100000000 ORDER BY s_suppkey"""
    },
    "q121_pagerank" ->
      s"""WITH trades AS MATERIALIZED (SELECT DISTINCT o_custkey AS c,
           l_suppkey + 100000000 AS p
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         edges AS MATERIALIZED (SELECT c AS src, p AS dst FROM trades
           UNION ALL SELECT p, c FROM trades),
         outdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT)
           AS outdeg FROM edges GROUP BY src),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM outdeg),
         r0 AS (SELECT src AS node, 1000000000000 // n AS r
           FROM outdeg CROSS JOIN nn),
         ${prIterSql(1, "r0")},
         ${prIterSql(2, "it1")},
         ${prIterSql(3, "it2")}
         SELECT node - 100000000 AS s_suppkey, outdeg,
           CAST(r AS BIGINT) AS rank_pico
         FROM it3 JOIN outdeg ON it3.node = outdeg.src
         WHERE node >= 100000000 ORDER BY s_suppkey""",
    "q120_hll_sketch" ->
      s"""WITH words AS (SELECT DISTINCT source, word FROM
           (SELECT source, unnest(${TextFns.sqlTokens("text")}) AS word
            FROM documents)),
         hashed AS (SELECT source, md5('graft-hll:' || word) AS h
           FROM words),
         parts AS (SELECT source,
             ((strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
               + strpos('0123456789abcdef', substring(h, 2, 1)) - 1) % 64
               AS bucket,
             ltrim(substring(h, 3, 16), '0') AS t
           FROM hashed),
         rhos AS (SELECT source, bucket,
             CASE WHEN t = '' THEN 65
               ELSE (16 - length(t)) * 4
                 + CASE WHEN substring(t, 1, 1) = '1' THEN 3
                     WHEN substring(t, 1, 1) IN ('2', '3') THEN 2
                     WHEN substring(t, 1, 1) IN ('4', '5', '6', '7') THEN 1
                     ELSE 0 END + 1 END AS rho
           FROM parts),
         regs AS (SELECT source, bucket, CAST(max(rho) AS BIGINT)
             AS register FROM rhos GROUP BY 1, 2),
         allregs AS (SELECT * FROM regs UNION ALL
           SELECT '__all__' AS source, bucket,
             CAST(max(register) AS BIGINT) AS register
           FROM regs GROUP BY bucket),
         est AS (SELECT source,
             CAST(sum(CAST(round(power(2.0, -register) * 1e6) AS BIGINT))
               AS BIGINT) AS sum_micro,
             CAST(count(*) AS BIGINT) AS n_buckets
           FROM allregs GROUP BY source),
         est1 AS (SELECT source, sum_micro, n_buckets,
             64 - n_buckets AS zeros,
             $HllAlpha64 * 64 * 64
               / ((sum_micro + (64 - n_buckets) * 1000000) / 1e6) AS raw_est
           FROM est),
         est2 AS (SELECT source,
             CASE WHEN raw_est <= 160.0 AND zeros > 0
               THEN CAST(round(64 * ln(64.0 / zeros) * 1000) AS BIGINT)
               ELSE CAST(round(raw_est * 1000) AS BIGINT) END AS est_milli
           FROM est1),
         exact AS (SELECT source, CAST(count(*) AS BIGINT)
             AS exact_distinct FROM words GROUP BY source
           UNION ALL SELECT '__all__',
             CAST(count(DISTINCT word) AS BIGINT) FROM words)
         SELECT source, exact_distinct, est_milli,
           abs(est_milli - exact_distinct * 1000) // exact_distinct
             AS err_milli
         FROM est2 JOIN exact USING (source) ORDER BY source""",
    "q58_technique_model" ->
      """WITH li AS (SELECT o.o_custkey AS custkey, p.p_brand AS brand
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN part p ON l.l_partkey = p.p_partkey),
         perkey AS (SELECT custkey, brand, count(*) AS n FROM li GROUP BY 1, 2),
         percust AS (SELECT custkey, CAST(sum(n) AS BIGINT) AS total
           FROM perkey GROUP BY custkey),
         r AS (SELECT perkey.custkey, n,
           CAST(round(n * 1000000.0 / total) AS BIGINT) AS ratio_micro
           FROM perkey JOIN percust ON perkey.custkey = percust.custkey)
         SELECT CAST(floor(ratio_micro / 100000) AS BIGINT) AS bucket,
           count(*) AS n_pairs,
           count(DISTINCT custkey) AS n_custs,
           CAST(sum(n) AS BIGINT) AS n_lines
         FROM r GROUP BY 1 ORDER BY bucket""",
    "q59_level2_hamming" ->
      s"""WITH ${TextQueries.lshDupPairsCtes},
         th AS (SELECT doc_id,
           list_transform(toks, t -> ${TextFns.sqlPolyHash("t")}) AS hs
           FROM toks WHERE len(toks) > 0),
         sh AS (SELECT doc_id, ${TextFns.sqlSimhash32("hs")} AS simhash FROM th)
         SELECT doc1, doc2,
           bit_count(xor(s1.simhash, s2.simhash)) AS hamming,
           CASE WHEN bit_count(xor(s1.simhash, s2.simhash)) <= 8
             THEN 100.0 ELSE 0.0 END AS score
         FROM dup_pairs
         JOIN sh s1 ON s1.doc_id = doc1
         JOIN sh s2 ON s2.doc_id = doc2
         ORDER BY doc1, doc2""",
    "q60_date_range" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
         count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM orders
         WHERE year(o_orderdate) BETWEEN 1995 AND 1996
         GROUP BY 1, 2 ORDER BY yr, mo""",
    "q76_composite_semi_join" ->
      """WITH valid AS (SELECT DISTINCT l_partkey, l_suppkey
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderstatus = 'O' AND l.l_quantity > 45)
         SELECT l_suppkey AS suppkey, count(*) AS n_lines,
           count(DISTINCT l_partkey) AS n_parts,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM lineitem l
         WHERE EXISTS (SELECT 1 FROM valid v
           WHERE v.l_partkey = l.l_partkey AND v.l_suppkey = l.l_suppkey)
         GROUP BY 1 ORDER BY suppkey""",
    "q73_rollup" ->
      """SELECT o_orderstatus, year(o_orderdate) AS yr,
         count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
         CAST(grouping(o_orderstatus) * 2 + grouping(year(o_orderdate)) AS BIGINT) AS gid
         FROM orders
         GROUP BY ROLLUP (o_orderstatus, year(o_orderdate))
         ORDER BY gid, o_orderstatus, yr""",
    "q80_hash_sample" ->
      """SELECT doc_id, lang, source, n_chars,
         substring(md5('graft-sample:' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
         FROM documents
         WHERE substring(md5('graft-sample:' || CAST(doc_id AS VARCHAR)), 1, 2)
           < CASE WHEN lang = 'en' THEN '80' ELSE '40' END
         ORDER BY doc_id""",
    "q61_or_join" ->
      """WITH pairs AS (SELECT l_orderkey AS doc1, l_partkey + 10000000 AS doc2
           FROM lineitem),
         train AS (SELECT DISTINCT tid FROM (
           SELECT doc1 AS tid FROM pairs UNION ALL SELECT doc2 FROM pairs)
           WHERE tid % 1000 = 0)
         SELECT DISTINCT doc1, doc2 FROM pairs
         WHERE doc1 IN (SELECT tid FROM train)
            OR doc2 IN (SELECT tid FROM train)
         ORDER BY doc1, doc2""")
}
