package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Exact.r6

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two strategies, mirroring how an ANN layer is deployed on a real
  * cluster:
  *
  *  - [[cosineTopK]] — brute-force: broadcast the (small) query set
  *    against the corpus and keep top-k per query. At 100 TB the corpus
  *    side stays partitioned and is scanned exactly once per batch of
  *    queries; no shuffle of the corpus is ever needed (the only
  *    shuffle is the final per-query top-k, k rows per query per
  *    partition after partial aggregation).
  *  - [[lshBuckets]] + bucket join — random-hyperplane LSH: each vector
  *    gets `bands` keys; candidates are pairs sharing a band key, so
  *    the corpus self/query join becomes an equi-join on (band, key)
  *    instead of a cross product. This is the scale path: bucket
  *    cardinality bounds the candidate count the same way the
  *    reference's MinHashLSH picture join does
  *    (`matching/matcher/PictureMatcher.scala:54-68`).
  *
  * All arithmetic is float→double casts + a left-to-right double fold,
  * which the native `graft_dot` expression, the HOF spelling and the
  * DuckDB oracle (`list_reduce`/`list_zip`) evaluate bit-identically.
  */
object VectorSearch {

  /** Dot product of two float/double-array columns, accumulated in
    * double in array order (deterministic across partitionings:
    * per-row op). Native codegen'd expression; bit-identical to
    * [[dotHof]] (HashSpec) and to the oracle's list fold. */
  def dotD(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  /** The interpreted HOF spelling of [[dotD]], kept as the spec
    * cross-check (HOFs are CodegenFallback — ~200 boxed node walks
    * per 64-dim pair — which is why the hot path is native). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity, total on degenerate input: a zero-norm (or
    * empty) vector has no direction, so its cosine is NULL — the
    * general form of the `sxx > 0` guard [[CosineText]] documents
    * (0/0 is NaN, which Spark and DuckDB then treat differently and
    * ANSI long-casts reject). NULL ranks LAST under the descending
    * top-k windows and fails every `>= threshold` pair filter, so
    * zero-norm vectors are deterministically un-rankable rather than
    * a crash. The guarded branch keeps the exact original arithmetic
    * (`dot / (sqrt(aa) · sqrt(bb))`, NOT `sqrt(aa·bb)` — different
    * ULPs), so results on any corpus without zero-norm vectors are
    * bit-identical to the unguarded spelling, and the oracle SQL
    * needs no change. Codegen subexpression elimination collapses the
    * repeated self-dots. */
  def cosine(a: Column, b: Column): Column =
    when(dotD(a, a) > 0.0 && dotD(b, b) > 0.0,
      dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b))))

  /** Brute-force cosine top-k: query rows (qid, qemb) × corpus
    * (vec_id, embedding). Query side is broadcast — at scale it is the
    * small side by construction. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("cosine", r6(cosine(col("qemb"), col("embedding"))))
      // zero-norm pairs score NULL (see [[cosine]]) — drop them so a
      // degenerate corpus can never pad the top-k with unranked rows
      .filter(col("cosine").isNotNull)
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("qid", "vec_id", "cosine", "rnk")
  }

  /** Deterministic ±1 hyperplanes (seeded), shared between the Spark
    * plan and the generated oracle SQL literal. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** One row per plane: (h, plane array<double>). Tiny — broadcast. */
  def planesDF(s: SparkSession, planes: Seq[Seq[Double]]): DataFrame = {
    import s.implicits._
    planes.zipWithIndex.map { case (p, h) => (h, p) }.toDF("h", "plane")
  }

  /** (id, band, key): sign-bit signature grouped into bands of
    * `bandBits` bits. Vectors sharing any (band, key) are candidates. */
  def lshBuckets(vecs: DataFrame, idCol: String, embCol: String,
                 planes: DataFrame, bandBits: Int): DataFrame =
    vecs
      .crossJoin(broadcast(planes))
      .withColumn("bit",
        when(dotD(col(embCol), col("plane")) >= 0.0, 1L).otherwise(0L))
      .withColumn("band", expr(s"h div $bandBits"))
      .groupBy(col(idCol), col("band"))
      .agg(sum(col("bit") * pow(lit(2.0), col("h") % bandBits).cast("long"))
        .as("key"))

  // ---- DuckDB spellings (oracle side) ------------------------------

  def sqlDotD(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0,
        list_transform(list_zip(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])),
          s -> s[1] * s[2])), (acc, x) -> acc + x)"""

  def sqlCosine(a: String, b: String): String =
    s"(${sqlDotD(a, b)}) / (sqrt(${sqlDotD(a, a)}) * sqrt(${sqlDotD(b, b)}))"

  /** VALUES rows `(h, plane)` matching [[planesDF]]. */
  def sqlPlanesCte(planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex
      .map { case (p, h) =>
        s"($h, CAST(${p.mkString("[", ",", "]")} AS DOUBLE[]))" }
      .mkString("planes(h, plane) AS (SELECT * FROM (VALUES ", ", ", "))")
}
