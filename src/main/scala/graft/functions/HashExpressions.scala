package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hash pipeline.
  *
  * The same math is expressible with Spark's higher-order functions
  * (`transform`/`aggregate`, see the `*Hof` variants in [[TextFns]]) —
  * but HOF lambdas are *interpreted*: every array element walks an
  * expression tree with boxing, so hashing one document's shingles
  * costs thousands of interpreted node evaluations (~5 ms/doc — the
  * round-1 bench spent 15+ min of its runtime there). Each expression
  * below is one compiled JVM loop per row, with `doGenCode` emitting a
  * static call so surrounding projections stay in WholeStageCodegen.
  *
  * Semantics are bit-for-bit identical to the HOF spellings and to the
  * DuckDB oracle spellings in [[TextFns]] (asserted by HashSpec):
  * inputs are ASCII by construction (tokens match `[a-z0-9]+`), so the
  * byte loop equals the per-char `ascii()` loop.
  */
object HashExpressions {

  val P: Long = TextFns.P

  /** poly(s): fold (acc*31 + codepoint) mod P over the string. */
  def polyHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xffL)) % P
      i += 1
    }
    acc
  }

  /** Continue a running poly hash with one more codepoint. */
  @inline private def step(acc: Long, b: Long): Long = (acc * 31 + b) % P

  /** Hash of toks[i..i+k-1] joined with ' ' without building the string. */
  private def shingleHash(toks: Array[UTF8String], i: Int, k: Int): Long = {
    var acc = 0L
    var j = i
    while (j < i + k) {
      if (j > i) acc = step(acc, 32L) // ' '
      val bytes = toks(j).getBytes
      var b = 0
      while (b < bytes.length) { acc = step(acc, bytes(b) & 0xffL); b += 1 }
      j += 1
    }
    acc
  }

  def shingleHashes(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val arr = new Array[UTF8String](n)
    var i = 0
    while (i < n) { arr(i) = toks.getUTF8String(i); i += 1 }
    val m = math.max(0, n - k + 1)
    val out = new Array[Any](m)
    i = 0
    while (i < m) { out(i) = shingleHash(arr, i, k); i += 1 }
    new GenericArrayData(out)
  }

  /** k-word shingle STRINGS (space-joined), one compiled loop per row —
    * the string-producing sibling of [[shingleHashes]] for operators
    * whose predicates need the shingle text itself (rare-word filters,
    * n-gram dictionaries). Mirrors the HOF spelling bit-for-bit:
    * fewer than k tokens → empty array. */
  def shingles(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val arr = new Array[UTF8String](n)
    var i = 0
    while (i < n) { arr(i) = toks.getUTF8String(i); i += 1 }
    val space = UTF8String.fromString(" ")
    val m = n - k + 1
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = arr(i + j); j += 1 }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def tokenHashes(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = polyHash(toks.getUTF8String(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** n permutations h_i(x) = ((2i+1)x + 7919i) mod P, min over the set.
    * Empty input → array of nulls (matching `array_min` over empty). */
  def minhashSignature(hashes: ArrayData, n: Int): ArrayData = {
    val m = hashes.numElements()
    val hs = new Array[Long](m)
    var j = 0
    while (j < m) { hs(j) = hashes.getLong(j); j += 1 }
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (m == 0) out(i) = null
      else {
        val a = 2L * i + 1
        val b = 7919L * i
        var min = Long.MaxValue
        j = 0
        while (j < m) {
          val v = (a * hs(j) + b) % P
          if (v < min) min = v
          j += 1
        }
        out(i) = min
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit simhash folded MSB-first from bit j=0 (see
    * [[TextFns.simhash32]] for the HOF spelling this mirrors). */
  def simhash32(hashes: ArrayData): Long = {
    val m = hashes.numElements()
    val counts = new Array[Long](32)
    var j = 0
    while (j < m) {
      val h = hashes.getLong(j)
      var bit = 0
      while (bit < 32) {
        counts(bit) += ((h >> bit) & 1L) * 2 - 1
        bit += 1
      }
      j += 1
    }
    var acc = 0L
    j = 0
    while (j < 32) {
      acc = acc * 2 + (if (counts(j) >= 0) 1L else 0L)
      j += 1
    }
    acc
  }

  /** Per-document repetition statistics in ONE compiled pass:
    * `[n_tokens, n_distinct_tokens, top_bigram_count, top_trigram_count]`.
    *
    * The Gopher/RefinedWeb repetition filters (duplicate-token and
    * top-n-gram fractions) are per-document aggregates; the relational
    * spelling (explode → two groupBys) shuffles every token of the
    * corpus to compute a statistic that never leaves its document. At
    * 100 TB that shuffle dominates the job, so this stays map-side:
    * one hash map per row, bounded by the document's token count.
    * Semantics match the oracle's unnest + lead() spelling exactly —
    * counts are integers, no ratio is computed here. */
  def repStats(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val arr = new Array[UTF8String](n)
    var i = 0
    while (i < n) { arr(i) = toks.getUTF8String(i); i += 1 }
    val distinct = new java.util.HashSet[UTF8String](Math.max(16, n * 2))
    i = 0
    while (i < n) { distinct.add(arr(i)); i += 1 }
    val sp = UTF8String.fromString(" ")
    var topBi = 0L
    if (n >= 2) {
      val m = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
      i = 0
      while (i < n - 1) {
        val k = UTF8String.concat(arr(i), sp, arr(i + 1))
        val c = m.get(k)
        val nc = if (c == null) 1L else c.longValue() + 1L
        m.put(k, nc)
        if (nc > topBi) topBi = nc
        i += 1
      }
    }
    var topTri = 0L
    if (n >= 3) {
      val m = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
      i = 0
      while (i < n - 2) {
        val k = UTF8String.concat(arr(i), sp, arr(i + 1), sp, arr(i + 2))
        val c = m.get(k)
        val nc = if (c == null) 1L else c.longValue() + 1L
        m.put(k, nc)
        if (nc > topTri) topTri = nc
        i += 1
      }
    }
    new GenericArrayData(
      Array[Any](n.toLong, distinct.size.toLong, topBi, topTri))
  }

  // ---- expression nodes --------------------------------------------

  abstract class ArrayLongUnary extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType)
    override def nullIntolerant: Boolean = true
  }

  case class PolyHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      polyHash(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashExpressions.polyHash($c)")
    override protected def withNewChildInternal(newChild: Expression): PolyHash =
      copy(child = newChild)
  }

  case class ShingleHashes(child: Expression, k: Int) extends ArrayLongUnary {
    override protected def nullSafeEval(input: Any): Any =
      shingleHashes(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashExpressions.shingleHashes($c, $k)")
    override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
      copy(child = newChild)
  }

  case class Shingles(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      shingles(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashExpressions.shingles($c, $k)")
    override protected def withNewChildInternal(newChild: Expression): Shingles =
      copy(child = newChild)
  }

  case class TokenHashes(child: Expression) extends ArrayLongUnary {
    override protected def nullSafeEval(input: Any): Any =
      tokenHashes(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashExpressions.tokenHashes($c)")
    override protected def withNewChildInternal(newChild: Expression): TokenHashes =
      copy(child = newChild)
  }

  case class MinhashSignature(child: Expression, n: Int) extends ArrayLongUnary {
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override protected def nullSafeEval(input: Any): Any =
      minhashSignature(input.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashExpressions.minhashSignature($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
      copy(child = newChild)
  }

  case class RepStats(child: Expression) extends ArrayLongUnary {
    override protected def nullSafeEval(input: Any): Any =
      repStats(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashExpressions.repStats($c)")
    override protected def withNewChildInternal(newChild: Expression): RepStats =
      copy(child = newChild)
  }

  case class Simhash32(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      simhash32(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashExpressions.simhash32($c)")
    override protected def withNewChildInternal(newChild: Expression): Simhash32 =
      copy(child = newChild)
  }

  // ---- registry ----------------------------------------------------

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int, got $other")
  }

  /** Registrations for [[graft.GraftExtensions]]. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (args: Seq[Expression]) => PolyHash(args.head)),
    (FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (args: Seq[Expression]) =>
        ShingleHashes(args.head, intArg(args(1), "graft_shingle_hashes"))),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (args: Seq[Expression]) =>
        Shingles(args.head, intArg(args(1), "graft_shingles"))),
    (FunctionIdentifier("graft_token_hashes"),
      new ExpressionInfo(classOf[TokenHashes].getName, "graft_token_hashes"),
      (args: Seq[Expression]) => TokenHashes(args.head)),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) =>
        MinhashSignature(args.head, intArg(args(1), "graft_minhash"))),
    (FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[Simhash32].getName, "graft_simhash32"),
      (args: Seq[Expression]) => Simhash32(args.head)),
    (FunctionIdentifier("graft_rep_stats"),
      new ExpressionInfo(classOf[RepStats].getName, "graft_rep_stats"),
      (args: Seq[Expression]) => RepStats(args.head)))
}
