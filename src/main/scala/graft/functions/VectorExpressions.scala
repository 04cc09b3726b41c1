package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native dot product over embedding arrays — the hot scalar loop of
  * every similarity-search operator (brute/LSH/IVF top-k, embedding
  * near-dup, k-means distances run it per candidate pair).
  *
  * The HOF spelling `aggregate(zip_with(a, b, _*_), 0d, _+_)` is
  * interpreted per element (HOFs are CodegenFallback), so a 64-dim
  * pair costs ~200 boxed expression-tree walks; this expression is one
  * compiled loop. The fold order and per-element arithmetic
  * (float→double exact widening, sequential sum from index 0) are
  * bit-identical to the HOF spelling AND to the DuckDB oracle
  * (`list_sum(list_transform(...))` folds the same way), so scores
  * hash-match either way — asserted by HashSpec.
  *
  * Elements must be non-null (true of embeddings and hyperplanes);
  * float×float, float×double and double×double arrays are accepted.
  */
object VectorExpressions {

  /** Sequential dot; aD/bD select the element accessor (codegen passes
    * them as constants, so the branches are loop-invariant). Arrays of
    * different lengths raise — the zip_with HOF spelling returns NULL
    * there, and silently truncating would hide a real schema bug in a
    * registered SQL function (ADVICE r3). */
  def dot(a: ArrayData, aD: Boolean, b: ArrayData, bD: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_dot: array length mismatch (${n} vs ${b.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aD) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bD) b.getDouble(i) else b.getFloat(i).toDouble
      s += x * y
      i += 1
    }
    s
  }

  case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
    private def isD(e: Expression): Boolean =
      e.dataType.asInstanceOf[ArrayType].elementType == DoubleType
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects array<float|double>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }
    override protected def nullSafeEval(a: Any, b: Any): Any =
      dot(a.asInstanceOf[ArrayData], isD(left),
        b.asInstanceOf[ArrayData], isD(right))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.VectorExpressions.dot($a, ${isD(left)}, $b, ${isD(right)})")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** Sequential squared L2 over two long arrays (the micro-quantized
    * embeddings of the k-means legs). Pure long arithmetic, so the
    * result is bit-identical to the `aggregate(zip_with(...))` HOF
    * spelling and to DuckDB's `list_sum(list_transform(...))` — but
    * one compiled loop instead of ~200 interpreted expression-tree
    * walks per 64-dim pair. The k-means assignment evaluates this
    * n×K times per Lloyd iteration, which made it the dominant cost
    * of q106/q116 at sf1 once K became corpus-derived. */
  def l2q(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_l2q: array length mismatch (${n} vs ${b.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  case class L2Quantized(left: Expression, right: Expression)
    extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_l2q expects array<bigint>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }
    override protected def nullSafeEval(a: Any, b: Any): Any =
      l2q(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.VectorExpressions.l2q($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): L2Quantized =
      copy(left = newLeft, right = newRight)
  }

  val name = "graft_dot"
  val l2Name = "graft_l2q"

  /** Column wrapper resolving through the registered function. */
  def dot(a: Column, b: Column): Column = call_function(name, a, b)

  /** Column wrapper for the quantized squared-L2 distance. */
  def l2q(a: Column, b: Column): Column = call_function(l2Name, a, b)

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[DotProduct].getName, name),
      (args: Seq[Expression]) => {
        // raised during analysis (the builder runs at resolution), so a
        // bad SQL call fails with a real message, not an
        // IndexOutOfBounds from args(1) (ADVICE r3)
        require(args.length == 2,
          s"$name expects exactly 2 arguments, got ${args.length}")
        DotProduct(args.head, args(1))
      }),
    (FunctionIdentifier(l2Name),
      new ExpressionInfo(classOf[L2Quantized].getName, l2Name),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"$l2Name expects exactly 2 arguments, got ${args.length}")
        L2Quantized(args.head, args(1))
      }))
}
