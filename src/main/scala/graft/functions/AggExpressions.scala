package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ArrayMax, AttributeReference, Coalesce, CreateArray, Expression, ExpressionInfo, GetArrayItem, If, IsNotNull, IsNull, Least, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Native MERGEABLE aggregates, registered through
  * [[graft.GraftExtensions]] next to the scalar expressions.
  *
  * [[MinhashMergeAgg]] is the aggregate half of the MinHash algebra:
  * a scalar `graft_minhash` signature is the element-wise min of the
  * permuted shingle hashes of ONE document; the signature of a UNION
  * of documents is the element-wise min of their signatures. That
  * union-by-min is exactly an aggregate monoid (commutative,
  * associative, identity = all-MaxValue), so it is expressed as a
  * `DeclarativeAggregate` over `n` primitive long buffer slots — no
  * object buffer, no sort, map-side combinable, codegen-friendly —
  * the same execution class as built-in `max`. The relational
  * spelling (explode the signature, groupBy component, min) shuffles
  * n rows per input row; this shuffles one n-slot buffer per group.
  */
object AggExpressions {

  /** Element-wise min of `n`-component long-array signatures.
    * Null inputs are skipped; null components (empty shingle sets)
    * act as the identity. A group that contributed NO signature
    * component — every input NULL, an empty array, or an array of
    * all-null components — evaluates to NULL, matching the
    * relational explode/min spelling (explode of such inputs yields
    * no non-null rows, so the group is absent / all-NULL there). The
    * `seen` buffer slot therefore flips only when an input carries at
    * least one non-null component (`IsNotNull(ArrayMax(child))`,
    * which is null-safe for NULL/empty/all-null arrays alike), so
    * callers can distinguish "no signature data" from a real
    * signature that happens to equal the identity. */
  case class MinhashMergeAgg(child: Expression, n: Int)
      extends DeclarativeAggregate with UnaryLike[Expression] {

    // surface a clear analysis error for a non-array<bigint> child
    // instead of a confusing GetArrayItem/Least resolution failure
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"graft_minhash_agg expects array<bigint>, got ${other.catalogString}")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_minhash_agg"

    private lazy val slots: Seq[AttributeReference] =
      (0 until n).map(i =>
        AttributeReference(s"mh$i", LongType, nullable = false)())

    // true once any input row carrying a non-null component reached
    // the buffer: identity-only groups (all inputs NULL, empty, or
    // all-null-component) evaluate to NULL instead of [MaxValue × n]
    private lazy val seen: AttributeReference =
      AttributeReference("mhSeen", BooleanType, nullable = false)()

    override lazy val aggBufferAttributes: Seq[AttributeReference] =
      slots :+ seen

    override lazy val initialValues: Seq[Expression] =
      Seq.fill(n)(Literal(Long.MaxValue)) :+ Literal(false)

    override lazy val updateExpressions: Seq[Expression] =
      slots.zipWithIndex.map { case (b, i) =>
        // failOnError = false: an input shorter than n (incl. the
        // empty array) reads as NULL → identity, instead of throwing
        // INVALID_ARRAY_INDEX under ANSI mode
        If(IsNull(child), b,
          Least(Seq(b, Coalesce(Seq(
            GetArrayItem(child, Literal(i), failOnError = false),
            Literal(Long.MaxValue))))))
      } :+ Or(seen, IsNotNull(ArrayMax(child)))

    override lazy val mergeExpressions: Seq[Expression] =
      slots.map(b => Least(Seq(b.left, b.right))) :+
        Or(seen.left, seen.right)

    override lazy val evaluateExpression: Expression =
      If(seen, CreateArray(slots), Literal.create(null, dataType))

    override protected def withNewChildInternal(newChild: Expression): MinhashMergeAgg =
      copy(child = newChild)
  }

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int, got $other")
  }

  /** Registrations for [[graft.GraftExtensions]]. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_minhash_agg"),
      new ExpressionInfo(classOf[MinhashMergeAgg].getName, "graft_minhash_agg"),
      (es: Seq[Expression]) => {
        // arity checked here so a wrong call surfaces as an analysis
        // error, not an IndexOutOfBoundsException from the builder
        if (es.length != 2) throw new IllegalArgumentException(
          s"graft_minhash_agg(sig, n) expects 2 arguments, got ${es.length}")
        MinhashMergeAgg(es.head, intArg(es(1), "graft_minhash_agg"))
      }))
}
