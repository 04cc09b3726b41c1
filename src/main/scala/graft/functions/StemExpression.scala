package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Porter stemming — the codegen
  * upgrade over the Scala UDF that SURVEY §2.11 flags as the one
  * scalar worth a custom `Expression`: a UDF forces
  * catalyst-value → Scala-String encoder conversion and a closure
  * call per row and breaks the WholeStageCodegen span; this expression
  * stays inside generated code (one static JVM call on the already-
  * decoded UTF8String) so surrounding projections/filters fuse into
  * one codegen stage.
  */
case class StemExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    StemExpression.stemUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StemExpression.stemUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): StemExpression =
    copy(child = newChild)
}

object StemExpression {
  /** Static entry the generated code calls; keeps the UTF8String →
    * String round-trip as the only per-row allocation. */
  def stemUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(PorterStemmer.stem(s.toString))

  val name = "graft_stem"

  /** Registration triple for `SparkSessionExtensions.injectFunction`. */
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(classOf[StemExpression].getName, name),
    (args: Seq[Expression]) => StemExpression(args.head))

  /** Column wrapper: `stem(col("token"))` — resolves through the
    * session's function registry (see [[graft.GraftExtensions]]). */
  def stem(c: Column): Column = call_function(name, c)
}
