package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String
import graft.core.Gram

/** Native gram-extraction expression (reference `grams`/`addGrams`
  * fulltext.go:210-238 via [[graft.core.Gram.gramsSorted]]): sorted trigram
  * codes of a string — whole-word mode (space-wrapped, boundary grams) or
  * partial mode (interior trigrams only). Codegen'd so relational pipelines
  * (dedup, coverage analytics, SQL users) extract grams without a UDF.
  */
case class GramsOf(child: Expression, partial: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_grams"

  override protected def nullSafeEval(input: Any): Any =
    GramsOf.eval(input.asInstanceOf[UTF8String], partial)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramsOf.eval($c, $partial)")

  override protected def withNewChildInternal(newChild: Expression): GramsOf =
    copy(child = newChild)
}

object GramsOf {
  /** Shared by interpreted eval and generated code. */
  def eval(text: UTF8String, partial: Boolean): ArrayData =
    ArrayData.toArrayData(Gram.gramsSorted(partial, Seq(text.toString)))

  def apply(text: Column, partial: Boolean): Column =
    GraftBridge.column(GramsOf(GraftBridge.expression(text), partial))
}
