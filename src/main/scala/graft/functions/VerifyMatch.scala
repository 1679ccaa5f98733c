package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String
import graft.core.Tokenizer

/** Codegen'd whole-word verifier (reference hasArg fts-lmdb.go:1299-1311,
  * per-chunk verify loop 1282-1291): `verify(chunk)` = byte offset of the
  * first match when EVERY arg whole-word-occurs in the chunk, else -1.
  *
  * This is the search hot path's only non-relational predicate; as a native
  * [[UnaryExpression]] it stays inside whole-stage codegen and — unlike the
  * Scala-UDF form — does not convert the (constant) args array from Catalyst
  * `ArrayData` to `Seq[String]` per input row: the query's args are captured
  * once as a codegen reference object.
  */
case class VerifyMatch(child: Expression, args: Seq[String], partial: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "verify_match"

  @transient private lazy val argsArr: Array[String] = args.toArray

  override protected def nullSafeEval(input: Any): Any =
    VerifyMatch.verify(input.asInstanceOf[UTF8String].toString, argsArr, partial)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the query's args are constant per plan: one reference object, zero
    // per-row conversion
    val ref = ctx.addReferenceObj("verifyArgs", args.toArray, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VerifyMatch.verify($c.toString(), $ref, $partial)")
  }

  override protected def withNewChildInternal(newChild: Expression): VerifyMatch =
    copy(child = newChild)
}

object VerifyMatch {
  /** Static entry point shared by interpreted eval and generated code. */
  def verify(chunk: String, args: Array[String], partial: Boolean): Int = {
    var first = -1
    var i = 0
    while (i < args.length) {
      val off = Tokenizer.firstWordBoundaryMatch(chunk, args(i), partial)
      if (off == -1) return -1
      if (first == -1) first = off
      i += 1
    }
    first
  }

  /** Column API: `verifyMatch($"chunk_text", Seq("word","one"), partial)`. */
  def apply(chunk: Column, args: Seq[String], partial: Boolean): Column =
    GraftBridge.column(
      VerifyMatch(GraftBridge.expression(chunk), args, partial))
}
