package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL registration of the engine's native expressions, the
  * SparkSessionExtensions way:
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions   (config time), or
  *   GraftFunctions.register(spark)                         (live session)
  *
  * Functions:
  *   verify_match(chunk, array('a','b')[, partial]) -> INT  match offset/-1
  *   graft_grams(text[, partial])                   -> ARRAY<INT> gram codes
  *
  * The args/partial arguments must be foldable (query constants) — they are
  * captured once per plan, which is what makes [[VerifyMatch]] faster than a
  * UDF in the first place.
  */
object GraftFunctions {

  private def foldedString(e: Expression, fn: String): String = {
    require(e.foldable, s"$fn: argument must be a constant")
    e.eval() match {
      case s: UTF8String => s.toString
      case other => other.toString
    }
  }

  private def foldedBool(e: Expression, fn: String): Boolean = {
    require(e.foldable && e.dataType == BooleanType,
      s"$fn: partial flag must be a constant boolean")
    e.eval().asInstanceOf[Boolean]
  }

  private def foldedStringArray(e: Expression, fn: String): Seq[String] = {
    require(e.foldable, s"$fn: args array must be a constant")
    e.dataType match {
      case ArrayType(StringType, _) =>
        val ad = e.eval().asInstanceOf[ArrayData]
        (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
      case StringType => Seq(foldedString(e, fn))
      case other => throw new IllegalArgumentException(
        s"$fn: expected ARRAY<STRING> args, got $other")
    }
  }

  private val verifyBuilder: Seq[Expression] => Expression = {
    case Seq(chunk, args) =>
      VerifyMatch(chunk, foldedStringArray(args, "verify_match"), partial = false)
    case Seq(chunk, args, partial) =>
      VerifyMatch(chunk, foldedStringArray(args, "verify_match"),
        foldedBool(partial, "verify_match"))
    case other => throw new IllegalArgumentException(
      s"verify_match expects (chunk, args[, partial]), got ${other.size} args")
  }

  private val gramsBuilder: Seq[Expression] => Expression = {
    case Seq(text) => GramsOf(text, partial = false)
    case Seq(text, partial) => GramsOf(text, foldedBool(partial, "graft_grams"))
    case other => throw new IllegalArgumentException(
      s"graft_grams expects (text[, partial]), got ${other.size} args")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftFunctions.type].getCanonicalName, null,
      name, usage, "", "", "", "", "", "", "built-in")

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("verify_match"),
      info("verify_match",
        "verify_match(chunk, array('a','b')[, partial]) - offset of first whole-word match of ALL args, or -1"),
      verifyBuilder),
    (FunctionIdentifier("graft_grams"),
      info("graft_grams",
        "graft_grams(text[, partial]) - sorted trigram codes (whole-word or partial mode)"),
      gramsBuilder))

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, fi, b) => GraftBridge.registerFunction(spark, id, fi, b) }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (id, fi, b) => ext.injectFunction((id, fi, b)) }
}
