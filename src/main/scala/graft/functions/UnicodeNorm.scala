package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper called from both interpreted eval and generated code.
  * A top-level object with no companion class gets a Java static forwarder,
  * so Janino-generated code can call `graft.functions.UnicodeNorm.norm(...)`
  * directly.
  */
object UnicodeNorm {
  /** Fast path: `isNormalized` is a cheap scan that avoids the
    * String-allocation round trip for text that is already in the target
    * form (virtually all real text is already NFC).
    */
  def norm(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

/** Native Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd Catalyst
  * expression — Spark ships no normalizer function, yet a crawl corpus mixes
  * precomposed and decomposed forms of the same text, which breaks exact
  * dedup fingerprints (`md5("café")` differs between the one-codepoint and
  * the combining-accent spelling) and token statistics. Normalizing is the
  * first step of any large-scale text pipeline.
  *
  * The JDK's `java.text.Normalizer` does the actual transform; the
  * expression stays inside whole-stage codegen (single static call, no UDF
  * serialization, null-safety handled by the framework) and short-circuits
  * on already-normalized text.
  */
case class NormalizeUnicode(child: Expression, formName: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!NormalizeUnicode.Forms.contains(formName))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${NormalizeUnicode.Forms.mkString(", ")}, got $formName")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_norm"

  @transient private lazy val form = Normalizer.Form.valueOf(formName)

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.norm(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNorm.norm($c, java.text.Normalizer.Form.$formName)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicode =
    copy(child = newChild)
}

object NormalizeUnicode {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}
