package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native max token multiplicity: the count of the most frequent element
  * of a string array — the Gopher top-word gate's aggregate, computed
  * per row in one hash pass instead of the
  * explode → groupBy(doc_id, w) → groupBy(doc_id) max formulation that
  * shuffled the exploded token stream twice and re-attached the result
  * through an equi-join carrying the document payload (r20, guide §2.4:
  * the decision needs only this row's array, so no exchange is
  * fundamentally required).
  *
  * Exact parity with the former shape: elements compare by exact string
  * equality (UTF8String), a null element counts as its own group
  * (explode emitted it as a row), and `tokens()` never yields an empty
  * array (split returns [""] at minimum) — an empty array returns 0,
  * where the former inner join dropped the row; no declared query can
  * reach that case (TopTokenCountSpec pins all of this).
  */
case class TopTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "top_token_count"

  def evalArr(a: ArrayData): Long = {
    val n = a.numElements()
    val counts =
      new java.util.HashMap[UTF8String, java.lang.Long](math.max(16, n * 2))
    var best = 0L
    var nulls = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) {
        nulls += 1L
        if (nulls > best) best = nulls
      } else {
        val w = a.getUTF8String(i)
        val prev = counts.get(w)
        val c = if (prev == null) 1L else prev.longValue() + 1L
        counts.put(w, java.lang.Long.valueOf(c))
        if (c > best) best = c
      }
      i += 1
    }
    best
  }

  override def nullSafeEval(a: Any): Any = evalArr(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topTokenCount", this,
      classOf[TopTokenCount].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalArr($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TopTokenCount =
    copy(child = newChild)
}
