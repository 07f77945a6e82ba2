package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sparse dot product of two SORTED posting lists
  * (`array<struct<t: string, c: long>>`, ordered by token) — the
  * verification kernel of the AllPairs token-cosine path
  * ([[graft.operators.Similarity.tokenCosinePairsPrefix]]).
  *
  * A two-pointer merge: O(|A| + |B|) with binary UTF8 comparisons,
  * matching `sort_array`'s ordering. The HOF formulation
  * (`aggregate(map_entries(ma), ...)` + `try_element_at`) is interpreted
  * AND does a linear map lookup per entry — O(|A|·|B|) per pair off
  * codegen; this expression runs inside whole-stage codegen via the same
  * static-kernel pattern as the PQ/sketch kernels.
  */
case class TokenDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(StructType(Array(a, b)), _) =>
      a.dataType == StringType && b.dataType == LongType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_dot expects two array<struct<string,long>>, got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    TokenDotKernel.sortedDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TokenDotKernel.sortedDot($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "token_dot"
}

object TokenDotKernel {
  /** Two-pointer merge over token-sorted posting arrays. */
  def sortedDot(a: ArrayData, b: ArrayData): Double = {
    var i = 0; var j = 0; var s = 0.0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val ra = a.getStruct(i, 2); val rb = b.getStruct(j, 2)
      val cmp = ra.getUTF8String(0).compareTo(rb.getUTF8String(0))
      if (cmp == 0) {
        s += ra.getLong(1).toDouble * rb.getLong(1).toDouble
        i += 1; j += 1
      } else if (cmp < 0) i += 1
      else j += 1
    }
    s
  }
}

object TokenDotColumns {
  def tokenDot(a: Column, b: Column): Column =
    GraftSqlShim.column(TokenDotExpr(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}
