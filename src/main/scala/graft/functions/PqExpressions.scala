package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI'11 — public method, re-derived for
  * Spark):
  *
  *  - [[PqEncodeExpr]]: vector -> m byte codes (argmin sub-centroid per
  *    subspace) — compresses a d-dim float vector ~4d bytes to m bytes.
  *  - [[PqAdcExpr]]: codes -> approximate squared L2 distance to a query,
  *    via a per-query m x k lookup table (asymmetric distance computation).
  *
  * Both carry their trained constants (codebook / distance table) as
  * constructor state referenced from generated code (`addReferenceObj`) —
  * they are per-row tight loops inside whole-stage codegen, no HOFs, no
  * shuffles. The codebook rides the serialized expression to executors
  * (metadata-sized: m*k*dsub doubles).
  */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_encode expects array<float|double>, got $t")
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(PqKernel.encode(
      input.asInstanceOf[ArrayData], codebooks, elemFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PqKernel.encode($v, $cb, $elemFloat));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** Approximate squared-L2 distance of PQ codes to the query that produced
  * `table` (m x k: table[j][c] = |q_j - codebook[j][c]|^2).
  */
case class PqAdcExpr(child: Expression, table: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_adc expects array<byte> codes, got $t")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    PqKernel.adc(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("pqAdcTable", table, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqKernel.adc($v, $tbl);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_adc"
}

/** `mat_vec(vec)` with a constant row-major matrix — the OPQ rotation
  * x' = R x applied per row inside whole-stage codegen (same
  * addReferenceObj pattern as the codebook kernels). Output array<double>.
  */
case class MatVecExpr(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"mat_vec expects array<float|double>, got $t")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(PqKernel.matVec(
      input.asInstanceOf[ArrayData], matrix, elemFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mref = ctx.addReferenceObj("matVecMatrix", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PqKernel.matVec($v, $mref, $elemFloat));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "mat_vec"
}

object PqKernel {

  /** out[i] = Σ_j matrix[i][j] · v[j] — dense row-major mat-vec. */
  def matVec(v: ArrayData, matrix: Array[Array[Double]],
             floatElems: Boolean): Array[Double] = {
    val d = matrix.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      val row = matrix(i)
      var s = 0.0
      var j = 0
      while (j < row.length) {
        s += row(j) * (if (floatElems) v.getFloat(j).toDouble else v.getDouble(j))
        j += 1
      }
      out(i) = s
      i += 1
    }
    out
  }

  /** argmin sub-centroid per subspace; returns m codes (k <= 256). */
  def encode(v: ArrayData, codebooks: Array[Array[Array[Double]]],
             floatElems: Boolean): Array[Byte] = {
    val m = codebooks.length
    val out = new Array[Byte](m)
    var j = 0
    var off = 0
    while (j < m) {
      val cb = codebooks(j)
      val dsub = cb(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val x = (if (floatElems) v.getFloat(off + i).toDouble else v.getDouble(off + i)) - cent(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      off += dsub
      j += 1
    }
    out
  }

  def adc(codes: ArrayData, table: Array[Array[Double]]): Double = {
    val m = math.min(codes.numElements(), table.length)
    var s = 0.0
    var j = 0
    while (j < m) {
      s += table(j)(codes.getByte(j) & 0xFF)
      j += 1
    }
    s
  }
}

object PqColumns {
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlShim.column(PqEncodeExpr(GraftSqlShim.expression(vec), codebooks))
  def pqAdc(codes: Column, table: Array[Array[Double]]): Column =
    GraftSqlShim.column(PqAdcExpr(GraftSqlShim.expression(codes), table))
  def matVec(vec: Column, matrix: Array[Array[Double]]): Column =
    GraftSqlShim.column(MatVecExpr(GraftSqlShim.expression(vec), matrix))
}
