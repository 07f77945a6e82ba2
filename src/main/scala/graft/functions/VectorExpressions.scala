package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Codegen'd dense-vector dot product over `array<float>` / `array<double>`
  * columns. The higher-order-function formulation
  * (`aggregate(zip_with(...))`) is evaluated interpreted with per-row array
  * allocations; this expression is a tight primitive loop inside
  * whole-stage codegen — the difference is ~10x on brute-force ANN scans.
  *
  * Element nulls are treated as 0 (embeddings are dense by contract);
  * length mismatch uses the shorter length.
  */
case class VecDotExpr(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _               => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) match {
      case FloatType | DoubleType => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float|double> arguments, got ${left.dataType}, ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val getL = if (elemType(left) == FloatType) s"(double)$a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (elemType(right) == FloatType) s"(double)$b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += $getL * $getR; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** `sign_bands(vec, bandBits, bands)` -> array<long>[bands]: each element
  * packs `bandBits` sign bits of hash-Rademacher projections — projection
  * j of band b uses the +/-1 weight derived from Spark's
  * `hash(dim_index, j)` (Murmur3, seed 42), reproduced EXACTLY so buckets
  * agree bit-for-bit with the HOF formulation
  * ([[VectorFns.signBucket]], spec-enforced). One compiled pass per row
  * computes ALL bandBits×bands projections: the posexplode + k-aggregate
  * formulation this replaces shuffled #rows×dim exploded values per
  * banding — per-row map-side work is the shape that survives 100 TB.
  */
case class SignBandsExpr(child: Expression, bandBits: Int, bands: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
      if bandBits > 0 && bandBits <= 63 && bands > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_bands(vec ARRAY<FLOAT|DOUBLE>, 0 < bandBits <= 63, bands > 0) expected, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    VectorKernels.signBands(input.asInstanceOf[ArrayData], bandBits, bands, elemFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.signBands($c, $bandBits, $bands, $elemFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "sign_bands"
}

object VectorKernels {
  import org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt

  /** All bandBits×bands sign projections in one pass. The weight of
    * (dimension i, projection j) replicates Spark's `hash(i, j)` fold —
    * hashInt(j, hashInt(i, 42)) — and `pmod(h, 2) == 0` is `(h & 1) == 0`;
    * per-projection sums accumulate in ascending dimension order, matching
    * the HOF `aggregate` fold bit-for-bit.
    */
  def signBands(vec: ArrayData, bandBits: Int, bands: Int,
                elemFloat: Boolean): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val nBits = bandBits * bands
    val sums = new Array[Double](nBits)
    val n = vec.numElements()
    var i = 0
    while (i < n) {
      val x = if (elemFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      val hi = hashInt(i, 42)
      var j = 0
      while (j < nBits) {
        if ((hashInt(j, hi) & 1) == 0) sums(j) += x else sums(j) -= x
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var t = 0
      while (t < bandBits) {
        if (sums(b * bandBits + t) >= 0) acc += (1L << t)
        t += 1
      }
      out(b) = acc
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorExpressions {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDotExpr(exprs(0), exprs(1)), "built-in")

  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def signBands(vec: Column, bandBits: Int, bands: Int): Column =
    org.apache.spark.sql.GraftSqlShim.column(
      SignBandsExpr(org.apache.spark.sql.GraftSqlShim.expression(vec), bandBits, bands))
}
