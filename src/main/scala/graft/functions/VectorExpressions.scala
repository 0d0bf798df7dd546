package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity-search operators.
  *
  * `vec_dot` replaces the `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * higher-order-function formulation: HOFs are interpreted (no codegen)
  * and allocate an intermediate array per row — at 2M candidate pairs
  * that allocation dominated the whole benchmark. This expression
  * accumulates left-to-right in double precision, exactly the HOF's
  * (and DuckDB list_reduce's) float semantics, so results are
  * bit-identical; it participates in whole-stage codegen via doGenCode.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** plane_band_keys(embedding) → array<long> of LSH band keys: plane i's
  * sign bit (dot(weights(i), v) > 0) lands in band i/bitsPerBand at
  * position i%bitsPerBand. One pass over the vector per plane — no
  * per-plane HOF chains (interpreted + recomputed per reference), no
  * explode of the embedding. Weights are driver-side constants. */
case class PlaneBandKeys(child: Expression, weights: Seq[Seq[Double]], bitsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(weights.nonEmpty && weights.length % bitsPerBand == 0)
  @transient private lazy val w: Array[Array[Double]] = weights.map(_.toArray).toArray
  private val nBands = weights.length / bitsPerBand

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val keys = new Array[Long](nBands)
    if (v != null) {
      val x = v.asInstanceOf[ArrayData]
      val n = x.numElements()
      var i = 0
      while (i < w.length) {
        val wi = w(i)
        val m = math.min(n, wi.length)
        var acc = 0.0
        var j = 0
        while (j < m) { acc += x.getFloat(j).toDouble * wi(j); j += 1 }
        if (acc > 0) keys(i / bitsPerBand) |= (1L << (i % bitsPerBand))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  import org.apache.spark.sql.graft.Bridge.{column => toCol, expression => toExpr}
  import org.apache.spark.sql.functions.sqrt

  def vec_dot(a: Column, b: Column): Column = toCol(VecDot(toExpr(a), toExpr(b)))
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))
  def plane_band_keys(v: Column, weights: Seq[Seq[Double]], bitsPerBand: Int): Column =
    toCol(PlaneBandKeys(toExpr(v), weights, bitsPerBand))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", e => VecDot(e(0), e(1)), "built-in")
}
