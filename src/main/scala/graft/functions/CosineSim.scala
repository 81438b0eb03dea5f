package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity between two
  * `array<double>` embedding columns — the codegen upgrade of the
  * `aggregate(zip_with(...))` higher-order formulation in the ANN layer.
  *
  * Why: Spark evaluates higher-order-function lambdas *interpreted*
  * (µs-per-element), so a d-dimensional cosine via zip_with/aggregate costs
  * ~3d interpreted closure calls per candidate pair — the hottest loop of
  * both ANN re-ranking and embedding near-dup. This kernel is one tight JVM
  * loop over the unsafe array data and inlines into whole-stage codegen.
  *
  * The accumulation order (sequential dot and per-side square sums, then
  * sqrt·sqrt) reproduces the higher-order formulation bit-for-bit, so
  * results are interchangeable with `Ann.cosine`'s closed form.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects two array<double> columns, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    CosineSim.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSim.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Static kernel; called from generated code — Java-callable,
    * allocation-free. Empty vectors yield NaN (0/0), matching the
    * higher-order formulation. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"vector sizes differ: $n vs ${b.numElements()}")
    var dot = 0.0
    var sa = 0.0
    var sb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      sa += x * x
      sb += y * y
      i += 1
    }
    dot / (math.sqrt(sa) * math.sqrt(sb))
  }

  /** Column-API form. */
  def cosine_sim(a: Column, b: Column): Column =
    Shim.toColumn(CosineSim(Shim.toExpression(a), Shim.toExpression(b)))

  /** Register for SQL as `cosine_sim`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "built-in")
}
