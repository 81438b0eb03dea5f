package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for the product-quantization ASYMMETRIC
  * DISTANCE COMPUTATION: `Σ_j lut[j][codes[j]]` over a code row
  * (`array<int>`, one code per subspace) and a per-query lookup table
  * (`array<array<double>>`, partial squared distances to every codeword
  * — m × ksub doubles, built once per (query, probed cell)).
  *
  * Why codegen: the ADC sum is THE per-candidate kernel of the IVF-PQ
  * serve — it runs once per probed CODE ROW, a population that grows
  * ~√n per cell under the √n cell-sizing rule, so at a 100×-class
  * corpus the serve evaluates it millions of times while everything
  * around it stays pruned. As a Scala UDF each call paid Seq boxing +
  * interpreted dispatch; this expression is one tight JVM loop over the
  * unsafe array data, inlined into whole-stage codegen next to the
  * shortlist window it feeds (the same upgrade [[CosineSim]] and
  * [[SqDist]] gave the exact re-rank kernels).
  *
  * The summation order (ascending subspace index from 0.0) reproduces
  * the UDF form bit-for-bit. NULL-propagating on either side, matching
  * the UDF's guard — a NULL never survives the upstream usability
  * filters, and the shortlist windows additionally drop NULL adc rows
  * before ranking.
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<int> codes, array<array<double>> lut), got $l / $r")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(c: Any, l: Any): Any =
    PqAdc.compute(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.functions.PqAdc.compute($c, $l)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {

  /** Static kernel; called from generated code — Java-callable,
    * allocation-free modulo the per-subspace sub-array handle. Fails
    * loudly on a code row whose width differs from the LUT's subspace
    * count (codes and codebooks of different stores can never mix). */
  def compute(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    require(m == lut.numElements(),
      s"code width $m != LUT subspace count ${lut.numElements()}")
    var s = 0.0
    var j = 0
    while (j < m) {
      s += lut.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    s
  }

  /** Column-API form. */
  def pq_adc(codes: Column, lut: Column): Column =
    Shim.toColumn(PqAdc(Shim.toExpression(codes), Shim.toExpression(lut)))

  /** Register for SQL as `pq_adc`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_adc", exprs => PqAdc(exprs(0), exprs(1)), "built-in")
}
