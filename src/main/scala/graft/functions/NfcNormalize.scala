package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the first
  * step of corpus text normalization (composed accents, compatibility
  * variants of the same glyph sequence hash differently, so every dedup /
  * fingerprint operator upstream depends on a canonical form).
  *
  * An Expression rather than a UDF for the usual reason (see [[SqDist]]):
  * normalization runs inside the corpus-scan projection — the widest map
  * stage the engine has — and a UDF there breaks whole-stage codegen and
  * pays an encoder round-trip per document. `doGenCode` emits a static
  * call; the fast path (`Normalizer.isNormalized`, true for effectively
  * all real text, trivially for ASCII) returns the input UTF8String
  * without even materializing a java.lang.String.
  *
  * DuckDB mirror: `nfc_normalize(x)` — the oracle for `tx_normalize`
  * composes it with the same regex pipeline the engine uses.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string column, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static kernel, called from generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-API form. */
  def nfc_normalize(c: Column): Column =
    Shim.toColumn(NfcNormalize(Shim.toExpression(c)))

  /** Register for SQL as `nfc_normalize` (the DuckDB-compatible name). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
}
