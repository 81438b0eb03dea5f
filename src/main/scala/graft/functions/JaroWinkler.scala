package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen expression — the classic
  * typo-tolerant name-similarity kernel of record-linkage (Winkler 1990,
  * building on Jaro 1989; the same public construction DuckDB ships as
  * `jaro_winkler_similarity`, which is the cross-engine oracle).
  *
  * An Expression rather than a UDF for the usual reason ([[SqDist]]):
  * name scoring runs inside candidate-pair projections — with blocking
  * producing millions of pairs, a UDF there breaks whole-stage codegen
  * and pays an encoder round-trip per pair. `doGenCode` emits one static
  * call; the kernel is two tight char loops with a reusable window
  * bitset, O(|a|·|b|) worst case but O(|a|+|b|) over the match window.
  *
  * Semantics pinned to the canonical (and DuckDB's) definition:
  * match window = max(len)/2 − 1; transpositions halved; Winkler boost
  * `j + ℓ·0.1·(1−j)` with ℓ = common prefix capped at 4, applied only
  * when j > 0.7; any empty input (including both empty) scores 0 —
  * all verified value-for-value against DuckDB in JaroWinklerSpec and
  * by the `j11_jaro_winkler` full-value oracle. Operates on UTF-16 code
  * units (= code points for the fixtures' ASCII; a supplementary-plane
  * string would count surrogate pairs as two units, same as DuckDB's
  * byte-wise variant differs — document, don't hide). */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects two string columns, got " +
        s"(${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static kernel, called from generated code. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true; bMatched(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars compared in order
    var transpositions = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // transpositions HALVE WITH INTEGER FLOOR — an odd ordered-mismatch
    // count (possible with asymmetric alignments, e.g. one unmatched char
    // between two cross-matched ones) floors, matching DuckDB and the
    // common reference implementations; a fractional 1.5 here diverged on
    // the Customer#000000951/Customer#000001051 fixture pair
    val jaro = (m / la + m / lb + (m - transpositions / 2) / m) / 3.0
    // Winkler boost, canonical 0.7 gate (DuckDB applies the same gate)
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(la, lb)) &&
           a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** Column-API form. */
  def jaro_winkler(a: Column, b: Column): Column =
    Shim.toColumn(JaroWinkler(Shim.toExpression(a), Shim.toExpression(b)))
}
