package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `jaro_winkler_micros(a, b)` — Jaro–Winkler similarity (Winkler 1990)
  * in EXACT integer micros, as one codegen'd kernel call per pair.
  *
  * Everything after the match/transposition scan is exact rational
  * arithmetic — jaro = [m²(|a|+|b|) + (m−t)|a||b|] / (3|a||b|m), the
  * Winkler boost (prefix ℓ ≤ 4, weight 0.1, applied iff jaro > 0.7 — the
  * strict RapidFuzz/DuckDB convention, checked against DuckDB's builtin
  * empirically: boost threshold, prefix cap, and empty→0 all agree) folds
  * in as (10·num + ℓ·(den−num)) / (10·den), and the result is
  * round-half-up micros ⌊(2·10⁶·N + D) / 2D⌋ of the TRUE rational — no
  * doubles anywhere, so the value is independent of evaluation order and
  * platform libm. Long math covers |a||b|m ≤ 3·10⁸ (strings to ~450
  * chars); beyond that a BigInt branch keeps exactness instead of
  * overflowing. Matching is UTF-16-char-level (= codepoint-level on the
  * BMP; the corpus contract is ASCII part/name strings).
  *
  * The expression is the pairwise kernel of a blocked fuzzy join
  * (q_jw_join): the join's candidate generation must come from blocking
  * keys — this function prices a CANDIDATE, never the cross product.
  */
object JaroWinklerFunctions {

  /** Exact Jaro–Winkler similarity in micros (0..1_000_000). Hot path:
    * both strings ASCII and ≤ 64 chars (every part/name corpus) runs
    * allocation-free on the UTF8String bytes with long-bitmask match
    * flags; anything else takes the general char-level path. Both paths
    * compute the identical function.
    */
  def jwMicros(ua: UTF8String, ub: UTF8String): Long = {
    val n1 = ua.numBytes
    val n2 = ub.numBytes
    if (n1 == 0 || n2 == 0) return 0L
    if (n1 <= 64 && n2 <= 64 && ua.numChars == n1 && ub.numChars == n2) {
      // ASCII ≤64: bytes are chars, matched flags fit two longs
      val win = math.max(math.max(n1, n2) / 2 - 1, 0)
      var maskA = 0L
      var maskB = 0L
      var m = 0
      var i = 0
      while (i < n1) {
        val ci = ua.getByte(i)
        val hi = math.min(n2 - 1, i + win)
        var j = math.max(0, i - win)
        var searching = true
        while (j <= hi && searching) {
          if (((maskB >>> j) & 1L) == 0L && ci == ub.getByte(j)) {
            maskA |= 1L << i; maskB |= 1L << j; m += 1; searching = false
          }
          j += 1
        }
        i += 1
      }
      if (m == 0) return 0L
      var k = 0
      var trans = 0
      i = 0
      while (i < n1) {
        if (((maskA >>> i) & 1L) != 0L) {
          while (((maskB >>> k) & 1L) == 0L) k += 1
          if (ua.getByte(i) != ub.getByte(k)) trans += 1
          k += 1
        }
        i += 1
      }
      var ell = 0
      while (ell < 4 && ell < n1 && ell < n2 && ua.getByte(ell) == ub.getByte(ell))
        ell += 1
      finish(m, trans / 2, n1, n2, ell)
    } else jwMicrosGeneral(ua.toString, ub.toString)
  }

  private def jwMicrosGeneral(a: String, b: String): Long = {
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0L
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val ma = new Array[Boolean](l1)
    val mb = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + win)
      var j = math.max(0, i - win)
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    var k = 0
    var trans = 0
    i = 0
    while (i < l1) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    var ell = 0
    while (ell < 4 && ell < l1 && ell < l2 && a.charAt(ell) == b.charAt(ell))
      ell += 1
    finish(m, trans / 2, l1, l2, ell)
  }

  private def finish(m: Int, t: Int, l1: Int, l2: Int, ell: Int): Long = {
    val num = m.toLong * m * (l1 + l2) + (m.toLong - t) * l1 * l2
    val den = 3L * l1 * l2 * m
    val boost = ell > 0 && 10L * num > 7L * den
    val nN = if (boost) 10L * num + ell * (den - num) else num
    val nD = if (boost) 10L * den else den
    // round-half-up micros of nN/nD, exactly
    if (nN <= (Long.MaxValue - nD) / 2000000L)
      (2000000L * nN + nD) / (2L * nD)
    else
      ((BigInt(nN) * 2000000 + nD) / (BigInt(nD) * 2)).toLong
  }
}

case class JaroWinklerMicros(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "jaro_winkler_micros"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerFunctions.jwMicros(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerFunctions.jwMicros($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerMicros {
  val identifier: FunctionIdentifier = FunctionIdentifier("jaro_winkler_micros")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[JaroWinklerMicros].getName, "jaro_winkler_micros")
  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) =>
      def str(e: Expression): Expression =
        if (e.dataType == StringType) e else Cast(e, StringType)
      JaroWinklerMicros(str(a), str(b))
    case other => throw new IllegalArgumentException(
      s"jaro_winkler_micros expects 2 arguments, got ${other.size}")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
