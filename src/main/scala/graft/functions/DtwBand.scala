package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `dtw_band(a, b)` — Sakoe–Chiba banded dynamic time warping distance
  * (radius 3) between two integer series, as one codegen'd kernel call
  * per pair. Pure integer (max, +) DP over a (|a|+1)×(|b|+1) table with
  * cells outside the |i−j| ≤ 3 band held at the INF sentinel — no float
  * anywhere, so the distance is bit-identical across engines and
  * partitionings. Callers must pre-filter ||a|−|b|| ≤ 3 (the band
  * otherwise cannot connect the corners); the kernel returns INF for
  * such pairs rather than guessing.
  *
  * This is the pairwise kernel of a blocked similarity join over
  * time-series — like [[JaroWinklerMicros]], it prices a CANDIDATE;
  * candidate generation must come from blocking/pairing upstream.
  */
object DtwBandFunctions {
  val Radius = 3
  val Inf = 1000000000000000L

  def dtwBand(aa: ArrayData, bb: ArrayData): Long = {
    val n = aa.numElements()
    val m = bb.numElements()
    if (n == 0 || m == 0) return Inf
    val a = aa.toLongArray()
    val b = bb.toLongArray()
    // rows 0..n over columns 0..m, rolling two rows
    var prev = new Array[Long](m + 1)
    var cur = new Array[Long](m + 1)
    java.util.Arrays.fill(prev, Inf)
    prev(0) = 0L
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, Inf)
      val lo = math.max(1, i - Radius)
      val hi = math.min(m, i + Radius)
      var j = lo
      while (j <= hi) {
        val c = math.abs(a(i - 1) - b(j - 1))
        val dp = math.min(prev(j - 1), math.min(prev(j), cur(j - 1)))
        cur(j) = if (dp >= Inf) Inf else c + dp
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}

case class DtwBand(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dtw_band"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DtwBandFunctions.dtwBand(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DtwBandFunctions.dtwBand($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DtwBand {
  val identifier: FunctionIdentifier = FunctionIdentifier("dtw_band")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[DtwBand].getName, "dtw_band")
  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) =>
      def arr(e: Expression): Expression = e.dataType match {
        case ArrayType(LongType, _) => e
        case ArrayType(_, _)        => Cast(e, ArrayType(LongType))
        case other => throw new IllegalArgumentException(
          s"dtw_band expects array<bigint>, got ${other.simpleString}")
      }
      DtwBand(arr(a), arr(b))
    case other => throw new IllegalArgumentException(
      s"dtw_band expects 2 arguments, got ${other.size}")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
