package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `packed_dot16(a, b)` — exact integer dot product of two vectors packed
  * four signed 16-bit lanes per long (round 13, the IVF-PQ rerank
  * exchange fix): lane j of word i holds coordinate 4i+j in bits
  * [16j, 16j+16). The packing exists for the EXCHANGE, not the kernel —
  * the exact-rerank join ships one vector per (query, shortlist-candidate)
  * pair through two shuffles, so at 320k queries × 400 candidates the
  * payload is pairs × 520 bytes per 64-long vector ≈ 70 GB twice; packed
  * it is 4× less. The arithmetic is identical to the unpacked
  * `aggregate(zip_with(a, b, *), 0, +)` formulation whenever every
  * coordinate fits a signed 16-bit lane — the caller guarantees that
  * (normalized quantized unit vectors are bounded ±1000 by construction;
  * see Similarity.pqPrepare) and non-normalized paths keep the unpacked
  * frames. Lanes sign-extend on read, so negative coordinates round-trip
  * exactly. Trailing lanes of a padded final word are zero and contribute
  * nothing. Mismatched word counts dot the common prefix (mirrors
  * zip_with's null-free truncation; packed callers always produce equal
  * lengths).
  */
object PackedDotFunctions {
  /** Static kernel referenced from generated code. */
  def dot16(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val wa = a.getLong(i)
      val wb = b.getLong(i)
      // sign-extend each 16-bit lane via the <<48 >>48 arithmetic shift
      s += ((wa << 48) >> 48) * ((wb << 48) >> 48)
      s += ((wa << 32) >> 48) * ((wb << 32) >> 48)
      s += ((wa << 16) >> 48) * ((wb << 16) >> 48)
      s += (wa >> 48) * (wb >> 48)
      i += 1
    }
    s
  }

  /** Pack a long vector into 16-bit lanes, 4 per word (driver/executor
    * shared helper — also used by the map-side vframe packers). Caller
    * guarantees every value fits a signed 16-bit lane. */
  def pack16(q: Array[Long]): Array[Long] = {
    val out = new Array[Long]((q.length + 3) >> 2)
    var i = 0
    while (i < q.length) {
      out(i >> 2) |= (q(i) & 0xFFFFL) << ((i & 3) << 4)
      i += 1
    }
    out
  }
}

case class PackedDot16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "packed_dot16"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PackedDotFunctions.dot16(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PackedDotFunctions.dot16($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PackedDot16 {
  val identifier: FunctionIdentifier = FunctionIdentifier("packed_dot16")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[PackedDot16].getName, "packed_dot16")
  // builder-coercion pattern shared with SortedIntersectAtLeast
  // (ExpectsInputTypes is private[sql] in Spark 4)
  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) =>
      def arr(e: Expression): Expression = e.dataType match {
        case ArrayType(LongType, _) => e
        case ArrayType(_, _)        => Cast(e, ArrayType(LongType))
        case other => throw new IllegalArgumentException(
          s"packed_dot16 expects array<bigint>, got ${other.simpleString}")
      }
      PackedDot16(arr(a), arr(b))
    case other => throw new IllegalArgumentException(
      s"packed_dot16 expects 2 arguments, got ${other.size}")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
