package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a token array as a native codegen'd Expression:
  * the 8 per-slice md5 minima (4 hex chars each — same definition as
  * `min(substring(md5(w), i*4+1, 4))` and as the [[MinHashSketch]]
  * aggregate) computed in one static call per document, entirely
  * map-side. Use this form when tokens are already an array column on the
  * row (the document-dedup path — no explode, no shuffle); keep the
  * [[MinHashSketch]] TypedImperativeAggregate for token-STREAM inputs
  * where tokens arrive as rows and partial aggregation is the point.
  */
object MinHashSigFunctions {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  def minHashSig(words: ArrayData): ArrayData = {
    val md = digests.get()
    val minima = new Array[String](8)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        md.reset()
        val d = md.digest(words.getUTF8String(i).getBytes)
        val hex = new Array[Char](32)
        var k = 0
        while (k < 16) {
          hex(k * 2) = hexChars((d(k) >> 4) & 0xf)
          hex(k * 2 + 1) = hexChars(d(k) & 0xf)
          k += 1
        }
        var s = 0
        while (s < 8) {
          val slice = new String(hex, s * 4, 4)
          if (minima(s) == null || slice < minima(s)) minima(s) = slice
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(minima.map(m => if (m == null) null else UTF8String.fromString(m)))
  }
}

case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigFunctions.minHashSig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSigFunctions.minHashSig($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  val identifier: FunctionIdentifier = FunctionIdentifier("minhash_sig")
  val info: ExpressionInfo = new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig")
  // arity/type checked at resolution time (ExpectsInputTypes' AbstractDataType
  // is private[sql] in Spark 4, so coercion happens in the builder — the same
  // pattern as GreatCircleDistance.builder); non-string arrays are cast so
  // minhash_sig(array(1,2)) hashes the rendered elements instead of failing
  // in getUTF8String at execution.
  val builder: Seq[Expression] => Expression = {
    case Seq(e) => e.dataType match {
      case ArrayType(StringType, _) => MinHashSig(e)
      case ArrayType(_, _)          => MinHashSig(Cast(e, ArrayType(StringType)))
      case other => throw new IllegalArgumentException(
        s"minhash_sig expects array<string>, got ${other.simpleString}")
    }
    case other => throw new IllegalArgumentException(
      s"minhash_sig expects 1 argument, got ${other.size}")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
