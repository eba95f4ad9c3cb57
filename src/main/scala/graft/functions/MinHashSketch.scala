package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature as a custom `TypedImperativeAggregate` — the
  * sketch-aggregate tier of SURVEY §2.10 (kept "in reserve for the 100 TB
  * extensions"): the buffer holds the per-slice minima of each token's md5
  * digest (8 slices of 4 hex chars), updated in a single pass and merged
  * associatively, so the signature computes map-side with partial
  * aggregation — at scale the shuffle carries 8 short strings per key
  * instead of the token stream.
  *
  * Semantics are pinned to the declarative form used by q_dedup_minhash
  * (`min(substring(md5(w), i*4+1, 4))` per slice) and asserted equal in
  * MinHashSketchSpec.
  */
case class MinHashSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[Array[String]] {

  private val numSlices = 8

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "minhash_sketch"

  @transient private lazy val digest = java.security.MessageDigest.getInstance("MD5")
  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(bytes: Array[Byte]): String = {
    digest.reset()
    val d = digest.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = hexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def createAggregationBuffer(): Array[String] =
    Array.fill(numSlices)(null)

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = md5Hex(v.asInstanceOf[UTF8String].getBytes)
      var i = 0
      while (i < numSlices) {
        val slice = hex.substring(i * 4, i * 4 + 4)
        if (buf(i) == null || slice < buf(i)) buf(i) = slice
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[String], b2: Array[String]): Array[String] = {
    var i = 0
    while (i < numSlices) {
      if (b1(i) == null || (b2(i) != null && b2(i) < b1(i))) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[String]): Any =
    new GenericArrayData(buf.map(s => if (s == null) null else UTF8String.fromString(s)))

  override def serialize(buf: Array[String]): Array[Byte] =
    buf.map(s => if (s == null) "-" else s).mkString("|").getBytes("UTF-8")

  override def deserialize(bytes: Array[Byte]): Array[String] =
    new String(bytes, "UTF-8").split('|').map(s => if (s == "-") null else s)

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object MinHashSketch {
  val identifier: FunctionIdentifier = FunctionIdentifier("minhash_sketch")
  val info: ExpressionInfo = new ExpressionInfo(classOf[MinHashSketch].getName, "minhash_sketch")
  val builder: Seq[Expression] => Expression = exprs => MinHashSketch(exprs.head)

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
