package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, GenericInternalRow, Literal}
import org.apache.spark.sql.types._

/** Bounded k-smallest-distinct-hash buffer: the KMV ("k minimum values")
  * distinct-count sketch state. Values are kept sorted ascending in a fixed
  * k-slot array — O(log k) membership probe + O(k) insert, O(k) merge, and
  * a fixed 4+8k-byte serialized form regardless of input cardinality. That
  * bounded, mergeable state is the whole point at 100 TB: a distinct count
  * over billions of keys shuffles k longs per group instead of the key set.
  */
final class KmvBuffer(val k: Int) {
  val vals = new Array[Long](k)
  var size = 0

  def add(v: Long): Unit = {
    if (size == k && v >= vals(k - 1)) return
    val idx = java.util.Arrays.binarySearch(vals, 0, size, v)
    if (idx >= 0) return // already present — sketch holds DISTINCT hashes
    val ins = -idx - 1
    val keep = if (size < k) size else k - 1 // full: max slot falls off
    System.arraycopy(vals, ins, vals, ins + 1, keep - ins)
    vals(ins) = v
    if (size < k) size += 1
  }

  def merge(other: KmvBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.vals(i)); i += 1 }
  }
}

/** `kmv_sketch(hashCol, k)` — a Catalyst [[TypedImperativeAggregate]]
  * producing `struct(nd: bigint, kth: bigint)`: the number of distinct
  * hashes retained (`min(distinct, k)`) and the largest retained hash (the
  * k-th minimum once saturated). The standard KMV estimator follows as a
  * column expression: `nd < k ? nd : (k-1) * 2^bits / kth` — kept OUTSIDE
  * the aggregate so the DuckDB oracle can reproduce it bit-for-bit from
  * the same integers (see q_kmv_distinct).
  *
  * Buffers are partial-aggregated map-side and merged by sorted-array
  * union, so the shuffle carries one ≤(4+8k)-byte blob per (partition,
  * group) — the sketch never materializes the key set anywhere.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    full: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  // `full` adds the retained k-min array itself — the form set-operation
  // estimators (union/intersection) consume; still ≤ k longs per group
  override def dataType: DataType = {
    val base = Seq(
      StructField("nd", LongType, nullable = false),
      StructField("kth", LongType, nullable = false))
    StructType(if (full) base :+ StructField("mins", ArrayType(LongType, containsNull = false), nullable = false) else base)
  }
  override def prettyName: String = if (full) "kmv_sketch_full" else "kmv_sketch"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KmvBuffer): Any = {
    val kth = if (buffer.size > 0) buffer.vals(buffer.size - 1) else 0L
    if (full) {
      val mins = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        java.util.Arrays.copyOf(buffer.vals, buffer.size))
      new GenericInternalRow(Array[Any](buffer.size.toLong, kth, mins))
    } else new GenericInternalRow(Array[Any](buffer.size.toLong, kth))
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putLong(buffer.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new KmvBuffer(k)
    // serialized form is already sorted-distinct: bulk restore
    var i = 0
    while (i < n) { buf.vals(i) = bb.getLong(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvSketch {
  val identifier: FunctionIdentifier = FunctionIdentifier("kmv_sketch")
  val info: ExpressionInfo = new ExpressionInfo(classOf[KmvSketch].getName, "kmv_sketch")
  val fullIdentifier: FunctionIdentifier = FunctionIdentifier("kmv_sketch_full")
  val fullInfo: ExpressionInfo = new ExpressionInfo(classOf[KmvSketch].getName, "kmv_sketch_full")

  // arity/type checked at resolution (builder-coercion pattern shared with
  // SimHash16/MinHashSig — ExpectsInputTypes is private[sql] in Spark 4)
  private def mkBuilder(full: Boolean): Seq[Expression] => Expression = {
    case Seq(e, Literal(kv: Int, IntegerType)) =>
      require(kv > 0 && kv <= 65536, s"kmv_sketch k must be in [1, 65536], got $kv")
      val hash = e.dataType match {
        case LongType => e
        case IntegerType | ShortType | ByteType => Cast(e, LongType)
        case other => throw new IllegalArgumentException(
          s"kmv_sketch expects an integral hash column, got ${other.simpleString}")
      }
      KmvSketch(hash, kv, full)
    case other => throw new IllegalArgumentException(
      s"kmv_sketch expects (hashCol, k literal), got ${other.size} args")
  }
  val builder: Seq[Expression] => Expression = mkBuilder(full = false)
  val fullBuilder: Seq[Expression] => Expression = mkBuilder(full = true)

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
    spark.sessionState.functionRegistry.registerFunction(
      fullIdentifier, fullInfo, fullBuilder)
  }
}
