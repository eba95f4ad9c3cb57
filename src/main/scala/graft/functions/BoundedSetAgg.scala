package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Distinct-set buffer with a hard capacity: collects up to `cap` distinct
  * longs (sorted-array insert, the [[KmvBuffer]] discipline); one element
  * past `cap` flips the buffer to OVERFLOWED — the array is dropped and the
  * state collapses to a single flag, so a hub key costs O(1) memory from
  * the moment it reveals itself, not O(fanout). That makes `collect_set`
  * shapes safe at 100 TB: the aggregate's per-group state is ≤ 8·cap bytes
  * by construction, and hub keys (which the caller was going to discard
  * anyway — that's what a fanout cap MEANS) never materialize their set on
  * any task's heap.
  */
final class BoundedSetBuffer(val cap: Int) {
  var vals: Array[Long] = new Array[Long](math.min(cap, 16))
  var size = 0
  var overflowed = false

  def add(v: Long): Unit = {
    if (overflowed) return
    val idx = java.util.Arrays.binarySearch(vals, 0, size, v)
    if (idx >= 0) return // already present
    if (size == cap) { overflow(); return }
    if (size == vals.length) // geometric growth up to cap
      vals = java.util.Arrays.copyOf(vals, math.min(cap, vals.length * 2))
    val ins = -idx - 1
    System.arraycopy(vals, ins, vals, ins + 1, size - ins)
    vals(ins) = v
    size += 1
  }

  def merge(other: BoundedSetBuffer): Unit = {
    if (overflowed) return
    if (other.overflowed) { overflow(); return }
    var i = 0
    while (i < other.size && !overflowed) { add(other.vals(i)); i += 1 }
  }

  private def overflow(): Unit = {
    overflowed = true
    vals = Array.emptyLongArray // hub state is a flag, not a set
    size = 0
  }
}

/** `bounded_set(col, cap)` — collect the DISTINCT values of an integral
  * column as a sorted `array<bigint>`, or NULL if the group holds more
  * than `cap` distinct values. The null-on-overflow contract is the point:
  * fanout-capped operators (co-occurrence projection, posting lists,
  * neighbor sets) filter hub keys anyway, and this aggregate guarantees
  * they never pay for them — state is O(cap) per group on every task,
  * map-side partials included.
  */
case class BoundedSetAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[BoundedSetBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true // null = overflowed (hub key)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_set"

  override def createAggregationBuffer(): BoundedSetBuffer = new BoundedSetBuffer(cap)

  override def update(buffer: BoundedSetBuffer, input: InternalRow): BoundedSetBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BoundedSetBuffer, other: BoundedSetBuffer): BoundedSetBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: BoundedSetBuffer): Any =
    if (buffer.overflowed) null
    else new GenericArrayData(java.util.Arrays.copyOf(buffer.vals, buffer.size))

  override def serialize(buffer: BoundedSetBuffer): Array[Byte] = {
    if (buffer.overflowed) Array[Byte](1)
    else {
      val bb = ByteBuffer.allocate(1 + 4 + 8 * buffer.size)
      bb.put(0.toByte)
      bb.putInt(buffer.size)
      var i = 0
      while (i < buffer.size) { bb.putLong(buffer.vals(i)); i += 1 }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): BoundedSetBuffer = {
    val buf = new BoundedSetBuffer(cap)
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() == 1.toByte) {
      buf.overflowed = true
      buf.vals = Array.emptyLongArray
    } else {
      val n = bb.getInt()
      buf.vals = new Array[Long](math.max(n, 1))
      var i = 0
      while (i < n) { buf.vals(i) = bb.getLong(); i += 1 }
      buf.size = n
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BoundedSetAgg {
  val identifier: FunctionIdentifier = FunctionIdentifier("bounded_set")
  val info: ExpressionInfo = new ExpressionInfo(classOf[BoundedSetAgg].getName, "bounded_set")

  val builder: Seq[Expression] => Expression = {
    case Seq(e, Literal(capv: Int, IntegerType)) =>
      require(capv > 0 && capv <= (1 << 20), s"bounded_set cap must be in [1, 2^20], got $capv")
      val v = e.dataType match {
        case LongType => e
        case IntegerType | ShortType | ByteType => Cast(e, LongType)
        case other => throw new IllegalArgumentException(
          s"bounded_set expects an integral column, got ${other.simpleString}")
      }
      BoundedSetAgg(v, capv)
    case other => throw new IllegalArgumentException(
      s"bounded_set expects (col, cap literal), got ${other.size} args")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
