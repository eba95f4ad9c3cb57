package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded m-smallest buffer over (value, id) pairs, ordered by
  * (value asc, id asc) — the shortlist-cut state. Pairs are kept sorted in
  * fixed m-slot parallel primitive arrays: O(log m) position probe +
  * O(m) insert, O(m·m') merge, and a ≤(4+16m)-byte serialized form
  * regardless of how many candidates streamed through. The bound is the
  * point at 100 TB: a per-query shortlist over billions of ADC candidates
  * shuffles m pairs per (partition, query) instead of every per-tile
  * partial row through a global sort exchange (see
  * [[graft.operators.Similarity.ivfPqQueryTopK]] — replacing the
  * row_number window with this aggregate is the round-12 fix for the
  * measured per-tile partial mass ceiling in PLANS.md).
  */
final class TopMinBuffer(val m: Int) {
  val vals = new Array[Double](m)
  val ids = new Array[Long](m)
  var size = 0

  def add(v: Double, id: Long): Unit = {
    // java.lang.Double.compare, not primitive <, so NaN orders GREATER
    // than every real double (and -0.0 < 0.0) — matching Spark's SQL
    // ordering for the row_number window this aggregate replaces. With
    // primitive comparisons every NaN comparison is false: the full-buffer
    // early exit never fires and the binary search inserts NaN at slot 0,
    // evicting a real pair (ADVICE r12). Current callers guard NaN out
    // (pqPrepare zero-norm guard), but the aggregate is caller-agnostic.
    if (size == m) {
      val c = java.lang.Double.compare(v, vals(m - 1))
      if (c > 0 || (c == 0 && id >= ids(m - 1))) return
    }
    // first index whose (value, id) orders after the candidate
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Double.compare(vals(mid), v)
      if (c < 0 || (c == 0 && ids(mid) < id)) lo = mid + 1 else hi = mid
    }
    val keep = if (size < m) size else m - 1 // full: worst slot falls off
    System.arraycopy(vals, lo, vals, lo + 1, keep - lo)
    System.arraycopy(ids, lo, ids, lo + 1, keep - lo)
    vals(lo) = v
    ids(lo) = id
    if (size < m) size += 1
  }

  def merge(other: TopMinBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.vals(i), other.ids(i)); i += 1 }
  }
}

/** `top_min_pairs(valueCol, idCol, m)` — a Catalyst
  * [[TypedImperativeAggregate]] producing the group's m smallest
  * (value, id) pairs by (value asc, id asc) as
  * `array<struct<id: bigint, v: double>>`, in that order. Exactly the rows
  * `row_number() OVER (ORDER BY value, id) <= m` keeps, but as a bounded,
  * mergeable aggregate: partials combine map-side, so the exchange carries
  * one ≤m-pair state per (partition, group) instead of every input row,
  * and no sort ever runs. Rows where either argument is null are skipped —
  * a null ADC/candidate-id is treated as a non-candidate. Note this is a
  * deliberate DIVERGENCE from the old window formulation: Spark's default
  * for an ascending orderBy is NULLS FIRST, so a null value row would have
  * ranked #1 there; here it is dropped. NaN values rank GREATER than every
  * real double (java.lang.Double.compare), matching Spark's SQL ordering.
  * Current call sites compute cos/adc distances and never produce nulls.
  *
  * Deploy note: the group key is typically a query id — high cardinality
  * by design — and ObjectHashAggregate's DEFAULT sort-based fallback
  * fires at 128 in-memory groups, after which every typed buffer pays a
  * per-sort-run serialize/merge (measured ~12% on q_ann_pq at the 64×
  * fixture, round 12). The state is ≤ m pairs by construction, so
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` can be
  * raised — but it is a PER-TASK memory commitment of threshold ×
  * (16·m + ~100) bytes: 2^20 at m=200 OOMed an 8 GiB local[32] box
  * (measured, round 12), while 8192 holds ≤ ~27 MB/task at that m (the
  * graft bench/probe sessions use 8192). Tests keep the default so the
  * fallback path stays correctness-covered.
  */
case class TopMinPairs(
    value: Expression,
    id: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[TopMinBuffer] {

  override def children: Seq[Expression] = Seq(value, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_min_pairs"

  override def createAggregationBuffer(): TopMinBuffer = new TopMinBuffer(m)

  override def update(buffer: TopMinBuffer, input: InternalRow): TopMinBuffer = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null)
      buffer.add(v.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopMinBuffer, other: TopMinBuffer): TopMinBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: TopMinBuffer): Any =
    new GenericArrayData(Array.tabulate[Any](buffer.size)(i =>
      new GenericInternalRow(Array[Any](buffer.ids(i), buffer.vals(i)))))

  override def serialize(buffer: TopMinBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.vals(i)); bb.putLong(buffer.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopMinBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopMinBuffer(m)
    // serialized form is already (value, id)-sorted: bulk restore
    var i = 0
    while (i < n) { buf.vals(i) = bb.getDouble(); buf.ids(i) = bb.getLong(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopMinPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopMinPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), id = newChildren(1))
}

object TopMinPairs {
  val identifier: FunctionIdentifier = FunctionIdentifier("top_min_pairs")
  val info: ExpressionInfo = new ExpressionInfo(classOf[TopMinPairs].getName, "top_min_pairs")

  // arity/type checked at resolution (builder-coercion pattern shared with
  // KmvSketch — ExpectsInputTypes is private[sql] in Spark 4)
  val builder: Seq[Expression] => Expression = {
    case Seq(v, i, Literal(mv: Int, IntegerType)) =>
      require(mv > 0 && mv <= (1 << 20), s"top_min_pairs m must be in [1, 2^20], got $mv")
      val vd = v.dataType match {
        case DoubleType => v
        case FloatType | LongType | IntegerType | ShortType | ByteType | _: DecimalType =>
          Cast(v, DoubleType)
        case other => throw new IllegalArgumentException(
          s"top_min_pairs expects a numeric value column, got ${other.simpleString}")
      }
      val il = i.dataType match {
        case LongType => i
        case IntegerType | ShortType | ByteType => Cast(i, LongType)
        case other => throw new IllegalArgumentException(
          s"top_min_pairs expects an integral id column, got ${other.simpleString}")
      }
      TopMinPairs(vd, il, mv)
    case Seq(_, _, m) => throw new IllegalArgumentException(
      "top_min_pairs: m must be an INT literal (e.g. 200, not 200L or a " +
        s"column), got ${m.sql}: ${m.dataType.simpleString}")
    case other => throw new IllegalArgumentException(
      s"top_min_pairs expects (valueCol, idCol, m literal), got ${other.size} args")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
