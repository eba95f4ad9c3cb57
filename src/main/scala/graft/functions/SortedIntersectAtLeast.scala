package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType}

/** `sorted_intersect_atleast(a, b, k)` — true iff two SORTED int arrays
  * share at least `k` elements; a native codegen'd Expression built as
  * the edit join's conjunctive COUNT filter (VERDICT r10 #2).
  *
  * MULTISET semantics are part of the contract (ADVICE r12): arrays need
  * only be sorted, not distinct. The merge scan advances BOTH pointers on
  * a match, so duplicate elements count as Σ min(multiplicity_a,
  * multiplicity_b) — exactly multiset intersection. The cooccur cold-pair
  * filter (Graph.prefilterEdges) relies on this: its arrays are
  * hash IMAGES of item sets, where deduplicating would be UNSOUND —
  * two shared items colliding to one hash value must still count twice
  * for the shared-count lower bound to hold. Pinned by a duplicate-
  * element case in SketchSpec.
  *
  * The point is the two-sided EARLY EXIT, which `size(array_intersect(a,
  * b)) >= k` cannot do: the merge scan aborts the moment the matches so
  * far plus everything left on the shorter side cannot reach `k` — for a
  * count-filter threshold near the array length (the edit join asks for
  * max(|A|,|B|) − τ·q shared grams out of ≤ 58), a DISSIMILAR pair dies
  * after a handful of mismatches, and the filter sits in a join
  * condition evaluated tens of millions of times on the saturated-
  * alphabet corner. `array_intersect` would also allocate a hash set per
  * evaluation; this is two pointers over unsafe array data, no
  * allocation, whole-stage-codegen-able via the static kernel call.
  *
  * `k <= 0` returns true without scanning (the bound is vacuous there —
  * callers need no special-casing for short arrays).
  */
object SortedIntersectFunctions {

  /** Static kernel referenced from generated code. Requires both arrays
    * sorted ascending; duplicates allowed (multiset intersection — both
    * pointers advance on a match, so each matched copy is consumed once
    * per side). Null slots are not expected and would read as 0 via
    * getInt.
    */
  def atLeast(a: ArrayData, b: ArrayData, k: Int): Boolean = {
    if (k <= 0) return true
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var m = 0
    while (i < na && j < nb && m + math.min(na - i, nb - j) >= k) {
      val va = a.getInt(i)
      val vb = b.getInt(j)
      if (va == vb) {
        m += 1
        if (m >= k) return true
        i += 1
        j += 1
      } else if (va < vb) i += 1
      else j += 1
    }
    false
  }
}

case class SortedIntersectAtLeast(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "sorted_intersect_atleast"

  override protected def nullSafeEval(a: Any, b: Any, k: Any): Any =
    SortedIntersectFunctions.atLeast(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, k) =>
      s"graft.functions.SortedIntersectFunctions.atLeast($a, $b, $k)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SortedIntersectAtLeast {
  val identifier: FunctionIdentifier = FunctionIdentifier("sorted_intersect_atleast")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[SortedIntersectAtLeast].getName, "sorted_intersect_atleast")
  // arity/type checked at resolution time — same builder-coercion pattern
  // as SimHash16 (ExpectsInputTypes is unavailable to external expressions
  // in Spark 4).
  val builder: Seq[Expression] => Expression = {
    case Seq(a, b, k) =>
      def arr(e: Expression): Expression = e.dataType match {
        case ArrayType(IntegerType, _) => e
        case ArrayType(_, _)           => Cast(e, ArrayType(IntegerType))
        case other => throw new IllegalArgumentException(
          s"sorted_intersect_atleast expects array<int>, got ${other.simpleString}")
      }
      val kk = k.dataType match {
        case IntegerType => k
        case _           => Cast(k, IntegerType)
      }
      SortedIntersectAtLeast(arr(a), arr(b), kk)
    case other => throw new IllegalArgumentException(
      s"sorted_intersect_atleast expects 3 arguments, got ${other.size}")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(identifier, info, builder)
}
