package graft

import graft.functions.MinHashSketch
import org.apache.spark.sql.functions._

/** The custom TypedImperativeAggregate equals the declarative 8-slice-min
  * formulation, survives partial aggregation (repartitioned input), and
  * handles empty/null groups.
  */
class MinHashSketchSpec extends SparkSuite {

  test("sketch equals declarative per-slice minima across partitionings") {
    MinHashSketch.register(spark)
    val t = Tables(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .repartition(7) // force cross-partition partial agg + merge
    val sketch = t.groupBy("doc_id").agg(expr("minhash_sketch(w)").as("sig"))
    val declAggs = (0 until 8).map(i =>
      min(expr(s"substring(md5(w), ${i * 4 + 1}, 4)")).as(s"h$i"))
    val decl = t.groupBy("doc_id").agg(declAggs.head, declAggs.tail: _*)
    val joined = sketch.join(decl, "doc_id")
    val bad = joined.filter(
      (0 until 8).map(i => col("sig").getItem(i) =!= col(s"h$i")).reduce(_ || _))
    assert(bad.count() == 0)
    assert(sketch.count() == decl.count())
  }

  test("map-side MinHashSig expression equals the aggregate sketch per doc") {
    MinHashSketch.register(spark)
    graft.functions.MinHashSig.register(spark)
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val viaExpr = docs.select(col("doc_id"),
      expr("minhash_sig(array_distinct(split(text, ' ')))").as("sig"))
    val viaAgg = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .groupBy("doc_id").agg(expr("minhash_sketch(w)").as("sig2"))
    val joined = viaExpr.join(viaAgg, "doc_id")
    val bad = joined.filter(
      (0 until 8).map(i => col("sig").getItem(i) =!= col("sig2").getItem(i)).reduce(_ || _))
    assert(bad.count() == 0)
    assert(joined.count() == docs.count())
  }

  test("null inputs are ignored; all-null group yields null slices") {
    MinHashSketch.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("abc")), (1L, None), (2L, None))
      .toDF("k", "w")
    val got = df.groupBy("k").agg(expr("minhash_sketch(w)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L).forall(_ != null))
    assert(got(2L).forall(_ == null))
  }
}
