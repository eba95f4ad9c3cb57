package graft

import graft.operators.Dedup
import scala.util.Random

/** The thresholded edit join's ED-Join candidate stage (rarest-first
  * q-gram prefix filtering: heads within τ edits share all but ≤ τ·q
  * distinct q-gram contents, so their τ·q+1 rarest grams must collide)
  * must be LOSSLESS: its output must equal the brute-force all-pairs scan
  * filtered to dist ≤ τ, pair for pair and distance for distance. These
  * pins cover the cases the count-bound proof leans on: exact dups, edits
  * up to and past the threshold, length drift across gram positions, heads
  * with too few distinct grams for the bound to bite (the fallback path),
  * and a randomized corpus.
  */
class EditThresholdSpec extends SparkSuite {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  private def check(docs: org.apache.spark.sql.DataFrame, tau: Int): Unit = {
    val thresholded = Dedup.editDistancePairs(docs, "doc_id", "text", "source",
      maxDist = Some(tau))
    val brute = Dedup.editDistancePairs(docs, "doc_id", "text", "source")
      .filter(org.apache.spark.sql.functions.col("dist") <= tau)
    assert(canon(thresholded) == canon(brute))
  }

  test("engineered pairs: dup, near, far, boundary — equals brute force") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running onward"
    val docs = Seq(
      (1L, base, "a"),
      (2L, base, "a"), // exact dup: dist 0
      (3L, base.replace("quick", "quack"), "a"), // 1 edit
      (4L, base.replace("quick brown", "slow green"), "a"), // several edits
      (5L, base.toUpperCase, "a"), // way past threshold
      (6L, base, "b"), // other block: never paired with source a
      (7L, "x" * 70, "a"), // same len bucket, all-different head
      (8L, base.drop(4), "a"), // length drift within the bucket
    ).toDF("doc_id", "text", "source")
    check(docs, 8)
    val out = Dedup.editDistancePairs(docs, "doc_id", "text", "source", maxDist = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out((1L, 2L)) == 0)
    assert(out((1L, 3L)) == 1)
    assert(!out.keySet.exists { case (a, b) => a == 6L || b == 6L })
  }

  test("short heads (below tau+1 chars) take the fallback and stay exact") {
    val docs = Seq(
      (1L, "abc", "a"), (2L, "abd", "a"), (3L, "abcdefgh", "a"),
      (4L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz", "a"),
      (5L, "", "a"), (6L, "abc", "a"),
    ).toDF("doc_id", "text", "source")
    check(docs, 8)
    val out = Dedup.editDistancePairs(docs, "doc_id", "text", "source", maxDist = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out((1L, 2L)) == 1)
    assert(out((1L, 6L)) == 0)
    assert(out((1L, 3L)) == 5)
    assert(out((3L, 5L)) == 8) // empty head vs 8 chars: exactly tau
  }

  test("candidate stage plans as equi hash joins — never a nested loop") {
    // The point of the ED-Join candidate stage is that pair generation is
    // an EQUI join on gram content (hash-partitionable at any scale,
    // broadcastable when one side is small); a planner fallback to
    // BroadcastNestedLoopJoin or CartesianProduct would silently
    // reintroduce the all-pairs scan this stage exists to remove.
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val plan = Dedup.editDistancePairs(docs, "doc_id", "text", "source",
      maxDist = Some(8)).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi join, got:\n$plan")
  }

  test("randomized corpus equals brute force (seeded)") {
    val rnd = new Random(42)
    val alphabet = "abcdef "
    def randDoc(n: Int) = (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (1 to edits).foreach { _ =>
        val i = if (cur.isEmpty) 0 else rnd.nextInt(cur.length)
        rnd.nextInt(3) match {
          case 0 if cur.nonEmpty => cur = cur.updated(i, alphabet(rnd.nextInt(alphabet.length)))
          case 1 => cur = cur.take(i) + alphabet(rnd.nextInt(alphabet.length)) + cur.drop(i)
          case _ if cur.nonEmpty => cur = cur.take(i) + cur.drop(i + 1)
          case _ => ()
        }
      }
      cur
    }
    val seeds = (0 until 12).map(_ => randDoc(40 + rnd.nextInt(40)))
    val docs = (0 until 90).map { i =>
      val s = seeds(rnd.nextInt(seeds.length))
      (i.toLong, mutate(s, rnd.nextInt(12)), s"s${rnd.nextInt(2)}")
    }.toDF("doc_id", "text", "source")
    check(docs, 8)
    check(docs, 3)
  }

  test("randomized corpus, non-default head length (count-filter bound at 120 chars)") {
    // the round-11 count filter's bound is stated on the HEAD's distinct
    // gram sets; exercise it away from the default prefixLen=60 so a
    // length-dependent mistake (e.g. using raw instead of hashed set
    // sizes) could not hide behind the default geometry
    val rnd = new Random(7)
    val alphabet = "abcdefgh "
    def randDoc(n: Int) = (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (1 to edits).foreach { _ =>
        val i = if (cur.isEmpty) 0 else rnd.nextInt(cur.length)
        rnd.nextInt(3) match {
          case 0 if cur.nonEmpty => cur = cur.updated(i, alphabet(rnd.nextInt(alphabet.length)))
          case 1 => cur = cur.take(i) + alphabet(rnd.nextInt(alphabet.length)) + cur.drop(i)
          case _ if cur.nonEmpty => cur = cur.take(i) + cur.drop(i + 1)
          case _ => ()
        }
      }
      cur
    }
    val seeds = (0 until 8).map(_ => randDoc(100 + rnd.nextInt(60)))
    val docs = (0 until 70).map { i =>
      val s = seeds(rnd.nextInt(seeds.length))
      (i.toLong, mutate(s, rnd.nextInt(8)), s"s${rnd.nextInt(2)}")
    }.toDF("doc_id", "text", "source")
    def checkAt(tau: Int): Unit = {
      val thresholded = Dedup.editDistancePairs(docs, "doc_id", "text", "source",
        prefixLen = 120, maxDist = Some(tau))
      val brute = Dedup.editDistancePairs(docs, "doc_id", "text", "source",
        prefixLen = 120)
        .filter(org.apache.spark.sql.functions.col("dist") <= tau)
      assert(canon(thresholded) == canon(brute))
    }
    checkAt(5)
    checkAt(2)
  }
}
