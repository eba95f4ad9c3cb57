package graft

import graft.operators.Spatial
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-blocked radius join: equivalence to the brute-force cross join on
  * randomized point sets (the losslessness proof at test scale — the
  * sf0.01 oracle replays it at fixture scale), cell-boundary geometry,
  * pair uniqueness, and the radius-vs-cell-size guards.
  */
class SpatialSpec extends SparkSuite {

  /** Points on the q_geo_radius_join lattice: lat ∈ [30, 60) from latc
    * centidegrees, lon ∈ [−10, 40) from lonc.
    */
  private def pts(rows: Seq[(Long, Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "latc", "lonc")
      .withColumn("lat", col("latc") / 100.0 + 30.0)
      .withColumn("lon", col("lonc") / 100.0 - 10.0)
  }

  private def bruteForce(left: DataFrame, right: DataFrame, r: Double): Set[(Long, Long)] = {
    val dist = graft.functions.GeoFunctions.greatCircleKm(
      col("l.lat"), col("l.lon"), col("r.lat"), col("r.lon"))
    val rounded = floor(dist * lit(1e4) + lit(0.5)) / lit(1e4)
    left.as("l").crossJoin(right.as("r"))
      .filter(rounded <= r)
      .select(col("l.id"), col("r.id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
  }

  private def blocked(left: DataFrame, right: DataFrame, r: Double): Seq[(Long, Long)] =
    Spatial.radiusJoin(left, right, r, latCellCd = 50, lonCellCd = 100, maxAbsLatDeg = 60.0)
      .select("left_id", "right_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq

  test("blocked join ≡ brute force on seeded random point sets") {
    val rnd = new scala.util.Random(42)
    def randPts(n: Int, idBase: Long) = pts(Seq.tabulate(n)(i =>
      (idBase + i, rnd.nextInt(3000).toLong, rnd.nextInt(5000).toLong)))
    val l = randPts(250, 0)
    val r = randPts(250, 1000)
    val got = blocked(l, r, 50.0)
    assert(got.size == got.toSet.size, "duplicate candidate pair emitted")
    assert(got.toSet == bruteForce(l, r, 50.0))
  }

  test("neighbor-cell pairs are found: straddling lat, lon, and diagonal cell edges") {
    // cells are 0.5° lat × 1.0° lon; each pair below crosses a cell
    // boundary but is well under 50 km apart
    val l = pts(Seq((1L, 49L, 99L)))                    // cell (0, 0), at its far corner
    val r = pts(Seq(
      (10L, 51L, 98L),   // lat cell 1, lon cell 0: ~2.4 km away
      (11L, 48L, 101L),  // lat cell 0, lon cell 1: ~2.1 km
      (12L, 51L, 101L),  // diagonal cell (1, 1): ~2.9 km
      (13L, 49L, 98L),   // same cell, ~1 km
    ))
    assert(blocked(l, r, 50.0).map(_._2).sorted == Seq(10L, 11L, 12L, 13L))
  }

  test("same-cell pair beyond the radius is rejected by the exact filter") {
    // same 0.5°×1.0° cell, ~77 km apart (0.5° lon at lat 30 ≈ 48 km is
    // inside; 0.8° ≈ 77 km needs a bigger separation: use lat+lon spread)
    val l = pts(Seq((1L, 0L, 0L)))
    val r = pts(Seq((2L, 49L, 99L))) // Δ0.49° lat, Δ0.99° lon in-cell
    assert(blocked(l, r, 50.0).isEmpty)
    assert(bruteForce(pts(Seq((1L, 0L, 0L))), pts(Seq((2L, 49L, 99L))), 50.0).isEmpty)
  }

  test("coincident points match at distance zero") {
    val l = pts(Seq((1L, 1500L, 2500L)))
    val r = pts(Seq((2L, 1500L, 2500L)))
    val rows = Spatial.radiusJoin(l, r, 50.0, 50, 100, 60.0).collect()
    assert(rows.length == 1 && rows(0).getDouble(2) == 0.0)
  }

  test("negative centidegrees block correctly (floor cells, not div truncation)") {
    // Points straddling the centidegree origin: with truncating `div`,
    // latc −1 and +1 both land in cell 0 while −51 lands in −1, so the
    // cells around zero are misaligned (double-width at 0, and the ±1
    // probe ring shifts) and true sub-radius pairs can be dropped.
    // Floor-division cells must reproduce the brute force exactly.
    val rnd = new scala.util.Random(7)
    def randPts(n: Int, idBase: Long) = pts(Seq.tabulate(n)(i =>
      (idBase + i, (rnd.nextInt(3000) - 1500).toLong, (rnd.nextInt(5000) - 2500).toLong)))
    val l = randPts(250, 0)
    val r = randPts(250, 1000)
    val got = blocked(l, r, 50.0)
    assert(got.size == got.toSet.size, "duplicate candidate pair emitted")
    assert(got.toSet == bruteForce(l, r, 50.0))
    // and a hand-placed cross-origin pair ~1.5 km apart must survive
    val lo = pts(Seq((1L, -1L, -1L)))
    val ro = pts(Seq((2L, 1L, 1L)))
    assert(blocked(lo, ro, 50.0) == Seq((1L, 2L)))
  }

  test("cell-size guards reject cells smaller than the radius reach") {
    val p = pts(Seq((1L, 0L, 0L)))
    // 50 km needs ≥ 44.97 centideg of lat: 44 must throw, 45 passes
    intercept[IllegalArgumentException](Spatial.radiusJoin(p, p, 50.0, 44, 100, 60.0))
    Spatial.radiusJoin(p, p, 50.0, 45, 100, 60.0).collect()
    // and ≥ 89.94 centideg of lon at |lat| ≤ 60: 89 must throw
    intercept[IllegalArgumentException](Spatial.radiusJoin(p, p, 50.0, 50, 89, 60.0))
    // near-pole φmax blows the lon bound sky-high
    intercept[IllegalArgumentException](Spatial.radiusJoin(p, p, 50.0, 50, 100, 89.9))
  }
}
