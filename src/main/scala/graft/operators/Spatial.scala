package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-blocked spatial radius join — "all right-side points within R km of
  * each left-side point" without the cross join, the blocking pattern every
  * geo pipeline (store-visit attribution, device co-location, POI match)
  * needs at scale.
  *
  * Both sides land in a fixed lat/lon grid whose cell is AT LEAST as large
  * as the radius's reach along each axis; the left side is exploded to its
  * 3×3 cell neighborhood and equi-joined against the right side's home
  * cell, then the exact great-circle filter runs on candidates only. The
  * losslessness argument, on a sphere of radius 6371 km:
  *
  *   - latitude: the central angle between two points is ≥ their latitude
  *     difference, so dist ≤ R ⇒ |Δlat°| ≤ R / 111.195 (km per degree of
  *     arc). A lat cell ≥ that bound keeps matches within ±1 cell.
  *   - longitude: from the law of cosines at fixed latitudes φ₁, φ₂ with
  *     |φ| ≤ φmax, sin(c/2) ≥ cos(φmax)·sin(Δλ/2), so dist ≤ R ⇒
  *     Δλ ≤ 2·asin(R / (2·6371·cos φmax)). A lon cell ≥ that bound (checked
  *     by `require` against the caller's φmax) again keeps matches within
  *     ±1 cell.
  *
  * Cell ids are computed in INTEGER centidegrees via true floor division
  * (pmod-adjusted, so NEGATIVE centidegrees land in aligned cells too —
  * `div` alone truncates toward zero and would fold the two cells around
  * the origin together while splitting their neighbors), never floats, so
  * the blocking is engine-exact; only the final distance filter touches
  * doubles, and it is the same formula on both engines. Each candidate
  * pair is emitted exactly once — the
  * right side sits in its unique home cell and the left side's 9 probe
  * cells are distinct — so no dedup pass is needed.
  *
  * At 100 TB this is the shape that survives: candidate volume is
  * Σ_cell |L_cell±1|·|R_cell|, an equi-join Catalyst shuffles on the cell
  * id (AQE handles dense-city skew); the 9× left replication is map-side.
  * Antimeridian wrap and |lat| > φmax are out of contract (the caller's
  * grid must not cross them) — a production wrap would union a second
  * join with lon shifted 360°.
  */
object Spatial {

  /** Pair left ids with right ids within `radiusKm`. Inputs need columns
    * (id, latc, lonc, lat, lon): `latc`/`lonc` integer centidegrees on a
    * caller-chosen origin, either sign (cells are cut from these via
    * floor division, so negatives block correctly), `lat`/`lon` the true
    * coordinates in degrees with |lat| ≤ maxAbsLatDeg (the distance runs
    * on these). Output: (left_id, right_id, dist_km) with dist_km rounded
    * to 1e-4 km — the filter uses the ROUNDED value so the kept set is
    * decided on the exact quantity both engines emit. Because rounding
    * admits true distances up to radiusKm + 5e-5 km, the cell-size
    * guards validate against that slack-padded radius, so the ±1-cell
    * blocking bound covers everything the rounded filter can keep.
    */
  def radiusJoin(left: DataFrame, right: DataFrame, radiusKm: Double,
      latCellCd: Int, lonCellCd: Int, maxAbsLatDeg: Double): DataFrame = {
    val kmPerDegArc = math.Pi * 6371.0 / 180.0 // 111.195
    val keepKm = radiusKm + 0.5e-4 // rounding half-step: max TRUE distance kept
    val minLatCd = keepKm / kmPerDegArc * 100.0
    require(latCellCd >= minLatCd,
      s"lat cell $latCellCd centideg < radius reach $minLatCd")
    val cosMax = math.cos(math.toRadians(maxAbsLatDeg))
    require(cosMax > 0, s"maxAbsLatDeg $maxAbsLatDeg too close to the pole")
    val minLonCd =
      math.toDegrees(2 * math.asin(math.min(1.0, keepKm / (2 * 6371.0 * cosMax)))) * 100.0
    require(lonCellCd >= minLonCd,
      s"lon cell $lonCellCd centideg < radius reach $minLonCd at lat $maxAbsLatDeg")

    // floor division: (x - pmod(x, c)) div c == ⌊x/c⌋ for either sign of
    // x (pmod is the nonnegative remainder), and reduces to x div c on
    // nonnegative x
    def cells(df: DataFrame) = df
      .withColumn("__clat", expr(s"(latc - pmod(latc, $latCellCd)) div $latCellCd"))
      .withColumn("__clon", expr(s"(lonc - pmod(lonc, $lonCellCd)) div $lonCellCd"))
    val r = cells(right)
      .select(col("id").as("right_id"), col("lat").as("rlat"),
        col("lon").as("rlon"), col("__clat"), col("__clon"))
    val probes = array((for (i <- -1 to 1; j <- -1 to 1) yield
      struct((col("__clat") + i).as("pa"), (col("__clon") + j).as("po"))): _*)
    val l = cells(left)
      .select(col("id").as("left_id"), col("lat").as("llat"),
        col("lon").as("llon"), explode(probes).as("p"))
      .select(col("left_id"), col("llat"), col("llon"),
        col("p.pa").as("__clat"), col("p.po").as("__clon"))
    val dist = graft.functions.GeoFunctions.greatCircleKm(
      col("llat"), col("llon"), col("rlat"), col("rlon"))
    val rounded = floor(dist * lit(1e4) + lit(0.5)) / lit(1e4)
    l.join(r, Seq("__clat", "__clon"))
      .select(col("left_id"), col("right_id"), rounded.as("dist_km"))
      .filter(col("dist_km") <= radiusKm)
  }

  /** Deterministic event geography for the fixture: event_id maps to a
    * point on a 0.01° lattice over lat ∈ [30, 60), lon ∈ [−10, 40) —
    * integer arithmetic both engines replay exactly, away from poles and
    * antimeridian per the operator contract.
    */
  private def eventPoints(ev: DataFrame, eventType: String): DataFrame =
    ev.filter(col("event_type") === eventType)
      .select(col("event_id").as("id"),
        (col("event_id") * 7919 % 3000).as("latc"),
        (col("event_id") * 104729 % 5000).as("lonc"))
      .withColumn("lat", col("latc") / 100.0 + 30.0)
      .withColumn("lon", col("lonc") / 100.0 - 10.0)

  private val pointsSql =
    """SELECT event_id AS id, event_type,
      |  30.0 + (event_id * 7919 % 3000) / 100.0 AS lat,
      |  (event_id * 104729 % 5000) / 100.0 - 10.0 AS lon
      |FROM events""".stripMargin

  /** Bounded k-nearest: the k closest right points within `radiusKm` of
    * each left point — [[radiusJoin]] plus one per-left-point window.
    * The radius bound is what keeps this scalable (an unbounded global
    * kNN cannot prune candidates); ties break (dist, right_id), so the
    * result is engine-exact on the rounded distance.
    */
  def knnWithin(left: DataFrame, right: DataFrame, radiusKm: Double, k: Int,
      latCellCd: Int, lonCellCd: Int, maxAbsLatDeg: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("left_id").orderBy(col("dist_km"), col("right_id"))
    radiusJoin(left, right, radiusKm, latCellCd, lonCellCd, maxAbsLatDeg)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  val queries: Seq[GraftQuery] = Seq(

    // Error events paired with every purchase event within 50 km — the
    // co-location screen ("which purchases sit near a failure/fraud
    // signal"). Spark blocks on a 0.5°×1.0° grid (both bounds hold with
    // ~11% margin at |lat| ≤ 60); the oracle is the brute-force cross
    // join, so a hash match PROVES the blocking dropped no pair.
    GraftQuery(
      "q_geo_radius_join",
      (s, dir) => {
        val ev = Tables(s, dir, "events").localCheckpoint(false)
        radiusJoin(eventPoints(ev, "error"), eventPoints(ev, "purchase"),
            radiusKm = 50.0, latCellCd = 50, lonCellCd = 100, maxAbsLatDeg = 60.0)
          .orderBy("left_id", "right_id")
      },
      Some {
        val d = Relational.greatCircleSql("e.lat", "e.lon", "p.lat", "p.lon")
        s"""WITH pts AS ($pointsSql),
           |err AS (SELECT id, lat, lon FROM pts WHERE event_type = 'error'),
           |pur AS (SELECT id, lat, lon FROM pts WHERE event_type = 'purchase')
           |SELECT e.id AS left_id, p.id AS right_id,
           |  floor(($d) * 1e4 + 0.5) / 1e4 AS dist_km
           |FROM err e JOIN pur p
           |  ON floor(($d) * 1e4 + 0.5) / 1e4 <= 50.0
           |ORDER BY left_id, right_id""".stripMargin
      },
    ),

    // The 3 nearest purchases within 50 km of each error event — the
    // "closest stores / nearest prior activity" feature join. Same
    // blocked candidates; one window on the left key. Ties break on
    // (rounded dist, right_id) so the cut is engine-exact.
    GraftQuery(
      "q_geo_knn",
      (s, dir) => {
        val ev = Tables(s, dir, "events").localCheckpoint(false)
        knnWithin(eventPoints(ev, "error"), eventPoints(ev, "purchase"),
            radiusKm = 50.0, k = 3, latCellCd = 50, lonCellCd = 100,
            maxAbsLatDeg = 60.0)
          .orderBy("left_id", "rk")
      },
      Some {
        val d = Relational.greatCircleSql("e.lat", "e.lon", "p.lat", "p.lon")
        s"""WITH pts AS ($pointsSql),
           |err AS (SELECT id, lat, lon FROM pts WHERE event_type = 'error'),
           |pur AS (SELECT id, lat, lon FROM pts WHERE event_type = 'purchase'),
           |cand AS (
           |  SELECT e.id AS left_id, p.id AS right_id,
           |    floor(($d) * 1e4 + 0.5) / 1e4 AS dist_km
           |  FROM err e JOIN pur p
           |    ON floor(($d) * 1e4 + 0.5) / 1e4 <= 50.0),
           |ranked AS (
           |  SELECT *, CAST(row_number() OVER (
           |    PARTITION BY left_id ORDER BY dist_km, right_id) AS INT) AS rk
           |  FROM cand)
           |SELECT left_id, right_id, dist_km, rk FROM ranked
           |WHERE rk <= 3 ORDER BY left_id, rk""".stripMargin
      },
    ),
  )
}
