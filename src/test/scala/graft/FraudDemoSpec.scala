package graft

import org.apache.spark.sql.functions._

/** The end-to-end demo: batch build + streaming replay on generated
  * reference-shaped data (EP1 + EP2 through the public entry points).
  */
class FraudDemoSpec extends SparkSuite {

  test("batch lookup + streaming replay end to end") {
    val out = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val (lookup, master) = FraudDemo.run(spark, out)

    assert(lookup.columns.toSeq == Seq("card_id", "ucl", "postcode", "transaction_dt", "score"))
    assert(lookup.count() > 0)

    assert(master.count() == 22) // 20 normal + over-UCL + impossible-travel
    val byCard = master.collect().map(r =>
      (r.getAs[Long]("card_id"), r.getAs[Long]("pos_id")) -> r.getAs[String]("status")).toMap
    // low-score cards (1-4) are FRAUD on their normal transaction
    (1L to 4L).foreach(c => assert(byCard((c, 5000 + c)) == "FRAUD", s"card $c"))
    // card 5's second txn is over UCL
    assert(byCard((5L, 5905L)) == "FRAUD")
    // card 6's second txn is impossible travel (69 km in 10 s)
    assert(byCard((6L, 5906L)) == "FRAUD")
    // a healthy card's normal txn is genuine
    assert(byCard((10L, 5010L)) == "GENUINE")
    // every row got a fresh uuid rowid
    assert(master.select("rowid").distinct().count() == master.count())
  }
}
