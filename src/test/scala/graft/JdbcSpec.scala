package graft

import graft.sources.Sources

/** S1/S2 against a real database: embedded Derby (ships with Spark). Full
  * ingest, Sqoop-mapper-style partitioned read, incremental watermark pull.
  */
class JdbcSpec extends SparkSuite {

  private val driver = Some("org.apache.derby.jdbc.EmbeddedDriver")

  test("derby roundtrip: full, partitioned, and incremental reads") {
    val db = "/tmp/graft-derby-" + System.nanoTime()
    val url = s"jdbc:derby:$db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE member_score (member_id BIGINT, score INT, joined VARCHAR(20))")
      (1 to 50).foreach { i =>
        st.execute(s"INSERT INTO member_score VALUES ($i, ${i * 10}, '2024-01-${i % 27 + 1}')")
      }
    } finally conn.close()

    val full = Sources.readJdbc(spark, url, "member_score", driver = driver)
    assert(full.count() == 50)
    assert(full.columns.map(_.toLowerCase).toSeq == Seq("member_id", "score", "joined"))

    // partitioned read: 4 range splits on member_id, same rows back
    val part = Sources.readJdbc(spark, url, "member_score",
      partitionColumn = Some("member_id"), numPartitions = 4,
      bounds = Some((1L, 50L)), driver = driver)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 50)

    // incremental: watermark pushed into the source query (member_id > 40)
    val delta = Sources.readJdbcIncremental(spark, url, "member_score",
      checkColumn = "member_id", lastValue = "40", driver = driver)
    assert(delta.count() == 10)
    assert(delta.agg(org.apache.spark.sql.functions.min("member_id"))
      .head().getLong(0) == 41L)

    // injection surface (ADVICE r1): values interpolated into pushdown SQL
    // must be identifiers / plain literals, never SQL text
    intercept[IllegalArgumentException] {
      Sources.readJdbc(spark, url, "member_score; DROP TABLE member_score", driver = driver)
    }
    intercept[IllegalArgumentException] {
      Sources.readJdbcIncremental(spark, url, "member_score",
        checkColumn = "member_id) UNION SELECT * FROM secrets --", lastValue = "40", driver = driver)
    }
    intercept[IllegalArgumentException] {
      Sources.readJdbcIncremental(spark, url, "member_score",
        checkColumn = "member_id", lastValue = "40 OR 1=1", driver = driver)
    }
    // quoted string watermark stays accepted
    assert(Sources.readJdbcIncremental(spark, url, "member_score",
      checkColumn = "joined", lastValue = "'2024-01-20'", driver = driver).count() > 0)
  }
}
