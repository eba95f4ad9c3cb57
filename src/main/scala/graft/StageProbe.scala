package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** r16 optimization probe: run one query cold (bench shape) and print every
  * completed stage — wall duration, task-time sum, shuffle bytes, rows —
  * so the seconds can be attributed to operators without the UI.
  * Usage: runmain.sh graft.StageProbe <sfDir> <query> [reps]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // keep probe sessions split-compatible with Bench (r17)
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "524288"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).selectExpr("id % 97 AS k").groupBy("k").count().count()

    case class St(id: Int, name: String, wallMs: Long, taskMs: Long,
        tasks: Int, shufReadMB: Double, shufWriteMB: Double, recs: Long)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        val m = si.taskMetrics
        stages += St(si.stageId, si.name.takeWhile(_ != '\n'), wall,
          m.executorRunTime, si.numTasks,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.outputMetrics.recordsWritten + m.shuffleWriteMetrics.recordsWritten)
      }
    })

    // r17: comma-separated list — one JVM amortizes warmup across a sweep
    name.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      stages.clear()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      // listener is async; give it a beat to drain
      Thread.sleep(500)
      println(f"[stageprobe] === $name rep $r total $total%.2f s, ${stages.size} stages ===")
      val wallSum = stages.map(_.wallMs).sum / 1e3
      val taskSum = stages.map(_.taskMs).sum / 1e3
      println(f"[stageprobe] wall-sum ${wallSum}%.2f s  task-time-sum ${taskSum}%.2f s  " +
        f"sched-gap ${total - wallSum}%.2f s")
      stages.sortBy(-_.wallMs).take(40).foreach { s =>
        println(f"[stageprobe] ${s.wallMs}%6d ms wall ${s.taskMs}%7d ms task ${s.tasks}%3d t " +
          f"${s.shufReadMB}%7.1f MB r ${s.shufWriteMB}%7.1f MB w ${s.recs}%9d rec  ${s.name}")
      }
    }
    }
    spark.stop()
  }
}
