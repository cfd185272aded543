package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage trace for one query (guide §1/§7.1 — the Stages-tab view as
  * a headless instrument): prints every stage's task count, summed task
  * wall (executorRunTime), summed task CPU and shuffle-read bytes while
  * the named query runs, so "where do the task-seconds go" decomposes
  * into nameable stages — and BLOCKED time (run >> cpu) separates from
  * compute. `graft.StageTrace <sfDir> <queryName> [passes]` */
object StageTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val passes = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val m = si.taskMetrics
        println(f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"run=${m.executorRunTime}%7d ms cpu=${m.executorCpuTime / 1000000}%7d ms " +
          f"srBytes=${m.shuffleReadMetrics.totalBytesRead}%10d " +
          f"spill=${m.diskBytesSpilled}%8d  ${si.name.take(70)}")
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.Tables.names.foreach { n =>
      try spark.read.parquet(s"$sfDir/$n.parquet").count()
      catch { case _: Throwable => () }
    }
    val fn = SparkEntry.queries(name)
    (1 to passes).foreach { p =>
      println(s"===== pass $p: $name =====")
      val w0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"===== pass $p wall ${(System.nanoTime() - w0) / 1e9}%.3f s =====")
      Thread.sleep(200)
    }
    spark.stop()
  }
}
