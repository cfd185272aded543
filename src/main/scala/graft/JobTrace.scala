package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** Per-job trace for one query (guide §1/§7): prints every Spark job's
  * call site and wall time while the named query builds and runs, so the
  * "19 jobs for one search" overhead decomposes into nameable actions.
  * `graft.JobTrace <sfDir> <queryName> [passes]` */
object JobTrace {
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
    val t0 = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map { si =>
          si.name + " | " + si.details.linesIterator
            .filter(l => l.contains("graft.") || l.contains("Dataset"))
            .take(3).mkString(" <- ")
        }.getOrElse("?")
        t0.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(t0.get(j.jobId)).foreach { case (s, site) =>
          println(f"[job] ${j.jobId}%4d ${(System.nanoTime() - s) / 1e6}%8.1f ms  $site")
        }
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
    }
    spark.stop()
  }
}
