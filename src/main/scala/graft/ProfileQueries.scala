package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement harness for the optimization rounds (guide §1): runs the
  * named queries (all when none named) with the SAME session shape as
  * [[Bench]] and records, per query and per pass, the wall seconds plus
  * the Spark-side job / stage / task counts and summed task time from a
  * listener. Separates "many tiny driver-side jobs" overhead from "few
  * heavy stages" compute so optimization targets the right thing.
  *
  * `graft.ProfileQueries <sfDir> [name,name,...]` — prints one line per
  * (query, pass) and a JSON summary at the end.
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null)
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
      }
    })

    // warm exactly like Bench
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.Tables.names.foreach { n =>
      try spark.read.parquet(s"$sfDir/$n.parquet").count()
      catch { case _: Throwable => () }
    }

    def snap(): (Int, Int, Int, Long) = (jobs.get, stages.get, tasks.get, taskMs.get)
    case class Row(name: String, pass: Int, sec: Double, jobs: Int,
        stages: Int, tasks: Int, taskSec: Double)
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        (1 to 2).foreach { pass =>
          val (j0, s0, t0, m0) = snap()
          val w0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable => System.err.println(s"[profile] $n: $e") }
          val sec = (System.nanoTime() - w0) / 1e9
          // let straggling listener events drain before the snapshot
          // (outside the timed region — the sleep is instrument overhead)
          Thread.sleep(50)
          val (j1, s1, t1, m1) = snap()
          val r = Row(n, pass, sec, j1 - j0, s1 - s0, t1 - t0, (m1 - m0) / 1e3)
          out += r
          println(f"[profile] ${r.name}%-32s p${r.pass} ${r.sec}%8.3fs jobs=${r.jobs}%3d stages=${r.stages}%3d tasks=${r.tasks}%5d taskTime=${r.taskSec}%8.2fs")
        }
      }
    }
    val byQ = out.groupBy(_.name).view.mapValues { rs =>
      val best = rs.minBy(_.sec)
      (best.sec, rs.map(_.sec).max, best.jobs, best.stages, best.tasks, best.taskSec)
    }.toMap
    val js = byQ.toSeq.sortBy(-_._2._1).map { case (n, (mn, mx, j, s, t, ts)) =>
      s""""$n":{"min_sec":$mn,"max_sec":$mx,"jobs":$j,"stages":$s,"tasks":$t,"task_sec":$ts}"""
    }.mkString("{", ",", "}")
    println(s"""{"profile":$js}""")
    spark.stop()
  }
}
