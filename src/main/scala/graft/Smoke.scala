package graft

import org.apache.spark.sql.SparkSession

/** Mimics the driver's t1 smoke: a bare session (no graft-specific configs)
  * running `SparkEntry.entry` and checking rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
