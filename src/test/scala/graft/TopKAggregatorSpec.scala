package graft

import graft.functions.{ScoredId, TopKAggregator}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("typed top-k aggregator equals window row_number top-k") {
    import spark.implicits._
    val ev = Tables(spark, TestSpark.sfDir, "events")
    val viaAgg = ev.select(col("user_id"),
        col("event_id").as("id"), col("value").as("score"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => ScoredId(r._2, r._3))
      .agg(new TopKAggregator(3).toColumn)
      .collect()
      .flatMap { case (u, top) => top.map(s => (u, s.id, s.score)) }
      .toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    val viaWindow = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("user_id"), col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaAgg === viaWindow)
  }
}
