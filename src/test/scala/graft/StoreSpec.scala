package graft

import graft.sources.Store
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("partitioned write prunes non-matching clusters at scan time") {
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("graft_part").toString
    Store.writePartitioned(emb, path, "label")
    val pruned = spark.read.parquet(path).filter(col("label") === 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    // only the label=3 directory is read
    val files = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("label=3")))
  }

  test("co-bucketed join plans without a shuffle exchange") {
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    Store.writeBucketed(emb.select(col("vec_id"), col("label")), "b_left", 4, "vec_id")
    Store.writeBucketed(emb.select(col("vec_id"), col("embedding")), "b_right", 4, "vec_id")
    val joined = spark.table("b_left")
      .hint("merge")
      .join(spark.table("b_right"), "vec_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() === emb.count())
  }
}
