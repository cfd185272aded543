package graft

import graft.streaming.IncrementalIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AvailableNow runs process only new files; re-runs are no-ops") {
    val base = java.nio.file.Files.createTempDirectory("graft_incr")
    val landing = base.resolve("landing").toString
    val sink = base.resolve("postings").toString
    val ckpt = base.resolve("ckpt").toString

    val docs = Tables(spark, TestSpark.sfDir, "documents").select("doc_id", "text")
    docs.write.parquet(landing)
    IncrementalIndex.updatePostings(spark, landing, sink, ckpt)
    val afterFirst = spark.read.parquet(sink).count()
    assert(afterFirst > 0)

    // second run, nothing new -> no growth
    IncrementalIndex.updatePostings(spark, landing, sink, ckpt)
    assert(spark.read.parquet(sink).count() === afterFirst)

    // land a new file (id-shifted copy) -> only its postings are appended
    docs.withColumn("doc_id", col("doc_id") + 100000)
      .write.mode("append").parquet(landing)
    IncrementalIndex.updatePostings(spark, landing, sink, ckpt)
    val afterThird = spark.read.parquet(sink)
    assert(afterThird.count() === 2 * afterFirst)
    // original ids were not reprocessed (no duplicates)
    val dups = afterThird.groupBy("id", "term").count().filter(col("count") > 1).count()
    assert(dups === 0)
  }

  test("incremental dense index: batches land cell-partitioned, probe prunes directories") {
    import graft.operators.Similarity
    val base = java.nio.file.Files.createTempDirectory("graft_incr_dense")
    val landing = base.resolve("landing").toString
    val sink = base.resolve("store").toString
    val ckpt = base.resolve("ckpt").toString
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val cents = Similarity.centroids(emb)

    // batch 1 + batch 2 land disjoint id ranges
    emb.filter(col("vec_id") < 30).write.mode("append").parquet(landing)
    IncrementalIndex.updateDenseIndex(spark, landing, sink, ckpt, cents)
    emb.filter(col("vec_id") >= 30 && col("vec_id") < 50)
      .write.mode("append").parquet(landing)
    IncrementalIndex.updateDenseIndex(spark, landing, sink, ckpt, cents)

    val store = spark.read.parquet(sink)
    assert(store.count() === 50)
    // assignments match the batch operator's
    val want = Similarity.knnJoin(emb.filter(col("vec_id") < 50), cents
        .select(col("label").as("seed_id"), col("cv").as("sv")), k = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Number]("seed_id").longValue).toMap
    val got = store.select("vec_id", "ivf_cell")
      .collect().map(r => r.getLong(0) -> r.getAs[Number]("ivf_cell").longValue).toMap
    assert(got === want)
    // cell partitioning is physical: a cell predicate prunes to that
    // cell's directories
    val one = store.filter(col("ivf_cell") === lit(got(0L)))
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ivf_cell"),
      s"cell predicate not a partition filter:\n$plan")
    // idle re-run: no reprocessing
    IncrementalIndex.updateDenseIndex(spark, landing, sink, ckpt, cents)
    assert(spark.read.parquet(sink).count() === 50)
  }

  test("incremental dense index keeps the PQ codes artifact in lockstep") {
    import graft.operators.Similarity
    val base = java.nio.file.Files.createTempDirectory("graft_incr_pq")
    val landing = base.resolve("landing").toString
    val sink = base.resolve("store").toString
    val codes = base.resolve("codes").toString
    val ckpt = base.resolve("ckpt").toString
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val cents = Similarity.centroids(emb)
    val cb = Similarity.pqCodebooks(emb, 8, 8, 16)

    emb.filter(col("vec_id") < 30).write.mode("append").parquet(landing)
    IncrementalIndex.updateDenseIndex(spark, landing, sink, ckpt, cents,
      codebooks = Some(cb), codesDir = Some(codes))
    emb.filter(col("vec_id") >= 30 && col("vec_id") < 50)
      .write.mode("append").parquet(landing)
    IncrementalIndex.updateDenseIndex(spark, landing, sink, ckpt, cents,
      codebooks = Some(cb), codesDir = Some(codes))

    // accumulated codes == one-shot batch encode over everything landed
    val got = spark.read.parquet(codes)
      .select("vec_id", "m", "code")
      .collect().map(r => (r.getLong(0), r.getAs[Number]("m").intValue) ->
        r.getAs[Number]("code").intValue).toMap
    val want = Similarity.pqEncode(emb.filter(col("vec_id") < 50), cb, 8, 8)
      .collect().map(r => (r.getLong(0), r.getAs[Number]("m").intValue) ->
        r.getAs[Number]("code").intValue).toMap
    assert(got === want)
    // codes are cell-partitioned like the vector store: probing prunes dirs
    val plan = spark.read.parquet(codes).filter(col("ivf_cell") === 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ivf_cell"),
      s"cell predicate not a partition filter on codes:\n$plan")
    // idle re-run: codes do not grow
    val n = spark.read.parquet(codes).count()
    IncrementalIndex.updateDenseIndex(spark, landing, sink, ckpt, cents,
      codebooks = Some(cb), codesDir = Some(codes))
    assert(spark.read.parquet(codes).count() === n)
  }

  test("incremental refresh loop: streaming sink -> fitted index -> identical scores") {
    import graft.operators.Lexical
    val base = java.nio.file.Files.createTempDirectory("graft_incr_loop")
    val landing = base.resolve("landing").toString
    val sink = base.resolve("postings").toString
    val ckpt = base.resolve("ckpt").toString
    import spark.implicits._
    val b1 = Seq((1L, "spark join table"), (2L, "join scan")).toDF("doc_id", "text")
    val b2 = Seq((3L, "table spark spark")).toDF("doc_id", "text")

    // two maintenance runs land two batches into the postings sink
    b1.write.mode("append").parquet(landing)
    IncrementalIndex.updatePostings(spark, landing, sink, ckpt)
    b2.write.mode("append").parquet(landing)
    IncrementalIndex.updatePostings(spark, landing, sink, ckpt)

    // refresh the fitted index FROM THE SINK (no raw text touched) and
    // search: scores must equal a from-scratch build over the full corpus
    val allDocs = b1.unionByName(b2)
    val fromSink = Lexical.writeIndexFromPostings(spark,
      spark.read.parquet(sink).drop("batch_id"), nDocs = allDocs.count(),
      s"$base/idx_sink", buckets = 2)
    val fromDocs = Lexical.writeIndex(spark, allDocs, "doc_id", "text",
      s"$base/idx_docs", buckets = 2)
    def scores(idx: Lexical.SparseIndex) =
      Lexical.tfidfSearchIndexed(spark, idx, Seq("spark", "join"))
        .collect().map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e9)).toMap
    assert(scores(fromSink) === scores(fromDocs))
    assert(scores(fromSink).keySet === Set(1L, 2L, 3L))
  }
}
