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

  test("morton key interleaves bits; z-ordered files stay tight on BOTH dims") {
    import spark.implicits._
    // morton(3, 1): x bits at even positions, y bits at odd -> 1+2+4 = 7
    val m = Seq((3, 1)).toDF("a", "b")
      .select(Store.mortonKey(col("a"), col("b"))).head.getLong(0)
    assert(m === 7L)
    // 64x64 uniform grid; z-order into 8 files vs sort by a only
    val grid = spark.range(4096)
      .select((col("id") % 64).cast("int").as("a"), (col("id") / 64).cast("int").as("b"))
    def avgSpanB(path: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max("b") - min("b")).as("span"))
        .collect().map(_.getAs[Number]("span").doubleValue())
      spans.sum / spans.length
    }
    val zPath = java.nio.file.Files.createTempDirectory("graft_z").toString
    Store.writeZOrdered(grid, zPath, "a", "b", partitions = 8)
    val aPath = java.nio.file.Files.createTempDirectory("graft_a").toString
    grid.repartitionByRange(8, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(aPath)
    // sorting by `a` alone leaves each file spanning (nearly) all of b;
    // z-ordering keeps every file a compact block in both dimensions
    assert(avgSpanB(zPath) < 0.6 * avgSpanB(aPath),
      s"z=${avgSpanB(zPath)} vs a-sorted=${avgSpanB(aPath)}")
  }

  test("bucketed fitted index: term-bucket pruning + exchange-free artifact join") {
    import spark.implicits._
    val docs = (1L to 50L).map { i =>
      (i, (0 to 9).map(k => s"w${(i * 3 + k) % 23}").mkString(" "))
    }.toDF("doc_id", "text")
    val idx = graft.operators.Lexical
      .writeIndexTables(spark, docs, "doc_id", "text", "sx_idx", buckets = 8)
    // searches against table-backed artifacts score identically to the
    // path-backed form
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_cmp").toString
    val pathIdx = graft.operators.Lexical.writeIndex(spark, docs, "doc_id", "text", dir, 4)
    val terms = Seq("w1", "w5")
    def r6(i: graft.operators.Lexical.SparseIndex) =
      graft.operators.Lexical.tfidfSearchIndexed(spark, i, terms)
        .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e6))).toSet
    assert(r6(idx) === r6(pathIdx))
    // bucket pruning: the query-term IN filter selects a strict subset of
    // the 8 term buckets
    val search = graft.operators.Lexical.tfidfSearchIndexed(spark, idx, terms)
    search.collect()
    val plan = search.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of 8".r.findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning in:\n$plan")
    assert(sel.get.group(1).toInt < 8, s"IN filter pruned nothing:\n$plan")
    // co-bucketed postings x docFreq join: no exchange on either side
    val j = idx.postings.hint("merge").join(idx.docFreq, Seq("term"))
    assert(!j.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
      "co-bucketed artifact join should not shuffle")
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

  test("composite-key bucketed minhash store: candidate self-join is exchange-free") {
    import graft.operators.Dedup
    val docs = Tables(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val hashed = Dedup.shingles(docs, "doc_id", "text")
      .select(col("id"), Dedup.hash60(col("s")).as("hv"))
    val buckets = Dedup.minhashBucketsFromHashes(hashed, 16, 2)
    Store.writeBucketedMulti(buckets, "mh_buckets", 4, "band", "bucket")
    val stored = spark.table("mh_buckets")
    val cands = Dedup.lshCandidates(stored.hint("merge"))
    val plan = cands.queryExecution.executedPlan.toString
    // the (band, bucket) self-join must ride the bucketed layout: the
    // ONLY hash exchange left is the distinct on (i, j) ABOVE the join
    // (unbucketed, both join inputs shuffle too)
    val nEx = "Exchange hashpartitioning".r.findAllMatchIn(plan).length
    assert(nEx <= 1,
      s"bucketed candidate join should only shuffle for distinct, saw $nEx:\n$plan")
    // and the stored layout changes no values
    val want = Dedup.lshCandidates(buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }
}
