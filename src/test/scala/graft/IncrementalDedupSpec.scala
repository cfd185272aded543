package graft

import graft.streaming.IncrementalIndex
import org.scalatest.funsuite.AnyFunSuite

/** Incremental LSH dedup across maintenance runs: new docs are banded once,
  * joined against the accumulated index, and cross-batch near-dup pairs
  * surface WITHOUT re-shingling earlier batches. */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cross-batch near-dups found; earlier pairs not re-emitted") {
    val landing = java.nio.file.Files.createTempDirectory("graft_idd_land").toString
    val index = java.nio.file.Files.createTempDirectory("graft_idd_idx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_idd_ck").toString
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok7", "tok7x")
    val other = (100 to 130).map(i => s"tok$i").mkString(" ")

    def pairs(): Set[(Long, Long)] =
      spark.read.parquet(s"$index/pairs")
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch 1: docs 1 (base), 2 (near-dup of 1), 9 (unrelated)
    Seq((1L, base), (2L, nearDup), (9L, other)).toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    IncrementalIndex.updateDedup(spark, landing, index, ckpt)
    assert(pairs() === Set((1L, 2L)))

    // batch 2: doc 3 near-dups BOTH earlier docs; doc 4 unrelated
    val nearDup2 = base.replace("tok20", "tok20x")
    Seq((3L, nearDup2), (4L, (200 to 230).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    IncrementalIndex.updateDedup(spark, landing, index, ckpt)
    assert(pairs() === Set((1L, 2L), (1L, 3L), (2L, 3L)))

    // idle run: nothing new lands, nothing changes
    IncrementalIndex.updateDedup(spark, landing, index, ckpt)
    assert(pairs() === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("a zero-shingle first batch does not wedge later runs") {
    // docs under 3 tokens produce no 3-gram shingles: the first batch
    // writes _SUCCESS-only state dirs; later batches must treat that as
    // "no index yet" instead of failing the schema-less read forever
    val landing = java.nio.file.Files.createTempDirectory("graft_idz_land").toString
    val index = java.nio.file.Files.createTempDirectory("graft_idz_idx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_idz_ck").toString
    Seq((1L, "too short"), (2L, "also tiny")).toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    IncrementalIndex.updateDedup(spark, landing, index, ckpt)
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    Seq((3L, base), (4L, base.replace("tok7", "tok7x"))).toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    IncrementalIndex.updateDedup(spark, landing, index, ckpt)
    val pairs = spark.read.parquet(s"$index/pairs").select("i", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((3L, 4L)))
  }

  test("crash replay of a batch is idempotent; file:-URI paths work") {
    // explicit file: URIs — the index-presence check must go through the
    // Hadoop FileSystem API, not java.io.File (which only understands bare
    // local paths and would silently treat hdfs:/s3a: indexes as absent)
    def uri(p: java.nio.file.Path) = p.toUri.toString.stripSuffix("/")
    val landing = uri(java.nio.file.Files.createTempDirectory("graft_idr_land"))
    val index = uri(java.nio.file.Files.createTempDirectory("graft_idr_idx"))
    val ckptPath = java.nio.file.Files.createTempDirectory("graft_idr_ck")
    val ckpt = uri(ckptPath)
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")

    Seq((1L, base), (2L, base.replace("tok7", "tok7x"))).toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    IncrementalIndex.updateDedup(spark, landing, index, ckpt)

    // compare pairs WITH their jaccard values: a replay that re-reads its
    // own crashed attempt's shingles as "old" state double-counts sizes
    // and intersections — the (i, j) set can survive that, the scores not
    def state(): (Set[(Long, Long, Double)], Long, Long) = (
      spark.read.parquet(s"$index/pairs").select("i", "j", "jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e9))).toSet,
      spark.read.parquet(s"$index/shingles").count(),
      spark.read.parquet(s"$index/buckets").count())
    assert(state()._1.map(p => (p._1, p._2)) === Set((1L, 2L)))

    // snapshot the checkpoint BEFORE batch 2 commits, land batch 2, run
    val ckptBackup = java.nio.file.Files.createTempDirectory("graft_idr_ckbk")
    org.apache.commons.io.FileUtils.copyDirectory(ckptPath.toFile, ckptBackup.toFile)
    Seq((3L, base.replace("tok20", "tok20x"))).toDF("doc_id", "text")
      .write.mode("append").parquet(landing)
    IncrementalIndex.updateDedup(spark, landing, index, ckpt)
    val afterBatch2 = state()
    assert(afterBatch2._1.map(p => (p._1, p._2)) === Set((1L, 2L), (1L, 3L), (2L, 3L)))

    // crash simulation: restore the pre-batch-2 checkpoint (sink writes
    // landed, commit did not) and re-run — foreachBatch REPLAYS the same
    // batch; the per-batch partition overwrite must leave pairs, shingles
    // and buckets bit-identical instead of duplicating them
    org.apache.commons.io.FileUtils.deleteDirectory(ckptPath.toFile)
    org.apache.commons.io.FileUtils.copyDirectory(ckptBackup.toFile, ckptPath.toFile)
    IncrementalIndex.updateDedup(spark, landing, index, ckpt)
    assert(state() === afterBatch2)
  }
}
