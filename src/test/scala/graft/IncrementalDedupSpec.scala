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
}
