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

  test("accumulated signature store == one-shot batch index (the two halves of one artifact)") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions._
    val landing = java.nio.file.Files.createTempDirectory("graft_idd2_land").toString
    val index = java.nio.file.Files.createTempDirectory("graft_idd2_idx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_idd2_ck").toString
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base.replace("tok7", "tok7x")),
      (3L, (100 to 130).map(i => s"q$i").mkString(" ")),
      (4L, base.replace("tok20", "tok20x")))
    // land in two batches through the incremental maintenance path
    docs.take(2).toDF("doc_id", "text").write.mode("append").parquet(landing)
    IncrementalIndex.updateDedup(spark, landing, index, ckpt)
    docs.drop(2).toDF("doc_id", "text").write.mode("append").parquet(landing)
    IncrementalIndex.updateDedup(spark, landing, index, ckpt)
    // the accumulated shingle/bucket tables equal the one-shot build over
    // the same corpus — the batch MinhashArtifacts and the streaming
    // store are the SAME index, maintained two ways
    val all = docs.toDF("doc_id", "text")
    val sh = Dedup.shingles(all, "doc_id", "text")
    val wantHashes = sh.select(col("id"), Dedup.hash60(col("s")).as("hv"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotHashes = spark.read.parquet(s"$index/shingles")
      .select(col("id"), col("hv"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotHashes === wantHashes)
    val wantBuckets = Dedup.minhashBuckets(sh, 16, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gotBuckets = spark.read.parquet(s"$index/buckets")
      .select(col("id"), col("band"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotBuckets === wantBuckets)
    // ...and serving the artifact-fed pair query from the ACCUMULATED
    // tables returns exactly the one-shot pipeline's pairs
    val served = Dedup.minhashLshPairsFromIndex(
        spark.read.parquet(s"$index/shingles").select(col("id"), col("hv")),
        spark.read.parquet(s"$index/buckets").select(col("id"), col("band"), col("bucket")))
      .select(col("i"), col("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = Dedup.minhashLshPairs(all, "doc_id", "text")
      .select(col("i"), col("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served === oneShot)
  }

  test("incremental span-dedup: cross-batch spans marked, first copies exempt, replay-idempotent") {
    import org.apache.spark.sql.functions._
    val landing = java.nio.file.Files.createTempDirectory("graft_isd_land").toString
    val index = java.nio.file.Files.createTempDirectory("graft_isd_idx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_isd_ck").toString
    def spans(): Set[(Long, Long, Long, Long)] =
      // an all-empty store (no batch marked anything yet) is a
      // _SUCCESS-only layout whose schema-less read throws — that is
      // "no spans", not an error
      try spark.read.parquet(s"$index/spans")
        .select("doc_id", "span_start", "span_end", "n_shingles")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          Set.empty[(Long, Long, Long, Long)]
      }

    // batch 1: two disjoint docs -> nothing marked, hashes indexed
    Seq((1L, "a b c d e f g h"), (2L, "q r s t u v"))
      .toDF("doc_id", "text").write.mode("append").parquet(landing)
    IncrementalIndex.updateSpanDedup(spark, landing, index, ckpt)
    assert(spans() === Set.empty)

    // snapshot the checkpoint BEFORE batch 2 commits (crash simulation)
    val ckptBackup = java.nio.file.Files.createTempDirectory("graft_isd_ckbk")
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(ckpt), ckptBackup.toFile)

    // batch 2: doc 3 repeats doc 1's run (cross-batch, never re-shingling
    // doc 1) and doc 4 repeats doc 3's fresh tail (within-batch, batch
    // first exempt)
    Seq((3L, "x y z a b c d e f w1 w2 w3 w4 w5"),
        (4L, "n1 n2 n3 w1 w2 w3 w4 w5"))
      .toDF("doc_id", "text").write.mode("append").parquet(landing)
    IncrementalIndex.updateSpanDedup(spark, landing, index, ckpt)
    // doc 3: shingles at st=4,5 ("a b c d e", "b c d e f") hit the index
    // -> span tokens 4..9; doc 4: "w1..w5" at st=4 first occurred in doc 3
    // THIS batch -> span 4..8
    val want = Set((3L, 4L, 9L, 2L), (4L, 4L, 8L, 1L))
    assert(spans() === want)

    // nothing new -> no-op run, spans unchanged
    IncrementalIndex.updateSpanDedup(spark, landing, index, ckpt)
    assert(spans() === want)

    // crash replay: restore the pre-batch-2 checkpoint (sink writes landed,
    // commit did not) and re-run — the batch's own batch_id= partitions
    // must not read back as "old" state, or doc 3/4's FIRST copies would
    // get flagged on replay; result must be bit-identical
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    org.apache.commons.io.FileUtils.copyDirectory(
      ckptBackup.toFile, new java.io.File(ckpt))
    IncrementalIndex.updateSpanDedup(spark, landing, index, ckpt)
    assert(spans() === want)
    // the replay rewrote its own batch partition instead of appending a
    // second copy of the batch's hashes
    val perBatch = spark.read.parquet(s"$index/shingle_hashes")
      .groupBy("batch_id", "__h").count().filter(col("count") > 1).count()
    assert(perBatch === 0, "replay duplicated hashes inside a batch partition")
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
