package graft

import graft.operators.Similarity
import graft.streaming.IncrementalIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental Gram maintenance: batch-local raw Grams land as batch
  * partitions, the merged store is BIT-EXACT equal to the one-shot Gram of
  * everything landed, and a PCA refresh from the store matches the full
  * refit — without re-reading any earlier batch. */
class IncrementalGramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(ids: Range) = ids.map { i =>
    (i.toLong, Array.tabulate(6)(j => (((i * 7 + j * 5) % 23) / 23.0f)))
  }.toDF("vec_id", "embedding")

  test("accumulated store == one-shot gram, exactly; PCA refresh matches full refit") {
    val landing = java.nio.file.Files.createTempDirectory("graft_igr_land").toString
    val index = java.nio.file.Files.createTempDirectory("graft_igr_idx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_igr_ck").toString

    vecs(0 until 30).write.mode("append").parquet(landing)
    IncrementalIndex.updateGram(spark, landing, index, ckpt)
    vecs(30 until 50).write.mode("append").parquet(landing)
    IncrementalIndex.updateGram(spark, landing, index, ckpt)

    // two batch partitions landed
    val batches = spark.read.parquet(s"$index/gram")
      .select("batch_id").distinct().count()
    assert(batches === 2L)

    def gmap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap
    val store = gmap(IncrementalIndex.loadGram(spark, s"$index/gram"))
    val oneShot = gmap(Similarity.gramMatrixRaw(vecs(0 until 50), "embedding"))
    assert(store.keySet === oneShot.keySet)
    oneShot.foreach { case (k, v) =>
      assert(v.compareTo(store(k)) === 0, s"store drift at $k: $v vs ${store(k)}")
    }

    // PCA refresh from the store == the full one-shot fit, bit-for-bit
    val fromStore = Similarity.pcaPowerFitFromGram(
        Similarity.roundGram(IncrementalIndex.loadGram(spark, s"$index/gram")),
        iters = 5)
      .orderBy("pos").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val full = Similarity.pcaPowerFit(vecs(0 until 50), "embedding", iters = 5)
      .orderBy("pos").collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(fromStore.toSeq === full.toSeq)

    // a third no-new-data run is a no-op (AvailableNow with nothing new)
    IncrementalIndex.updateGram(spark, landing, index, ckpt)
    val after = gmap(IncrementalIndex.loadGram(spark, s"$index/gram"))
    assert(after.forall { case (k, v) => v.compareTo(store(k)) == 0 })
  }

  test("incremental projections equal the one-shot projection of everything landed") {
    val landing = java.nio.file.Files.createTempDirectory("graft_ipr_land").toString
    val index = java.nio.file.Files.createTempDirectory("graft_ipr_idx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ipr_ck").toString
    val all = vecs(0 until 50)
    val comps = Similarity.pcaTopComponents(all, "embedding", m = 2, iters = 6)

    vecs(0 until 30).write.mode("append").parquet(landing)
    IncrementalIndex.updateProjections(spark, landing, index, ckpt, comps)
    vecs(30 until 50).write.mode("append").parquet(landing)
    IncrementalIndex.updateProjections(spark, landing, index, ckpt, comps)

    def pmap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    val store = pmap(IncrementalIndex.loadProjections(spark, s"$index/projections"))
    val oneShot = pmap(Similarity.pcaProjectPacked(all, comps))
    assert(store === oneShot)
    // the accumulated store serves the two-stage path identically to the
    // inline projection
    val qv = all.filter(col("vec_id") === 3).select(col("embedding").as("qv"))
    val viaStore = Similarity.pcaCoarseRefineSearch(all,
        comps.select(col("comp"), col("pos"), col("pc")), qv, kCoarse = 20, k = 5,
        projections = Some(
          IncrementalIndex.loadProjections(spark, s"$index/projections")))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    val inline = Similarity.pcaCoarseRefineSearch(all,
        comps.select(col("comp"), col("pos"), col("pc")), qv, kCoarse = 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(viaStore === inline)
  }
}
