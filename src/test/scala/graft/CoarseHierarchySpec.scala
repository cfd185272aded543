package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-level coarse quantizer ([[Similarity.buildCoarseHierarchy]] /
  * [[Similarity.probeCellsTwoLevel]] — the FAISS IMI analog that bounds
  * the driver at sqrt(nlist) instead of nlist):
  *
  *  - the grouped level-2 store partitions the centroid table without
  *    loss (every centroid lands in exactly one group);
  *  - at FULL level-1 probe the two-level probe equals [[probeCells]]
  *    exactly, at every nprobe depth — same rounded-dot ordering, same
  *    lower-id tiebreaks (the parity contract that makes the hierarchy
  *    a drop-in for the flat probe when the driver can afford flat);
  *  - at partial level-1 probe the result is a subset drawn only from
  *    the probed groups (the IMI coverage trade, explicit not silent);
  *  - the level-1 table is sqrt-scale: groups ~ ceil(sqrt(nlist)). */
class CoarseHierarchySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture() = {
    val emb = Tables(spark, TestSpark.sfDir, "embeddings").limit(400)
    val out = java.nio.file.Files.createTempDirectory("graft_coarse2").toString
    val cents = Similarity.kmeansFit(emb, 25, iters = 2)
    cents.coalesce(1).write.mode("overwrite").parquet(s"$out/centroids")
    cents.unpersist()
    val centArt = spark.read.parquet(s"$out/centroids")
    val (l1, l2) = Similarity.buildCoarseHierarchy(centArt, out)
    (emb, centArt, l1, l2)
  }

  test("grouped store partitions the centroids losslessly at sqrt scale") {
    val (_, centArt, l1, l2) = fixture()
    val nlist = centArt.count()
    assert(l1.count() <= math.ceil(math.sqrt(nlist.toDouble)).toLong)
    assert(l2.count() === nlist)
    val flat = centArt.select("cluster").collect().map(_.getInt(0)).toSet
    val grouped = l2.select("cluster").collect().map(_.getInt(0)).toSet
    assert(grouped === flat)
    // every group id in l2 exists in l1 (the probe's partition filter
    // can reach every centroid)
    val gids = l1.select("gid").collect().map(_.getInt(0)).toSet
    val used = l2.select("gid").distinct().collect().map(_.getInt(0)).toSet
    assert(used.subsetOf(gids))
  }

  test("full level-1 probe == flat probeCells at every depth") {
    val (emb, centArt, l1, l2) = fixture()
    val groups = l1.count().toInt
    val nlist = centArt.count().toInt
    for (q <- Seq(0L, 7L, 42L); np <- Seq(1, 3, 8, nlist)) {
      val qDf = emb.filter(col("vec_id") === q)
        .select(col("embedding").as("qv"))
      val flat = Similarity.probeCells(centArt, qDf, np)
      val two = Similarity.probeCellsTwoLevel(l1, l2, qDf, groups, np)
      assert(two === flat, s"two-level(full l1) != flat at q=$q np=$np")
    }
  }

  test("partial level-1 probe draws only from the probed groups") {
    val (emb, _, l1, l2) = fixture()
    val qDf = emb.filter(col("vec_id") === 3L)
      .select(col("embedding").as("qv"))
    val got = Similarity.probeCellsTwoLevel(l1, l2, qDf, nprobeL1 = 2,
      nprobe = 100)
    // recompute the 2 probed groups' membership directly
    val gids = l1.crossJoin(qDf)
      .select(col("gid"),
        round(graft.functions.VectorOps.dot(col("gv"), col("qv")), 6)
          .as("gs"))
      .orderBy(col("gs").desc, col("gid").asc).limit(2)
      .collect().map(_.getInt(0)).toSeq
    val member = l2.filter(col("gid").isin(gids: _*))
      .select("cluster").collect().map(_.getInt(0)).toSet
    assert(got.nonEmpty && got.toSet.subsetOf(member))
  }
}
