package graft

import graft.functions.VectorOps
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd-refined PQ codebooks (VERDICT r3/r4 stretch): refinement must
  * quantize at least as tightly as the sampled init at the SAME code
  * budget — Lloyd never increases within-cell distortion — and the tighter
  * cells should carry over to ADC top-k recall vs exact search. */
class PqRefineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = Tables(spark, TestSpark.sfDir, "embeddings")
  private lazy val init = Similarity.pqCodebooks(emb, 8, 8, 16)

  /** Mean squared reconstruction error of the corpus under a codebook:
    * every (row, subspace) subvector vs its assigned code's centroid. */
  private def distortion(cb: DataFrame): Double = {
    val sub = emb.select(col("vec_id"), explode(expr(
      "transform(sequence(0, 7), m -> struct(m AS m, slice(embedding, m*8+1, 8) AS sv))")).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))
    Similarity.pqEncode(emb, cb, 8, 8)
      .join(cb.withColumnRenamed("c", "code"), Seq("m", "code"))
      .join(sub, Seq("vec_id", "m"))
      .agg(avg(VectorOps.sqDist(col("sv"), col("cbv")))).head.getDouble(0)
  }

  /** Mean ADC top-k recall against exact inner-product top-k, averaged
    * over a 20-query batch (single-query recall at K=16 codes is far too
    * noisy to compare codebooks on). */
  private def recall(cb: DataFrame, k: Int = 20, nQueries: Int = 20): Double = {
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exact = Similarity.knnBatch(emb, queries, k)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val adc = Similarity
      .pqAdcScore(Similarity.pqEncode(emb, cb, 8, 8), cb, queries, k)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    exact.map { case (q, ids) => ids.intersect(adc.getOrElse(q, Set.empty)).size.toDouble / k }
      .sum / exact.size
  }

  test("codebook init is id-space agnostic: offset ids still yield a full M x K codebook") {
    // an `id < K` seed filter returns an EMPTY codebook on any corpus whose
    // ids don't cover 0..K-1 (offset, sparse, hashed) and PQ serving
    // silently returns nothing; hash-rank sampling must not care
    val offset = emb.withColumn("vec_id", col("vec_id") + 1000000L)
    val cb = Similarity.pqCodebooks(offset, 8, 8, 16)
    assert(cb.count() === 8L * 16L, "offset-id corpus produced a partial codebook")
    assert(cb.select("c").distinct().count() === 16L)
    // and the seed CHOICE is id-derived, so shifting every id reseeds
    // deterministically — same geometry, full coverage, valid codes
    val codes = Similarity.pqEncode(offset, cb, 8, 8)
    assert(codes.filter(col("code").isNull).count() === 0)
  }

  test("one Lloyd iteration tightens quantization and does not hurt recall") {
    val refined = Similarity.pqRefineCodebooks(emb, init, 8, 8, iters = 1)
    val (d0, d1) = (distortion(init), distortion(refined))
    // Lloyd monotonicity: assign-then-refit cannot increase distortion
    assert(d1 <= d0 + 1e-9, s"refined distortion $d1 > init $d0")
    assert(d1 < d0, s"refinement changed nothing (distortion $d0)")
    val (r0, r1) = (recall(init), recall(refined))
    info(f"distortion $d0%.6f -> $d1%.6f, mean recall@20 $r0%.3f -> $r1%.3f")
    assert(r1 >= r0, s"refined mean recall $r1 dropped below init $r0")
    refined.unpersist()
  }

  test("a second iteration keeps distortion monotone") {
    val one = Similarity.pqRefineCodebooks(emb, init, 8, 8, iters = 1)
    val two = Similarity.pqRefineCodebooks(emb, init, 8, 8, iters = 2)
    assert(distortion(two) <= distortion(one) + 1e-9)
    one.unpersist(); two.unpersist()
  }
}
