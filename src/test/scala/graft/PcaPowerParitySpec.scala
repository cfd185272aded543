package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the driver-local power iteration against the declarative
  * SQL twin ([[Similarity.powerIterateSql]]) — every intermediate of the
  * trajectory (matvec decimal sums, round-8 normalize, Rayleigh quotient)
  * must agree to the EXACT double, or the fit would drift from the
  * unrolled oracle CTEs that sim_pca_* verify. */
class PcaPowerParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(n: Int, d: Int) = (0L until n.toLong).map { i =>
    (i, Array.tabulate(d) { j =>
      val s = if ((i + j) % 3 == 0) -1.0f else 1.0f
      s * (((i * 31 + j * 17) % 97).toFloat / 97.0f + 0.001f * j)
    })
  }.toDF("vec_id", "embedding")

  private def run(g: org.apache.spark.sql.DataFrame, iters: Int) = {
    val (vL, rL) = Similarity.powerIterate(g, iters, 8)
    val (vS, rS) = Similarity.powerIterateSql(g, iters, 8)
    val local = vL.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val sql = vS.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    (local, sql, rL.head().getDouble(0), rS.head().getDouble(0))
  }

  test("local == SQL trajectory on a generic Gram, several iteration counts") {
    val g = Similarity.gramMatrix(vecs(40, 8), "embedding")
    for (iters <- Seq(1, 3, 6)) {
      val (local, sql, eL, eS) = run(g, iters)
      assert(local.keySet === sql.keySet)
      local.foreach { case (i, v) =>
        assert(java.lang.Double.doubleToLongBits(v) ===
          java.lang.Double.doubleToLongBits(sql(i)),
          s"iters=$iters v($i): local=$v sql=${sql(i)}")
      }
      assert(java.lang.Double.doubleToLongBits(eL) ===
        java.lang.Double.doubleToLongBits(eS), s"iters=$iters eigval: $eL vs $eS")
    }
  }

  test("local == SQL on a near-degenerate Gram (single dominant axis)") {
    val emb = (0L until 20L).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      (i, Array(s * 1.0f, 1e-4f * (i % 3), 0.0f))
    }.toDF("vec_id", "embedding")
    val g = Similarity.gramMatrix(emb, "embedding")
    val (local, sql, eL, eS) = run(g, 8)
    assert(local === sql)
    assert(eL === eS)
  }

  test("driver-local deflation == SQL deflation for the multi-component fit") {
    val emb = vecs(40, 8)
    def collectComps(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("comp", "pos").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSeq
    val local = collectComps(
      Similarity.pcaTopComponents(emb, "embedding", m = 3, iters = 6))
    val sql = collectComps(
      Similarity.pcaTopComponentsSqlDeflate(emb, "embedding", m = 3, iters = 6))
    assert(local === sql)
  }

  test("empty Gram fails loudly from both forms") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("i",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("j",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("g",
          org.apache.spark.sql.types.DoubleType))))
    val e1 = intercept[IllegalArgumentException] {
      Similarity.powerIterate(empty, 2, 8)
    }
    assert(e1.getMessage.contains("non-empty Gram"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.powerIterateSql(empty, 2, 8)
    }
    assert(e2.getMessage.contains("non-empty Gram"))
  }
}
