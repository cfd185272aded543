package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the primitive-kernel [[Similarity.gramMatrixRaw]] against
  * its declarative posexplode oracle [[Similarity.gramMatrixRawExplode]] —
  * the KmeansSpec bulk==chunked pattern for the Gram fit. Parity is on the
  * RAW decimal(,12) sums (compareTo == 0), not a rounded view, so the
  * fast-path rounding, the long-unit accumulation, and the overflow spill
  * lane are all pinned to the engine's own cast semantics. */
class GramKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap

  private def assertParity(vecs: org.apache.spark.sql.DataFrame): Unit = {
    val kernel = toMap(Similarity.gramMatrixRaw(vecs, "embedding"))
    val oracle = toMap(Similarity.gramMatrixRawExplode(vecs, "embedding"))
    assert(kernel.keySet === oracle.keySet)
    oracle.foreach { case (k, v) =>
      assert(v.compareTo(kernel(k)) === 0,
        s"kernel drift at $k: kernel=${kernel(k)} oracle=$v")
    }
  }

  test("kernel == explode on mixed-sign pseudo-random vectors") {
    val vecs = (0L until 64L).map { i =>
      (i, Array.tabulate(12) { j =>
        val s = if ((i + j) % 3 == 0) -1.0f else 1.0f
        s * (((i * 31 + j * 17) % 97).toFloat / 97.0f + 0.001f * j)
      })
    }.toDF("vec_id", "embedding")
    assertParity(vecs)
  }

  test("kernel == explode on power-of-two coords (exact decimal products)") {
    val vecs = (0L until 16L).map { i =>
      (i, Array.tabulate(6)(j => math.pow(2.0, -(j + (i % 4)).toDouble).toFloat *
        (if (i % 2 == 0) 1 else -1)))
    }.toDF("vec_id", "embedding")
    assertParity(vecs)
  }

  test("kernel == explode on tiny magnitudes near the 1e-12 rounding grain") {
    val vecs = (0L until 24L).map { i =>
      (i, Array.tabulate(5)(j => (1e-6 * ((i * 13 + j * 7) % 19 + 1) *
        (if (j % 2 == 0) 1 else -1)).toFloat))
    }.toDF("vec_id", "embedding")
    assertParity(vecs)
  }

  test("overflow spill lane: huge coords exceed long units, stay decimal-exact") {
    // products ~9e6 -> ~9e18 of the 1e-12 units each: the second add
    // overflows a long and must route through the BigDecimal spill
    val vecs = (0L until 6L).map { i =>
      (i, Array(3000.0f + i, -2999.0f - i))
    }.toDF("vec_id", "embedding")
    assertParity(vecs)
  }

  test("ragged + null vectors match the explode form's row semantics") {
    val rows = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(0.5f, -0.5f)),          // shorter row: pairs beyond 2x2 absent
      (3L, null.asInstanceOf[Array[Float]]),
      (4L, Array(0.1f, 0.2f, 0.3f)))
    val vecs = rows.toDF("vec_id", "embedding")
    assertParity(vecs)
    // d x d keys from the longest row, none from the null row
    val keys = toMap(Similarity.gramMatrixRaw(vecs, "embedding")).keySet
    assert(keys === (for (i <- 0 until 3; j <- 0 until 3) yield (i, j)).toSet)
  }

  test("empty corpus produces an empty Gram from both forms") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    assert(Similarity.gramMatrixRaw(empty, "embedding").count() === 0L)
    assert(Similarity.gramMatrixRawExplode(empty, "embedding").count() === 0L)
  }

  test("downstream fit is unchanged: pcaPowerFit still recovers the planted axis") {
    val emb = (0L until 30L).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      (i, Array(s * 1.0f, (((i % 5) - 2) / 50.0f), 0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val got = Similarity.pcaPowerFit(emb, "embedding", iters = 8)
      .orderBy("pos").collect()
    val v = got.map(_.getAs[Double]("pc"))
    assert(math.abs(math.abs(v(0)) - 1.0) < 1e-3)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-6)
  }
}
