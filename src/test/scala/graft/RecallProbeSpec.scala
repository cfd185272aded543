package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the invariants of the committed RECALL.md artifact (VERDICT r6 #3):
  * the recall-vs-nprobe curve measured on the PERSISTED index must be
  * monotone non-decreasing, reach exactly 1.0 at full probe (every cell
  * probed == exhaustive exact search, same rounding and tie-breaks), and
  * scan monotonically more rows as nprobe grows. */
class RecallProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("recall@full-probe == 1.0 and the curve is monotone in nprobe") {
    val cv = RecallProbe.curve(spark, TestSpark.sfDir, k = 10, nQueries = 10)
    assert(cv.nonEmpty)
    assert(cv.last._2 === 1.0,
      s"full probe must equal exact search, got recall ${cv.last._2}")
    assert(cv.sliding(2).forall { case Seq((_, r1, _), (_, r2, _)) => r2 >= r1 - 1e-12
                                  case _ => true },
      s"recall not monotone: ${cv.map(_._2)}")
    assert(cv.sliding(2).forall { case Seq((_, _, s1), (_, _, s2)) => s2 >= s1
                                  case _ => true },
      s"rows scanned not monotone: ${cv.map(_._3)}")
    // full probe scans the whole corpus — the curve's cost axis is honest
    val total = Tables(spark, TestSpark.sfDir, "embeddings").count()
    assert(cv.last._3 === total)
  }

  test("the PERSISTED default nprobe meets the recall floor (recall@20 >= 0.8, VERDICT r6 #5)") {
    val idx = SparkEntry.DenseArtifacts.ivf(spark, TestSpark.sfDir)
    val np = idx.defaultNprobe.getOrElse(
      fail("index params artifact carries no default_nprobe"))
    val nlist = idx.centroids.count().toInt
    // the default is a real probe budget, not a trivial full scan
    assert(np >= 1 && np < nlist, s"calibrated default $np of $nlist cells")
    // measured on the persisted artifacts with the committed curve
    // protocol (k=20, 20-query batch) — a future geometry change that
    // ships a bad serving default fails HERE, not in production
    val cv = RecallProbe.curve(spark, TestSpark.sfDir, k = 20, nQueries = 20)
    val atDefault = cv.find(_._1 == np).map(_._2).getOrElse(
      fail(s"curve has no nprobe=$np row"))
    assert(atDefault >= 0.8,
      f"recall@20 at the persisted default nprobe=$np is $atDefault%.3f < 0.8")
  }
}
