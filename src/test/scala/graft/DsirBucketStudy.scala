package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** DSIR bucket-fidelity study (VERDICT r8 #5): `dsirFit` defaults to 1024
  * hashed-bigram buckets; the DSIR paper's feature space is 10^4. This
  * study measures, at sf0.1, how the SELECTION (the operator's actual
  * output — the top-N cut) and the weight RANKING move as the bucket
  * space grows 1024 -> 10^4 -> 10^5, to pick a justified default.
  *
  * Run: `sbt "Test/runMain graft.DsirBucketStudy [sfDir]"`.
  * Results are recorded in BASELINE.md ("DSIR bucket fidelity"). */
object DsirBucketStudy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = TestSpark.spark
    val docs = Tables(spark, sfDir, "documents")
    val target = docs.filter(col("source") === "src0")
    val nDocs = docs.count()
    val keep = (nDocs / 10).toInt.max(50)
    println(s"corpus=$nDocs docs, target=src0, keep=$keep (10%)")

    val cuts = Seq(1024, 10000, 100000).map { b =>
      val sel = Curation.dsirSelect(docs, target, targetRows = keep,
          buckets = b)
        .select(col("id"), col("dsir_weight"))
        .collect()
      b -> (sel.map(_.getLong(0)).toSet,
        sel.map(r => r.getLong(0) -> r.getDouble(1)).toMap)
    }
    for (Seq((b1, (s1, w1)), (b2, (s2, _))) <- cuts.combinations(2)) {
      val overlap = (s1 & s2).size.toDouble / keep
      println(f"selection overlap $b1%6d vs $b2%6d buckets: $overlap%.4f")
    }
    // rank stability across the FULL weight ordering, not just the cut:
    // Spearman over the common scored ids of the smallest vs largest space
    val wA = Curation.dsirWeights(docs, target).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val wB = Curation.dsirWeights(docs, target, buckets = 100000).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val common = (wA.keySet & wB.keySet).toSeq.sorted
    def ranks(w: Map[Long, Double]) = common.sortBy(id => (-w(id), id))
      .zipWithIndex.toMap
    val (ra, rb) = (ranks(wA), ranks(wB))
    val n = common.size.toDouble
    val d2 = common.map(id => { val d = ra(id) - rb(id); d.toDouble * d }).sum
    val rho = 1.0 - 6.0 * d2 / (n * (n * n - 1.0))
    println(f"spearman(1024, 100000) over ${common.size} docs: $rho%.4f")
    spark.stop()
  }
}
