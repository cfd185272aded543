package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Rotation-apply economics probe at real dimensionality (the r11
  * `rotateVectorsPrepared` literal/kernel switch): measures the
  * codegen'd literal-projection path at OPQ-realistic m=16 components
  * (12k coefficient literals) and the mapPartitions kernel at the FULL
  * d=768 rotation (589,824 coefficients — the geometry whose literal
  * form blows past Janino limits and motivated the switch). Run:
  * `java -cp classes:spark-jars graft.RotProbe [sfDir] [times]`. */
object RotProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val times = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // d=768 corpus: 12 scaled tiles of the d=64 table, `times` id-shifted
    // copies (the DimProbe expansion)
    val corpus = (0 until times).map { i =>
      base.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        expr(s"flatten(transform(sequence(0, 11), r -> " +
          s"transform(embedding, x -> CAST(x * (1.0d + r * 0.01d + $i * 0.001d) AS FLOAT))))")
          .as("embedding"))
    }.reduce(_ unionByName _).persist()
    val n = corpus.count()
    def coefs(m: Int): Array[Array[Double]] = Array.tabulate(m, 768) { (c, i) =>
      (((c * 7919L + i * 104729L) % 2000L) - 1000L) / 30000.0
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm both paths
    force(Similarity.rotateVectorsPrepared(corpus, coefs(16)))
    force(Similarity.rotateVectorsKernel(corpus, coefs(16)))
    val tLit16 = (1 to 3).map(_ =>
      time(force(Similarity.rotateVectorsPrepared(corpus, coefs(16))))).min
    val tKer16 = (1 to 3).map(_ =>
      time(force(Similarity.rotateVectorsKernel(corpus, coefs(16))))).min
    val tKer768 = (1 to 3).map(_ =>
      time(force(Similarity.rotateVectorsKernel(corpus, coefs(768))))).min
    println(f"RotProbe ($sfDir x$times = $n rows, d=768)")
    println(f"literal m=16  (12,288 lits):  $tLit16%6.2f s (${tLit16 * 1e3 / n}%.3f ms/row)")
    println(f"kernel  m=16:                 $tKer16%6.2f s (${tKer16 * 1e3 / n}%.3f ms/row)")
    println(f"kernel  m=768 (589,824 coef): $tKer768%6.2f s (${tKer768 * 1e3 / n}%.3f ms/row)")
    spark.stop()
  }
}
