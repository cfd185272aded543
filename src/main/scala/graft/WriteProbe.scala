package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused wall for the production build's biggest WRITE leg (BASELINE
  * r14 phase table: of the 403 s assign+cells leg, ~290 s is the
  * cell-partitioned parquet write; the int8 leg's 271 s is mostly the
  * same write shape). The suspected mechanism is dynamic-partition file
  * explosion: [[graft.sources.Store.writePartitioned]] called directly
  * on the assign output makes EVERY scan task write a file per cluster
  * it holds (~tasks x nlist files), the same bug r13 fixed in the
  * incremental landing path (`IncrementalIndex.scala` repartitions by
  * the cell column first — "one file per cell") but the batch build
  * path never got.
  *
  * Measures, at the flagship assign geometry (1M x d=768, nlist=4000),
  * the cells-store write four ways from an identical pre-assigned
  * source, reporting wall + output file count:
  *   v0 direct writePartitioned (the current build path), zstd
  *   v1 repartition(col("cluster")) first, zstd
  *   v2 repartition first, snappy
  *   v3 repartition first, uncompressed
  *
  * Run: `java -cp classes:spark-jars graft.WriteProbe [sfDir]
  * [targetRows] [nlist]`. */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val targetRows = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val nlist = args.lift(2).map(_.toInt).getOrElse(4000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Files.createTempDirectory("graft_write").toString

    // the AssignProbe corpus recipe: expand sf0.1 embeddings to 1M x 768
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val baseN = base.count()
    val times = math.max(1, math.ceil(targetRows.toDouble / baseN).toInt)
    val corpus = (0 until times).map { r =>
      val d64 =
        if (r == 0) base
        else {
          val s = 2 * (r % 32) + 1
          base.select((col("vec_id") + lit(r.toLong * 10000000L)).as("vec_id"),
            expr(s"transform(sequence(0, 63), j -> cast(" +
              s"element_at(embedding, cast((j * $s) % 64 + 1 as int)) * " +
              s"(0.5d + pmod(${r}L * 2654435761L + j * 40503L, 1024) / 1024.0d)" +
              s" as float))").as("embedding"))
        }
      d64.select(col("vec_id"),
        expr("flatten(transform(sequence(0, 11), t -> " +
          "transform(embedding, x -> CAST(x * (1.0d + t * 0.01d) AS FLOAT))))")
          .as("embedding"))
    }.reduce(_ unionByName _)
    corpus.write.mode("overwrite").parquet(s"$outDir/emb")
    val emb = spark.read.parquet(s"$outDir/emb")
    val cents = emb.orderBy("vec_id").limit(nlist)
      .select((col("vec_id") % 1000000L).cast("int").as("cluster"),
        col("embedding").as("cv"))
      .persist()
    cents.count()
    // materialize the assignment ONCE to a flat parquet so every write
    // variant starts from the identical (already-assigned) source and
    // pays the same scan cost — the probe isolates the WRITE
    Similarity.assignCellsBulk(emb, cents)
      .write.mode("overwrite").parquet(s"$outDir/assigned")
    val assigned = spark.read.parquet(s"$outDir/assigned")
    println(s"assigned rows: ${assigned.count()}, " +
      s"input partitions: ${assigned.rdd.getNumPartitions}")

    def countFiles(path: String): Long = {
      val root = java.nio.file.Paths.get(path)
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    def timeWrite(name: String)(run: String => Unit): Unit = {
      val path = s"$outDir/cells_$name"
      val t0 = System.nanoTime()
      run(path)
      val wall = (System.nanoTime() - t0) / 1e9
      val du = {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
        try s.mapToLong(p => if (java.nio.file.Files.isRegularFile(p))
          java.nio.file.Files.size(p) else 0L).sum()
        finally s.close()
      }
      println(f"$name%-28s $wall%7.1f s  files=${countFiles(path)}%6d  " +
        f"bytes=${du / 1e9}%.2f GB")
    }

    timeWrite("v0_direct_zstd") { p =>
      assigned.write.mode("overwrite").option("compression", "zstd")
        .partitionBy("cluster").parquet(p)
    }
    timeWrite("v1_repart_zstd") { p =>
      assigned.repartition(col("cluster"))
        .write.mode("overwrite").option("compression", "zstd")
        .partitionBy("cluster").parquet(p)
    }
    timeWrite("v2_repart_snappy") { p =>
      assigned.repartition(col("cluster"))
        .write.mode("overwrite").option("compression", "snappy")
        .partitionBy("cluster").parquet(p)
    }
    timeWrite("v3_repart_none") { p =>
      assigned.repartition(col("cluster"))
        .write.mode("overwrite").option("compression", "none")
        .partitionBy("cluster").parquet(p)
    }
    // the downstream-read side of the same story: one full pass over the
    // store (the shape every post-cells build leg starts with)
    def timeRead(name: String): Unit = {
      val t0 = System.nanoTime()
      val n = spark.read.parquet(s"$outDir/cells_$name")
        .select(count(lit(1)), sum(element_at(col("embedding"), 1))).collect()
      println(f"read $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.1f s " +
        s" (${n.head.getLong(0)} rows)")
    }
    timeRead("v0_direct_zstd")
    timeRead("v1_repart_zstd")
    timeRead("v2_repart_snappy")
    timeRead("v3_repart_none")
    spark.stop()
  }
}
