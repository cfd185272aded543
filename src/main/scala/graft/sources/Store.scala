package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical storage layout for the corpus tables — where the 100 TB design
  * actually lives (SURVEY §4: "partition keyframes/embeddings by collection,
  * rely on AQE, columnar Parquet+ZSTD").
  *
  *  - Hive-style partitioning by a low-cardinality pruning column
  *    (`collection` ≙ the reference's search-space lists, `label`/cluster-id
  *    ≙ FAISS IVF cells): a partition predicate turns the ANN `nprobe` scan
  *    into directory pruning — the scan never opens non-probed clusters.
  *  - Bucketing by the join id: equi-joins between co-bucketed tables
  *    (embeddings x keyframes x text channels) plan with NO shuffle
  *    exchange on either side — the "co-located join" that replaces the
  *    reference's positional row alignment invariant.
  */
object Store {

  /** Partitioned parquet write (ZSTD). `partitionCols` should be the pruning
    * dimension(s): collection, cluster id. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed+sorted managed table: join-key-co-located storage. */
  def writeBucketed(
      df: DataFrame, table: String, buckets: Int, key: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
