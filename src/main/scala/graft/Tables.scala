package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * The reference engine loads its corpus from FAISS `.bin` + JSON dicts with a
  * load-bearing positional row<->id convention (reference
  * `utils/faiss_processing.py:30-51`, `data_extraction/create_bin.ipynb`).
  * Here every table carries an explicit id column and lives in columnar
  * parquet, so scans get predicate pushdown + column pruning for free and the
  * positional invariant disappears.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS): read as long nanos (session sets
    // spark.sql.legacy.parquet.nanosAsLong) and truncate to micros, the same
    // precision DuckDB's TIMESTAMP uses — keeps both engines' boundary
    // comparisons identical.
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        // integer `div`, not `/`: double division rounds the microsecond
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}
