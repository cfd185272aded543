package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Resolved-HANDLE memo (r18): `spark.read.parquet` runs a schema
    * inference / listing job (~30 ms) on EVERY call, and every query
    * calls this 1-3 times — resolving each table once per (session,
    * path, mtime) removes that fixed per-query driver cost. The memo
    * holds a LAZY DataFrame only (no data; every action still scans the
    * files); the mtime key re-resolves when the driver regenerates the
    * testdata in place. */
  private val handles =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (Long, DataFrame)]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    // mtime lives in the VALUE, not the key (ADVICE r18): a regenerated
    // table replaces its superseded handle instead of pinning every
    // (path, mtime) generation in the map for the JVM lifetime
    val mtime = new java.io.File(path).lastModified()
    handles.compute((spark, path), (_, prev) =>
      if (prev != null && prev._1 == mtime) prev
      else (mtime, normalizeTs(spark.read.parquet(path))))._2
  }

  /** Normalize an events-style `ts` column to the session TIMESTAMP type at
    * MICROS precision, whatever physical type the generator wrote:
    * TIMESTAMP(NANOS) — read as long nanos under the session's
    * `spark.sql.legacy.parquet.nanosAsLong` — truncates to micros;
    * TIMESTAMP_NTZ (micros) casts to TIMESTAMP (the sessions here run in
    * UTC, where the NTZ wall-clock IS the instant — the same reading
    * DuckDB's native TIMESTAMP gives the column, so both engines' boundary
    * comparisons stay identical); a plain TIMESTAMP passes through. Used
    * by every batch AND streaming events reader — the generated data has
    * shipped both layouts across rounds. */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema.fields.find(_.name == tsCol).map(_.dataType) match {
      case Some(LongType) =>
        // integer `div`, not `/`: double division rounds the microsecond
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => df
    }
}
