package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S4: raw context corpus scan — the reference globs directories of
  * per-video `.txt` files where LINE POSITION i belongs to keyframe i of
  * that video (reference `object_retrieval.py:147-215`,
  * `utils/semantic_extract.py:88-163`, with numeric-suffix file sort and
  * UTF-8/BOM fallback). The load-bearing positional convention is recovered
  * explicitly here: `input_file_name()` + a per-file line ordinal becomes a
  * real (video_id, ordinal) key, after which everything is ordinary
  * relational data.
  *
  * Note Spark's `spark.read.text` preserves line order *within a file's
  * split*; per-file ordinals are assigned with a window over the file name,
  * ordered by the monotonic split/offset id — correct as long as each file
  * is one split (context files are small; `wholetext` is the fallback for
  * multi-split safety at scale).
  */
object RawContext {

  /** Read a directory of text files into `(video_id, ordinal, line)` where
    * `video_id` is the file basename (extension stripped) and `ordinal` is
    * the 0-based line position within that file. */
  def readOrdinalText(spark: SparkSession, dir: String): DataFrame = {
    val byFile = Window.partitionBy(col("__file"))
      .orderBy(col("__pos"))
    spark.read.text(dir)
      .select(
        regexp_extract(input_file_name(), "([^/]+)\\.[^./]+$", 1).as("__file"),
        monotonically_increasing_id().as("__pos"),
        // BOM fallback: strip a leading UTF-8 BOM if present (reference
        // reads with utf-8-sig)
        regexp_replace(col("value"), "^﻿", "").as("line"))
      .withColumn("ordinal", row_number().over(byFile) - 1)
      .select(col("__file").as("video_id"), col("ordinal"), col("line"))
  }
}
