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

  /** Multi-split-safe variant: each file is read WHOLE (`wholetext` marks
    * the source non-splittable), so ordinals are exact line positions even
    * for a file that the default reader would break into several input
    * splits — [[readOrdinalText]]'s per-file ordinal recovery assumes one
    * split per file. One row per file -> line split -> posexplode; the
    * trade is per-FILE parallelism and whole-file records in memory, which
    * is the right shape for a scale-up where individual context files grow
    * past the split size while the corpus stays many-files wide. */
  def readOrdinalTextWhole(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      // the line reader yields no rows for an empty file; mirror that
      .filter(length(col("value")) > 0)
      .select(
        regexp_extract(input_file_name(), "([^/]+)\\.[^./]+$", 1).as("video_id"),
        posexplode(split(
          // strip a leading BOM and the final line terminator (a trailing
          // newline ends the last line, it does not open an empty one)
          regexp_replace(regexp_replace(col("value"), "^﻿", ""), "\r?\n$", ""),
          "\r?\n")).as(Seq("ordinal", "line")))
}
