package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators. (Engine extension; in the reference all media decoding happens
  * offline in GPU notebooks — CLIP `clip.ipynb`, OCR `ocr.ipynb`, VAD/ASR
  * `audio_*.ipynb` — and the engine only ever sees the extracted columns.)
  *
  * ==STUB boundary==
  * No image/audio codecs exist in this environment, so `decode*` here is a
  * DETERMINISTIC FAKE: metadata is derived from independent md5 substrings
  * of the content bytes. The Spark-side plumbing is the real design and is
  * what's tested: binary column + schema, per-field derivation as codegen'd
  * column expressions, frame expansion via `sequence`/`explode` (a
  * Generator, partition-parallel). In production the fake derivations are
  * replaced by a batched inference stage (`mapPartitions` over Arrow
  * batches / an external encoder service) with the SAME schema contract, so
  * downstream operators are unaffected.
  */
object Multimodal {

  /** Independent small hash fields from disjoint md5 substrings of the
    * binary content (avoids 64-bit division, which DuckDB/Spark round
    * differently at 2^60 scale). */
  private def hslice(c: Column, from: Int, mod: Int): Column =
    conv(substring(md5(c), from, 8), 16, 10).cast("long") % mod

  /** "Decode" image/video metadata from a binary column. */
  def decodeStub(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      (lit(320) + hslice(col(binCol), 1, 1600)).as("width"),
      (lit(240) + hslice(col(binCol), 9, 840)).as("height"),
      (lit(1) + hslice(col(binCol), 17, 240)).as("n_frames"),
      ((hslice(col(binCol), 25, 36000)).cast("double") / 100.0).as("duration_s"))

  /** Frame sampling: one row per sampled frame index (every `every`-th
    * frame), the Generator-shaped expansion used for keyframe extraction. */
  def sampleFrames(meta: DataFrame, every: Int): DataFrame =
    meta.select(col("id"), col("n_frames"),
      explode(expr(s"sequence(0, cast(n_frames - 1 as int), $every)")).as("frame_idx"))

  /** Audio segmentation stub: <=10s ASR windows per clip (the reference's
    * `audio_regconition.ipynb` windowing), computed from the stub duration. */
  def audioSegments(meta: DataFrame, windowS: Double = 10.0): DataFrame =
    meta.select(col("id"), col("duration_s"),
      ceil(col("duration_s") / lit(windowS)).cast("long").as("n_segments"))
}
