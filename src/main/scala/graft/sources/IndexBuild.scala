package graft.sources

import graft.operators.TemporalJoins
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Offline index build (§7 step 9): assemble the §1 keyframe fact table from
  * extractor outputs, the way the reference's `data_preparation.ipynb`
  * does imperatively — but as distributed jobs:
  *
  *  - dense global id = `dict(enumerate(sorted(...)))` (cells 5-6)
  *    -> [[denseIds]]: range-partition on the sort key, count partitions,
  *    offset-prefix-sum on the driver, per-partition local enumeration. Two
  *    passes, no single-reducer window, ids dense 0..N-1 in key order.
  *  - sec = frame_idx / fps (cell 5) -> column arithmetic after a broadcast
  *    join with the fps dimension;
  *  - shot assignment (implicit via `lst_keyframe_idxs`) -> an
  *    interval-containment join of frames against shot ranges.
  */
object IndexBuild {

  /** Dense 0..N-1 ids in `sortCols` order, assigned scalably: no global
    * window, no single partition. The per-partition counts (numPartitions
    * longs) are the only driver-side data. */
  def denseIds(
      df: DataFrame, idCol: String, numPartitions: Int, sortCols: Column*): DataFrame = {
    val sorted = df.repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = sorted.rdd
    val counts = rdd.mapPartitionsWithIndex { (pid, it) =>
      Iterator((pid, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val withIds = rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = offsets(pid) - 1
      it.map { r => i += 1; Row.fromSeq(i +: r.toSeq) }
    }
    df.sparkSession.createDataFrame(withIds,
      StructType(StructField(idCol, LongType, nullable = false) +: sorted.schema.fields))
  }

  /** Build the audio<->image bridge (J3, `audio_id2img_id.json`): speech
    * intervals overlap-joined to shot time ranges, exploded to the shots'
    * keyframe ids. `audio`: (video_id, audio_id, a_start, a_end TIMESTAMP);
    * `shots`: (video_id, shot_id, s_start, s_end TIMESTAMP,
    * keyframe_ids ARRAY<BIGINT>). */
  def audioImageBridge(audio: DataFrame, shots: DataFrame): DataFrame =
    TemporalJoins.intervalOverlapJoin(
        audio, col("a_start"), col("a_end"),
        shots, col("s_start"), col("s_end"),
        equiKeys = Seq("video_id"))
      .select(col("audio_id"), explode(col("keyframe_ids")).as("img_id"))
      .distinct()

  /** Assemble the keyframe fact table.
    * `listing`: (collection, video_id, frame_n, frame_idx) from the keyframe
    * file scan; `fps`: (video_id, fps); `shots`: (video_id, shot_id,
    * start_frame, end_frame). */
  def keyframes(
      listing: DataFrame, fps: DataFrame, shots: DataFrame,
      numPartitions: Int = 32): DataFrame = {
    val withSec = listing
      .join(broadcast(fps), Seq("video_id"))
      .withColumn("sec", col("frame_idx").cast("double") / col("fps"))
      .drop("fps")
    // shot containment: start_frame <= frame_idx <= end_frame, equi on video
    val withShot = withSec.join(shots,
        withSec("video_id") === shots("video_id") &&
          withSec("frame_idx") >= shots("start_frame") &&
          withSec("frame_idx") <= shots("end_frame"),
        "left")
      .drop(shots("video_id"))
      .drop("start_frame", "end_frame")
    denseIds(withShot, "id", numPartitions,
      col("collection"), col("video_id"), col("frame_idx"))
  }

  /** Deletion propagation: one delete set applied consistently to EVERY
    * index artifact (fact table, embedding table, postings, bridges, ...) —
    * the right-to-be-forgotten sweep a production index needs. Each
    * artifact is a broadcast anti-join on its own id column: one pass per
    * artifact, no shuffle of the artifacts, and the delete set is the only
    * data that moves. Returns the cleaned artifacts keyed as given. */
  def applyDeletes(
      artifacts: Map[String, (DataFrame, String)],
      deleteIds: DataFrame): Map[String, DataFrame] = {
    val ids = deleteIds.select(col(deleteIds.columns.head).as("__del_id"))
    artifacts.map { case (name, (df, idCol)) =>
      name -> df.join(broadcast(ids), df(idCol) === col("__del_id"), "left_anti")
    }
  }
}
