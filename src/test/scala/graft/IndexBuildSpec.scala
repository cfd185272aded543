package graft

import graft.sources.IndexBuild
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IndexBuildSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("denseIds assigns 0..N-1 in key order without a global window") {
    import spark.implicits._
    val df = (1 to 997).map(i => (s"k${1000 - i}", i)).toDF("k", "v")
    val got = IndexBuild.denseIds(df, "id", numPartitions = 7, col("k"))
      .orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq === (0L until 997L))
    // id order == key order
    val keys = got.map(_.getString(1))
    assert(keys.toSeq === keys.sorted.toSeq)
  }

  test("keyframes build: sec arithmetic + shot containment + dense ids") {
    import spark.implicits._
    val listing = Seq(
      ("L21", "L21_V001", 0, 0), ("L21", "L21_V001", 1, 30),
      ("L21", "L21_V001", 2, 75), ("L21", "L21_V002", 0, 10))
      .toDF("collection", "video_id", "frame_n", "frame_idx")
    val fps = Seq(("L21_V001", 25.0), ("L21_V002", 30.0)).toDF("video_id", "fps")
    val shots = Seq(
      ("L21_V001", 0, 0, 40), ("L21_V001", 1, 41, 100), ("L21_V002", 0, 0, 50))
      .toDF("video_id", "shot_id", "start_frame", "end_frame")
    val kf = IndexBuild.keyframes(listing, fps, shots, numPartitions = 2)
      .orderBy("id")
      .select("id", "video_id", "frame_idx", "sec", "shot_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
    assert(kf.toSeq === Seq(
      (0L, "L21_V001", 0, 0.0, 0),
      (1L, "L21_V001", 30, 1.2, 0),
      (2L, "L21_V001", 75, 3.0, 1),
      (3L, "L21_V002", 10, 10 / 30.0, 0)))
  }
}
