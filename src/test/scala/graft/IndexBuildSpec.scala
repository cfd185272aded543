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

  test("intervalOverlapJoin equals brute force and emits each pair once") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    // long intervals spanning several 1h buckets
    def iv() = { val s = rnd.nextInt(100000); (s.toLong, (s + 1 + rnd.nextInt(20000)).toLong) }
    val as = (1 to 40).map { i => val (s, e) = iv(); (i.toLong, s * 1000000L, e * 1000000L) }
    val bs = (1 to 40).map { i => val (s, e) = iv(); (i.toLong, s * 1000000L, e * 1000000L) }
    val aDf = as.toDF("aid", "s", "e")
      .select(col("aid"), timestamp_micros(col("s")).as("as_"), timestamp_micros(col("e")).as("ae"))
    val bDf = bs.toDF("bid", "s", "e")
      .select(col("bid"), timestamp_micros(col("s")).as("bs"), timestamp_micros(col("e")).as("be"))
    val got = graft.operators.TemporalJoins
      .intervalOverlapJoin(aDf, col("as_"), col("ae"), bDf, col("bs"), col("be"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.distinct.length) // no duplicate pair emission
    val want = for {
      (ai, s1, e1) <- as; (bi, s2, e2) <- bs if s1 < e2 && s2 < e1
    } yield (ai, bi)
    assert(got.toSet === want.toSet)
  }

  test("audio-image bridge: overlap join scattered to keyframe ids") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ts(sec: Long) = sec * 1000000L
    val audio = Seq(("V1", 100L, ts(0), ts(12)), ("V1", 101L, ts(30), ts(45)))
      .toDF("video_id", "audio_id", "s", "e")
      .select(col("video_id"), col("audio_id"),
        timestamp_micros(col("s")).as("a_start"), timestamp_micros(col("e")).as("a_end"))
    val shots = Seq(
      ("V1", 0, ts(0), ts(10), Seq(1L, 2L)),
      ("V1", 1, ts(10), ts(20), Seq(3L)),
      ("V1", 2, ts(40), ts(60), Seq(4L, 5L)))
      .toDF("video_id", "shot_id", "s", "e", "keyframe_ids")
      .select(col("video_id"), col("shot_id"),
        timestamp_micros(col("s")).as("s_start"), timestamp_micros(col("e")).as("s_end"),
        col("keyframe_ids"))
    val got = IndexBuild.audioImageBridge(audio, shots)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // audio 100 [0,12) overlaps shots 0 and 1 -> kfs 1,2,3; audio 101 [30,45) overlaps shot 2 -> 4,5
    assert(got === Set((100L, 1L), (100L, 2L), (100L, 3L), (101L, 4L), (101L, 5L)))
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

  test("applyDeletes sweeps one delete set across every artifact") {
    import spark.implicits._
    val facts = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val post = Seq((1L, "t1"), (2L, "t2"), (3L, "t3"), (3L, "t4")).toDF("doc", "term")
    val dels = Seq(Tuple1(2L), Tuple1(3L)).toDF("id")
    val out = IndexBuild.applyDeletes(
      Map("facts" -> (facts, "id"), "postings" -> (post, "doc")), dels)
    assert(out("facts").select("id").collect().map(_.getLong(0)).toSet === Set(1L))
    assert(out("postings").select("doc").collect().map(_.getLong(0)).toSet === Set(1L))
  }
}
