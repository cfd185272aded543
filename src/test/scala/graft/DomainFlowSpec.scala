package graft

import graft.functions.VectorOps
import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §A: miniature of the reference's data model (2 collections x
  * 3 videos x 4 shots x 5 keyframes), driven end-to-end through the
  * /textsearch dataflow (SURVEY §3.1) and checked against a brute-force
  * in-test oracle. */
object DomainFixture {
  val collections = Seq("L21", "L22")
  val videosPerCollection = 3
  val shotsPerVideo = 4
  val kfPerShot = 5
  val dim = 8

  case class Kf(id: Long, collection: String, videoId: String, shotId: Int,
    frameN: Int, frameIdx: Int, sec: Double, partitionTag: Int)

  val kfs: Seq[Kf] = {
    var id = -1L
    for {
      c <- collections
      v <- 1 to videosPerCollection
      s <- 0 until shotsPerVideo
      k <- 0 until kfPerShot
    } yield {
      id += 1
      val videoId = f"${c}_V$v%03d"
      val frameIdx = (s * kfPerShot + k) * 30
      Kf(id, c, videoId, s, s * kfPerShot + k, frameIdx, frameIdx / 25.0,
        (id % 4 + 1).toInt)
    }
  }

  /** Deterministic pseudo-embedding: same-shot keyframes cluster. */
  def vec(kf: Kf): Array[Float] = {
    val shotSeed = kf.videoId.hashCode * 31 + kf.shotId
    val raw = Array.tabulate(dim)(j =>
      math.sin(shotSeed * 0.37 + j) + 0.05 * math.sin(kf.id * 0.91 + j))
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(x => (x / n).toFloat)
  }

  def dot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
}

class DomainFlowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import DomainFixture._

  private def keyframesDf: DataFrame = {
    import spark.implicits._
    kfs.map(k => (k.id, k.collection, k.videoId, k.shotId, k.frameN, k.frameIdx,
        k.sec, k.partitionTag))
      .toDF("id", "collection", "video_id", "shot_id", "frame_n", "frame_idx",
        "sec", "partition_tag")
  }

  private def embeddingsDf: DataFrame = {
    import spark.implicits._
    kfs.map(k => (k.id, vec(k))).toDF("id", "clip")
  }

  private def shotsDf: DataFrame = {
    import spark.implicits._
    kfs.groupBy(k => (k.videoId, k.shotId)).toSeq.map { case ((v, s), ks) =>
      (v, s, ks.map(_.id).sorted)
    }.toDF("video_id", "shot_id", "keyframe_ids")
  }

  test("/textsearch dataflow: partition filter + shot-expanded ignore + kNN + group-by-video") {
    val k = 10
    val queryId = 0L
    val ignoreIds = Seq(41L) // expands to its whole shot (reference F3)
    val partition = 1

    // --- engine ---
    val kfDf = keyframesDf
    val emb = embeddingsDf
    val qv = emb.filter(col("id") === queryId).select(col("clip").as("qv"))
    val ignoredShots = kfDf.join(
        spark.createDataFrame(Seq(Tuple1(41L))).toDF("id"), Seq("id"))
      .select(col("video_id"), col("shot_id"))
    val ignoreExpanded = kfDf.join(broadcast(ignoredShots), Seq("video_id", "shot_id"))
      .select(col("id"))
    val candidates = Candidates.exclude(
      kfDf.filter(col("partition_tag") === partition), ignoreExpanded, "id")
    val scored = emb.join(candidates.select("id", "video_id"), Seq("id"))
      .crossJoin(broadcast(qv))
      .select(col("id"), col("video_id"),
        round(VectorOps.dot(col("clip"), col("qv")), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
    val grouped = GroupShaping.groupResults(scored, "video_id", "id", "score")
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](2).toList))

    // --- brute-force oracle over the fixture arrays ---
    val qvec = vec(kfs(queryId.toInt))
    val ignoredShot = kfs.find(_.id == 41L).map(kf => (kf.videoId, kf.shotId)).get
    val expectTop = kfs
      .filter(kf => kf.partitionTag == partition &&
        (kf.videoId, kf.shotId) != ignoredShot)
      .map(kf => (kf.id, kf.videoId,
        BigDecimal(dot(vec(kf), qvec)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (id, _, s) => (-s, id) }
      .take(k)
    val expectGroups = expectTop.groupBy(_._2).toSeq
      .map { case (v, hits) => (v, hits.map(h => (-h._3, h._1)).sorted.map(_._2).toList,
        hits.map(_._3).max) }
      .sortBy { case (v, _, best) => (-best, v) }
      .map { case (v, ids, _) => (v, ids) }

    assert(grouped.toList === expectGroups.toList)
    // sanity: the ignored shot is really gone, partition filter held
    val returned = grouped.flatMap(_._2).toSet
    assert(returned.intersect(
      kfs.filter(kf => (kf.videoId, kf.shotId) == ignoredShot).map(_.id).toSet).isEmpty)
    assert(returned.forall(id => kfs(id.toInt).partitionTag == partition))
  }

  test("T1 temporal re-query: shot-window expansion via the shots table") {
    import spark.implicits._
    val hits = Seq((kfs(7).videoId, kfs(7).shotId, 0.9)).toDF("video_id", "shot_id", "prev_score")
    val range = 2
    // expand [s+1, s+range] forwards (reference search_utils.py:148-158)
    val neighborShots = hits.select(col("video_id"), col("prev_score"),
      explode(sequence(col("shot_id") + 1, col("shot_id") + range)).as("shot_id"))
    val candidateKfs = shotsDf.join(neighborShots, Seq("video_id", "shot_id"))
      .select(col("video_id"), explode(col("keyframe_ids")).as("id"), col("prev_score"))
      .distinct()
    val got = candidateKfs.select("id").as[Long].collect().toSet
    val base = kfs(7)
    val want = kfs.filter(kf => kf.videoId == base.videoId &&
      kf.shotId > base.shotId && kf.shotId <= base.shotId + range).map(_.id).toSet
    assert(got === want)
  }
}
