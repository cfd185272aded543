package graft

import graft.operators.{Curation, Eval, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Eval.annQuality]] retrieval metrics, [[Curation.stratifiedSample]]
  * exact quotas, and [[Similarity.pcaPowerFit]] spectral invariants. */
class EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranked(rows: (Long, Long)*) =
    // (query_id, vec_id) in rank order per query
    rows.groupBy(_._1).toSeq.flatMap { case (q, rs) =>
      rs.map(_._2).zipWithIndex.map { case (v, i) => (q, v, i + 1) }
    }.toDF("query_id", "vec_id", "rank")

  test("perfect result set scores 1.0 on every metric") {
    val truth = ranked(1L -> 10L, 1L -> 11L, 1L -> 12L)
    val got = Eval.annQuality(truth, truth, k = 3).collect().head
    assert(got.getAs[Long]("n_hit") === 3L)
    assert(got.getAs[Double]("recall") === 1.0)
    assert(got.getAs[Double]("mrr") === 1.0)
    assert(got.getAs[Double]("ndcg") === 1.0)
  }

  test("zero-hit query stays in the output with recall 0") {
    val truth = ranked(1L -> 10L, 1L -> 11L, 2L -> 20L, 2L -> 21L)
    val ann = ranked(1L -> 10L, 1L -> 11L, 2L -> 98L, 2L -> 99L)
    val got = Eval.annQuality(ann, truth, k = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(2L).getAs[Long]("n_hit") === 0L)
    assert(got(2L).getAs[Double]("recall") === 0.0)
    assert(got(2L).getAs[Double]("mrr") === 0.0)
    assert(got(2L).getAs[Double]("ndcg") === 0.0)
  }

  test("partial hit: metrics reflect the ANN-side rank of the hit") {
    // truth = {10, 11}; ann = {99, 10}: one hit at ann rank 2
    val truth = ranked(1L -> 10L, 1L -> 11L)
    val ann = ranked(1L -> 99L, 1L -> 10L)
    val got = Eval.annQuality(ann, truth, k = 2).collect().head
    assert(got.getAs[Long]("n_hit") === 1L)
    assert(got.getAs[Double]("recall") === 0.5)
    assert(got.getAs[Double]("mrr") === 0.5)
    // dcg = 1/log2(3); idcg = 1/log2(2) + 1/log2(3)
    val expected = (1.0 / (math.log(3) / math.log(2))) /
      (1.0 + 1.0 / (math.log(3) / math.log(2)))
    assert(math.abs(got.getAs[Double]("ndcg") - expected) < 1e-6)
  }

  test("annQuality clips both frames to rank <= k: long frames cannot inflate metrics") {
    // ann carries 4 ranked rows but k=2: rows at rank 3-4 must not count,
    // even though row 3 (id 12) IS in the truth top-2
    val truth = ranked(1L -> 10L, 1L -> 12L)
    val ann = ranked(1L -> 10L, 1L -> 11L, 1L -> 12L, 1L -> 13L)
    val got = Eval.annQuality(ann, truth, k = 2).collect().head
    assert(got.getAs[Long]("n_hit") === 1L, "rank-3 hit must be clipped at k=2")
    assert(got.getAs[Double]("recall") === 0.5)
    // and an over-long truth frame cannot push recall past 1.0
    val longTruth = ranked(1L -> 10L, 1L -> 11L, 1L -> 12L)
    val perfect = Eval.annQuality(ranked(1L -> 10L, 1L -> 11L), longTruth, k = 2)
      .collect().head
    assert(perfect.getAs[Double]("recall") === 1.0)
    assert(perfect.getAs[Double]("ndcg") === 1.0)
  }

  test("annQuality: truth list shorter than k scores a perfect result 1.0 nDCG") {
    // corpus (truth) holds a single relevant item; a perfect ann result
    // must reach nDCG 1.0 (per-query IDCG), not 1/series(k)
    val truth = ranked(1L -> 10L)
    val ann = ranked(1L -> 10L, 1L -> 98L, 1L -> 99L)
    val got = Eval.annQuality(ann, truth, k = 3).collect().head
    assert(got.getAs[Long]("n_hit") === 1L)
    assert(got.getAs[Double]("ndcg") === 1.0, "per-query IDCG must match truth size")
    assert(got.getAs[Double]("mrr") === 1.0)
    // recall uses the SAME per-query denominator: a perfect result on a
    // 1-item truth list is recall 1.0 too, not the inconsistent 1/k
    assert(got.getAs[Double]("recall") === 1.0,
      "recall denominator must be min(k, truth size)")
    // and a MISSED short truth list still scores 0, full-k lists unchanged
    val miss = Eval.annQuality(ranked(1L -> 98L), truth, k = 3).collect().head
    assert(miss.getAs[Double]("recall") === 0.0)
  }

  test("rankCorrelation keeps disjoint-list queries with m = 0 and NULL tau") {
    // query 1 agrees fully; query 2's lists share nothing — the worst
    // disagreement must stay visible, not vanish from the output
    val a = ranked(1L -> 10L, 1L -> 11L, 2L -> 20L, 2L -> 21L)
    val b = ranked(1L -> 10L, 1L -> 11L, 2L -> 88L, 2L -> 89L)
    val got = Eval.rankCorrelation(a, b).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L).getAs[Double]("kendall_tau") === 1.0)
    assert(got(2L).getAs[Long]("m") === 0L)
    assert(got(2L).isNullAt(got(2L).fieldIndex("kendall_tau")))
  }

  test("full-probe IVF serving evaluates to recall 1.0 vs exact") {
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j => (((i * 7 + j * 3) % 11) / 11.0f)))
    }.toDF("vec_id", "embedding")
    val cent = Similarity.kmeansFit(emb, k = 4, iters = 1)
    val queries = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val cells = Similarity.assignCells(emb, cent)
    val ann = Eval.ranked(
      Similarity.ivfSearchBatchPruned(cells, cent, queries, nprobe = 4, k = 5),
      "query_id", "vec_id", "sim")
    val truth = Eval.ranked(Similarity.knnBatch(emb, queries, k = 5),
      "query_id", "vec_id", "sim")
    val got = Eval.annQuality(ann, truth, k = 5).collect()
    assert(got.length === 2)
    got.foreach { r =>
      assert(r.getAs[Double]("recall") === 1.0, s"full probe must be exact: $r")
      assert(r.getAs[Double]("ndcg") === 1.0)
    }
    cent.unpersist()
  }

  test("recall is monotone non-decreasing in nprobe") {
    val emb = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(j => (((i * 13 + j * 5) % 17) / 17.0f)))
    }.toDF("vec_id", "embedding")
    val cent = Similarity.kmeansFit(emb, k = 6, iters = 1)
    val cells = Similarity.assignCells(emb, cent)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val truth = Eval.ranked(Similarity.knnBatch(emb, queries, k = 8),
      "query_id", "vec_id", "sim")
    val byNp = (1 to 6).map { np =>
      val ann = Eval.ranked(
        Similarity.ivfSearchBatchPruned(cells, cent, queries, nprobe = np, k = 8),
        "query_id", "vec_id", "sim")
      np -> Eval.annQuality(ann, truth, k = 8)
        .agg(sum(col("n_hit"))).head().getLong(0)
    }
    byNp.sliding(2).foreach { case Seq((np1, h1), (np2, h2)) =>
      assert(h1 <= h2, s"recall must not drop: nprobe $np1 -> $np2 went $h1 -> $h2")
    }
    assert(byNp.last._2 === 24L, "full probe recalls everything (3 queries x 8)")
    cent.unpersist()
  }

  test("stratifiedSample: exact ceil quota per stratum, deterministic") {
    val docs = ((0L until 100L).map(i => (i, "big")) ++
      (100L until 107L).map(i => (i, "tail"))).toDF("doc_id", "lang")
    val got = Curation.stratifiedSample(docs, "doc_id", "lang", 2000, "s")
    val counts = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("big") === 20L)      // ceil(100 * 0.2)
    assert(counts("tail") === 2L)      // ceil(7 * 0.2) — the tail survives
    val again = Curation.stratifiedSample(docs, "doc_id", "lang", 2000, "s")
    assert(got.collect().toSet === again.collect().toSet)
    // membership is stable: a kept tail doc stays kept when ITS stratum
    // is untouched and another stratum grows
    val grown = docs.union(Seq((500L, "big"), (501L, "big")).toDF("doc_id", "lang"))
    val keptTail = got.filter(col("lang") === "tail")
      .select("doc_id").as[Long].collect().toSet
    val grownTail = Curation.stratifiedSample(grown, "doc_id", "lang", 2000, "s")
      .filter(col("lang") === "tail").select("doc_id").as[Long].collect().toSet
    assert(keptTail === grownTail)
  }

  test("perplexityBuckets: integer-exact terciles, best scores land in head") {
    // n=7 per group: head = ceil(7/3) = 3, middle = ceil(14/3) - 3 = 2, tail = 2
    val scored = (0L until 7L).map(i => (i, "en", 10.0 - i))
      .toDF("id", "lang", "lp")
    val got = Curation.perplexityBuckets(scored, "lang", "lp", "id")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("bucket")).toMap
    assert((0L to 2L).forall(got(_) == "head"))
    assert((3L to 4L).forall(got(_) == "middle"))
    assert((5L to 6L).forall(got(_) == "tail"))
    // groups bucket independently; a 1-doc group is all head
    val two = Curation.perplexityBuckets(
      scored.union(Seq((99L, "de", 1.0)).toDF("id", "lang", "lp")),
      "lang", "lp", "id")
    assert(two.filter(col("lang") === "de").head().getAs[String]("bucket") === "head")
  }

  test("stratifiedSample: fracBp bounds enforced; 10000 keeps everything") {
    val docs = (0L until 9L).map(i => (i, "x")).toDF("doc_id", "lang")
    assertThrows[IllegalArgumentException] {
      Curation.stratifiedSample(docs, "doc_id", "lang", 10001, "s")
    }
    assert(Curation.stratifiedSample(docs, "doc_id", "lang", 10000, "s")
      .count() === 9L)
    assert(Curation.stratifiedSample(docs, "doc_id", "lang", 0, "s")
      .count() === 0L)
  }

  test("pcaPowerFit: unit direction, positive eigval, dominant-axis recovery") {
    // rows concentrated along axis 0 with small noise on axis 1
    val emb = (0L until 30L).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      (i, Array(s * 1.0f, (((i % 5) - 2) / 50.0f), 0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val got = Similarity.pcaPowerFit(emb, "embedding", iters = 8)
      .orderBy("pos").collect()
    assert(got.length === 4)
    val v = got.map(_.getAs[Double]("pc"))
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"unit vector, got $norm")
    val eig = got.head.getAs[Double]("eigval")
    assert(eig > 0.0)
    // the dominant direction is axis 0
    assert(math.abs(math.abs(v(0)) - 1.0) < 1e-3, s"axis-0 dominant, got ${v.toList}")
    // Rayleigh quotient equals the dominant Gram eigenvalue ~ n (unit rows)
    assert(math.abs(eig - 30.0) < 1.0, s"eigval ~ n for unit axis rows, got $eig")
  }

  test("rankCorrelation: identical order -> 1, reversed -> -1, m<2 -> null") {
    val fwd = ranked(1L -> 10L, 1L -> 11L, 1L -> 12L, 1L -> 13L)
    val rev = ranked(1L -> 13L, 1L -> 12L, 1L -> 11L, 1L -> 10L)
    val same = Eval.rankCorrelation(fwd, fwd).collect().head
    assert(same.getAs[Long]("m") === 4L)
    assert(same.getAs[Double]("kendall_tau") === 1.0)
    val opp = Eval.rankCorrelation(fwd, rev).collect().head
    assert(opp.getAs[Double]("kendall_tau") === -1.0)
    // single shared item: correlation undefined, NULL not NaN/Inf
    val one = Eval.rankCorrelation(
      ranked(2L -> 10L), ranked(2L -> 10L)).collect().head
    assert(one.getAs[Long]("m") === 1L)
    assert(one.isNullAt(one.fieldIndex("kendall_tau")))
    // partial agreement: fwd vs one adjacent swap = 1 - 2*1/(4*3/2) = 2/3
    val swap = ranked(1L -> 10L, 1L -> 12L, 1L -> 11L, 1L -> 13L)
    val part = Eval.rankCorrelation(fwd, swap).collect().head
    assert(math.abs(part.getAs[Double]("kendall_tau") - 2.0 / 3.0) < 1e-6)
  }

  test("pcaTopComponents: orthogonal components, non-increasing eigenvalues") {
    // three scaled axes: eigenvalues ~ 40*1, 40*0.25, 40*0.04
    val emb = (0L until 40L).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      val ax = (i % 3).toInt
      val v = Array(0.0f, 0.0f, 0.0f, 0.0f)
      v(ax) = s * (ax match { case 0 => 1.0f; case 1 => 0.5f; case _ => 0.2f })
      (i, v)
    }.toDF("vec_id", "embedding")
    val got = Similarity.pcaTopComponents(emb, "embedding", m = 3, iters = 10)
      .orderBy(col("comp"), col("pos")).collect()
    assert(got.length === 12)
    val byComp = got.groupBy(_.getAs[Int]("comp")).view
      .mapValues(rs => (rs.sortBy(_.getAs[Long]("pos")).map(_.getAs[Double]("pc")),
        rs.head.getAs[Double]("eigval"))).toMap
    // each component is unit and they are mutually orthogonal
    for (c <- 0 to 2) {
      val n = math.sqrt(byComp(c)._1.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"comp $c not unit: $n")
    }
    for (a <- 0 to 2; b <- (a + 1) to 2) {
      val dot = byComp(a)._1.zip(byComp(b)._1).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) < 1e-3, s"comps $a,$b not orthogonal: $dot")
    }
    // eigenvalues come out largest-first and track the planted spectrum
    val eigs = (0 to 2).map(byComp(_)._2)
    assert(eigs(0) > eigs(1) && eigs(1) > eigs(2), s"not sorted: $eigs")
    // axis recovery: comp 0 ~ axis 0, comp 1 ~ axis 1, comp 2 ~ axis 2
    for (c <- 0 to 2)
      assert(math.abs(math.abs(byComp(c)._1(c)) - 1.0) < 1e-2,
        s"comp $c should align with axis $c: ${byComp(c)._1.toList}")
  }

  test("pcaProject recovers planted per-row coordinates for fitted components") {
    // rows live on axes 0/1 with known magnitudes; projecting onto the
    // fitted top-2 subspace must recover those magnitudes (up to the
    // component's sign, which power iteration fixes deterministically)
    val emb = (0L until 20L).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      if (i % 4 < 2) (i, Array(s * 2.0f, 0.0f, 0.0f))
      else (i, Array(0.0f, s * 1.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val comps = Similarity.pcaTopComponents(emb, "embedding", m = 2, iters = 10)
    val got = Similarity.pcaProject(emb, comps)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size === 40)
    for (i <- 0L until 20L) {
      val (p0, p1) = (got((i, 0)), got((i, 1)))
      if (i % 4 < 2) {
        assert(math.abs(math.abs(p0) - 2.0) < 1e-3, s"row $i axis-0 coord: $p0")
        assert(math.abs(p1) < 1e-3, s"row $i should be orthogonal to comp 1: $p1")
      } else {
        assert(math.abs(p0) < 1e-3, s"row $i should be orthogonal to comp 0: $p0")
        assert(math.abs(math.abs(p1) - 1.0) < 1e-3, s"row $i axis-1 coord: $p1")
      }
    }
    // single-direction form (pcaPowerFit output, no comp column) works too
    val one = Similarity.pcaProject(emb,
      Similarity.pcaPowerFit(emb, "embedding", iters = 10)
        .select(col("pos"), col("pc")))
    assert(one.select(countDistinct(col("comp"))).head().getLong(0) === 1L)
  }

  test("pcaCoarseRefineSearch is exact at kCoarse >= corpus; coarse cut stays top-k-correct on planted geometry") {
    val emb = (0L until 50L).map { i =>
      (i, Array.tabulate(8)(j => (((i * 11 + j * 3) % 19) / 19.0f)))
    }.toDF("vec_id", "embedding")
    val comps = Similarity.pcaTopComponents(emb, "embedding", m = 2, iters = 8)
    val qv = emb.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
    val exact = Similarity.knnExact(emb, qv, k = 10)
      .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e4))).toList
    val full = Similarity.pcaCoarseRefineSearch(emb, comps, qv, kCoarse = 50, k = 10)
      .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e4))).toList
    assert(full === exact, "full-coarse two-stage must equal exact top-k")
    // a tight coarse cut still returns k rows, each with its true score
    val tight = Similarity.pcaCoarseRefineSearch(emb, comps, qv, kCoarse = 15, k = 10)
      .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e4))).toMap
    assert(tight.size === 10)
    val exactScores = Similarity.scoreAll(emb, qv)
      .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e4))).toMap
    tight.foreach { case (id, s) =>
      assert(s === exactScores(id), s"refine stage must re-score exactly: $id")
    }
    assertThrows[IllegalArgumentException] {
      Similarity.pcaCoarseRefineSearch(emb, comps, qv, kCoarse = 5, k = 10)
    }
    // candidate pushdown: restricted full-coarse search == exact top-k
    // over the filtered corpus (the filter reaches the coarse stage, so a
    // tight candidate set cannot starve the refine)
    val cands = emb.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
    val restricted = Similarity.pcaCoarseRefineSearch(emb, comps, qv,
        kCoarse = 50, k = 5, restrictIds = Some(cands))
      .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e4))).toList
    val exactFiltered = Similarity.knnExact(
        emb.filter(col("vec_id") % 3 === 0), qv, k = 5)
      .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e4))).toList
    assert(restricted === exactFiltered)
  }

  test("gram artifacts over disjoint batches merge EXACTLY (incremental fit)") {
    val all = (0L until 24L).map(i =>
      (i, Array.tabulate(4)(j => ((i * 5 + j * 7) % 13) / 13.0f)))
      .toDF("vec_id", "embedding")
    val a = all.filter(col("vec_id") < 10)
    val b = all.filter(col("vec_id") >= 10 && col("vec_id") < 17)
    val c = all.filter(col("vec_id") >= 17)
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap
    val whole = toMap(Similarity.gramMatrixRaw(all, "embedding"))
    // batch-by-batch and all-at-once merge trees produce the identical
    // artifact — decimal addition is associative and exact
    val m1 = toMap(Similarity.mergeGramRaw(Seq(
      Similarity.gramMatrixRaw(a, "embedding"),
      Similarity.gramMatrixRaw(b, "embedding"),
      Similarity.gramMatrixRaw(c, "embedding"))))
    val m2 = toMap(Similarity.mergeGramRaw(Seq(
      Similarity.mergeGramRaw(Seq(
        Similarity.gramMatrixRaw(a, "embedding"),
        Similarity.gramMatrixRaw(b, "embedding"))),
      Similarity.gramMatrixRaw(c, "embedding"))))
    assert(whole.keySet === m1.keySet)
    whole.foreach { case (k, v) =>
      assert(v.compareTo(m1(k)) === 0, s"merge drift at $k: $v vs ${m1(k)}")
      assert(v.compareTo(m2(k)) === 0, s"merge-tree drift at $k: $v vs ${m2(k)}")
    }
    // and the rounded fit-time view matches the one-shot gramMatrix
    val direct = Similarity.gramMatrix(all, "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val viaMerge = Similarity.roundGram(Similarity.mergeGramRaw(Seq(
      Similarity.gramMatrixRaw(a, "embedding"),
      Similarity.gramMatrixRaw(b, "embedding"),
      Similarity.gramMatrixRaw(c, "embedding")))).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(direct === viaMerge)
  }

  test("gramMatrix is symmetric with decimal-exact entries") {
    val emb = (0L until 10L).map(i =>
      (i, Array.tabulate(3)(j => (i * 3 + j) / 10.0f))).toDF("vec_id", "embedding")
    val g = Similarity.gramMatrix(emb, "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(g.size === 9)
    for (i <- 0 until 3; j <- 0 until 3)
      assert(g((i, j)) === g((j, i)), s"G($i,$j) != G($j,$i)")
  }
}
