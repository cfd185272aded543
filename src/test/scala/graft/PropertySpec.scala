package graft

import graft.operators.{Candidates, Fusion, GroupShaping, Similarity}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** SURVEY §5(3) property tests. Trials are few (Spark jobs per trial) but
  * each exercises randomized inputs end-to-end. */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark

  private val channelGen: Gen[List[(Long, Double)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0.0, 100.0)))
      .map(_.groupBy(_._1).map { case (k, vs) => (k, vs.head._2) }.toList)

  private def fuse(chs: Seq[List[(Long, Double)]]): Map[Long, BigDecimal] = {
    import spark.implicits._
    val dfs = chs.map(_.toDF("id", "score"))
    Fusion.fuseByAddition(dfs).collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).toMap
  }

  property("A1 fusion is channel-permutation invariant") =
    forAll(channelGen, channelGen, channelGen) { (a, b, c) =>
      fuse(Seq(a, b, c)) == fuse(Seq(c, a, b))
    }

  property("single-channel fusion is identity (combine_utils.py:36-37)") =
    forAll(channelGen) { a =>
      fuse(Seq(a)) == a.map { case (k, v) =>
        k -> BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP) }.toMap
    }

  property("filter-then-score == score-then-filter") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, 49L)).map(_.distinct)) { ids =>
      import spark.implicits._
      val emb = Tables(spark, TestSpark.sfDir, "embeddings").limit(50)
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val cand = ids.toDF("vec_id")
      def toMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val pre = toMap(Similarity.scoreAll(Candidates.restrictTo(emb, cand, "vec_id"), qv))
      val post = toMap(Similarity.scoreAll(emb, qv)
        .join(cand, Seq("vec_id"), "left_semi"))
      pre == post
    }

  property("minhash-LSH pairs are a subset of exact-Jaccard pairs (same threshold)") =
    forAll(Gen.chooseNum(0, 1000)) { seed =>
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
      def doc() = (1 to 12).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val base = (1L to 6L).map(i => (i, doc()))
      // plant one exact duplicate pair
      val docs = (base :+ (99L, base.head._2)).toDF("doc_id", "text")
      val lsh = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
          shingleN = 2, threshold = 0.3)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text",
          shingleN = 2, threshold = 0.3)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      lsh.subsetOf(exact) && lsh.contains((1L, 99L)) // identical docs always recalled
    }

  property("pigeonhole banding recalls EVERY pair within the hamming bound") =
    forAll(Gen.chooseNum(0L, Long.MaxValue >> 1), Gen.chooseNum(1, 6),
      Gen.listOfN(6, Gen.chooseNum(0, 62))) { (base, flips, positions) =>
      import spark.implicits._
      // construct a pair at a KNOWN hamming distance <= 6 by flipping bits
      val other = positions.distinct.take(flips)
        .foldLeft(base & ((1L << 63) - 1))((v, p) => v ^ (1L << p))
      val fp = Seq((1L, base & ((1L << 63) - 1)), (2L, other)).toDF("id", "simhash")
      val got = graft.operators.Dedup.simhashPairsBanded(fp)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // >=1 and <=6 bits flipped: the banded search must recall the pair
      got == Set((1L, 2L))
    }

  property("canonicalIds: driver-local union-find == distributed fixpoint on random graphs") =
    forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 40L), Gen.chooseNum(0L, 40L)))) { edges0 =>
      import spark.implicits._
      import graft.operators.Dedup
      // drop self-loops (the pair relation is i<j by construction upstream,
      // but the resolver must not care about orientation or duplicates)
      val edges = edges0.filter { case (a, b) => a != b }
      edges.isEmpty || {
        val pairs = edges.toDF("i", "j")
        def m(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        m(Dedup.canonicalIds(pairs)) ==
          m(Dedup.canonicalIds(pairs, maxLocalEdges = 0))
      }
    }

  property("morton key is a bijection on the grid (order-free uniqueness)") =
    forAll(Gen.listOfN(20, Gen.zip(Gen.chooseNum(0, 65535), Gen.chooseNum(0, 65535)))) { pts =>
      import spark.implicits._
      val distinctPts = pts.distinct
      val keys = distinctPts.toDF("a", "b")
        .select(graft.sources.Store.mortonKey(col("a"), col("b")))
        .collect().map(_.getLong(0))
      keys.distinct.length == distinctPts.length
    }

  property("topK equals sort-take-k") =
    forAll(channelGen, Gen.chooseNum(1, 10)) { (rows, k) =>
      import spark.implicits._
      val df = rows.toDF("id", "score")
      val got = GroupShaping.topK(df, k, col("score"), col("id"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
      val want = rows.sortBy { case (id, s) => (-s, id) }.take(k)
      got == want
    }

  property("packSequences: offsets are exact prefix sums and stay inside the budget") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 30L), Gen.chooseNum(1, 12))).map(_.distinctBy(_._1)),
      Gen.chooseNum(5L, 40L)) { (docs, budget) =>
      import spark.implicits._
      val df = docs.map { case (id, nTok) => (id, "src", Seq.fill(nTok)("t").mkString(" ")) }
        .toDF("doc_id", "src", "text")
      val got = graft.operators.Curation
        .packSequences(df, "doc_id", "text", budget, "src")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      // reconstruct: bin*budget + offset must equal the running prefix sum,
      // offsets in [0, budget)
      var cum = 0L
      got.forall { case (_, nTok, bin, off) =>
        val ok = bin * budget + off == cum && off >= 0 && off < budget
        cum += nTok
        ok
      }
    }

  // ---- span-dedup family (round 9): randomized corpora with a tiny
  // vocabulary force heavy shingle duplication; invariants pin the merge
  // arithmetic, the census determinism under partitioning, and the
  // excision accounting against driver-side recomputation
  private val spanCorpusGen: Gen[List[(Long, String)]] = for {
    seed <- Gen.chooseNum(0, 10000)
  } yield {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    (1L to 6L).map(i =>
      (i, (1 to (8 + rnd.nextInt(8))).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))).toList
  }

  property("duplicateSpans: per-doc spans are sorted, disjoint, k-wide, shingle-consistent") =
    forAll(spanCorpusGen) { docs =>
      import spark.implicits._
      val k = 3
      val spans = graft.operators.Dedup
        .duplicateSpans(docs.toDF("id", "text"), "id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
      spans.values.forall { ss =>
        val sorted = ss.sortBy(_._2)
        // n_shingles counts the marked STARTS in the island; starts may
        // gap up to k inside one merged span, so the count is bounded by
        // [1, width - k + 1], not pinned to it
        sorted.forall { case (_, s0, s1, n) =>
          s1 - s0 + 1 >= k && n >= 1 && n <= s1 - s0 - k + 2 } &&
          sorted.sliding(2).forall {
            case Array((_, _, e1, _), (_, s2, _, _)) => s2 > e1
            case _ => true
          }
      }
    }

  property("duplicateSpans is deterministic under input partitioning") =
    forAll(spanCorpusGen) { docs =>
      import spark.implicits._
      val df = docs.toDF("id", "text")
      def run(parts: Int) = graft.operators.Dedup
        .duplicateSpans(df.repartition(parts), "id", "text", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      run(7) == run(2)
    }

  property("removeDuplicateSpans: n_dropped equals total span width, text matches recomputation") =
    forAll(spanCorpusGen) { docs =>
      import spark.implicits._
      val k = 3
      val df = docs.toDF("id", "text")
      val spans = graft.operators.Dedup.duplicateSpans(df, "id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap
      val cleaned = graft.operators.Dedup.removeDuplicateSpans(df, "id", "text", k)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      docs.forall { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val ss = spans.getOrElse(id, Array.empty[(Long, Long)])
        val expectKept = toks.zipWithIndex.collect {
          case (t, i) if !ss.exists { case (s0, s1) => i + 1 >= s0 && i + 1 <= s1 } => t
        }.mkString(" ")
        val (gotText, nTok, nDrop) = cleaned(id)
        gotText == expectKept && nTok == toks.length &&
          nDrop == ss.map { case (s0, s1) => s1 - s0 + 1 }.sum
      }
    }

  property("stratified sample: exact ceil quota per stratum, at every fraction") =
    forAll(
      Gen.listOfN(3, Gen.chooseNum(1, 80)).map(_.zipWithIndex),
      Gen.chooseNum(0, 10000)) { (sizes, bp) =>
      import spark.implicits._
      val docs = sizes.flatMap { case (n, s) =>
        (0 until n).map(i => (s * 100000L + i, s"lang$s"))
      }.toDF("doc_id", "lang")
      val got = graft.operators.Curation
        .stratifiedSample(docs, "doc_id", "lang", bp, "prop")
        .groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      sizes.forall { case (n, s) =>
        val expect = (n.toLong * bp + 9999) / 10000
        got.getOrElse(s"lang$s", 0L) == expect
      }
    }

  property("temperature mix: rates decrease with source size and never exceed 10000") =
    forAll(Gen.listOfN(3, Gen.chooseNum(5, 400)).map(_.distinct).suchThat(_.size >= 2)) { sizes =>
      import spark.implicits._
      val docs = sizes.zipWithIndex.flatMap { case (n, s) =>
        (0 until n).map(i => (s * 100000L + i, s"src$s"))
      }.toDF("doc_id", "source")
      val rates = graft.operators.Curation
        .temperatureMixRates(docs, "source", targetRows = 100L)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).sortBy(_._1)
      rates.forall(_._2 <= 10000L) &&
        // sqrt temperature: rate is monotonically non-increasing in n
        rates.sliding(2).forall {
          case Array((n1, r1), (n2, r2)) => n1 == n2 || r1 >= r2
          case _ => true
        }
    }
}
