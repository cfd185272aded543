package graft

import graft.operators.Lexical
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Lexical.bpeFit]] / [[Lexical.bpeSegment]] — BPE subword trainer
  * (Sennrich et al. 2016). The first test is the paper's own worked
  * example corpus shape (low/lower/newest/widest with counts). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // word counts planted via repetition: low*5 lower*2 newest*6 widest*3
  private lazy val corpus = Seq(
    (1L, Array.fill(5)("low").mkString(" ")),
    (2L, Array.fill(2)("lower").mkString(" ")),
    (3L, Array.fill(6)("newest").mkString(" ")),
    (4L, Array.fill(3)("widest").mkString(" "))).toDF("id", "text")

  test("fit reproduces the paper-style merge sequence on the worked corpus") {
    val merges = Lexical.bpeFit(corpus, "id", "text", numMerges = 4)
      .orderBy(col("step"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // freq 9: 'e s' and 's t' both appear in newest+widest (6+3); tie
    // breaks lexicographically -> 'e s' first, after it merges 'es t' is 9
    assert(merges(0) === ((1, "e s", 9L)))
    assert(merges(1) === ((2, "es t", 9L)))
    assert(merges(2) === ((3, "est </w>", 9L)))
    // next: 'l o' in low+lower = 7
    assert(merges(3) === ((4, "l o", 7L)))
  }

  test("segment counts subwords under the fitted merges") {
    val merges = Lexical.bpeFit(corpus, "id", "text", numMerges = 4)
    val got = Lexical.bpeSegment(corpus, merges, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // after (e s)(es t)(est </w>)(l o): 'newest' = n e w est</w> -> 4
    // subwords x 6 copies = 24; 'low' = lo w </w> -> 3 x 5 = 15
    assert(got(3L) === ((6L, 24L)))
    assert(got(1L) === ((5L, 15L)))
    // 'widest' = w i d est</w> -> 4 x 3 = 12; 'lower' = lo w e r </w> -> 5 x 2 = 10
    assert(got(4L) === ((3L, 12L)))
    assert(got(2L) === ((2L, 10L)))
  }

  test("driver-local fit == distributed fit at numMerges 6 and 100") {
    // richer corpus than the worked example so 100 merges have material
    // to chew through, including tie-heavy repeated shapes
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog the quick fox"),
      (2L, "lower lowest newest newer widest wider low new wide"),
      (3L, "internationalization localization internationalization"),
      (4L, "aaa aab aba abb baa bab bba bbb aaa aab"),
      (5L, "mississippi mississippi missouri missive")).toDF("id", "text")
    for (n <- Seq(6, 100)) {
      val local = Lexical.bpeFit(docs, "id", "text", numMerges = n)
        .orderBy(col("step"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      val dist = Lexical.bpeFitDistributed(docs, "id", "text", numMerges = n)
        .orderBy(col("step"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      assert(local === dist, s"numMerges=$n local/distributed drift")
    }
  }

  test("oversized vocabulary falls back to the distributed loop") {
    // maxLocalVocab = 2 with 4+ distinct words forces the fallback; the
    // result must be identical either way
    val viaFallback = Lexical.bpeFit(corpus, "id", "text", numMerges = 4,
        maxLocalVocab = 2)
      .orderBy(col("step"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val local = Lexical.bpeFit(corpus, "id", "text", numMerges = 4)
      .orderBy(col("step"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(viaFallback === local)
  }

  test("empty documents and single-char words survive") {
    val df = Seq((1L, ""), (2L, "a a a"), (3L, "I")).toDF("id", "text")
    val merges = Lexical.bpeFit(df, "id", "text", numMerges = 2)
    val rules = merges.collect().map(r => (r.getInt(0), r.getString(1)))
    // only possible first pair: 'a </w>' (weight 3) beats 'i </w>' (1)
    assert(rules.head === ((1, "a </w>")))
    val seg = Lexical.bpeSegment(df, merges, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(seg(1L) === ((0L, 0L)))
    // leftmost non-overlapping replace: the 1st and 3rd 'a </w>' merge,
    // the middle one is skipped (its leading boundary space was consumed
    // by match 1) — the pinned convention the oracle mirrors
    assert(seg(2L) === ((3L, 4L)))
  }

  test("persisted merge artifact segments identically to a fresh fit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_art").toString
    val persisted = Lexical.writeBpe(spark, corpus, "id", "text", 4, dir)
    val fresh = Lexical.bpeFit(corpus, "id", "text", 4)
    def seg(m: org.apache.spark.sql.DataFrame) =
      Lexical.bpeSegment(corpus, m, "id", "text")
        .orderBy(col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(seg(persisted) === seg(fresh))
    // the artifact is the k-row merge table, loadable in a fresh reader
    assert(Lexical.loadBpeMerges(spark, dir).count() === 4L)
  }

  test("fit is deterministic under input partitioning") {
    def run(parts: Int) = Lexical
      .bpeFit(corpus.repartition(parts), "id", "text", numMerges = 4)
      .orderBy(col("step")).collect().map(_.getString(1)).toSeq
    assert(run(5) === run(2))
  }

  test("incremental merge engine == naive recount engine (residuals, ties, exhaustion)") {
    // adversarial vocabularies at the merge-loop level: odd repeated-symbol
    // runs (the non-overlapping-replace residual convention — the merged
    // pair keeps a count and must be able to WIN AGAIN in a later step),
    // four-way tie-breaking, and single-symbol words that exhaust early
    val vocabs = Seq(
      Array(("a a a a a </w>", 7L), ("a a </w>", 3L), ("b a a b </w>", 2L)),
      Array(("x y x y x </w>", 5L), ("x y </w>", 1L), ("y x </w>", 1L)),
      Array(("p q </w>", 4L), ("q p </w>", 4L), ("p p </w>", 4L), ("q q </w>", 4L)),
      Array(("z </w>", 9L), ("z z </w>", 1L)))
    for (v <- vocabs; n <- Seq(1, 3, 8, 64)) {
      val naive = Lexical.bpeMergeLocalNaive(v, n)
      val inc = Lexical.bpeMergeLocal(v, n)
      assert(inc === naive, s"vocab=${v.mkString(",")} merges=$n")
    }
    // a deterministic pseudo-random vocabulary large enough that the
    // inverted index and the lazy heap see real churn (stale entries,
    // compaction, membership add/remove across many steps)
    val rnd = new scala.util.Random(42)
    val alpha = "abcdef"
    val big = Array.tabulate(400) { _ =>
      val len = 2 + rnd.nextInt(9)
      val w = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length)).toString)
        .mkString(" ")
      (w + " </w>", 1L + rnd.nextInt(20))
    }
    assert(Lexical.bpeMergeLocal(big, 300) ===
      Lexical.bpeMergeLocalNaive(big, 300))
  }

  // the convention REFERENCE: java String.replace IS the pinned sentinel
  // semantics both engines mirror (leftmost non-overlapping, scanning
  // resumes AFTER each replacement) — an independent driver-side replay
  private def stringReplayRef(
      docs: Seq[(Long, String)], rules: Seq[String]): Seq[(Long, Long, Long)] =
    docs.map { case (id, text) =>
      val words = "\\w+".r.findAllIn(text.toLowerCase).toArray
      val nSub =
        if (words.isEmpty) 0L
        else {
          val s0 = words.map(w =>
            w.split("").filter(_.nonEmpty).mkString(" ") + " </w>").mkString(" ")
          val s = rules.foldLeft(s0) { (s, pair) =>
            (" " + s + " ").replace(
              " " + pair + " ", " " + pair.replace(" ", "") + " ").trim
          }
          s.split(" ").length.toLong
        }
      (id, words.length.toLong, nSub)
    }.sortBy(_._1)

  private lazy val richDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog the quick fox"),
    (2L, "lower lowest newest newer widest wider low new wide"),
    (3L, "internationalization localization internationalization"),
    (4L, "aaa aab aba abb baa bab bba bbb aaa aab"),
    (5L, "mississippi mississippi missouri missive"),
    (6L, ""),
    (7L, "!!! ... ???"))

  test("replay segmenter == folded segmenter (fitted rules, rich corpus)") {
    val docs = richDocs.toDF("id", "text")
    // fold-safe rule counts only: the nested-Column fold StackOverflows
    // around ~100 rules (the hazard the replay form exists to avoid)
    for (n <- Seq(4, 32)) {
      val rules = Lexical.bpeFit(docs, "id", "text", numMerges = n)
        .orderBy(col("step")).collect().map(_.getAs[String]("pair"))
      val fold = Lexical.bpeSegmentFolded(docs, rules, "id", "text")
        .orderBy(col("id")).collect().map(r => (r.get(0), r.get(1), r.get(2))).toSeq
      val replay = Lexical.bpeSegmentReplay(docs, rules, "id", "text")
        .orderBy(col("id")).collect().map(r => (r.get(0), r.get(1), r.get(2))).toSeq
      assert(replay === fold, s"numMerges=$n")
    }
  }

  test("replay segmenter == String.replace reference at fold-killing rule counts") {
    val docs = richDocs.toDF("id", "text")
    for (n <- Seq(100, 400)) {
      val rules = Lexical.bpeFit(docs, "id", "text", numMerges = n)
        .orderBy(col("step")).collect().map(_.getAs[String]("pair"))
      val replay = Lexical.bpeSegmentReplay(docs, rules, "id", "text")
        .orderBy(col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(replay === stringReplayRef(richDocs, rules.toSeq), s"numMerges=$n")
    }
  }

  test("replay segmenter honors the residual convention and duplicate rules") {
    // 'a a a a a' folds to 'aa a aa' under one ' a a '->' aa ' sweep
    // (String.replace resumes AFTER the replacement: the symbol following
    // a fuse cannot START the next match), and a DUPLICATE rule later in
    // the list gets the surviving occurrence — adversarial rule lists the
    // fitted path cannot produce in one step but CAN via residual wins
    val raw = Seq((1L, "aaaaa aaaaa"), (2L, "ababab"))
    val docs = raw.toDF("id", "text")
    val ruleSets = Seq(
      Array("a a"),
      Array("a a", "a a"), // duplicate: residual merges on second sweep
      Array("a b", "ab ab", "a b"),
      Array("a a", "aa a", "aa aa", "</w> a"))
    for (rules <- ruleSets) {
      val fold = Lexical.bpeSegmentFolded(docs, rules, "id", "text")
        .orderBy(col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val replay = Lexical.bpeSegmentReplay(docs, rules, "id", "text")
        .orderBy(col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(replay === fold, s"rules=${rules.mkString("|")}")
      assert(replay === stringReplayRef(raw, rules.toSeq),
        s"rules=${rules.mkString("|")}")
    }
  }

  test("bpeSegment dispatches on rule count, both forms agree end-to-end") {
    val merges = Lexical.bpeFit(corpus, "id", "text", numMerges = 4)
    val viaFold = Lexical.bpeSegment(corpus, merges, "id", "text")
      .orderBy(col("id")).collect().map(r => (r.get(0), r.get(1), r.get(2))).toSeq
    // maxFoldRules = 0 forces every rule through the replay kernel
    val viaReplay = Lexical.bpeSegment(corpus, merges, "id", "text",
      maxFoldRules = 0)
      .orderBy(col("id")).collect().map(r => (r.get(0), r.get(1), r.get(2))).toSeq
    assert(viaReplay === viaFold)
  }
}
