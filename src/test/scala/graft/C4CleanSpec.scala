package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** [[TextAnalysis.c4Clean]] — C4 line-level cleanup (Raffel et al. 2020
  * §2.2). Line rules: terminal punctuation, >= minLineWords words, no
  * "javascript". Document gate: >= minKeptLines survivors, no `{`, no
  * "lorem ipsum". */
class C4CleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clean(rows: (Long, String)*) =
    TextAnalysis.c4Clean(rows.toSeq.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

  test("line rules: terminal punct, min words, javascript") {
    val got = clean(1L ->
      "This line is kept.\nno punct here\nshort.\nuses javascript here.\nAnd this one too!\nIs this kept?")
    val (text, nLines, nKept, keep) = got(1L)
    assert(text === "This line is kept.\nAnd this one too!\nIs this kept?")
    assert(nLines === 6L && nKept === 3L && keep)
  }

  test("document gates: curly brace, lorem ipsum, too few survivors") {
    val got = clean(
      1L -> "Good line number one.\nGood line number two.\nGood line number three.",
      2L -> "Good line with { brace.\nAnother good line here.\nAnd a third good one.",
      3L -> "Has some Lorem Ipsum filler.\nAnother good line here.\nAnd a third good one.",
      4L -> "Only one good line here.\nnope\nstill nope")
    assert(got(1L)._4 === true)
    assert(got(2L)._4 === false, "curly brace must poison the document")
    assert(got(3L)._4 === false, "lorem ipsum must poison the document (case-insensitive)")
    assert(got(4L)._4 === false, "fewer than minKeptLines survivors")
    assert(got(4L)._3 === 1L)
  }

  test("quoted-speech terminal and whitespace trim") {
    val got = clean(1L ->
      "  He said \"hello there folks.\"  \nA plain good sentence here.\nAlso a good third line.")
    val (text, _, nKept, keep) = got(1L)
    assert(nKept === 3L && keep)
    // the kept line keeps its ORIGINAL form (trim applies to the test only)
    assert(text.startsWith("  He said"))
  }

  test("empty text and all-dropped text survive as non-kept rows") {
    val got = clean(1L -> "", 2L -> "nothing here matches")
    assert(got(1L)._3 === 0L && !got(1L)._4)
    assert(got(2L)._3 === 0L && !got(2L)._4)
  }
}
