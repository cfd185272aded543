package graft

import graft.functions.GridEncoding
import graft.functions.GridEncoding.Box
import org.scalatest.funsuite.AnyFunSuite

class GridEncodingSpec extends AnyFunSuite {

  test("a quadrant box overlaps the 4x4 top-left cells in grid order") {
    // [0, 0.5]^2 crosses cell boundary 3/7 < 0.5 < 4/7 -> cols a..d, rows 0..3
    val got = GridEncoding.encodeBoxes(Seq((Box(0, 0, 0.5, 0.5), "person")))
    val want = (0 to 3).flatMap(r => Seq("a", "b", "c", "d").map(c => s"$c${r}person"))
      .mkString(" ")
    assert(got === want)
  }

  test("a tiny centered box hits exactly one cell") {
    val got = GridEncoding.encodeBoxes(Seq((Box(0.5, 0.5, 0.52, 0.52), "red")))
    assert(got === "d3red")
  }

  test("boundary-touching boxes do not claim the adjacent cell") {
    // exactly on the 1/7 boundary: zero-area intersection with cell b*
    val got = GridEncoding.encodeBoxes(Seq((Box(0, 0, 1.0 / 7, 1.0 / 7), "cat")))
    assert(got === "a0cat")
  }

  test("class counting emits ordinal-suffixed tokens in class-index order") {
    val order = Seq("person", "car", "dog")
    val got = GridEncoding.encodeClasses(Seq("dog", "person", "person"), order)
    assert(got === "person0 person1 dog0")
  }
}
