package graft.functions

/** C7: query-side visual-context encoding (reference
  * `utils/context_encoding.py:28-111`, `utils/parse_frontend.py:3-51`).
  * Drawn boxes on a normalized canvas are encoded as grid tokens that the
  * sparse bbox/color channels index: a 7x7 grid with cells labeled
  * `{col a..g}{row 0..6}`; every cell a box overlaps (intersection > 0, the
  * `box_iou > 0` test) emits `cellLabel + className`; class counts emit
  * `class0 class1 ...`; colors strip the `orange_` underscore.
  *
  * Pure driver-side preprocessing — the output is a query string for
  * [[graft.operators.Lexical]] channels; nothing here is distributed.
  */
object GridEncoding {

  val rows: Seq[String] = (0 to 6).map(_.toString)
  val cols: Seq[String] = Seq("a", "b", "c", "d", "e", "f", "g")

  case class Box(x0: Double, y0: Double, x1: Double, y1: Double)

  /** Grid cells in the reference's construction order (row-major: row i
    * outer, col j inner), label = col letter + row digit. */
  val cells: Seq[(String, Box)] = {
    val pts = (0 to 7).map(_ / 7.0)
    for (i <- 0 until 7; j <- 0 until 7)
      yield (cols(j) + rows(i), Box(pts(j), pts(i), pts(j + 1), pts(i + 1)))
  }

  private def intersects(a: Box, b: Box): Boolean = {
    val w = math.min(a.x1, b.x1) - math.max(a.x0, b.x0)
    val h = math.min(a.y1, b.y1) - math.max(a.y0, b.y0)
    w > 0 && h > 0
  }

  /** `encode_bboxes` / `encode_colors`: one token per (box, overlapped cell)
    * in (box order, cell order). `name` is the class or color, spaces and
    * underscores stripped as in the reference. */
  def encodeBoxes(boxes: Seq[(Box, String)]): String =
    boxes.flatMap { case (b, name) =>
      cells.collect { case (label, cell) if intersects(b, cell) =>
        label + name.replace(" ", "").replace("_", "")
      }
    }.mkString(" ")

  /** `encode_classes`: each class repeated with an ordinal suffix,
    * `person0 person1 car0 ...`, classes in first-occurrence-index order
    * (np.unique sorts by class index = order of the classes tuple). */
  def encodeClasses(labels: Seq[String], classOrder: Seq[String]): String = {
    val counts = labels.groupBy(identity).view.mapValues(_.size)
    classOrder.filter(counts.keySet)
      .flatMap(c => (0 until counts(c)).map(i => c.replace(" ", "") + i))
      .mkString(" ")
  }
}
