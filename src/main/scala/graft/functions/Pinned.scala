package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.DataType

/** Identity wrapper declared NONDETERMINISTIC — an evaluation-pinning
  * barrier for expensive projection pipelines (guide §4.4 applied to
  * built-in expression chains, r19).
  *
  * Catalyst freely duplicates deterministic alias definitions: predicate
  * pushdown rewrites a filter on a derived column by inlining the
  * column's FULL defining expression into the pushed-down condition, and
  * project collapsing (plus the `PhysicalOperation` scan pattern) merges
  * projection chains the same way. For a cheap expression that is the
  * right trade; for a document-tokenization pipeline it re-runs the
  * expensive subtree once per consumer — q38's physical plan carried 26
  * copies of the C4 `text_clean` expression before this barrier, one per
  * Gopher signal that referenced it.
  *
  * Wrapping the stage's gate column in `Pinned` marks the defining
  * Project nondeterministic, which the optimizer may not reorder,
  * duplicate, constant-fold, or push filters through — exactly the
  * guide's `asNondeterministic()` recipe for expensive UDFs, applicable
  * here because the value is genuinely deterministic (identity) and only
  * the optimizer contract is narrowed. Works in batch AND streaming
  * plans (unlike a `localCheckpoint` barrier, which streaming forbids).
  * Evaluation and codegen delegate to the child, so the wrapper costs
  * nothing at runtime and keeps whole-stage codegen.
  */
case class Pinned(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def prettyName: String = "pinned"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Pinned =
    copy(child = newChild)
}

object Pinned {
  /** Column form: `Pinned.pin(col)` — same value, optimizer-opaque. */
  def pin(c: Column): Column = ColumnShim.column(Pinned(ColumnShim.expression(c)))
}
