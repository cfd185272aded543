package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two `ARRAY<FLOAT>` columns.
  *
  * Re-expresses the reference's dense inner-product scoring (FAISS
  * `IndexFlatIP.search`, reference `utils/faiss_processing.py:157`) as a
  * whole-stage-codegen-friendly Catalyst expression: the hot loop compiles
  * into the generated Java of the enclosing stage, so a brute-force k-NN scan
  * stays a single fused pipeline (scan -> dot -> TakeOrderedAndProject) with
  * no per-row closure dispatch.
  *
  * Accumulates in double, sequential ascending fold — bit-identical to the
  * SQL higher-order form `aggregate(zip_with(a,b,(x,y)->x*y),0D,(s,v)->s+v)`
  * used as the reference implementation in [[VectorOps.dotHof]].
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_f"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: a bare `i` would fail to compile if the enclosing
      // generated method already declares one (Java forbids shadowing).
      val i = ctx.freshName("i")
      s"""
         |int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_s = 0.0;
         |for (int $i = 0; $i < ${ev.value}_n; $i++) {
         |  ${ev.value}_s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = ${ev.value}_s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
