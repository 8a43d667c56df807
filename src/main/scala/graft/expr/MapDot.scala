package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: exact integer dot product of two SPARSE tag
  * maps, each represented as an `array<struct<tag:string, w:bigint>>` sorted
  * by tag (the output of `sort_array(collect_list(struct(tag, w)))`). A
  * two-pointer merge over the sorted entries multiplies weights of equal
  * tags — O(|m1| + |m2|), no per-element lambda dispatch.
  *
  * This is the reference's weighted-tag similarity kernel (SURVEY.md §1
  * "similarity = map dot-product (custom expression)") done as a
  * whole-stage-codegen'd expression: the `map_zip_with` + `aggregate`
  * higher-order-function formulation is interpreted AND blocks codegen for
  * the join around it, which made the pair stage ~10× slower.
  */
case class SortedMapDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_map_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var s = 0L
    while (i < x.numElements() && j < y.numElements()) {
      val r1 = x.getStruct(i, 2)
      val r2 = y.getStruct(j, 2)
      val c = r1.getUTF8String(0).compareTo(r2.getUTF8String(0))
      if (c == 0) { s += r1.getLong(1) * r2.getLong(1); i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val r1 = ctx.freshName("r1")
      val r2 = ctx.freshName("r2")
      val c = ctx.freshName("c")
      s"""
         |int $i = 0; int $j = 0; long $s = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  org.apache.spark.sql.catalyst.InternalRow $r1 = $a.getStruct($i, 2);
         |  org.apache.spark.sql.catalyst.InternalRow $r2 = $b.getStruct($j, 2);
         |  int $c = $r1.getUTF8String(0).compareTo($r2.getUTF8String(0));
         |  if ($c == 0) { $s += $r1.getLong(1) * $r2.getLong(1); $i++; $j++; }
         |  else if ($c < 0) $i++; else $j++;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedMapDot =
    copy(left = newLeft, right = newRight)
}

object MapDot {
  /** Dot product of two sorted `array<struct<string, bigint>>` columns. */
  def sortedMapDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedMapDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
