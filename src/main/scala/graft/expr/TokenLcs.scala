package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: token-level longest-common-subsequence
  * length between two space-tokenized strings — the ROUGE-L kernel. Classic
  * two-row DP, O(n·m) per pair over n,m tokens (documents here are ~20
  * tokens; the op feeding it blocks pairs first so n·m work is paid only on
  * candidate pairs, never the corpus cross product). A higher-order-function
  * formulation can't express the row-to-row DP dependency at all, and a
  * Scala UDF would block whole-stage codegen for the join around it — this
  * expression keeps the pair stage codegen'd (the [[SortedMapDot]]
  * rationale); generated code is one static call.
  */
case class TokenLcs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "token_lcs"

  override def nullSafeEval(a: Any, b: Any): Any =
    TokenLcs.lcs(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.expr.TokenLcs.lcs($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenLcs =
    copy(left = newLeft, right = newRight)
}

object TokenLcs {
  /** LCS over space-split tokens (empty tokens dropped — doubled spaces
    * don't mint tokens). Called from generated code — keep signature.
    */
  def lcs(a: UTF8String, b: UTF8String): Long = {
    val xs = split(a)
    val ys = split(b)
    if (xs.isEmpty || ys.isEmpty) return 0L
    // two-row DP; prev(j) = LCS(xs[0..i-1), ys[0..j))
    val prev = new Array[Int](ys.length + 1)
    val cur = new Array[Int](ys.length + 1)
    var i = 0
    while (i < xs.length) {
      var j = 0
      while (j < ys.length) {
        cur(j + 1) =
          if (xs(i) == ys(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      i += 1
    }
    prev(ys.length).toLong
  }

  private def split(s: UTF8String): Array[String] =
    s.toString.split(" ").filter(_.nonEmpty)
}
