package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two float vectors, accumulated
  * in double left-to-right (index order — the same order DuckDB's
  * list_dot_product/list_cosine_similarity accumulate, so rounded values
  * hash-match).
  *
  * This is the hot inner loop of every similarity op (SURVEY.md §2.7): a
  * whole-stage-codegen'd tight loop over the unsafe array data — no lambda
  * dispatch per element like the `zip_with`+`aggregate` higher-order-function
  * formulation, no UDF serialization. At 100 TB this runs inside the same
  * generated function as the join that produced the pair.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<float> (AbstractDataType/ExpectsInputTypes is
  // private[sql], so call sites — all ours — guarantee it instead).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

/** Column-API and SQL-registry access to the graft native expressions. */
object FloatVec {

  /** Dot product of two `array<float>` columns, as double. */
  def floatDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(FloatDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Cosine similarity built from three codegen'd dot products. Callers that
    * pre-compute per-row norms should use floatDot directly.
    */
  def floatCosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    floatDot(a, b) / (sqrt(floatDot(a, a)) * sqrt(floatDot(b, b)))
  }

  /** Register the graft native functions for SQL use (idempotent). The same
    * builders are exposed through [[graft.GraftExtensions]] for
    * `spark.sql.extensions`-configured sessions.
    */
  def register(s: SparkSession): Unit = {
    s.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (children: Seq[Expression]) => FloatDot(children(0), children(1)))
    s.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("stable_hash64"),
      new ExpressionInfo(classOf[StableHash64].getName, "stable_hash64"),
      (children: Seq[Expression]) => StableHash64(children.head))
  }
}
