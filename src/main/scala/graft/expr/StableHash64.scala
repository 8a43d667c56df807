package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash of a string column — a stable, documented, dependency-
  * free hash for salting, bucketing, and fingerprints. Unlike hash()/
  * xxhash64 its definition is 4 lines a user can re-implement anywhere (the
  * point of "stable": the value is a contract, not an implementation
  * detail). Codegen'd tight loop over the UTF-8 bytes.
  */
case class StableHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "stable_hash64"

  override def nullSafeEval(input: Any): Any =
    StableHash64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.StableHash64.hash($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): StableHash64 =
    copy(child = newChild)
}

object StableHash64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  /** FNV-1a over the bytes. Called from generated code — keep signature. */
  def hash(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }
}
