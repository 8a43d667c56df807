package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Generator (UDTF) emitting the n-token shingles of a whitespace-tokenized
  * text column — one output row per shingle, no intermediate array column.
  * Equivalent to split → transform(sequence…) → explode but with a single
  * tokenize pass and zero array materialization per row; at 100 TB the
  * shingle stream feeds straight into the dedup join's shuffle write.
  *
  * Emits duplicates (callers distinct() when set semantics are needed),
  * nothing for texts with fewer than n tokens — mirroring the SQL
  * formulation the DuckDB oracles use.
  */
case class ShingleGen(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Iterator.empty
    else {
      val toks = raw.toString.split(" ", -1)
      if (toks.length < n) Iterator.empty
      else (0 to toks.length - n).iterator.map { i =>
        InternalRow(UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGen =
    copy(child = newChild)
}
