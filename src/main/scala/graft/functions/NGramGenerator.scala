package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram generator — the UDTF leg of the extension surface
  * (Generator, alongside the scalar codegen Expressions and the typed
  * Aggregator). One output row per n-gram of the input string.
  *
  * Streams `UTF8String.substringSQL` slices lazily instead of first
  * materializing an array<string> of every n-gram per document and
  * exploding it — at 100 TB the array form allocates the whole shingle
  * set per row (for a 10 kB document and n=3, ~30 kB of boxed strings)
  * before the explode even starts; this yields them one at a time.
  * Reference analog: the tokenize step a full-text index build needs
  * (/root/reference/Program.cs:506-528 declares the index; the engine owns
  * tokenization).
  */
case class NGramGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"ngrams: n must be >= 1, got $n")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngrams requires string, got ${other.catalogString}")
    }

  override def elementSchema: StructType =
    StructType(StructField("ngram", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val s = v.asInstanceOf[UTF8String]
      val len = s.numChars()
      if (len < n) Iterator.empty
      else new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i <= len - n
        override def next(): InternalRow = {
          // substringSQL is 1-based and codepoint-aware
          val row = new GenericInternalRow(Array[Any](s.substringSQL(i + 1, n)))
          i += 1
          row
        }
      }
    }
  }

  override def prettyName: String = "ngrams"
  override protected def withNewChildInternal(newChild: Expression): NGramGenerator =
    copy(child = newChild)
}

object NGramGenerator {
  /** Column-API entry: `select(ngrams(col("text"), 3))` explodes to one
    * row per n-gram.
    */
  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(NGramGenerator(ColumnBridge.expression(c), n))
}
