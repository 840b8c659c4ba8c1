package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC) for sub-document dedup, as one codegen
  * expression: a `w`-codepoint rolling window is hashed with the
  * [[PolyHash]] fold at every position, a chunk boundary falls wherever
  * `window_hash % div == 0`, and each resulting chunk is emitted as
  * `chunk_hash · 2^20 + min(len, 2^20−1)` — hash and length packed into
  * one long with plain arithmetic both engines reproduce exactly.
  *
  * This is the dedup granularity BETWEEN whole-document fingerprints
  * (q_l11) and shingle similarity (q_l05): boundaries derive from
  * CONTENT, not offsets, so editing a sentence re-chunks only its
  * neighborhood and every untouched chunk re-hashes identically — the
  * rsync/LBFS/storage-dedup trick, applied corpus-wide to measure (and
  * at 100 TB, reclaim) repeated spans that never reach whole-doc
  * equality. Expected chunk length is `div` codepoints; a document
  * shorter than `w` (or ending mid-window) contributes its tail as a
  * final chunk, so every codepoint belongs to exactly one chunk.
  *
  * One O(n·w) codegen loop per document (w is small and fixed); no
  * shuffle — downstream dedup aggregates carry only the packed longs.
  */
case class ContentChunks(child: Expression, w: Int, div: Int)
    extends UnaryExpression {

  require(w >= 2 && w <= 64, s"content_chunks: w must be in [2,64], got $w")
  require(div >= 2, s"content_chunks: div must be >= 2, got $div")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"content_chunks requires string, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "content_chunks"

  override protected def nullSafeEval(input: Any): Any =
    ContentChunks.chunks(input.asInstanceOf[UTF8String], w, div)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ContentChunks.chunks($c, $w, $div)")

  override protected def withNewChildInternal(newChild: Expression): ContentChunks =
    copy(child = newChild)
}

object ContentChunks {

  /** Length field width: 20 bits. Chunk hash < 1e9+7 keeps the packed
    * value far under 2^63.
    */
  final val LenCap = (1 << 20) - 1

  /** Called from both interpreted eval and generated code. The empty
    * string yields one empty chunk (hash 0, len 0) — same as the oracle's
    * reduce over an empty slice.
    */
  def chunks(s: UTF8String, w: Int, div: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = w - 1 // 0-based window END; window covers [i-w+1, i]
    while (i < n) {
      var h = 0L
      var j = i - w + 1
      while (j <= i) { h = (h * 31L + cps(j)) % PolyHash.Mod; j += 1 }
      if (h % div == 0) ends += (i + 1) // record as 1-based end
      i += 1
    }
    if (ends.isEmpty || ends(ends.length - 1) != n) ends += n
    val out = new Array[Long](ends.length)
    var st = 0
    var k = 0
    while (k < ends.length) {
      val e = ends(k)
      var h = 0L
      var j = st
      while (j < e) { h = (h * 31L + cps(j)) % PolyHash.Mod; j += 1 }
      out(k) = h * (LenCap + 1).toLong + math.min(e - st, LenCap)
      st = e
      k += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, w: Int = 8, div: Int = 32): Column =
    ColumnBridge.column(ContentChunks(ColumnBridge.expression(c), w, div))
}
