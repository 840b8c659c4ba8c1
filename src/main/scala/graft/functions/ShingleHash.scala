package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → n-gram shingle → polynomial hash, as one codegen
  * expression returning `array<long>`.
  *
  * Semantically identical to
  * `transform(shingles(split(lower(text)," "), n), poly_hash)` — same
  * space-split (trailing empties kept, like Spark's `split`), same
  * "short doc ⇒ one whole-text shingle" fallback, same per-codepoint
  * fold as [[PolyHash]] — but evaluated in a single O(chars) pass with no
  * intermediate token/shingle string arrays. The higher-order-function
  * formulation spent its time materializing 50+ shingle strings per
  * document through interpreted lambdas; this is the MinHash front-end
  * that survives wide corpora.
  */
case class ShingleHash(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hash requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

object ShingleHash {
  import PolyHash.Mod

  /** Called from both interpreted eval and generated code. */
  def hashes(str: UTF8String, n: Int): ArrayData = {
    val s = str.toLowerCase.toString
    // split on single space keeping empties, matching Spark split semantics
    val toks = s.split(" ", -1)
    if (toks.length < n) {
      // short doc: one shingle = the whole lowercased text (tokens re-joined
      // with the same separator reconstruct the input)
      new GenericArrayData(Array(PolyHash.hash(UTF8String.fromString(s))))
    } else {
      val out = new Array[Long](toks.length - n + 1)
      var i = 0
      while (i < out.length) {
        var acc = 0L
        var j = 0
        while (j < n) {
          if (j > 0) acc = (acc * 31L + ' '.toInt) % Mod
          val t = toks(i + j)
          var k = 0
          while (k < t.length) {
            val cp = t.codePointAt(k)
            acc = (acc * 31L + cp) % Mod
            k += Character.charCount(cp)
          }
          j += 1
        }
        out(i) = acc
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(c), n))
}
