package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** A product-quantization codebook in executor-ready form: `m` subspaces
  * of `dsub` coordinates, `ksub` centroids per subspace, centroid
  * `(sub, code)` at `cents(sub * ksub + code)`. Centroid coordinates are
  * DOUBLE so an arithmetic (hash-generated) codebook is exactly the
  * rational values its SQL twin regenerates — no float round-trip
  * between the engine and the oracle.
  */
final class PqCodebook(val m: Int, val dsub: Int, val ksub: Int,
    val cents: Array[Array[Double]]) extends Serializable {
  require(m >= 1 && dsub >= 1 && ksub >= 2, s"pq: m=$m dsub=$dsub ksub=$ksub")
  require(cents.length == m * ksub,
    s"pq: ${cents.length} centroids != m*ksub = ${m * ksub}")
  require(cents.forall(_.length == dsub), s"pq: centroid dim != dsub=$dsub")
  val dim: Int = m * dsub

  // Structural equality (Array compares by reference), so the
  // expressions carrying a codebook ([[PqEncode]], and [[PqAdc]]'s
  // table) canonicalize equal when structurally equal — without this,
  // Catalyst semanticEquals / exchange reuse / cached-plan matching
  // silently fail on any plan containing them.
  override def equals(o: Any): Boolean = o match {
    case that: PqCodebook =>
      m == that.m && dsub == that.dsub && ksub == that.ksub &&
        cents.length == that.cents.length &&
        cents.indices.forall(i =>
          java.util.Arrays.equals(cents(i), that.cents(i)))
    case _ => false
  }

  // cached — Catalyst hashes the carrying expressions repeatedly (the
  // NearestCell rationale; m × ksub × dsub doubles per sweep)
  @transient private lazy val cachedHash: Int = {
    var h = (m * 31 + dsub) * 31 + ksub
    cents.foreach(a => h = h * 31 + java.util.Arrays.hashCode(a))
    h
  }

  override def hashCode(): Int = cachedHash
}

/** PQ ENCODE as one codegen expression: unit-normalize the float vector
  * (the cosine-serving convention — on the unit sphere L2 is monotone
  * with cosine), then per subspace pick the argmin-L2 centroid, ties to
  * the smallest code. One `m × ksub × dsub` tight loop per row inside
  * whole-stage codegen, ZERO shuffle at any corpus size — the same
  * [[NearestCell]]/[[JlProject]] lesson. Every accumulation is the
  * sequential left fold the DuckDB oracle respells with
  * `list_reduce(list_prepend(0.0, …))`, so codes are bit-reproducible
  * across engines. NULL input or a vector of the wrong dimension yields
  * NULL (callers drop the row).
  */
case class PqEncode(child: Expression, codebook: PqCodebook)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires array<float>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    PqCodec.encode(v.asInstanceOf[ArrayData], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook,
      "graft.functions.PqCodebook")
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.functions.PqCodec.encode($a, $cbRef);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** PQ ASYMMETRIC DISTANCE (the ADC of IVFADC): the approximate squared
  * L2 distance from a fixed query to a PQ-coded vector is the sum of
  * `m` per-subspace table entries, where `table(sub * ksub + code)` is
  * the exact distance from the query's sub-slice to that centroid —
  * built ONCE per query on the driver ([[graft.operators.Pq]]), so the
  * corpus scan does `m` array lookups and adds per row instead of any
  * vector arithmetic. Left-fold addition in subspace order keeps the
  * result bit-reproducible by the SQL twin. NULL codes, wrong length,
  * or an out-of-range code yield NULL.
  */
case class PqAdc(child: Expression, table: Array[Double], m: Int, ksub: Int)
    extends UnaryExpression {

  require(table.length == m * ksub,
    s"pq_adc: table ${table.length} != m*ksub = ${m * ksub}")

  // element-wise equality for the table (see [[PqCodebook]] rationale)
  override def equals(o: Any): Boolean = o match {
    case that: PqAdc =>
      child == that.child && m == that.m && ksub == that.ksub &&
        java.util.Arrays.equals(table, that.table)
    case _ => false
  }

  @transient private lazy val cachedHash: Int =
    ((child.hashCode() * 31 + m) * 31 + ksub) * 31 +
      java.util.Arrays.hashCode(table)

  override def hashCode(): Int = cachedHash

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc requires array<int> codes, got ${other.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    PqCodec.adc(v.asInstanceOf[ArrayData], table, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("pqAdcTable", table, "double[]")
    val res = ctx.freshName("pqAdcRes")
    nullSafeCodeGen(ctx, ev, a => s"""
       |Double $res = graft.functions.PqCodec.adc($a, $tRef, $m, $ksub);
       |${ev.isNull} = $res == null;
       |${ev.value} = ${ev.isNull} ? -1.0 : $res.doubleValue();
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}

/** Unit-normalized subspace SLICES of a float vector as one codegen
  * expression: the per-subspace training view [[graft.operators.Pq
  * .trainCodebook]] explodes. The higher-order formulation it replaces
  * (`slice(transform(embedding, x -> x / sqrt(aggregate(...))), ...)`
  * per subspace) re-evaluated the interpreted norm fold and the full
  * normalize m times PER ROW — ~1k interpreted lambda dispatches per
  * 64-dim vector, the exact [[JlProject]] anti-pattern, and the
  * dominant cost of the enablePq rewrite at scale. One tight loop,
  * float-rounded exactly like the HOF output (same double division,
  * same cast), so trained codebooks are unchanged. NULL input, an
  * empty vector, or a dimension not divisible by `m` yields NULL.
  */
case class PqSlices(child: Expression, m: Int) extends UnaryExpression {

  require(m >= 1, s"pq_slices: m must be >= 1, got $m")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_slices requires array<float>, got ${other.catalogString}")
    }

  override def dataType: DataType =
    ArrayType(ArrayType(FloatType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_slices"
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    PqCodec.slices(v.asInstanceOf[ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.functions.PqCodec.slices($a, $m);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PqSlices =
    copy(child = newChild)
}

object PqCodec {

  def slices(arr: ArrayData, m: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0 || n % m != 0) return null
    val dsub = n / m
    var norm = 0.0
    var i = 0
    while (i < n) { val x = arr.getFloat(i).toDouble; norm += x * x; i += 1 }
    // zero-norm guard, same contract as encode: NaN slices would poison
    // the Lloyd centroid means silently — drop the row instead (callers
    // filter nulls), keeping training consistent with the encode path
    if (norm == 0.0) return null
    val nrm = math.sqrt(norm)
    val out = new Array[Any](m)
    var sub = 0
    while (sub < m) {
      val sl = new Array[Float](dsub)
      var j = 0
      while (j < dsub) {
        sl(j) = (arr.getFloat(sub * dsub + j).toDouble / nrm).toFloat
        j += 1
      }
      out(sub) = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(sl)
      sub += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def pqSlices(c: Column, m: Int): Column =
    ColumnBridge.column(PqSlices(ColumnBridge.expression(c), m))

  /** Shared by interpreted eval and generated code. Fold order is the
    * parity contract: norm and every per-subspace distance are
    * sequential left folds of doubles, exactly what the oracle's
    * `list_reduce(list_prepend(0.0, …), (a, b) -> a + b)` computes.
    */
  def encode(arr: ArrayData, cb: PqCodebook): ArrayData = {
    if (arr.numElements() != cb.dim) return null
    var norm = 0.0
    var i = 0
    while (i < cb.dim) {
      val x = arr.getFloat(i).toDouble
      norm += x * x
      i += 1
    }
    // A zero-norm vector would encode to code 0 in every subspace (all
    // distances NaN, the +Inf sentinel never beaten) — valid-looking
    // codes with an arbitrary ADC rank, while the exact serving path
    // ranks the same vector LAST (cosineSafe -1). Drop it like other
    // malformed inputs (callers filter `codes IS NOT NULL`), keeping
    // the two store paths consistent on zero vectors.
    if (norm == 0.0) return null
    val nrm = math.sqrt(norm)
    val out = new Array[Int](cb.m)
    var sub = 0
    while (sub < cb.m) {
      val base = sub * cb.dsub
      var bestCode = 0
      var bestDist = Double.PositiveInfinity
      var code = 0
      while (code < cb.ksub) {
        val c = cb.cents(sub * cb.ksub + code)
        var d = 0.0
        var j = 0
        while (j < cb.dsub) {
          val diff = arr.getFloat(base + j).toDouble / nrm - c(j)
          d += diff * diff
          j += 1
        }
        if (d < bestDist) { bestDist = d; bestCode = code } // tie → smallest
        code += 1
      }
      out(sub) = bestCode
      sub += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  def adc(codes: ArrayData, table: Array[Double], m: Int,
      ksub: Int): java.lang.Double = {
    if (codes.numElements() != m) return null
    var acc = 0.0
    var sub = 0
    while (sub < m) {
      val code = codes.getInt(sub)
      if (code < 0 || code >= ksub) return null
      acc += table(sub * ksub + code)
      sub += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def pqEncode(c: Column, cb: PqCodebook): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(c), cb))

  def pqAdc(c: Column, table: Array[Double], m: Int, ksub: Int): Column =
    ColumnBridge.column(PqAdc(ColumnBridge.expression(c), table, m, ksub))
}
