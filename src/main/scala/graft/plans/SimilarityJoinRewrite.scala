package graft.plans

import graft.functions.{CosineSim, LshBuckets}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType}

/** Opt-in optimizer rule: a cosine-threshold join written naively as
  * `a CROSS JOIN b WHERE cosine_sim(a.e, b.e) >= t` plans as a cartesian
  * product — O(n²) pairs evaluated, unrunnable at scale. With
  * `spark.graft.lsh.rewrite = true` this rule rewrites it into the LSH
  * banding plan: explode multi-table random-hyperplane bucket ids on both
  * sides, equi-join on (table, bucket) keeping each pair only at its first
  * colliding table (hash join, shuffle on the bucket key), and re-apply
  * the ORIGINAL predicate as an exact verification.
  *
  * The rewrite is precision-preserving (every surviving pair passed the
  * exact predicate) but recall-approximate (a true pair is found only if
  * some hash table buckets it together), so it is strictly opt-in — the
  * declarative plan states intent, the config picks the scale strategy,
  * mirroring Spark's own stance on `spark.sql.crossJoin.enabled`. Recall
  * tunes with `spark.graft.lsh.tables` (OR-amplification) vs
  * `spark.graft.lsh.bits` (bucket selectivity).
  *
  * ==Result multiplicity (user-facing contract)==
  * `spark.graft.lsh.multiplicity` picks the dedup strategy for pairs
  * colliding in several hash tables:
  *
  *  - `"set"` (default): deduplicate survivors over the joined output
  *    columns. Fully-duplicate input rows that the naive
  *    cross-join+filter would emit N×M times collapse to ONE output row
  *    — enable only if set semantics are acceptable. Sides carrying a
  *    unique key are unaffected and keep the dedup's shuffle narrow;
  *    without one the grouping keys include the embedding arrays.
  *    Fastest shape: the exact verify prunes before any dedup work.
  *  - `"bag"`: preserve the naive join's exact multiplicity — each
  *    matching (rowL, rowR) pair is kept only at its FIRST colliding
  *    table (both sides carry their per-table bucket array and the
  *    codegen [[graft.functions.FirstEqualIndex]] condition selects the
  *    first agreeing position), so no dedup operator and no extra
  *    shuffle exist in the plan at all. Measured ~2× the set shape's
  *    wall-clock at sf0.1 (the arrays ride through the broadcast and
  *    every hash-matched candidate pays the array walk), but the only
  *    shuffle is the bucket join itself — the shape to pick when
  *    duplicate rows are data, not noise.
  */
object SimilarityJoinRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.lsh.rewrite", "false").toBoolean
  private def bits: Int = conf.getConfString("spark.graft.lsh.bits", "6").toInt
  private def tables: Int = conf.getConfString("spark.graft.lsh.tables", "8").toInt
  private def seed: Long = conf.getConfString("spark.graft.lsh.seed", "0").toLong
  private def bagSemantics: Boolean =
    conf.getConfString("spark.graft.lsh.multiplicity", "set") == "bag"

  /** The cosine-threshold conjunct, if present: cosine_sim(l, r) >= lit
    * (either operand order), with one embedding from each join side.
    */
  private def thresholdConjunct(cond: Expression, l: LogicalPlan,
      r: LogicalPlan): Option[(Expression, Expression)] = {
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet))
        Some((a, b))
      else if (b.references.subsetOf(l.outputSet) && a.references.subsetOf(r.outputSet))
        Some((b, a))
      else None
    def isFloatArr(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    splitConjunctivePredicates(cond).iterator.flatMap {
      case GreaterThanOrEqual(c: CosineSim, _: Literal) => sides(c.left, c.right)
      case GreaterThan(c: CosineSim, _: Literal) => sides(c.left, c.right)
      case LessThanOrEqual(_: Literal, c: CosineSim) => sides(c.left, c.right)
      case LessThan(_: Literal, c: CosineSim) => sides(c.left, c.right)
      case _ => None
    }.find { case (a, b) => isFloatArr(a) && isFloatArr(b) }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(a, b) => splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
      case other => other :: Nil
    }

  /** A side that already contains an LSH bucket explode is an LSH plan the
    * user (or this rule) built — re-bucketing it would stack a second
    * recall loss on top. Guards both idempotence and hand-built pipelines
    * like [[graft.operators.Similarity.nearDupPairs]], whose exact-verify
    * cosine filter lands adjacent to its bucket join after pushdown.
    */
  private def alreadyBucketed(p: LogicalPlan): Boolean =
    p.exists(_.expressions.exists(_.exists(_.isInstanceOf[LshBuckets])))

  /** Set-mode side plan: (child cols..., exploded bucket) — the bucket
    * array exists only inside the generator, so nothing wide survives
    * into the join.
    */
  private def withBuckets(side: LogicalPlan,
      emb: Expression): (LogicalPlan, Attribute) = {
    val attr = AttributeReference("__graft_lsh_bucket", LongType, nullable = false)()
    (Generate(Explode(LshBuckets(emb, bits, tables, seed)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(attr), child = side), attr)
  }

  /** Bag-mode side plan: additionally carries the all-tables bucket
    * array (computed once in the Project; the explode and the
    * first-collision condition both read it). The bucket id folds its
    * table index into bits 32+ (LshBuckets), so no position column is
    * needed.
    */
  private def withBucketsAndArray(side: LogicalPlan, emb: Expression)
      : (LogicalPlan, Attribute, Attribute) = {
    val allAlias = Alias(LshBuckets(emb, bits, tables, seed), "__graft_lsh_all")()
    val projected = Project(side.output :+ allAlias, side)
    val bucket = AttributeReference("__graft_lsh_bucket", LongType, nullable = false)()
    (Generate(Explode(allAlias.toAttribute),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bucket), child = projected),
      allAlias.toAttribute, bucket)
  }

  /** Explicit parallelism for the bucket join (fixed-width hash
    * repartition on the join key, so the join reuses the exchange): the
    * exploded bucket rows are kilobytes at the join input but fan out
    * quadratically per shared bucket, and AQE — sizing the exchange from
    * the PRE-join bytes — coalesces it to one partition and runs the
    * whole quadratic bucket scan single-threaded (the
    * hammingNearDupPairs/videoJaccardPairs failure mode, guide §2.6).
    */
  private def spread(p: LogicalPlan, key: Attribute): LogicalPlan =
    RepartitionByExpression(Seq(key), p, Some(conf.numShufflePartitions))

  private def rewrite(cond: Expression, l: LogicalPlan, r: LogicalPlan,
      embL: Expression, embR: Expression): LogicalPlan = {
    val pairCols = l.output ++ r.output
    if (bagSemantics) {
      val (lb0, allL, bktL) = withBucketsAndArray(l, embL)
      val (rb0, allR, bktR) = withBucketsAndArray(r, embR)
      val (lb, rb) = (spread(lb0, bktL), spread(rb0, bktR))
      val joined = Join(lb, rb, Inner, Some(EqualTo(bktL, bktR)), JoinHint.NONE)
      // keep a match only at its FIRST colliding table: the bucket's
      // table index (bucket >> 32, folded in by LshBuckets) must be the
      // first position where the sides' bucket arrays agree. Exactly one
      // surviving row per matching (rowL, rowR) pair — the naive join's
      // multiplicity, no dedup operator, no extra shuffle.
      // FirstEqualIndex is a codegen expression, NOT
      // array_position(zip_with(...)): HOFs are CodegenFallback and this
      // runs once per hash-matched candidate (measured 58 s vs 4 s at
      // sf0.1 interpreted).
      val firstCollision = graft.functions.FirstEqualIndex(allL, allR)
      val tableOfBucket = Add(ShiftRight(bktL, Literal(32)), Literal(1L))
      val dedup = Filter(And(cond, EqualTo(firstCollision, tableOfBucket)), joined)
      Project(pairCols, dedup)
    } else {
      val (lb0, bktL) = withBuckets(l, embL)
      val (rb0, bktR) = withBuckets(r, embR)
      val (lb, rb) = (spread(lb0, bktL), spread(rb0, bktR))
      val joined = Join(lb, rb, Inner, Some(EqualTo(bktL, bktR)), JoinHint.NONE)
      // verify-then-distinct, not distinct-then-verify: the exact
      // predicate is cheap streaming codegen, so run it over every
      // candidate straight off the join (a pair colliding in k tables is
      // just verified k times), and deduplicate only the survivors. The
      // other order groups the FULL candidate set by the pair's columns —
      // including the embedding arrays — which at sf0.1 shuffled 75M
      // array-keyed rows (100 s) for a result the filter cuts to a
      // handful.
      val verified = Filter(cond, Project(pairCols, joined))
      Aggregate(pairCols, pairCols, verified)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      // predicate already merged into the join condition (the usual
      // post-pushdown shape)
      case j @ Join(l, r, Inner | Cross, Some(cond), _)
          if !alreadyBucketed(l) && !alreadyBucketed(r) =>
        thresholdConjunct(cond, l, r)
          .map { case (a, b) => rewrite(cond, l, r, a, b) }.getOrElse(j)
      // filter still sitting above an unconditioned cross join
      case f @ Filter(cond, Join(l, r, Inner | Cross, None, _))
          if !alreadyBucketed(l) && !alreadyBucketed(r) =>
        thresholdConjunct(cond, l, r)
          .map { case (a, b) => rewrite(cond, l, r, a, b) }.getOrElse(f)
    }
  }
}
