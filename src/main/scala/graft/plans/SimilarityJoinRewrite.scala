package graft.plans

import graft.functions.{CosineSim, LshBuckets}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

/** Opt-in optimizer rule: a cosine-threshold join written naively as
  * `a CROSS JOIN b WHERE cosine_sim(a.e, b.e) >= t` plans as a cartesian
  * product — O(n²) pairs evaluated, unrunnable at scale. With
  * `spark.graft.lsh.rewrite = true` this rule rewrites it into the LSH
  * banding plan: explode multi-table random-hyperplane bucket ids on both
  * sides, equi-join on the bucket id (hash join, shuffle on bucket),
  * distinct the candidate pairs, and re-apply the ORIGINAL predicate as an
  * exact verification.
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
  * Beyond the recall approximation, the rewritten plan changes result
  * MULTIPLICITY: candidate pairs are deduped over the joined output
  * columns, so two fully-identical input rows that the naive
  * cross-join+filter would emit N×M times collapse to one output row.
  * Sides carrying a unique key column are unaffected (every output row
  * is distinct anyway — the recommended shape, which also keeps the
  * dedup's shuffle keys narrow; without a key the grouping keys include
  * the embedding arrays themselves). Enable the rule only if set —
  * not bag — semantics are acceptable for the join's output.
  */
object SimilarityJoinRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.lsh.rewrite", "false").toBoolean
  private def bits: Int = conf.getConfString("spark.graft.lsh.bits", "6").toInt
  private def tables: Int = conf.getConfString("spark.graft.lsh.tables", "8").toInt
  private def seed: Long = conf.getConfString("spark.graft.lsh.seed", "0").toLong

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

  private def withBuckets(side: LogicalPlan,
      emb: Expression): (LogicalPlan, Attribute) = {
    val attr = AttributeReference("__graft_lsh_bucket", LongType, nullable = false)()
    (Generate(Explode(LshBuckets(emb, bits, tables, seed)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(attr), child = side), attr)
  }

  private def rewrite(cond: Expression, l: LogicalPlan, r: LogicalPlan,
      embL: Expression, embR: Expression): LogicalPlan = {
    val (lb, la) = withBuckets(l, embL)
    val (rb, ra) = withBuckets(r, embR)
    val joined = Join(lb, rb, Inner, Some(EqualTo(la, ra)), JoinHint.NONE)
    val pairCols = l.output ++ r.output
    // verify-then-distinct, not distinct-then-verify: the exact predicate
    // is cheap streaming codegen, so run it over every candidate straight
    // off the join (a pair colliding in k tables is just verified k
    // times), and deduplicate only the survivors. The other order groups
    // the FULL candidate set by the pair's columns — including the
    // embedding arrays themselves — which at sf0.1 shuffled 75M
    // array-keyed rows (100 s) for a result the filter would have cut to
    // a handful.
    val verified = Filter(cond, Project(pairCols, joined))
    Aggregate(pairCols, pairCols, verified)
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
