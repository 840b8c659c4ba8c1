package graft.plans

import graft.io.StatsManifest
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types._

/** Opt-in optimizer rule (`spark.graft.manifest.metacount = true`): a
  * global `COUNT(*)` under a band predicate over a [[ManifestRegistry]]-
  * registered table is rewritten to the metadata-first shape
  * [[StatsManifest.countPruned]] computes imperatively — made transparent
  * at the plan level, the way Iceberg/Delta answer metadata-only queries:
  *
  * {{{ (boundary-file count under the ORIGINAL predicate) + metaRows }}}
  *
  * where `metaRows` is the footer row total of files whose stats band
  * sits wholly inside the query band with ZERO footer nulls (the nulls
  * channel licenses crediting blind), and the boundary scan covers only
  * the files straddling a band edge. Nothing executes at planning beyond
  * the manifest split itself (driver-side, file-count-sized — the same
  * magnitude as the file listing the planner already materializes); the
  * boundary count stays a lazy plan fragment.
  *
  * Exactness discipline — the crucial difference from
  * [[ManifestPruneRule]]: pruning may extract bounds CONSERVATIVELY
  * (keeping extra files only costs speed), but counting from metadata is
  * only sound when the extracted bands are EXACTLY the predicate. So the
  * rewrite fires only when EVERY conjunct is a bare attribute-vs-literal
  * comparison on a stats-covered column, converted exactly: strict
  * bounds tighten by one on the integral stat domains (`x > v` ⇔
  * `x ≥ v+1` — every manifest domain is integral), equality becomes
  * [v, v], and anything else (IN-list gaps, OR, expression-wrapped
  * columns, uncovered columns) abandons the rewrite entirely. The
  * boundary fragment re-applies the ORIGINAL predicate, so the rewrite
  * is row-for-row the source aggregate.
  */
object MetaCountRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.manifest.metacount", "false").toBoolean

  /** Literal → Long in the manifest stat domain ([[ManifestPruneRule]]'s
    * table, duplicated here because that one is private and the two rules
    * deliberately do not share extraction discipline).
    */
  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType)         => Some(v)
    case Literal(v: Int, IntegerType)       => Some(v.toLong)
    case Literal(v: Short, ShortType)       => Some(v.toLong)
    case Literal(v: Byte, ByteType)         => Some(v.toLong)
    case Literal(v: Int, DateType)          => Some(v.toLong)
    case Literal(v: Long, TimestampType)    => Some(v)
    case Literal(v: Long, TimestampNTZType) => Some(v)
    case Literal(d: Decimal, dt: DecimalType)
        if dt.precision <= Decimal.MAX_LONG_DIGITS => Some(d.toUnscaledLong)
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x         => Seq(x)
  }

  /** EXACT per-column bands, or None when any conjunct cannot be
    * represented exactly. Strict comparisons tighten by one (integral
    * domains); Long.MinValue/MaxValue endpoints that cannot tighten
    * abandon the rewrite (no silent wrap).
    */
  private def exactBounds(cond: Expression,
      covered: Set[String]): Option[Seq[(String, Long, Long)]] = {
    val per = collection.mutable.Map.empty[String, (Long, Long)]
    def tighten(name: String, lo: Long, hi: Long): Boolean =
      covered(name) && {
        val (l0, h0) = per.getOrElse(name, (Long.MinValue, Long.MaxValue))
        per(name) = (math.max(l0, lo), math.min(h0, hi))
        true
      }
    val ok = conjuncts(cond).forall {
      case GreaterThanOrEqual(a: AttributeReference, l) =>
        litLong(l).exists(v => tighten(a.name, v, Long.MaxValue))
      case GreaterThan(a: AttributeReference, l) =>
        litLong(l).exists(v => v < Long.MaxValue &&
          tighten(a.name, v + 1, Long.MaxValue))
      case LessThanOrEqual(a: AttributeReference, l) =>
        litLong(l).exists(v => tighten(a.name, Long.MinValue, v))
      case LessThan(a: AttributeReference, l) =>
        litLong(l).exists(v => v > Long.MinValue &&
          tighten(a.name, Long.MinValue, v - 1))
      case EqualTo(a: AttributeReference, l) =>
        litLong(l).exists(v => tighten(a.name, v, v))
      case GreaterThanOrEqual(l, a: AttributeReference) =>
        litLong(l).exists(v => tighten(a.name, Long.MinValue, v))
      case GreaterThan(l, a: AttributeReference) =>
        litLong(l).exists(v => v > Long.MinValue &&
          tighten(a.name, Long.MinValue, v - 1))
      case LessThanOrEqual(l, a: AttributeReference) =>
        litLong(l).exists(v => tighten(a.name, v, Long.MaxValue))
      case LessThan(l, a: AttributeReference) =>
        litLong(l).exists(v => v < Long.MaxValue &&
          tighten(a.name, v + 1, Long.MaxValue))
      case EqualTo(l, a: AttributeReference) =>
        litLong(l).exists(v => tighten(a.name, v, v))
      // the optimizer infers IsNotNull from every band conjunct; as a
      // FULL-RANGE band it is exact — the countSplit coverage check then
      // requires nulls_<col> == 0 before crediting a file blind, which
      // is precisely the IsNotNull semantics (and it makes a bare
      // `WHERE x IS NOT NULL` count itself metadata-answerable)
      case IsNotNull(a: AttributeReference) =>
        tighten(a.name, Long.MinValue, Long.MaxValue)
      case _ => false // anything else: the band would be lossy — no rewrite
    }
    if (!ok || per.isEmpty) None
    else Some(per.toSeq.map { case (c, (lo, hi)) => (c, lo, hi) }.sortBy(_._1))
  }

  /** A global COUNT(1) aggregate: Seq(alias of the bare count). */
  private object GlobalCount {
    def unapply(agg: Aggregate): Option[Alias] = agg match {
      case Aggregate(Nil, Seq(a @ Alias(
          AggregateExpression(Count(Seq(Literal(1, IntegerType))),
            Complete, false, None, _), _)), _, _) => Some(a)
      case _ => None
    }
  }

  /** Filter over a registered relation, looking through a pure-attribute
    * Project (what column pruning inserts under the aggregate).
    */
  private object FilteredScan {
    def unapply(p: LogicalPlan): Option[(Expression, LogicalRelation)] =
      p match {
        case Filter(cond, lr: LogicalRelation)
            if lr.relation.isInstanceOf[HadoopFsRelation] => Some((cond, lr))
        case Project(pl, Filter(cond, lr: LogicalRelation))
            if pl.forall(_.isInstanceOf[AttributeReference]) &&
              lr.relation.isInstanceOf[HadoopFsRelation] => Some((cond, lr))
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || ManifestRegistry.isEmpty) plan
    else plan.transformUp {
      case agg @ GlobalCount(alias) =>
        val child = agg.asInstanceOf[Aggregate].child
        child match {
          case FilteredScan(cond, lr) =>
            val fsRel = lr.relation.asInstanceOf[HadoopFsRelation]
            ManifestRegistry.lookup(fsRel.location.rootPaths) match {
              case None => agg
              case Some((root, manifest)) =>
                val covered = manifest.columns
                  .filter(_.startsWith("min_")).map(_.stripPrefix("min_")).toSet
                exactBounds(cond, covered) match {
                  case None => agg
                  case Some(bounds) =>
                    val (metaRows, _, boundary) =
                      StatsManifest.countSplit(manifest, bounds)
                    val session = fsRel.sparkSession
                    // the original output attribute survives verbatim so
                    // every parent resolves unchanged
                    def out(e: Expression): NamedExpression =
                      Alias(e, alias.name)(exprId = alias.exprId)
                    if (boundary.isEmpty)
                      Project(Seq(out(Literal(metaRows, LongType))),
                        OneRowRelation())
                    else {
                      val prunedIndex = new InMemoryFileIndex(session,
                        boundary.map(new Path(_)), Map("basePath" -> root),
                        Some(fsRel.dataSchema))
                      val prunedRel = fsRel.copy(location = prunedIndex)(session)
                      val bcnt = Alias(AggregateExpression(
                        Count(Seq(Literal(1))), Complete, isDistinct = false),
                        "graft_boundary_count")()
                      val inner = Aggregate(Nil, Seq(bcnt),
                        Filter(cond, lr.copy(relation = prunedRel)))
                      Project(Seq(out(Add(bcnt.toAttribute,
                        Literal(metaRows, LongType)))), inner)
                    }
                }
            }
          case _ => agg
        }
    }
}
