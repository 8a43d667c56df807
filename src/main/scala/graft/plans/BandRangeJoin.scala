package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: rewrite a pure range (theta) inner join whose condition
  * bounds `leftTime - rightTime` inside a finite window into a BANDED
  * equi-join — the `join_theta_range` DataFrame rewrite done as a
  * `Rule[LogicalPlan]`, so SQL-text and library callers get it for free
  * (SURVEY.md §4 "Range-join banding").
  *
  * Without it Catalyst plans a pure range join as BroadcastNestedLoop or
  * CartesianProduct — O(|L|·|R|) comparisons, dead at scale. The rewrite:
  *
  *   - band width W = hi − lo (the window the conjuncts imply);
  *   - left gains `band = lt div W`;
  *   - right explodes into the ≤ 2 candidate bands covering
  *     `[rt + lo, rt + hi]` (truncating div moves by at most 1 across a
  *     span of W);
  *   - join becomes equi on the band with the ORIGINAL condition kept as a
  *     residual filter — exactness is the residual's job, the band only
  *     prunes pairs.
  *
  * By default fires only when no equi conjunct exists (with one, hash
  * partitioning usually bounds the pair space already) and both time sides
  * are bare/offset bigint attributes. When the session conf
  * `spark.graft.bandRangeJoin.withEquiKeys` is true the rule ALSO fires on
  * equi+range joins, adding the band to the equi keys: the shape that
  * needs this is a LOW-CARDINALITY equi key (few tags/types/segments),
  * where each key group is huge and the per-group range scan is quadratic —
  * banding subdivides every group by time at the cost of the ≤7× right-side
  * band explosion. That trade is wrong for high-cardinality keys (the
  * common case), so it is opt-in per pipeline rather than a default; the
  * logical plan alone cannot see key cardinality without CBO stats.
  * An explicit guard on the generated `graft_band_*` attributes stops the
  * rule re-firing on its own output (the residual range conjuncts it keeps
  * would otherwise re-trigger it every fixed-point pass when the flag is
  * on).
  */
object BandRangeJoinRule extends Rule[LogicalPlan] {

  /** Fixed-length micros of a calendar interval (reject month components —
    * not a constant duration; days accepted as 86400 s, valid in the
    * engine's UTC sessions).
    */
  private def intervalMicros(i: CalendarInterval): Option[Long] =
    if (i.months != 0) None
    else Some(i.days * 86400000000L + i.microseconds)

  /** e as (attribute, additive offset) in the attribute's integer domain:
    * bigint attrs with long-literal offsets, or timestamp attrs with
    * constant-interval offsets (micros domain).
    */
  private def linear(e: Expression): Option[(Attribute, Long)] = e match {
    case a: AttributeReference if a.dataType == LongType => Some((a, 0L))
    case a: AttributeReference if a.dataType == TimestampType => Some((a, 0L))
    case Add(a: AttributeReference, Literal(v: Long, LongType), _) => Some((a, v))
    case Add(Literal(v: Long, LongType), a: AttributeReference, _) => Some((a, v))
    case Subtract(a: AttributeReference, Literal(v: Long, LongType), _) => Some((a, -v))
    // ANSI interval literals are DayTimeIntervalType (a micros long);
    // legacy CalendarInterval appears from older parsers
    case TimestampAddInterval(a: AttributeReference,
        Literal(v: Long, _: org.apache.spark.sql.types.DayTimeIntervalType), _) =>
      Some((a, v))
    case TimestampAddInterval(a: AttributeReference, Literal(i: CalendarInterval, _), _) =>
      intervalMicros(i).map(m => (a, m))
    case _ => None
  }

  /** The attribute in its integer comparison domain: bigint as-is,
    * timestamp as epoch micros.
    */
  private def asLong(a: Attribute): Expression =
    if (a.dataType == TimestampType) UnixMicros(a) else a

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case other => Seq(other)
  }

  /** Normalize one comparison conjunct to a bound on (la − ra):
    * Some((la, ra, lo, hi)) with exactly one of lo/hi defined. Strict
    * bounds widen to inclusive — the residual filter restores exactness.
    */
  private def asBound(c: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Attribute, Attribute, Option[Long], Option[Long])] = {
    def norm(e1: Expression, e2: Expression) = // e1 <= e2
      (linear(e1), linear(e2)) match {
        case (Some((a1, o1)), Some((a2, o2))) =>
          if (l.outputSet.contains(a1) && r.outputSet.contains(a2))
            Some((a1, a2, None, Some(o2 - o1))) // la - ra <= o2 - o1
          else if (r.outputSet.contains(a1) && l.outputSet.contains(a2))
            Some((a2, a1, Some(o1 - o2), None)) // la - ra >= o1 - o2
          else None
        case _ => None
      }
    c match {
      case LessThanOrEqual(e1, e2) => norm(e1, e2)
      case LessThan(e1, e2) => norm(e1, e2)
      case GreaterThanOrEqual(e1, e2) => norm(e2, e1)
      case GreaterThan(e1, e2) => norm(e2, e1)
      case _ => None
    }
  }

  private def hasEquiConjunct(conjs: Seq[Expression], l: LogicalPlan, r: LogicalPlan): Boolean =
    conjs.exists {
      case EqualTo(e1, e2) =>
        (e1.references.subsetOf(l.outputSet) && e2.references.subsetOf(r.outputSet)) ||
          (e1.references.subsetOf(r.outputSet) && e2.references.subsetOf(l.outputSet))
      case _ => false
    }

  /** Opt-in: band equi+range joins too (low-cardinality equi keys). */
  val WithEquiKeysConf = "spark.graft.bandRangeJoin.withEquiKeys"

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(l, r, Inner, Some(cond), hint) =>
      val conjs = splitConj(cond)
      val alreadyBanded =
        conjs.exists(_.references.exists(_.name.startsWith("graft_band")))
      val bandWithEqui =
        conf.getConfString(WithEquiKeysConf, "false").toBoolean
      if (alreadyBanded || (hasEquiConjunct(conjs, l, r) && !bandWithEqui)) j
      else {
        // tightest (lo, hi) per (la, ra) attribute pair
        val bounds = conjs.flatMap(asBound(_, l, r))
          .groupBy(b => (b._1, b._2))
          .map { case (k, bs) =>
            k -> (bs.flatMap(_._3).sorted.lastOption, bs.flatMap(_._4).sorted.headOption)
          }
        bounds.collectFirst {
          // overflow guards: the width subtraction must not wrap, and the
          // band arithmetic below divides BEFORE adding a small offset, so
          // with w >= 2 and bounded offsets no intermediate can overflow
          // even for attribute values at the Long extremes (a sentinel
          // "infinity" time must never be silently dropped — exactness is
          // the rule's contract)
          case ((la, ra), (Some(lo), Some(hi)))
            if la.dataType == ra.dataType &&
              math.abs(lo) < (1L << 61) && math.abs(hi) < (1L << 61) &&
              hi - lo >= 2 => (la, ra, lo, hi)
        } match {
          case None => j
          case Some((la, ra, lo, hi)) =>
            val width = hi - lo
            val w = Literal(width, LongType)
            val bandL = Alias(IntegralDivide(asLong(la), w), "graft_band_l")()
            val leftP = Project(l.output :+ bandL, l)
            // candidate bands as trunc(ra/w) + d — never ra + offset, which
            // could wrap for extreme ra. Truncating division is NOT
            // translation-invariant (unlike floor), so the band of a value
            // in [ra+lo, ra+hi] can deviate from trunc(ra/w) + trunc(k/w)
            // by up to 2 in either direction — generate the full ±2-widened
            // offset set (≤ 7 bands for hi - lo = w; the equi-join dedups
            // via ArrayDistinct and the residual keeps exactness).
            val dRange = (lo / width - 2) to (hi / width + 2)
            val bands = ArrayDistinct(CreateArray(
              dRange.map(d => Add(IntegralDivide(asLong(ra), w), Literal(d, LongType)))))
            val bandR = AttributeReference("graft_band_r", LongType, nullable = true)()
            val rightG = Generate(Explode(bands), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(bandR), r)
            val banded = Join(leftP, rightG, Inner,
              Some(And(EqualTo(bandL.toAttribute, bandR), cond)), hint)
            Project(j.output, banded)
        }
      }
  }
}

object BandRangeJoin {
  /** Install the rule on a session (idempotent). Also available through
    * `spark.sql.extensions=graft.GraftExtensions`.
    */
  def install(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(BandRangeJoinRule)) {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ BandRangeJoinRule
    }
}
