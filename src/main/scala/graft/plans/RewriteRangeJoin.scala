package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a naive time-range join into the bucketed
  * equi-join [[graft.ops.TimeJoins]] hand-writes.
  *
  * The problem this kills: an inner join whose only condition is
  * `x >= y AND x < y + INTERVAL w` has no equi-key, so Spark's join
  * strategies fall through to BroadcastNestedLoopJoin — an all-pairs
  * O(|L|·|R|) scan that is a cluster-killer the moment neither side is
  * tiny. Users write exactly this shape constantly ("clicks within 10
  * minutes of each error"); telling them to hand-bucket is engine
  * failure. This rule restores the equi-key mechanically:
  *
  *   anchor side (y):  explode k ∈ {0, 1} → bucket = ⌊y/w⌋ + k
  *   bounded side (x): bucket = ⌊x/w⌋
  *   join on bucket equality AND the ORIGINAL predicates.
  *
  * Soundness: any pair with x ∈ [y, y+w] has ⌊x/w⌋ ∈ {⌊y/w⌋, ⌊y/w⌋+1}
  * (x spans at most one bucket boundary past y), so the two exploded
  * buckets COVER every qualifying pair; each pair matches in exactly the
  * one bucket ⌊x/w⌋, so no duplicates are introduced; and the original
  * condition is kept verbatim as the residual filter, so false bucket
  * collisions are filtered — the rewrite can only ever equal the naive
  * result. The anchor side doubles (2 rows per input), the bounded side
  * is untouched — O(2·|L| + |R|) shuffled rows instead of |L|·|R| pairs.
  *
  * Fires only when ALL of:
  *  - inner join with a conjunctive condition and NO cross-side equality
  *    conjunct (an equi-join never needs this, and the guard also makes
  *    the rule idempotent — the rewritten join has a bucket equality);
  *  - a lower conjunct `x >= y` (or `y <= x`) on bare timestamp
  *    attributes of opposite sides and equal types;
  *  - an upper conjunct `x < y + INTERVAL w` (or `<=`, or mirrored) on
  *    the SAME attribute pair, with a CONSTANT day-time interval w > 0
  *    (a months-bearing interval has no fixed width — no bucketing).
  *
  * Always-on when it matches (disable with
  * `spark.graft.rewriteRangeJoin.enabled=false`): even when one side is
  * small enough that BNLJ would survive, the rewritten join is still
  * eligible for broadcast-hash on the bucketed key, so the rewrite
  * trades at worst a constant factor for removing the quadratic cliff.
  *
  * This is the (c)-tier extension mechanism end-to-end: a
  * `Rule[LogicalPlan]` injected via `SparkSessionExtensions`
  * (`injectOptimizerRule`, [[graft.functions.GraftExtensions]]) — no
  * private Spark API.
  */
class RewriteRangeJoin extends Rule[LogicalPlan] {

  private val FlagKey = "spark.graft.rewriteRangeJoin.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(FlagKey, "true").toBoolean) plan
    else plan.transformUp {
      case j: Join if j.joinType == Inner && j.condition.isDefined =>
        rewrite(j).getOrElse(j)
    }

  private def split(e: Expression): Seq[Expression] = e match {
    case And(a, b) => split(a) ++ split(b)
    case x         => Seq(x)
  }

  private def isTs(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType

  /** Constant width in microseconds of `y + INTERVAL w`, when w is a
    * fixed-length literal. */
  private def constWidth(lit: Literal): Option[Long] = lit.dataType match {
    case _: DayTimeIntervalType => Some(lit.value.asInstanceOf[Long])
    case CalendarIntervalType =>
      val i = lit.value.asInstanceOf[org.apache.spark.unsafe.types.CalendarInterval]
      if (i.months == 0) Some(i.days * 86400000000L + i.microseconds) else None
    case _ => None
  }

  /** `y + <constant interval>` in either of the two analyzed forms
    * (day-time interval → TimestampAddInterval; calendar interval →
    * TimeAdd). */
  private object TsPlusConst {
    def unapply(e: Expression): Option[(AttributeReference, Literal)] = e match {
      case TimestampAddInterval(y: AttributeReference, l: Literal, _) => Some((y, l))
      case _                                                          => None
    }
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val conjuncts = split(j.condition.get)
    val crossEquality = conjuncts.exists {
      case e @ (_: EqualTo | _: EqualNullSafe) =>
        val Seq(a, b) = e.children
        a.references.nonEmpty && b.references.nonEmpty &&
          !(a.references ++ b.references).subsetOf(j.left.outputSet) &&
          !(a.references ++ b.references).subsetOf(j.right.outputSet)
      case _ => false
    }
    if (crossEquality) return None

    // normalize: (bounded, anchor) candidates from `x >= y` / `y <= x`
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(x: AttributeReference, y: AttributeReference) => (x, y)
      case LessThanOrEqual(y: AttributeReference, x: AttributeReference)    => (x, y)
    }.filter { case (x, y) =>
      isTs(x.dataType) && x.dataType == y.dataType &&
        ((j.left.outputSet.contains(x) && j.right.outputSet.contains(y)) ||
         (j.right.outputSet.contains(x) && j.left.outputSet.contains(y)))
    }
    // normalize: (bounded, anchor, width) from `x < y + w` / `x <= y + w`
    // and mirrors
    val uppers = conjuncts.collect {
      case LessThan(x: AttributeReference, TsPlusConst(y, l))           => (x, y, l)
      case LessThanOrEqual(x: AttributeReference, TsPlusConst(y, l))    => (x, y, l)
      case GreaterThan(TsPlusConst(y, l), x: AttributeReference)        => (x, y, l)
      case GreaterThanOrEqual(TsPlusConst(y, l), x: AttributeReference) => (x, y, l)
    }

    val matched = for {
      (x, y)       <- lowers
      (x2, y2, l)  <- uppers
      if x2.semanticEquals(x) && y2.semanticEquals(y)
      w            <- constWidth(l)
      if w > 0
    } yield (x, y, w)

    matched.headOption.map { case (x, y, w) =>
      val tz = Option(conf.sessionLocalTimeZone)
      // INTEGER floor-division (pmod-floored numerator), never
      // floor(us / w) in doubles: double division drifts near 2^53 µs
      // and the two-bucket cover argument needs bucket math exact for
      // every representable timestamp
      def bucket(ts: Expression): Expression = {
        val us = UnixMicros(Cast(ts, TimestampType, tz))
        IntegralDivide(Subtract(us, Pmod(us, Literal(w))), Literal(w))
      }

      val anchorIsLeft = j.left.outputSet.contains(y)
      val (anchorPlan, boundedPlan) =
        if (anchorIsLeft) (j.left, j.right) else (j.right, j.left)

      // anchor: explode bucket(y) + {0, 1}
      val kAttr = AttributeReference("__graft_bucket_k", LongType, nullable = true)()
      val gen = Generate(
        Explode(CreateArray(Seq(bucket(y), Add(bucket(y), Literal(1L))))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(kAttr), child = anchorPlan)

      // bounded: home bucket
      val hAlias = Alias(bucket(x), "__graft_bucket_h")()
      val proj = Project(boundedPlan.output :+ hAlias, boundedPlan)

      val bucketEq = EqualTo(kAttr, hAlias.toAttribute)
      val (newLeft, newRight) = if (anchorIsLeft) (gen, proj) else (proj, gen)
      val newJoin = Join(newLeft, newRight, Inner,
                         Some(And(bucketEq, j.condition.get)), j.hint)
      Project(j.output, newJoin)
    }
  }
}
