package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampType}

/** Optimizer rule (SURVEY §7.5's "range-join Rule for J3 at scale"):
  * rewrites an inner equi+interval join —
  *
  *   `l JOIN r ON ... AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL w`
  *
  * — into the time-bucketed form [[graft.ops.IntervalJoin]] applies by
  * hand: both sides gain a `floor(unix_seconds(ts) / w)` bucket key, the
  * left side explodes to its two covering buckets, and the bucket
  * equality joins the original condition. Every matching pair shares
  * exactly one of the two probed buckets, so the row multiset is
  * unchanged — but the join now carries an ADDITIONAL equi key that
  * spreads a hot join key across the time axis instead of melting one
  * reducer, and turns a pure range join (no equi key at all) from a
  * cartesian product into a hash join.
  *
  * Off by default; enabled per session with
  * `spark.graft.bucketRangeJoin=true` (the j3_interval_rule gate query
  * materializes under it and shares j3_interval_join's oracle, proving
  * the rewrite semantics end to end). Deliberately narrow match: INNER
  * join, deterministic timestamp expressions each bound to one side,
  * constant positive whole-second day-time interval. The rewritten
  * join's condition references the generated `_graft_ib` attribute,
  * which is also the guard against re-rewriting.
  */
object BucketRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.bucketRangeJoin"
  private val BucketName = "_graft_ib"

  override def apply(plan: LogicalPlan): LogicalPlan =
    // lenient parse: this rule runs inside the optimizer for EVERY query
    // in any session that loads GraftExtensions — an unparseable conf
    // value must mean "off", never an optimizer-time crash
    if (!conf.getConfString(ConfKey, "false").trim.equalsIgnoreCase("true")) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _)
          if j.resolved && !cond.references.exists(_.name == BucketName) =>
        tryRewrite(j).getOrElse(j)
    }

  /** Finds the J3 range shape in the conjuncts — a lower bound
    * `rTs >= lTs` and an upper bound `rTs <= lTs + INTERVAL w` over the
    * same timestamp pair — and emits the bucketed join. */
  private def tryRewrite(j: Join): Option[LogicalPlan] = {
    val cond = j.condition.get
    val conjuncts = splitConjunctivePredicates(cond)
    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet
    def isLeft(e: Expression) =
      e.deterministic && e.references.nonEmpty && e.references.subsetOf(leftOut)
    def isRight(e: Expression) =
      e.deterministic && e.references.nonEmpty && e.references.subsetOf(rightOut)
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(r, l)
          if r.dataType == TimestampType && l.dataType == TimestampType &&
            isRight(r) && isLeft(l) => (l, r)
      case LessThanOrEqual(l, r)
          if r.dataType == TimestampType && l.dataType == TimestampType &&
            isLeft(l) && isRight(r) => (l, r)
    }
    val uppers = conjuncts.collect {
      case LessThanOrEqual(r,
          TimestampAddInterval(l, Literal(micros: Long, _: DayTimeIntervalType), _))
          if isRight(r) && isLeft(l) => (l, r, micros)
      case GreaterThanOrEqual(
          TimestampAddInterval(l, Literal(micros: Long, _: DayTimeIntervalType), _), r)
          if isRight(r) && isLeft(l) => (l, r, micros)
    }
    val matched = (for {
      (loL, loR) <- lowers
      (upL, upR, micros) <- uppers
      if loL.semanticEquals(upL) && loR.semanticEquals(upR) &&
        micros > 0 && micros % 1000000L == 0
    } yield (loL, loR, micros / 1000000L)).headOption

    matched.map { case (lTs, rTs, w) =>
      // floor(unix_seconds(ts) / w) via (s - pmod(s, w)) div w — exact
      // integer floor-division for any sign, no double roundtrip
      def bucket(ts: Expression): Expression = {
        val s = UnixSeconds(ts)
        IntegralDivide(Subtract(s, Pmod(s, Literal(w))), Literal(w))
      }
      val lb = bucket(lTs)
      val lBucketAttr = AttributeReference(BucketName, LongType)()
      val genLeft = Generate(
        Explode(CreateArray(Seq(lb, Add(lb, Literal(1L))))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(lBucketAttr), child = j.left)
      val rBucketAlias = Alias(bucket(rTs), BucketName)()
      val projRight = Project(j.right.output :+ rBucketAlias, j.right)
      val newCond = And(cond, EqualTo(lBucketAttr, rBucketAlias.toAttribute))
      Project(j.output,
        Join(genLeft, projRight, Inner, Some(newCond), j.hint))
    }
  }
}
