package graft.plans

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Transparent materialized-view rewrite — the optimizer half of the
  * [[graft.ops.IncrementalAgg]] maintenance story: a registered
  * aggregate view (per-key `n / sum_c / min_c / max_c / cnt_c`
  * partials of a fact, written by `TableCatalog.createAggView`)
  * silently answers any matching `count(*)/count(v)/sum/min/max/avg`
  * aggregation over the fact, so a 100 TB fact scan becomes a
  * keys-sized MV scan with NO caller cooperation — the classic
  * algebraic query/view matching of warehouse engines (Goldstein &
  * Larson, SIGMOD'01), scoped to the shapes the partial state can
  * answer exactly:
  *
  *   - grouping columns ⊆ the view's key columns (attribute refs only),
  *   - aggregates from {count(lit), sum(v), min(v), max(v)} over the
  *     view's value column — no DISTINCT, no FILTER clause
  *     (count(1) → coalesce(sum(n), 0) keeps the non-null type),
  *
  * rewritten by substituting the view scan for the fact scan and
  * re-aggregating the partials (partials of partials are partials —
  * the same monoid property the maintenance path relies on). Output
  * names, exprIds, and types are preserved, so the rewrite is
  * invisible to the parent plan.
  *
  * FRESHNESS is structural, not a timestamp: the registry records the
  * fact's immutable SNAPSHOT directory (`_vN`), and the rule matches
  * scans by root path. Overwriting the fact moves its pointer to
  * `_vN+1`, new reads scan the new directory, and the stale view
  * simply stops matching — no version check can race, because the
  * thing compared IS the data's identity. The rule is inert unless
  * [[ConfKey]] points at a registry file (set by `createAggView`). */
object MvRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.mvRegistry"

  // the registry codec lives in ONE place — TableCatalog.parseMvRegistry,
  // the same parser the writer round-trips through — so a format change
  // cannot desynchronize the rule's copy (it HAS no copy); a parse
  // failure reads as an empty registry = rule off.
  private[plans] type MvDef = graft.catalog.TableCatalog.MvEntry

  // cached registry parse keyed on (path, mtime, size): the rule runs
  // on every query in a session that registered a view, so re-parse
  // only when the file observably changed. writeMvEntry additionally
  // invalidates this cache explicitly — two registry writes inside one
  // mtime granule (fast local FS) must not serve the older parse.
  @volatile private var cached: (String, Long, Long, Seq[MvDef]) = null

  private[graft] def invalidateCache(): Unit = cached = null

  private[plans] def registry(path: String): Seq[MvDef] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return Seq.empty
    val mtime = Files.getLastModifiedTime(p).toMillis
    val size = Files.size(p)
    val c = cached
    if (c != null && c._1 == path && c._2 == mtime && c._3 == size)
      return c._4
    val defs = graft.catalog.TableCatalog.parseMvRegistry(
      new String(Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8))
    cached = (path, mtime, size, defs)
    defs
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val reg = conf.getConfString(ConfKey, "")
    if (reg.isEmpty) plan
    else {
      val defs = registry(reg)
      if (defs.isEmpty) plan
      else plan.transformUp {
        case agg: Aggregate =>
          scanRoot(agg.child)
            .flatMap { case (root, files) =>
              // versioned fact: the immutable snapshot path IS the
              // freshness proof. Plain fact: the registry pins the file
              // set, compared against the scan's own (already
              // materialized) file index — an appended-but-unrefreshed
              // view silently stops matching, no extra LIST paid.
              defs.find(d => d.factPath == root &&
                (d.factFiles.isEmpty || d.factFiles.toSet == files))
            }
            .flatMap(mv => rewrite(agg, mv))
            .getOrElse(agg)
      }
    }
  }

  /** The single normalized root path of a bare fact scan plus its file
    * index: a LogicalRelation, optionally under the attribute-only
    * Project that column pruning inserts. Anything else (filters,
    * joins, computed projections) is out of scope for the partial
    * state. */
  private def scanRoot(p: LogicalPlan): Option[(String, Set[String])] = p match {
    case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      scanRoot(child)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation if fs.location.rootPaths.size == 1 =>
          Some((fs.location.rootPaths.head.toUri.getPath,
            fs.location.inputFiles.toSet))
        case _ => None
      }
    case _ => None
  }

  private def rewrite(agg: Aggregate, mv: MvDef): Option[LogicalPlan] = {
    val groupsOk = agg.groupingExpressions.forall {
      case a: AttributeReference => mv.keys.contains(a.name)
      case _ => false
    }
    if (!groupsOk) return None
    // a fresh scan per rewrite: reusing a cached plan would reuse its
    // exprIds, and two rewritten aggregates in one query must not alias.
    // GUARDED (ADVICE r9): a dropped/manually-deleted view table — or,
    // cross-JVM, a retention sweep landing between a stale registry
    // read and this scan — must disable the rewrite for this query, not
    // fail an innocent aggregate with a path-not-found AnalysisException.
    if (!Files.exists(Paths.get(mv.mvPath))) return None
    val mvPlan =
      try SparkSession.active.read.parquet(mv.mvPath).queryExecution.analyzed
      catch { case _: org.apache.spark.sql.AnalysisException => return None }
    val mvOut = mvPlan.output.map(a => a.name -> a).toMap
    val needed = mv.keys ++ Seq("n", "sum_c", "min_c", "max_c")
    if (!needed.forall(mvOut.contains)) return None

    var ok = true
    def rewriteAgg(ae: AggregateExpression): Expression =
      if (ae.isDistinct || ae.filter.isDefined) { ok = false; ae }
      else ae.aggregateFunction match {
        case Count(Seq(Literal(_, _))) =>
          Coalesce(Seq(
            ae.copy(aggregateFunction = Sum(mvOut("n"))), Literal(0L)))
        // count(v) = Σ cnt_c — the NON-NULL count column (views built
        // before cnt_c existed simply don't match these two shapes)
        case Count(Seq(c)) if attrNamed(c, mv.value) &&
            mvOut.contains("cnt_c") =>
          Coalesce(Seq(
            ae.copy(aggregateFunction = Sum(mvOut("cnt_c"))), Literal(0L)))
        // avg(v) = Σ sum_c / Σ cnt_c, LEGACY divide so an all-NULL
        // group yields NULL (Average's own evaluate expression divides
        // the same way) — dividing by n would silently shift every
        // average of a nullable column. The output-identity check
        // refuses decimal averages (our quotient is Double).
        case a: Average if attrNamed(a.child, mv.value) &&
            mvOut.contains("cnt_c") =>
          val sumE = AggregateExpression(
            Sum(mvOut("sum_c")), ae.mode, isDistinct = false)
          val cntE = AggregateExpression(
            Sum(mvOut("cnt_c")), ae.mode, isDistinct = false)
          Divide(Cast(sumE, org.apache.spark.sql.types.DoubleType),
            Cast(cntE, org.apache.spark.sql.types.DoubleType),
            EvalMode.LEGACY)
        case s: Sum if attrNamed(s.child, mv.value) =>
          ae.copy(aggregateFunction = s.withNewChildren(Seq(mvOut("sum_c")))
            .asInstanceOf[AggregateFunction])
        case m: Min if attrNamed(m.child, mv.value) =>
          ae.copy(aggregateFunction = Min(mvOut("min_c")))
        case m: Max if attrNamed(m.child, mv.value) =>
          ae.copy(aggregateFunction = Max(mvOut("max_c")))
        case _ => ok = false; ae
      }
    def rewriteExpr(e: Expression): Expression = e match {
      case ae: AggregateExpression => rewriteAgg(ae)
      case a: AttributeReference =>
        if (mv.keys.contains(a.name)) mvOut(a.name) else { ok = false; a }
      case other => other.mapChildren(rewriteExpr)
    }
    val newAggs = agg.aggregateExpressions.map {
      case a: AttributeReference if mv.keys.contains(a.name) =>
        Alias(mvOut(a.name), a.name)(exprId = a.exprId)
      case al: Alias =>
        Alias(rewriteExpr(al.child), al.name)(al.exprId, al.qualifier,
          al.explicitMetadata, al.nonInheritableMetadataKeys)
      case _ => ok = false; null
    }
    if (!ok) return None
    val newGroups = agg.groupingExpressions
      .map(g => mvOut(g.asInstanceOf[AttributeReference].name))
    val out = Aggregate(newGroups, newAggs, mvPlan)
    // the substitution must be invisible: same names, ids, and types —
    // refuse (rather than mis-plan) any shape where it is not
    if (out.output.map(a => (a.exprId, a.name, a.dataType)) ==
        agg.output.map(a => (a.exprId, a.name, a.dataType))) Some(out)
    else None
  }

  private def attrNamed(e: Expression, name: String): Boolean = e match {
    case a: AttributeReference => a.name == name
    case _ => false
  }
}
