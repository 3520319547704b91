package graft.plans

import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StructType

/** Registry of maintained materialized views, consulted by
  * [[RewriteToMv]] to answer aggregate queries from a (small) MV
  * instead of the (large) base scan — the classic warehouse
  * MV-rewrite, here as a Catalyst optimizer rule so EVERY entry point
  * (DataFrame, SQL view, downstream operator) benefits without opting
  * in. The 100-TB rationale: a maintained per-key summary is GBs where
  * the fact table is TBs; answering roll-ups from it removes the fact
  * scan entirely, which no amount of pushdown can.
  *
  * An MV definition must be `base.filter(…)*.groupBy(keys).agg(…)`
  * with every grouping key surfaced verbatim in the output — the shape
  * [[graft.operators.Changes]] maintains incrementally from the change
  * feed. Matching happens on OPTIMIZED plans (registration captures
  * `definition.queryExecution.optimizedPlan`), the same canonical
  * space the rule sees mid-optimization, so filter merging and column
  * pruning cannot break the match.
  *
  * Freshness is a first-class gate, not an afterthought: a rewrite
  * against a lagging MV silently serves stale rows, the same bug class
  * as the r12 vacuum window. [[MvCatalog.UpsertPin]] pins the base
  * upsert table's committed ledger head at registration and the rule
  * declines to fire the moment a newer batch commits;
  * [[MvCatalog.AssumeFresh]] is the caller-managed contract for plain
  * parquet bases (the caller just wrote the MV in the same job).
  */
object MvCatalog {

  /** When may the rule substitute the MV for the base scan? */
  sealed trait Freshness { def fresh(): Boolean }

  /** Caller guarantees the MV reflects the base (e.g. both written by
    * the running job). The rule trusts it unconditionally.
    */
  case object AssumeFresh extends Freshness { def fresh(): Boolean = true }

  /** Pinned to an upsert table's committed ledger head at construction:
    * stale (and the rewrite stops firing) as soon as any newer batch
    * commits. Re-register after refreshing the MV to re-arm.
    */
  final case class UpsertPin(tableDir: String)(
      implicit store: graft.sources.TableStore) extends Freshness {
    private val pinned = graft.sources.Ingest.committedBatchIds(tableDir)
      .reduceOption(_ max _)
    def fresh(): Boolean =
      graft.sources.Ingest.committedBatchIds(tableDir)
        .reduceOption(_ max _) == pinned
  }

  /** One registered MV: the decomposed definition (filter conjuncts +
    * base below them, grouping-key outputs, aggregate outputs — all in
    * the definition plan's attribute space) plus how to scan the
    * maintained copy. `scan()` builds a FRESH analyzed read each call
    * so one MV can appear at several places in a single query without
    * exprId collisions.
    */
  final case class MvDef(
      name: String,
      conjuncts: Seq[Expression],
      base: LogicalPlan,
      groupOut: Seq[(Expression, String)],
      aggOut: Seq[(AggregateExpression, String)],
      schema: StructType,
      path: String,
      freshness: Freshness) {
    def scan(spark: SparkSession): LogicalPlan =
      spark.read.schema(schema).parquet(path).queryExecution.analyzed
  }

  // keyed by (sessionUUID, mv name): registrations are session-scoped,
  // like temp views — two concurrent test sessions never see each
  // other's MVs
  private val registry = TrieMap.empty[(String, String), MvDef]

  // session-scoped, not name-scoped: two concurrent sessions (tests,
  // notebooks) must never see each other's registrations. An identity
  // hash can collide or be reissued after GC, so mint a UUID per live
  // session in a weak identity map: unique while the session lives,
  // and an address reused after collection gets a FRESH uuid
  // (SparkSession does not override equals, so WeakHashMap keys are
  // reference-identity here)
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String])
  private[graft] def sessionKey(spark: SparkSession): String =
    sessionIds.synchronized {
      val have = sessionIds.get(spark)
      if (have != null) have
      else {
        val id = java.util.UUID.randomUUID().toString
        sessionIds.put(spark, id); id
      }
    }

  def defsFor(spark: SparkSession): Seq[MvDef] =
    registry.collect { case ((s, _), d) if s == sessionKey(spark) => d }.toSeq

  /** Strip pure column-selection Projects: column pruning inserts them
    * at different widths on the two sides of a match (the query needs
    * fewer columns than the MV definition), and they carry no
    * semantics a positional output mapping doesn't.
    */
  private[plans] def stripAttrProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(ps, ch) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      stripAttrProjects(ch)
    case other => other
  }

  /** The same stripping applied THROUGHOUT the base subtree — for a
    * JOIN base (a star-schema MV), column pruning lands attr-only
    * Projects inside each join leg at whatever width that side of the
    * match needs, so the raw subtrees never `sameResult` even when the
    * joins are identical. Stripping restores every leg to its
    * full-width relation (V1 logical plans prune at physical planning,
    * not in the relation), making the comparison width-independent.
    * Comparison-only: the normalized plan is never executed, and
    * exprIds are untouched so the positional output mapping stays
    * valid.
    */
  private[plans] def stripInnerProjects(p: LogicalPlan): LogicalPlan =
    p.transformUp {
      case Project(ps, ch) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        ch
    }

  /** (filter conjuncts, base-below-filters), both Project-stripped. */
  private[plans] def decompose(p: LogicalPlan): (Seq[Expression], LogicalPlan) =
    stripAttrProjects(p) match {
      case Filter(c, ch) =>
        val (inner, base) = decompose(ch)
        (splitConj(c) ++ inner, base)
      case other => (Nil, other)
    }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  /** Register `definition` (NOT yet materialized — see
    * [[materialize]]) as answerable from the parquet at `path`.
    * Rejects definitions the rule could never match soundly: the plan
    * must optimize to a single non-distinct Aggregate, every grouping
    * key must be surfaced verbatim in the output, and every output
    * must be a grouping key or a bare (possibly aliased) aggregate.
    */
  def register(spark: SparkSession, name: String, definition: DataFrame,
               path: String, freshness: Freshness = AssumeFresh): Unit = {
    val (g, out, child) = definition.queryExecution.optimizedPlan match {
      case Aggregate(g, out, ch, _) => (g, out, ch)
      case other => throw new IllegalArgumentException(
        s"MV '$name' must optimize to a single Aggregate; got ${other.nodeName}")
    }
    require(out.forall(_.deterministic),
      s"MV '$name' has a non-deterministic output — not rewritable")
    val (conj, base0) = decompose(child)
    val base = stripInnerProjects(base0)
    val groupOut = out.collect {
      case ne if !ne.exists(_.isInstanceOf[AggregateExpression]) =>
        (stripAlias(ne), ne.name)
    }
    val aggOut = out.collect {
      case a @ Alias(ae: AggregateExpression, _) => (ae, a.name)
    }
    g.foreach { gk =>
      require(groupOut.exists(_._1.semanticEquals(gk)),
        s"MV '$name' must surface grouping key $gk verbatim in its output")
    }
    out.foreach { ne =>
      val ok = groupOut.exists(_._2 == ne.name) || aggOut.exists(_._2 == ne.name)
      require(ok, s"MV '$name' output '${ne.name}' is neither a grouping " +
        "key nor a bare aggregate — the rule cannot derive from it")
    }
    registry.put((sessionKey(spark), name),
      MvDef(name, conj, base, groupOut, aggOut, definition.schema, path,
        freshness))
  }

  private[plans] def stripAlias(ne: NamedExpression): Expression = ne match {
    case Alias(c, _) => c
    case other => other
  }

  /** Write the MV to `path` (overwrite) and register it. The write
    * itself runs with whatever MVs are already registered — correct
    * either way, since any rewrite of the definition is
    * semantics-preserving.
    */
  def materialize(spark: SparkSession, name: String, definition: DataFrame,
                  path: String, freshness: Freshness = AssumeFresh): Unit = {
    definition.write.mode(SaveMode.Overwrite).parquet(path)
    register(spark, name, definition, path, freshness)
  }

  def deregister(spark: SparkSession, name: String): Unit = {
    registry.remove((sessionKey(spark), name)); ()
  }

  def clear(spark: SparkSession): Unit =
    registry.keys.filter(_._1 == sessionKey(spark))
      .foreach(registry.remove)
}

/** Optimizer rule: answer an `Aggregate` from a registered, FRESH
  * materialized view when every piece is soundly derivable —
  *
  *   - the plan below the aggregate (modulo pruning Projects and
  *     filter merging) is the MV's base with the MV's filter
  *     conjuncts, plus optional RESIDUAL conjuncts over grouping keys
  *     only (per-group constants, so filtering MV rows ≡ filtering
  *     base rows);
  *   - every query grouping key is an MV grouping key (roll-up:
  *     re-aggregating MV partials regroups them exactly);
  *   - every aggregate is derivable from MV columns: SUM→SUM of
  *     partial sums, MIN/MAX→MIN/MAX of partials, COUNT→SUM of
  *     partial counts, AVG→Σsum/Σcount when both partials exist; and
  *     when the query's keys are EXACTLY the MV's keys (each MV row is
  *     one result group) any stored aggregate is served verbatim via
  *     MAX over the single row.
  *
  * Output names, exprIds, data types and non-nullability are preserved
  * (`Alias(..., name)(exprId = original)`, `KnownNotNull` where the
  * derivation relaxes nullability), so parent operators resolved
  * against the original aggregate stay valid. Anything not provably
  * derivable — DISTINCT, FILTER clauses, non-matching filters, keys
  * outside the MV, a type that derives differently — leaves the plan
  * untouched: the rule's failure mode is "no rewrite", never "wrong
  * answer". Disable per-session with
  * `spark.conf.set("graft.mv.rewrite.enabled", "false")`.
  *
  * Termination under the fixed-point batch: a rewritten aggregate
  * scans the MV parquet, whose base can never `sameResult` a
  * registered definition's base again, so the rule is a no-op on its
  * own output.
  */
object RewriteToMv extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spark = SparkSession.getActiveSession.orNull
    if (spark == null) return plan
    if (conf.getConfString("graft.mv.rewrite.enabled", "true") != "true")
      return plan
    val defs = MvCatalog.defsFor(spark)
    if (defs.isEmpty) return plan
    plan.transformDown {
      case agg: Aggregate =>
        defs.view.flatMap(d => tryRewrite(spark, agg, d))
          .headOption.getOrElse(agg)
    }
  }

  private def tryRewrite(spark: SparkSession, agg: Aggregate,
                         d: MvCatalog.MvDef): Option[LogicalPlan] = try {
    if (!agg.aggregateExpressions.forall(_.deterministic)) return None
    if (!d.freshness.fresh()) return None

    // ---- base + filter subsumption --------------------------------
    val (qConj, qBase0) = MvCatalog.decompose(agg.child)
    val qBase = MvCatalog.stripInnerProjects(qBase0)
    if (!qBase.sameResult(d.base)) return None
    // positional attr map: sameResult ⇒ outputs correspond 1:1
    val attrMap: Map[ExprId, Attribute] =
      d.base.output.map(_.exprId).zip(qBase.output).toMap
    def remap(e: Expression): Expression = e.transform {
      case a: AttributeReference => attrMap.getOrElse(a.exprId, a)
    }
    val dConjQ = d.conjuncts.map(remap)
    // every MV filter conjunct must be present in the query's filters
    // (else the MV dropped rows the query needs)
    if (!dConjQ.forall(dc => qConj.exists(_.semanticEquals(dc)))) return None
    // leftovers must be expressible over grouping keys (checked below)
    val residual = qConj.filterNot(qc => dConjQ.exists(_.semanticEquals(qc)))

    // ---- expression derivation ------------------------------------
    val mvScan = d.scan(spark)
    val mvAttr: Map[String, Attribute] = mvScan.output.map(a => a.name -> a).toMap
    val groupsQ: Seq[(Expression, String)] =
      d.groupOut.map { case (e, n) => (remap(e), n) }
    val aggsQ: Seq[(AggregateExpression, String)] =
      d.aggOut.map { case (ae, n) =>
        (remap(ae).asInstanceOf[AggregateExpression], n) }
    val keysExact = groupsQ.forall { case (e, _) =>
      agg.groupingExpressions.exists(_.semanticEquals(e)) }

    def aggCol(p: AggregateFunction => Boolean): Option[Attribute] =
      aggsQ.collectFirst {
        case (ae, n) if !ae.isDistinct && ae.filter.isEmpty &&
          p(ae.aggregateFunction) => mvAttr(n)
      }

    def sumOf(a: Attribute): Expression = Sum(a).toAggregateExpression()

    // x2 lives in aggsQ which was already remapped into query space
    def remapEq(x2: Expression, x: Expression): Boolean = x2.semanticEquals(x)

    /** Rewrite one aggregate call into MV space, or None. */
    def derive(qae: AggregateExpression): Option[Expression] = {
      // exact-key hit: one MV row per result group, so ANY stored
      // aggregate with the identical call is served verbatim (MAX over
      // a single row is the identity for every orderable type)
      val verbatim =
        if (!keysExact) None
        else aggsQ.collectFirst {
          case (ae, n) if qae.semanticEquals(ae) &&
            RowOrdering.isOrderable(ae.dataType) =>
            Max(mvAttr(n)).toAggregateExpression()
        }
      if (verbatim.isDefined) return verbatim
      if (qae.isDistinct || qae.filter.nonEmpty) return None
      qae.aggregateFunction match {
        case Sum(x, _) =>
          aggCol { case Sum(x2, _) => remapEq(x2, x); case _ => false }
            .map(sumOf)
        case Min(x) =>
          aggCol { case Min(x2) => remapEq(x2, x); case _ => false }
            .map(a => Min(a).toAggregateExpression())
        case Max(x) =>
          aggCol { case Max(x2) => remapEq(x2, x); case _ => false }
            .map(a => Max(a).toAggregateExpression())
        case Count(xs) =>
          aggCol { case Count(xs2) => xs2.length == xs.length &&
            xs2.zip(xs).forall { case (a, b) => remapEq(a, b) }
            case _ => false }.map(sumOf)
        case Average(x, _) =>
          for {
            s <- aggCol { case Sum(x2, _) => remapEq(x2, x); case _ => false }
            c <- aggCol { case Count(Seq(x2)) => remapEq(x2, x)
                          case _ => false }
          } yield Divide(Cast(sumOf(s), org.apache.spark.sql.types.DoubleType),
            Cast(sumOf(c), org.apache.spark.sql.types.DoubleType))
        case _ => None
      }
    }

    /** Rewrite an output/grouping/residual expression: aggregates via
      * [[derive]], maximal grouping-key subtrees to MV columns; any
      * surviving base attribute means the expression needs row-level
      * data the MV no longer has → give up.
      */
    def rewrite(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => derive(ae)
      case _ =>
        groupsQ.find(_._1.semanticEquals(e)) match {
          case Some((_, n)) => Some(mvAttr(n))
          case None => e match {
            case _: Attribute => None
            case _ if e.children.isEmpty => Some(e)
            case _ =>
              val kids = e.children.map(rewrite)
              if (kids.forall(_.isDefined)) Some(e.withNewChildren(kids.map(_.get)))
              else None
          }
        }
    }

    val newGroups = agg.groupingExpressions.map(rewrite)
    if (!newGroups.forall(_.isDefined)) return None
    if (!residual.forall(_.deterministic)) return None
    val newResidual = residual.map(rewrite)
    if (!newResidual.forall(_.isDefined)) return None
    val newOut: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      ne =>
        rewrite(MvCatalog.stripAlias(ne)).flatMap { r0 =>
          if (r0.dataType != ne.dataType) None
          else {
            val r = if (!ne.nullable && r0.nullable) KnownNotNull(r0) else r0
            Some(Alias(r, ne.name)(exprId = ne.exprId,
              qualifier = ne.qualifier,
              explicitMetadata = Some(ne.metadata)))
          }
        }
    }
    if (!newOut.forall(_.isDefined)) return None

    val newChild = newResidual.flatten match {
      case Seq() => mvScan
      case cs => Filter(cs.reduce(And), mvScan)
    }
    logInfo(s"RewriteToMv: answered ${agg.nodeName} from MV '${d.name}'")
    Some(Aggregate(newGroups.flatten, newOut.flatten, newChild, None))
  } catch {
    case NonFatal(e) =>
      logWarning(s"RewriteToMv: match against '${d.name}' failed softly", e)
      None
  }
}
