package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Complete, Max, Min}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Rewrites the "keep the first row per key" window idioms
  *
  * {{{
  *   Project [out...]
  *     Filter (rn = 1)
  *       Window [row_number() over (partition by p... order by o...) AS rn]
  * }}}
  *
  * into a partial-aggregable argmin/argmax:
  *
  * {{{
  *   Project [out...]
  *     Project [p..., packed.field AS <original attrs>...]
  *       Aggregate [p...], [p..., min|max(struct(o..., others...)) AS packed]
  * }}}
  *
  * and the `rank() = 1` variant (which keeps ALL rows tied for first, so
  * an argmin would change its cardinality) into the standard
  * min-keys-then-join-back form:
  *
  * {{{
  *   Project [out...]
  *     Join Inner ((p = rp)... and (o <=> packed.key)...)
  *       child
  *       Aggregate [rp...], [rp..., min|max(struct(o...)) AS packed]   // over a re-aliased child
  * }}}
  *
  * Why: the window form shuffles and SORTS every input row (WindowExec
  * buffers each partition), while the aggregate form combines map-side to
  * one row per key before the exchange — the shape this repo hand-applies
  * in `knn_cosine` and `color_nearest`. The rank form trades the full
  * window sort for a per-key aggregate plus an equi-join back (the
  * aggregate side is one row per key — broadcastable); the child is
  * evaluated twice, which at 100 TB still beats buffering and sorting
  * every partition. At scale the difference is the whole job.
  *
  * Semantics: `min(struct(...))` picks the lexicographic minimum (struct
  * field order compares ascending nulls-first, agreeing with ASC
  * NULLS FIRST sort keys); all-DESCENDING NULLS LAST keys use
  * `max(struct(...))`, which agrees because a null field never beats a
  * non-null one under max. Mixed directions don't fit one struct
  * ordering and are left alone. For row_number under order-key ties, the
  * window picks an arbitrary tied row (partition-order-dependent) while
  * the rewrite picks the deterministic lexicographic extreme — a strict
  * refinement of the nondeterminism, not a changed contract. For rank,
  * ties are preserved exactly: the join-back keeps every row whose order
  * keys null-safe-equal the per-key extreme.
  *
  * Fires only under narrow conditions (all checked):
  *   - exactly one window expression: `row_number()` or `rank()`;
  *   - sort keys uniformly ASC NULLS FIRST (min) or DESC NULLS LAST (max);
  *   - the filter keeps exactly rank 1 (`rn = 1`, `1 = rn`, `rn <= 1`,
  *     `rn < 2`);
  *   - the parent projection does not reference the rank itself;
  *   - partition keys are plain attributes; for row_number they must be
  *     NONEMPTY — a global (unpartitioned) argmin over empty input
  *     returns 0 rows from the window but 1 all-null row from a
  *     grand-total Aggregate. The rank join-back is safe even
  *     unpartitioned (an empty child joins to nothing);
  *   - every struct field type is orderable (no maps), and for rank the
  *     whole subtree is deterministic (it is duplicated into both join
  *     sides).
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule); the
  * declared queries are already hand-written in aggregate form, so the
  * rule is exercised by ExtensionsSpec synthetic plans rather than the
  * oracle surface.
  */
object WindowArgminToAggregate extends Rule[LogicalPlan] {

  private def keepsRankOne(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, IntegerLiteral(1)) => a.exprId == rn.exprId
    case EqualTo(IntegerLiteral(1), a: Attribute) => a.exprId == rn.exprId
    case LessThanOrEqual(a: Attribute, IntegerLiteral(1)) => a.exprId == rn.exprId
    case LessThan(a: Attribute, IntegerLiteral(2)) => a.exprId == rn.exprId
    case _ => false
  }

  /** Some(true) = pick per-key MIN (all ASC NULLS FIRST), Some(false) =
    * per-key MAX (all DESC NULLS LAST), None = mixed/empty → no rewrite.
    */
  private def structAgreeingExtreme(orderSpec: Seq[SortOrder]): Option[Boolean] =
    if (orderSpec.isEmpty) None
    else if (orderSpec.forall(so => so.direction == Ascending && so.nullOrdering == NullsFirst))
      Some(true)
    else if (orderSpec.forall(so => so.direction == Descending && so.nullOrdering == NullsLast))
      Some(false)
    else None

  private def extremeOf(useMin: Boolean, s: Expression): AggregateFunction =
    if (useMin) Min(s) else Max(s)

  /** row_number()=1 → Aggregate(min|max(struct(orderKeys ++ payload))). */
  private def rewriteRowNumber(outerList: Seq[NamedExpression], w: Window,
      orderSpec: Seq[SortOrder], useMin: Boolean): Option[LogicalPlan] = {
    if (w.partitionSpec.isEmpty || !w.partitionSpec.forall(_.isInstanceOf[AttributeReference]))
      return None
    val child = w.child
    val orderKeys = orderSpec.map(_.child)
    val partAttrs = w.partitionSpec.map(_.asInstanceOf[AttributeReference])
    val otherAttrs = child.output.filterNot(a => partAttrs.exists(_.exprId == a.exprId))
    val fields = orderKeys ++ otherAttrs
    if (!fields.forall(f => RowOrdering.isOrderable(f.dataType))) return None
    val packed = Alias(
      AggregateExpression(extremeOf(useMin, CreateStruct(fields)), Complete, isDistinct = false),
      "__argmin_packed")()
    val agg = Aggregate(partAttrs, (partAttrs :+ packed).toSeq, child)
    // restore the child's attribute ids so `outerList` resolves unchanged
    val restored: Seq[NamedExpression] =
      partAttrs ++ otherAttrs.zipWithIndex.map { case (a, i) =>
        Alias(GetStructField(packed.toAttribute, orderKeys.length + i), a.name)(
          exprId = a.exprId, qualifier = a.qualifier)
      }
    Some(Project(outerList, Project(restored, agg)))
  }

  /** Rebuilds `plan` as a copy with FRESH expression IDs throughout —
    * leaf relations re-instanced via `MultiInstanceRelation.newInstance()`
    * and every Alias re-minted, with references remapped bottom-up — the
    * same discipline Spark's own self-join construction applies
    * (DeduplicateRelations). Re-aliasing only the VISIBLE output would
    * leave the interior attribute ids duplicating the other join side's,
    * which can confuse later exprId-keyed optimizer passes. Returns the
    * copy and the old→new OUTPUT attribute map; None when some node
    * produces attributes this traversal cannot re-mint (non-
    * MultiInstanceRelation leaf, Generate output, …) — callers must then
    * skip the rewrite.
    */
  private def freshCopy(plan: LogicalPlan): Option[(LogicalPlan, AttributeMap[Attribute])] = {
    import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
    val mapping = scala.collection.mutable.Map.empty[ExprId, Attribute]
    var ok = true
    def remapExpr(e: Expression): Expression = e match {
      case al: Alias =>
        val fresh = Alias(remapExpr(al.child), al.name)(
          qualifier = al.qualifier, explicitMetadata = Some(al.metadata))
        mapping(al.exprId) = fresh.toAttribute
        fresh
      case a: Attribute => mapping.getOrElse(a.exprId, a)
      case other => other.mapChildren(remapExpr)
    }
    val rebuilt = plan.transformUp {
      case leaf: LeafNode if leaf.output.nonEmpty =>
        leaf match {
          case m: MultiInstanceRelation =>
            val fresh = m.newInstance().asInstanceOf[LogicalPlan]
            leaf.output.zip(fresh.output).foreach { case (o, n) => mapping(o.exprId) = n }
            fresh
          case _ => ok = false; leaf
        }
      case other => other.mapExpressions(remapExpr)
    }
    // safety net: a plan node producing output attrs NOT sourced from its
    // expressions or children (Generate, Expand, …) survives un-reminted;
    // any id shared with the original means the copy is not actually fresh
    val originalIds = plan.collect { case n => n.output.map(_.exprId) }.flatten.toSet
    val rebuiltIds = rebuilt.collect { case n => n.output.map(_.exprId) }.flatten.toSet
    if (!ok || rebuiltIds.exists(originalIds)) None
    else Some((rebuilt, AttributeMap(plan.output.zip(rebuilt.output))))
  }

  /** rank()=1 → join back to the per-key order-key extreme (keeps ties). */
  private def rewriteRank(outerList: Seq[NamedExpression], w: Window,
      orderSpec: Seq[SortOrder], useMin: Boolean): Option[LogicalPlan] = {
    if (!w.partitionSpec.forall(_.isInstanceOf[AttributeReference])) return None
    val child = w.child
    val orderKeys = orderSpec.map(_.child)
    if (!orderKeys.forall(k => RowOrdering.isOrderable(k.dataType) && k.deterministic))
      return None
    // the child is duplicated into both join sides — only safe when the
    // whole subtree is deterministic
    if (child.exists(p => p.expressions.exists(!_.deterministic))) return None
    val partAttrs = w.partitionSpec.map(_.asInstanceOf[AttributeReference])
    // the aggregate side is a fresh-exprId copy so the self-join's two
    // subtrees share NO ids anywhere, not just at the visible output
    val (rChild, attrMap) = freshCopy(child) match {
      case Some(r) => r
      case None => return None
    }
    def toRight(e: Expression): Expression = e.transform { case a: Attribute => attrMap(a) }
    val rPartAttrs = partAttrs.map(a => attrMap(a))
    val rOrderKeys = orderKeys.map(toRight)
    val packed = Alias(
      AggregateExpression(extremeOf(useMin, CreateStruct(rOrderKeys)), Complete, isDistinct = false),
      "__rank1_keys")()
    val agg = Aggregate(rPartAttrs, (rPartAttrs :+ packed).toSeq, rChild)
    val keyEqs = orderKeys.zipWithIndex.map { case (k, i) =>
      EqualNullSafe(k, GetStructField(packed.toAttribute, i))
    }
    val partEqs = partAttrs.zip(rPartAttrs).map { case (l, r) => EqualNullSafe(l, r) }
    val cond = (partEqs ++ keyEqs).reduce[Expression](And)
    val join = Join(child, agg, Inner, Some(cond), JoinHint.NONE)
    // drop the aggregate side's columns; child ids pass through unchanged
    Some(Project(outerList, Project(child.output, join)))
  }

  private def tryRewrite(p: Project): Option[LogicalPlan] = p match {
    case Project(outerList, Filter(cond, w: Window)) =>
      w.windowExpressions match {
        case Seq(al @ Alias(WindowExpression(fn, WindowSpecDefinition(_, orderSpec, _)), _))
            if keepsRankOne(cond, al.toAttribute) &&
              !outerList.exists(_.references.contains(al.toAttribute)) =>
          structAgreeingExtreme(orderSpec).flatMap { useMin =>
            fn match {
              case RowNumber() => rewriteRowNumber(outerList, w, orderSpec, useMin)
              case Rank(_) => rewriteRank(outerList, w, orderSpec, useMin)
              case _ => None
            }
          }
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p: Project => tryRewrite(p).getOrElse(p)
  }
}
