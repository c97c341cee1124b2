package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Min}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Rewrites the "keep the first row per key" window idiom
  *
  * {{{
  *   Project [out...]
  *     Filter (rn = 1)
  *       Window [row_number() over (partition by p... order by o... asc) AS rn]
  * }}}
  *
  * into a partial-aggregable argmin:
  *
  * {{{
  *   Project [out...]
  *     Project [p..., packed.field AS <original attrs>...]
  *       Aggregate [p...], [p..., min(struct(o..., others...)) AS packed]
  * }}}
  *
  * Why: the window form shuffles and SORTS every input row (WindowExec
  * buffers each partition), while the aggregate form combines map-side to
  * one row per key before the exchange — the shape this repo hand-applies
  * in `knn_cosine` and `color_nearest`. At 100 TB the difference is the
  * whole job.
  *
  * Semantics: `min(struct(orderKeys ++ payload))` picks the lexicographic
  * minimum. When the window's order keys are a total order per partition
  * this is EXACTLY the row_number()=1 row; under order-key ties,
  * row_number picks an arbitrary tied row (partition-order-dependent,
  * nondeterministic across runs) while this rewrite picks the
  * deterministic lexicographic minimum — a strict refinement of the
  * nondeterminism, not a changed contract.
  *
  * Fires only under narrow conditions (all checked):
  *   - exactly one window expression, and it is `row_number()`;
  *   - every sort key ascending nulls-first (struct ordering compares
  *     fields ascending nulls-first, so min(struct) agrees with the sort);
  *   - the filter keeps exactly rank 1 (`rn = 1`, `1 = rn`, `rn <= 1`,
  *     `rn < 2`);
  *   - the parent projection does not reference the rank itself;
  *   - partition keys are plain attributes, and NONEMPTY — a global
  *     (unpartitioned) argmin over empty input returns 0 rows from the
  *     window but 1 all-null row from a grand-total Aggregate, so the
  *     rewrite is only sound per-key;
  *   - every struct field type is orderable (no maps).
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

  private def ascNullsFirst(orderSpec: Seq[SortOrder]): Boolean =
    orderSpec.nonEmpty &&
      orderSpec.forall(so => so.direction == Ascending && so.nullOrdering == NullsFirst)

  private def tryRewrite(p: Project): Option[LogicalPlan] = p match {
    case Project(outerList, Filter(cond, w: Window)) =>
      w.windowExpressions match {
        case Seq(al @ Alias(WindowExpression(RowNumber(), WindowSpecDefinition(_, orderSpec, _)), _))
            if ascNullsFirst(orderSpec) &&
              keepsRankOne(cond, al.toAttribute) &&
              !outerList.exists(_.references.contains(al.toAttribute)) &&
              // nonEmpty: an UNpartitioned argmin over empty input yields 0
              // rows from the window but 1 all-null row from a global
              // Aggregate — the rewrite is only sound per-key
              w.partitionSpec.nonEmpty &&
              w.partitionSpec.forall(_.isInstanceOf[AttributeReference]) =>
          val child = w.child
          val orderKeys = orderSpec.map(_.child)
          val partAttrs = w.partitionSpec.map(_.asInstanceOf[AttributeReference])
          val otherAttrs = child.output.filterNot(a => partAttrs.exists(_.exprId == a.exprId))
          val fields = orderKeys ++ otherAttrs
          if (fields.forall(f => RowOrdering.isOrderable(f.dataType))) {
            val packed = Alias(
              AggregateExpression(Min(CreateStruct(fields)), Complete, isDistinct = false),
              "__argmin_packed")()
            val agg = Aggregate(partAttrs, (partAttrs :+ packed).toSeq, child)
            // restore the child's attribute ids so `outerList` resolves unchanged
            val restored: Seq[NamedExpression] =
              partAttrs ++ otherAttrs.zipWithIndex.map { case (a, i) =>
                Alias(GetStructField(packed.toAttribute, orderKeys.length + i), a.name)(
                  exprId = a.exprId, qualifier = a.qualifier)
              }
            Some(Project(outerList, Project(restored, agg)))
          } else None
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p: Project => tryRewrite(p).getOrElse(p)
  }
}
