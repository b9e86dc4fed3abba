package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, DynamicPruningSubquery, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, WriteDelta}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

/** Runtime FILE pruning for merge-on-read SQL DML
  * (`spark.graft.dml.mode=mor`) — the delta twin of Spark's
  * `RowLevelOperationRuntimeGroupFiltering`, which is group-based
  * (ReplaceData) only. A mor MERGE plans `WriteDelta` over a join of
  * the target's [[GraftDeltaScan]] with the source; ordinary DPP
  * never fires on it because the source side carries no selective
  * predicate (the CDC-batch shape). This rule injects the
  * DynamicPruningSubquery itself whenever a join equi-key matches the
  * scan's layout source column: at execution Spark collects the
  * SOURCE side's distinct key values and the scan's
  * `SupportsRuntimeV2Filtering.filter` maps them to layout groups at
  * the manifest — a trickle MERGE into a 100 TB bucket table then
  * READS ∝ touched buckets, matching the CALL-path
  * ([[MergeOnRead.candidateEntries]]) cost shape.
  *
  * Correctness: the delta path has NO replaced-group contract —
  * an unscanned row is simply an unchanged row — so pruning the scan
  * is over-approximation-safe EXCEPT where the plan must SEE
  * unmatched target rows. Pruning is therefore gated on the join
  * shape exactly like Spark's own DPP (`canPruneLeft/Right`): the
  * scan side is pruned only when the join drops its unmatched rows
  * anyway (Inner/LeftSemi, or the outer join preserving the OTHER
  * side) — a FULL OUTER merge (WHEN NOT MATCHED BY SOURCE) is never
  * pruned. The MERGE cardinality check is unaffected: matches can
  * only live in files whose group the source keys hash into, and
  * group pruning keeps every such file.
  */
final class MorDmlRuntimeFiltering(spark: SparkSession)
  extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.dynamicPartitionPruningEnabled &&
      spark.conf.get("spark.graft.dml.morRuntimeFiltering", "true") == "true"

  /** The mor DML target relation under projections/filters, with the
    * layout columns a runtime filter can prune on. Pre-CBO runs
    * BEFORE early scan pushdown, so the target is still the
    * DataSourceV2Relation over the RowLevelOperationTable wrapper;
    * the ScanRelation shape is matched too for robustness.
    */
  private def deltaRelOf(p: LogicalPlan): Option[(LogicalPlan, Set[String])] =
    p match {
      case r: DataSourceV2Relation =>
        org.apache.spark.sql.GraftColumnBridge
          .rowLevelOperationOf(r.table) match {
          case Some(op: GraftDeltaOperation) =>
            Some((r: LogicalPlan, op.runtimeFilterCols.toSet))
              .filter(_._2.nonEmpty)
          case _ => None
        }
      case r: DataSourceV2ScanRelation => r.scan match {
        case s: GraftDeltaScan =>
          Some((r, s.filterAttributes()
            .map(_.fieldNames.mkString(".")).toSet)).filter(_._2.nonEmpty)
        case _ => None
      }
      case pr: Project => deltaRelOf(pr.child)
      case f: Filter => deltaRelOf(f.child)
      case _ => None
    }

  private def alreadyFiltered(p: LogicalPlan): Boolean = p.exists {
    case f: Filter =>
      f.condition.exists(_.isInstanceOf[DynamicPruningSubquery])
    case _ => false
  }

  /** Same legality as Spark's DPP: the pruned side's unmatched rows
    * must already be droppable by the join.
    */
  private def canPrune(joinType: JoinType, scanIsLeft: Boolean): Boolean =
    joinType match {
      case Inner | LeftSemi => true
      case RightOuter => scanIsLeft
      case LeftOuter => !scanIsLeft
      case _ => false
    }

  private def injectOn(
      side: LogicalPlan, other: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    val (rel, filterable) = deltaRelOf(side) match {
      case Some(rf) if !alreadyFiltered(side) => rf
      case _ => return None
    }
    val relIds = rel.outputSet
    val otherIds = other.outputSet
    // equi-conjuncts keyed on the layout source column, whose other
    // side is evaluable against the build (source) plan
    val keys = splitConjunctivePredicates(cond).collect {
      case EqualTo(a: AttributeReference, b)
          if relIds.contains(a) && filterable.contains(a.name) &&
            b.references.subsetOf(otherIds) => (a, b)
      case EqualTo(b, a: AttributeReference)
          if relIds.contains(a) && filterable.contains(a.name) &&
            b.references.subsetOf(otherIds) => (a, b)
    }
    if (keys.isEmpty) return None
    val (pruningKey, buildKey) = keys.head
    val dpp = DynamicPruningSubquery(pruningKey, other, Seq(buildKey),
      Seq(0), onlyInBroadcast = false)
    // transformUp: the inserted Filter's child is the matched node
    // itself — a top-down transform would descend into it and recurse
    Some(side.transformUp {
      case r if r eq rel => Filter(dpp, r)
    })
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    if (!plan.exists(_.isInstanceOf[WriteDelta])) return plan
    plan.transformDown {
      case w: WriteDelta =>
        val newQuery = w.query.transformDown {
          case j @ Join(left, right, joinType, Some(cond), _) =>
            val prunedLeft =
              if (canPrune(joinType, scanIsLeft = true))
                injectOn(left, right, cond)
              else None
            val prunedRight =
              if (prunedLeft.isEmpty && canPrune(joinType, scanIsLeft = false))
                injectOn(right, left, cond)
              else None
            (prunedLeft, prunedRight) match {
              case (Some(l), _) => j.copy(left = l)
              case (_, Some(r)) => j.copy(right = r)
              case _ => j
            }
        }
        if (newQuery eq w.query) w else w.copy(query = newQuery)
    }
  }
}
