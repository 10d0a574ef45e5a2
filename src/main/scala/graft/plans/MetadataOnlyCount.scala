package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.ManifestFileIndex

/** `SELECT count(*)` over a manifest table answered from manifest
  * metadata — a Catalyst optimizer [[Rule]] (the Delta
  * `OptimizeMetadataOnlyQuery` idea): when an ungrouped, unfiltered
  * count(*) sits on a [[ManifestFileIndex]]-backed relation whose every
  * file has a recorded `#rows` fact, the whole subtree collapses to a
  * one-row [[LocalRelation]]. At 100 TB the query costs one small-file
  * read instead of a cluster-wide scan — and it composes with time
  * travel, since the count comes from whichever version the relation
  * was resolved at.
  *
  * Strictly conservative: any grouping, any filter, count(col) (null
  * semantics), or a file without a recorded count leaves the plan
  * untouched.
  *
  * Production registration is [[GraftSparkExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftSparkExtensions`);
  * [[MetadataOnlyCount.install]] adds the same rule to an already-built
  * session via `experimental.extraOptimizations`.
  */
object MetadataOnlyCount extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall(isCountStar) =>
      knownCount(child) match {
        case Some(n) =>
          LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(agg.output.map(_ => n))))
        case None => agg
      }
  }

  /** Only `count(*)` / `count(1)` — never count(col) (null-skipping) or
    * DISTINCT.
    */
  private def isCountStar(e: org.apache.spark.sql.catalyst.expressions.NamedExpression): Boolean =
    e match {
      case Alias(AggregateExpression(Count(Seq(Literal(_, _))), Complete, false, None, _), _) => true
      case _ => false
    }

  /** The child's exact row count, when provable from the manifest: a bare
    * manifest relation, possibly under Projects (cardinality-preserving).
    * Anything else — Filter, Join, sample, … — is None.
    */
  private def knownCount(plan: LogicalPlan): Option[Long] = plan match {
    case Project(_, c) => knownCount(c)
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case m: ManifestFileIndex => m.knownRowCount
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  /** Register on an existing session (extensions only apply at builder
    * time; `extraOptimizations` run at the end of the optimizer).
    */
  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(MetadataOnlyCount))
      exp.extraOptimizations = exp.extraOptimizations :+ MetadataOnlyCount
  }
}

/** `spark.sql.extensions` entry point:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
  * }}}
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => MetadataOnlyCount)
}
