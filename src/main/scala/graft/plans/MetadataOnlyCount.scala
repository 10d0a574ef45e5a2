package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.ManifestFileIndex
import org.apache.spark.sql.types._

/** `SELECT count(*)` / `min(col)` / `max(col)` over a manifest table
  * answered from manifest metadata — a Catalyst optimizer [[Rule]] (the
  * Delta `OptimizeMetadataOnlyQuery` idea): when an ungrouped, unfiltered
  * aggregate of only those shapes sits on a
  * [[ManifestFileIndex]]-backed relation, and the manifest has the facts
  * (a `#rows` count per file; `#filestat` bounds per file for min/max),
  * the whole subtree collapses to a one-row [[LocalRelation]]. At 100 TB
  * the query costs one small-file read instead of a cluster-wide scan —
  * and it composes with time travel, since the facts come from whichever
  * version the relation was resolved at.
  *
  * Strictly conservative: any grouping, any filter, count(col) (null
  * semantics), DISTINCT, a file without the needed fact, a bounds
  * encoding the column type can't round-trip exactly (timestamps,
  * longs beyond 2^53), or a min/max argument that isn't literally a
  * relation column leaves the plan untouched.
  *
  * Production registration is [[GraftSparkExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftSparkExtensions`);
  * [[MetadataOnlyCount.install]] adds the same rule to an already-built
  * session via `experimental.extraOptimizations`.
  */
object MetadataOnlyCount extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
      manifestOf(child) match {
        case Some((idx, relOutput)) =>
          val vals = aggExprs.map(metaValue(_, idx, relOutput))
          if (vals.forall(_.isDefined))
            LocalRelation(agg.output, Seq(InternalRow.fromSeq(vals.map(_.get))))
          else agg
        case None => agg
      }
  }

  /** The internal-row value of one output aggregate, when the manifest can
    * answer it: `count(*)`/`count(1)` from the row facts, `min(col)` /
    * `max(col)` from the recorded per-file bounds (every file must have
    * them, and the column's type must round-trip the double encoding
    * exactly). count(col), DISTINCT, and everything else → None.
    */
  private def metaValue(e: NamedExpression, idx: ManifestFileIndex,
                        relOutput: Seq[AttributeReference]): Option[Any] = {
    // a min/max argument must BE a relation column (matched by exprId —
    // a Project alias that merely REUSES a stats column's name must not
    // read that column's bounds)
    def relCol(a: AttributeReference): Boolean =
      relOutput.exists(_.exprId == a.exprId)
    e match {
      case Alias(AggregateExpression(Count(Seq(Literal(_, _))), Complete, false, None, _), _) =>
        idx.knownRowCount.map(n => n: java.lang.Long)
      case Alias(AggregateExpression(Min(a: AttributeReference), Complete, false, None, _), _)
          if relCol(a) =>
        idx.knownBounds(a.name).flatMap { case (lo, _) => internalValue(a.dataType, lo) }
      case Alias(AggregateExpression(Max(a: AttributeReference), Complete, false, None, _), _)
          if relCol(a) =>
        idx.knownBounds(a.name).flatMap { case (_, hi) => internalValue(a.dataType, hi) }
      case _ => None
    }
  }

  /** Decode a stats bound (double; dates as epoch days — see
    * `Manifest.statEncode`) back to the column type's INTERNAL value —
    * only for types where the round trip is provably exact. Timestamps
    * (fractional-second encoding) and longs beyond 2^53 are declined.
    */
  private def internalValue(dt: DataType, d: Double): Option[Any] = {
    val whole = d == math.rint(d) && !d.isInfinite
    dt match {
      case LongType if whole && math.abs(d) <= (1L << 53).toDouble =>
        Some(d.toLong: java.lang.Long)
      case IntegerType if whole && d >= Int.MinValue && d <= Int.MaxValue =>
        Some(d.toInt: java.lang.Integer)
      case ShortType if whole && d >= Short.MinValue && d <= Short.MaxValue =>
        Some(d.toShort: java.lang.Short)
      case ByteType if whole && d >= Byte.MinValue && d <= Byte.MaxValue =>
        Some(d.toByte: java.lang.Byte)
      case DateType if whole && d >= Int.MinValue && d <= Int.MaxValue =>
        Some(d.toInt: java.lang.Integer) // internal DateType = epoch days
      case FloatType => Some(d.toFloat: java.lang.Float)
      case DoubleType => Some(d: java.lang.Double)
      case _ => None
    }
  }

  /** The manifest index under the aggregate, when the subtree preserves
    * cardinality and columns: a bare manifest relation, possibly under
    * Projects. Anything else — Filter, Join, sample, … — is None.
    */
  private def manifestOf(plan: LogicalPlan)
      : Option[(ManifestFileIndex, Seq[AttributeReference])] = plan match {
    case Project(_, c) => manifestOf(c)
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case m: ManifestFileIndex =>
          Some((m, l.output.collect { case a: AttributeReference => a }))
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
