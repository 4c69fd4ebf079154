package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/**
 * Showcase optimizer rule (SURVEY §4.3 stretch): rewrites the declarative
 * window-top-k idiom
 *
 *   Project(cols…, Filter(rn <= k, Window(row_number() AS rn, part, ord)))
 *
 * into the bounded-heap [[TopKPerGroup]] operator whenever the rank column
 * itself is pruned away — the user keeps writing idiomatic window SQL and
 * the engine silently picks the O(n log k) physical shape. Registered via
 * spark.experimental.extraOptimizations (or [[GraftExtensions]]).
 *
 * Conservative by construction: single window expression, ROW_NUMBER only,
 * a literal integer bound, and a projection proving the rank is unused.
 */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  private def boundOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList,
        Filter(cond, Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
          part, order, child, _)))
        if spec.partitionSpec == part && spec.orderSpec == order && order.nonEmpty =>
      val rn = alias.toAttribute
      boundOf(cond, rn) match {
        case Some(k) if k > 0 &&
            !projectList.exists(_.exists(_.semanticEquals(rn))) &&
            projectList.forall(_.references.subsetOf(child.outputSet)) =>
          Project(projectList, TopKPerGroup(part, order, k, child))
        case _ => p
      }
  }
}

object GraftOptimizations {
  /** Idempotently install the graft optimizer rules + strategies on a
    * pre-built session (the driver's sessions are built without
    * spark.sql.extensions, so runtime registration is the path used). */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    if (!spark.experimental.extraOptimizations.contains(RewriteWindowTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteWindowTopK
  }
}
