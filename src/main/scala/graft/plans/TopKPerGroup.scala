package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, SortOrder}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Logical "top-k rows per group" operator.
  *
  * Semantics: for each distinct value of `groupExprs`, emit the first k
  * child rows under `orderExprs` (which must define a total order via a
  * tie-break key), each extended with a 1-based `rn` rank column —
  * exactly `row_number().over(partitionBy(g).orderBy(o)) <= k`.
  *
  * Why a custom operator instead of the window form: the window plan
  * fully sorts every partition's rows (shuffle + sort of ALL rows) and
  * only then filters to k. This operator keeps a bounded k-row heap per
  * group on each input partition (map-side, like partial aggregation),
  * shuffles only ≤ k·groups·partitions pre-filtered rows, and merges
  * heaps on the reduce side — at 100 TB the shuffle shrinks by orders
  * of magnitude and no full sort ever happens. The memory bound per
  * task is k × (groups resident in that task), the same envelope as
  * hash aggregation over the same keys.
  *
  * The node is constructed already-resolved (attributes are taken from
  * an analyzed child plan via [[TopKPerGroup.apply]]), so the analyzer
  * passes it through; [[TopKPerGroupStrategy]] plans it as
  * partial-heap → hash exchange → final-heap.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rnAttr: AttributeReference)
  extends UnaryNode {

  require(k > 0, s"top-k per group needs k > 0, got $k")

  override def output: Seq[Attribute] = child.output :+ rnAttr

  // rn originates here, not in the child — without this the analyzer's
  // missing-input check rejects the plan.
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr)

  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroup {

  /** DataFrame-facing API: `TopKPerGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), 3)`
    * — order pairs are (column, ascending). The order must be total
    * (include a unique tie-break column) for deterministic output.
    */
  def apply(df: DataFrame, groupCols: Seq[String], orderCols: Seq[(String, Boolean)],
            k: Int, rnName: String = "rn"): DataFrame = {
    val lp = PlanBridge.analyzed(df)
    def attr(n: String) = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${lp.output.map(_.name).mkString(",")}"))
    val node = new TopKPerGroup(
      groupCols.map(attr),
      orderCols.map { case (n, asc) =>
        SortOrder(attr(n), if (asc) Ascending else Descending) },
      k, lp,
      AttributeReference(rnName, IntegerType, nullable = false)())
    PlanBridge.ofRows(df.sparkSession, node)
  }
}
