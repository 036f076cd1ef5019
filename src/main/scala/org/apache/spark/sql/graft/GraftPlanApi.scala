package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]`-scoped bridge the custom-plan API needs:
  * turning a hand-built [[LogicalPlan]] into a `DataFrame`
  * (`Dataset.ofRows` has no public equivalent). Living in an
  * `org.apache.spark.sql` subpackage to reach it is the established
  * extension-library pattern; nothing else internal is touched.
  */
object GraftPlanApi {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan
    )
}
