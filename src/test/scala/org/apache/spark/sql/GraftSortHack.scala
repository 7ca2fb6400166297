package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.Sort

/** Test-only plan surgery for the sort-sampling A/B
  * (graft.tools.ProfileSortFamily): split a query into its unsorted
  * child and a function that re-applies the exact same top-level Sort,
  * so any production query can be timed as
  * `child.localCheckpoint() then re-sort` without duplicating its
  * body. Lives in org.apache.spark.sql only to reach the private[sql]
  * Dataset.ofRows; never on the production classpath.
  */
object GraftSortHack {
  def splitTopSort(df: DataFrame):
      Option[(DataFrame, DataFrame => DataFrame)] = {
    val cdf = df.asInstanceOf[classic.DataFrame]
    cdf.queryExecution.analyzed match {
      case s @ Sort(_, true, _, _) =>
        Some((classic.Dataset.ofRows(cdf.sparkSession, s.child),
          (d: DataFrame) => classic.Dataset.ofRows(cdf.sparkSession,
            s.copy(child =
              d.asInstanceOf[classic.DataFrame].queryExecution.analyzed))))
      case _ => None
    }
  }
}
