package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Logs `observe()` aggregates named `graft.*` when their query completes.
  *
  * Purpose: operators that bound their work (LSH bucket caps) must account
  * for what the bound dropped — a silent cap reads as full coverage. The
  * accounting rides the query's own plan as a CollectMetrics aggregate (zero
  * extra jobs); this listener surfaces it on the driver log.
  */
object ObservedMetrics {

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    if (registered.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft.")) {
              val dropped = row.schema.fieldNames.contains("dropped_buckets") &&
                row.getAs[Long]("dropped_buckets") > 0L
              if (dropped) System.err.println(s"[graft-metrics] $name: $row")
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
      ()
    }
  }
}
