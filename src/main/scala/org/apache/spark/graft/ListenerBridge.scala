package org.apache.spark.graft

import org.apache.spark.SparkContext

/** The one `private[spark]` surface this codebase needs from core: a
  * deterministic drain of the async listener bus, so event-derived
  * numbers (profilers' per-phase job attribution, specs asserting "this
  * scheduled zero jobs") read complete state instead of racing the
  * delivery thread. Same pattern as `sql.graft.ColumnBridge`: a minimal
  * package-located bridge, no behavior of its own. */
object ListenerBridge {

  /** Block until every queued listener event has been delivered (bounded
    * by the bus's default internal timeout). */
  def waitForListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
