package org.apache.spark

/** Core-side access shim (the [[org.apache.spark.sql.GraftSqlBridge]]
  * pattern applied to SparkContext internals): the listener bus is
  * `private[spark]`, and [[graft.Probe]] must drain it between passes —
  * stage-completed events are delivered asynchronously, so reading the
  * metrics listener without a drain races the last stages of the pass
  * it is trying to attribute. */
object GraftSparkBridge {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
