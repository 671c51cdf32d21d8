package org.apache.spark

import org.apache.spark.memory.TaskMemoryManager

/** Minimal private[spark] bridge: expose the running task's memory
  * manager so custom execs can register their working set with Spark's
  * execution-memory accounting (the standard extension-library need).
  */
object GraftTaskBridge {
  def taskMemoryManager(ctx: TaskContext): TaskMemoryManager =
    ctx.taskMemoryManager()
}
