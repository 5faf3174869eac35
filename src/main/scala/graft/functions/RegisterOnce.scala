package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Register a session function only if its name is not already bound.
  *
  * Every operator registers its kernels defensively per query build, and
  * `createOrReplaceTempFunction` logs a
  * `SimpleFunctionRegistry: The function X replaced ...` WARN on each
  * re-registration — hundreds of lines over a 119-query run, enough to
  * flood a bounded stdout capture (the driver keeps only a 3 KB tail
  * around the bench JSON line). All graft registrations bind a fixed
  * name to the same builder, so first-wins is equivalent to replace and
  * silent.
  *
  * Known limitation: first-wins also defers to a FOREIGN session function
  * that happens to share a graft kernel's name (registered by user code
  * before any graft query ran) — the query would then resolve to the
  * foreign binding. Sessions embedding graft next to other function
  * libraries should install the kernels via `spark.sql.extensions=
  * graft.GraftExtensions`, which binds them at session build time
  * (before any user registration) and is the supported deployment
  * route. */
object RegisterOnce {
  def apply(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name))) {
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
