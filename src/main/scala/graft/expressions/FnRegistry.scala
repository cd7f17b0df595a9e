package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Once-per-session temp-function registration + Column face, shared
  * by the native expression objects (round-8 review: DotProduct,
  * SignSig63, SqDist and AgreeCount each carried a verbatim copy of
  * this ~15-line scaffold, and the r3-verdict once-per-session
  * semantics — re-registering mid-flight mutates the session and
  * floods the log with replaced-function WARNs — had four copies to
  * keep in sync). As of round 9 every expression object routes its
  * registration through here — one face per SQL function name — so
  * the once-per-session semantics has exactly one implementation. */
private[expressions] final class FnRegistry(
    name: String, builder: Seq[Expression] => Expression) {
  import org.apache.spark.sql.classic.ClassicConversions.castToImpl

  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit =
    if (registered.putIfAbsent(spark, java.lang.Boolean.TRUE) == null)
      castToImpl(spark).sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")

  def column(spark: SparkSession, cols: Column*): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(name, cols: _*)
  }
}
