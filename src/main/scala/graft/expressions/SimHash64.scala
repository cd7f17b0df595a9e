package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash over an array<string> of tokens: per token take
  * xxhash64 (seed 42, same family as Spark's `xxhash64` SQL function),
  * vote +1/-1 per bit position, emit the sign bitmap. Hamming distance
  * between simhashes (`bit_count(a ^ b)`) approximates token-multiset
  * distance — the classic near-dup signal (Charikar '02 / Manku '07).
  *
  * A native Catalyst Expression (not a Scala UDF): null-safe, single
  * pass over the array, no row-object conversion. CodegenFallback is
  * acceptable off the per-row hot path's innermost loop; the heavy
  * lifting (the 64-way vote) is still one tight JVM loop per row.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val face =
    new FnRegistry("simhash64", exprs => SimHash64(exprs.head))

  /** Register once per session, then usable from SQL and via
    * `call_function` (idempotent). */
  def register(spark: SparkSession): Unit = face.register(spark)

  /** Column API: registers on the column's active session and calls
    * through the registry (the public Spark-4 route from Column to a
    * custom Expression). */
  def simhash64(spark: SparkSession, tokens: Column): Column =
    face.column(spark, tokens)
}
