package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-itemset / association-rule mining over item-array columns.
  * Reference: mlqueries.py:148 calculate_and_filter_association_rules
  * (FPGrowth over tag sets).
  */
object AssociationRules {

  /** spark.ml FPGrowth wrapper: full frequent-itemset mining. */
  def fpGrowthRules(df: DataFrame, itemsCol: Column,
                    minSupport: Double, minConfidence: Double): DataFrame = {
    val tx = df.select(array_distinct(itemsCol).as("items"))
      .where(size(col("items")) > 0)
    new org.apache.spark.ml.fpm.FPGrowth()
      .setItemsCol("items")
      .setMinSupport(minSupport)
      .setMinConfidence(minConfidence)
      .fit(tx)
      .associationRules
  }

  /** Size-2 rules as pure relational algebra (the SQL-oracle-able
    * core of FPGrowth): per-transaction distinct items, co-occurrence
    * self-join blocked on the transaction id, support/confidence from
    * exact counts. Emits both rule directions. */
  def frequentPairs(df: DataFrame, txId: Column, itemsCol: Column,
                    minSupport: Double, minConfidence: Double): DataFrame = {
    val tx = df.select(txId.as("tid"), array_distinct(itemsCol).as("items"))
      .where(size(col("items")) > 0)
    val ex = graft.util.CacheScope.persist(
      tx.select(col("tid"), explode(col("items")).as("item")))
    val tot = tx.agg(count(lit(1)).as("t"))
    val singles = ex.groupBy("item").agg(count(lit(1)).as("n"))
    val pairs = ex.as("a").join(ex.as("b"),
        col("a.tid") === col("b.tid") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
      .agg(count(lit(1)).as("nab"))
      .join(singles.select(col("item").as("ia"), col("n").as("na")), "ia")
      .join(singles.select(col("item").as("ib"), col("n").as("nb")), "ib")
      .crossJoin(broadcast(tot))
    val fwd = pairs.select(
      col("ia").as("antecedent"), col("ib").as("consequent"),
      (col("nab").cast("double") / col("t").cast("double")).as("support"),
      (col("nab").cast("double") / col("na").cast("double")).as("confidence"))
    val bwd = pairs.select(
      col("ib").as("antecedent"), col("ia").as("consequent"),
      (col("nab").cast("double") / col("t").cast("double")).as("support"),
      (col("nab").cast("double") / col("nb").cast("double")).as("confidence"))
    fwd.union(bwd)
      .where(col("support") >= minSupport && col("confidence") >= minConfidence)
  }
}
