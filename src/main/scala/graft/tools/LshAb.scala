package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the cosine-LSH headline's plane family (round-5
  * verdict item 1): times Irwin–Hall integer planes
  * (Similarity.lshCosinePairsAutoIH — the oracle-replayable headline
  * binding) against the seeded-Gaussian float planes
  * (lshCosinePairsAuto) back-to-back in ONE warmed session,
  * alternating, so the comparison carries no cross-session box noise.
  */
object LshAb {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.sources.Tables.embeddings(spark, d)
    e.count() // warm the cache

    def ih() = graft.operators.Similarity
      .lshCosinePairsAutoIH(e, col("vec_id"), col("embedding"), tau = 0.4, dim = 64)
    def gauss() = graft.operators.Similarity
      .lshCosinePairsAuto(e, col("vec_id"), col("embedding"), tau = 0.4, dim = 64)

    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
    }
    time(ih); time(gauss) // untimed warm-up (JIT + codegen)
    val rows = (1 to reps).map { r =>
      val ti = time(ih); val tg = time(gauss)
      println(f"rep $r: IH $ti%.3f s  Gauss $tg%.3f s")
      (ti, tg)
    }
    val (mi, mg) = (rows.map(_._1).min, rows.map(_._2).min)
    println(f"best-of-$reps: IH $mi%.3f s  Gauss $mg%.3f s  IH/Gauss ${mi / mg}%.3f")
    spark.stop()
  }
}
