package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark._

/** sources.Manifest as the layout AUDIT: after a clustered
  * (range-partitioned + sorted) write, the per-file min/max ranges
  * must be disjoint and ascending — the property that makes parquet
  * row-group pruning work. The manifest is how you check it without
  * trusting the writer. */
class ManifestSpec extends AnyFunSuite {

  test("manifest over a clustered multi-file write: counts exact, ranges disjoint") {
    val ord = graft.sources.Tables.orders(spark, sfTiny)
    val dir = java.nio.file.Files.createTempDirectory("manifest_sorted").toString + "/orders"
    graft.sources.Tables.writeSortedParquet(ord, dir, "o_orderkey", numFiles = 4)
    val m = graft.sources.Manifest.fileStats(spark, dir, Seq("o_orderkey"))
      .collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("min_o_orderkey"), r.getAs[Long]("max_o_orderkey")))
      .sortBy(_._3)
    assert(m.length == 4, s"expected 4 files, got ${m.map(_._1).toSeq}")
    assert(m.map(_._2).sum == ord.count())
    // per-file stats agree with reading each file directly
    m.foreach { case (f, n, lo, hi) =>
      val direct = spark.read.parquet(s"$dir/$f")
        .agg(count(lit(1)), min("o_orderkey"), max("o_orderkey")).first()
      assert((direct.getLong(0), direct.getLong(1), direct.getLong(2)) == ((n, lo, hi)), f)
    }
    // clustered layout: file k's max < file k+1's min (total order)
    m.sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) =>
        assert(hi1 < lo2, s"file ranges overlap: $m")
      case _ => ()
    }
  }

  test("manifest flags an unclustered write's overlapping ranges") {
    val ord = graft.sources.Tables.orders(spark, sfTiny)
    val dir = java.nio.file.Files.createTempDirectory("manifest_unsorted").toString + "/orders"
    // round-robin repartition: every file spans ~the whole key domain
    ord.repartition(4).write.parquet(dir)
    val m = graft.sources.Manifest.fileStats(spark, dir, Seq("o_orderkey"))
      .collect()
      .map(r => (r.getAs[Long]("min_o_orderkey"), r.getAs[Long]("max_o_orderkey")))
      .sortBy(_._1)
    assert(m.length == 4)
    val overlaps = m.sliding(2).count {
      case Array((_, hi1), (lo2, _)) => hi1 >= lo2
      case _ => false
    }
    assert(overlaps > 0, s"round-robin files should overlap: ${m.toSeq}")
  }
}
