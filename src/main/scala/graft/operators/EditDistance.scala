package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join via segment blocking (PassJoin,
  * Li/Deng/Wang/Feng, VLDB 2011): all pairs with levenshtein ≤ k,
  * never the within-block O(block²) compare.
  *
  * Pigeonhole lemma: split the indexed string s into k+1 contiguous
  * segments. Any string t with ed(s,t) ≤ k must contain at least one
  * segment EXACTLY as a substring, starting within ±k of the
  * segment's position in s (each edit disturbs at most one segment's
  * alignment, and k edits cannot touch all k+1). So: index each
  * string once per segment under (block, |s|, segIdx, segment);
  * probe each string with every same-length substring for target
  * lengths |t|-k..|t|+k and start offsets ±k; equi-join, dedup, then
  * verify candidates with the banded `levenshtein(a, b, k)` (early
  * exits at k+1). Candidates are strings sharing an ALIGNED exact
  * substring of length ~|s|/(k+1) — selective the way a fixed
  * business-key block is not: a blocking key with CONSTANT
  * cardinality (e.g. brand, 25 values) makes block size grow linearly
  * with data and the join quadratic; the sf1 scaling smoke caught
  * q_levenshtein_pairs doing exactly that (25 blocks × 8000 rows →
  * ~800M levenshtein calls). Probe fan-out is the static
  * (2k+1)·(k+1)·(2k+1) ≈ 200 keys/string — linear in n.
  *
  * Strings shorter than 2k+1 go through a tiny per-length-window
  * cross path (their segments degenerate to empty); both paths are
  * exact and disjoint (segment path keeps only pairs with both
  * lengths > 2k).
  */
object EditDistance {

  def editDistancePairs(df: DataFrame, idCol: Column, strCol: Column, maxDist: Int,
                        blockCol: Option[Column] = None): DataFrame = {
    val k = maxDist
    require(k >= 1, "maxDist must be >= 1")
    val block = blockCol.getOrElse(lit(1))
    val base = graft.util.CacheScope.persist(
      df.select(idCol.as("id"), block.as("blk"), strCol.as("s"))
        .withColumn("l", length(col("s")).cast("long")))

    // canonical even partition of a length-l string into k+1 segments:
    // the first (k+1 - l%(k+1)) get floor(l/(k+1)) chars, the rest one
    // more. start/len for fixed segIdx i as Column arithmetic over l.
    def segLen(l: Column, i: Int): Column = {
      val lb = floor(l / (k + 1)).cast("long")
      val nSmall = lit(k + 1) - pmod(l, lit(k + 1))
      when(lit(i) < nSmall, lb).otherwise(lb + 1)
    }
    def segStart(l: Column, i: Int): Column = { // 0-based
      val lb = floor(l / (k + 1)).cast("long")
      val nSmall = lit(k + 1) - pmod(l, lit(k + 1))
      lit(i) * lb + greatest(lit(0L), lit(i.toLong) - nSmall)
    }

    val long = base.where(col("l") > 2 * k)
    val short = base.where(col("l") <= 2 * k)

    // index side: one row per (string, segment)
    val indexSegs = (0 until k + 1).map { i =>
      struct(lit(i).as("i"),
        col("s").substr(segStart(col("l"), i) + 1, segLen(col("l"), i)).as("seg"))
    }
    val indexed = long
      .select(col("id"), col("blk"), col("l"),
        explode(array(indexSegs: _*)).as("e"))
      .select(col("id"), col("blk"), col("l"), col("e.i").as("i"), col("e.seg").as("seg"))

    // probe side: for each target length l2 = l+d, segment i, start
    // offset o, the |seg(l2,i)|-length substring of this string at
    // seg's position + o. The (d, i, o) grid explodes as a LITERAL
    // integer-triple array and the substring math runs ONCE on the
    // exploded row — inlining a per-combo CASE into the generate
    // consume (the old shape) grew the generated method past janino's
    // 64 KB limit at k ≥ 3 and silently fell back to interpreted.
    def segLenC(l: Column, i: Column): Column = {
      val lb = floor(l / (k + 1)).cast("long")
      val nSmall = lit(k + 1) - pmod(l, lit(k + 1))
      when(i < nSmall, lb).otherwise(lb + 1)
    }
    def segStartC(l: Column, i: Column): Column = { // 0-based
      val lb = floor(l / (k + 1)).cast("long")
      val nSmall = lit(k + 1) - pmod(l, lit(k + 1))
      i.cast("long") * lb + greatest(lit(0L), i.cast("long") - nSmall)
    }
    val combos = array((for {
      d <- -k to k
      i <- 0 until k + 1
      o <- -k to k
    } yield struct(lit(d).as("d"), lit(i).as("i"), lit(o).as("o"))): _*)
    val probed = long
      .select(col("id"), col("blk"), col("l"), col("s"),
        explode(combos).as("c"))
      .withColumn("l2", col("l") + col("c.d"))
      .withColumn("st", segStartC(col("l2"), col("c.i")) + col("c.o"))
      .withColumn("ln", segLenC(col("l2"), col("c.i")))
      .where(col("l2") > 2 * k && col("ln") > 0 && col("st") >= 0 &&
        col("st") + col("ln") <= col("l"))
      .select(col("id"), col("blk"), col("l2"), col("c.i").as("i"),
        col("s").substr(col("st") + 1, col("ln")).as("sub"))
      .distinct() // a string can generate the same probe key many times

    val candLong = probed.as("p").join(indexed.as("x"),
        col("p.blk") === col("x.blk") && col("p.l2") === col("x.l") &&
        col("p.i") === col("x.i") && col("p.sub") === col("x.seg") &&
        col("p.id") =!= col("x.id"))
      .select(least(col("p.id"), col("x.id")).as("id_a"),
        greatest(col("p.id"), col("x.id")).as("id_b"))
      .distinct()

    // pairs with at least one short side: the partner's length is then
    // ≤ 3k, so the cross side is the bounded ≤3k-length population,
    // not the corpus. Disjoint from candLong (which has both > 2k).
    val candShort = short.as("a").join(base.where(col("l") <= 3 * k).as("b"),
        col("a.blk") === col("b.blk") && col("a.id") =!= col("b.id") &&
        abs(col("a.l") - col("b.l")) <= k)
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()

    candLong.union(candShort)
      .join(base.select(col("id").as("id_a"), col("s").as("sa")), "id_a")
      .join(base.select(col("id").as("id_b"), col("s").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("sa"), col("sb"), k).cast("long").as("dist"))
      .where(col("dist") >= 0 && col("dist") <= k)
  }
}
