package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.CacheScope

/** Density-based clustering (DBSCAN, Ester et al. KDD'96) over 2-D
  * integer-quantized points, Spark-first: the ε-neighborhood search is
  * a GRID-BLOCKED self-join (cell width = ε ⇒ every qualifying pair
  * lies within one cell step on each axis — lossless, the bound is
  * |Δx| ≤ ε ⇒ |⌊x₁/ε⌋−⌊x₂/ε⌋| ≤ 1 for non-negative coords), the
  * transitive core closure is pointer-doubled connected components,
  * and every distance test is exact integer arithmetic (micro-unit
  * coords, squared distances — no sqrt, no float).
  *
  * Complements the centroid family (ml.KMeansLite, q_kmeans_arith):
  * DBSCAN finds arbitrary-shape clusters and a NOISE set, with no k.
  *
  * Determinism (the property k-d DBSCAN implementations give up):
  * cluster id = MIN core id of the density-connected component, and a
  * border point joins the MIN cluster among its in-range cores — no
  * visit-order dependence, so results are partition-invariant and
  * SQL-replayable.
  *
  * Scale shape: candidates are generated per grid cell (the blocking
  * key); fan-out is bounded by cell occupancy, which for ε chosen at
  * the intended density is O(minPts)-ish per cell — candidates grow
  * linearly with points, never points². The degenerate-cell guard for
  * adversarial data (all points in one cell → m² pairs) is the same
  * maxShingleDf-style cap discipline as the ngram joins; density ε
  * misconfigured by orders of magnitude is a parameter bug, not a
  * data hazard, and surfaces as a skewed-cell explosion in
  * q_skew_audit's pre-flight.
  *
  * Reference scope: the reference's clustering surface is centroid
  * k-means (mlqueries.py); DBSCAN is part of the beyond-reference
  * training-data mandate (embedding-space curation: dense regions =
  * modes worth down-sampling, noise = outliers worth auditing).
  */
object DbscanGrid {

  /** @param points (id: long unique, x,y: long NON-NEGATIVE micro-unit
    *               coords — offset before calling; floor==truncate only
    *               holds for non-negatives and both engines must agree)
    * @return (id, role ∈ core|border|noise, cluster_id: long nullable —
    *         min core id of the cluster, null for noise) */
  def cluster(points: DataFrame, idCol: Column, xCol: Column, yCol: Column,
              epsU: Long, minPts: Int): DataFrame = {
    val pts = CacheScope.persist(
      points.select(idCol.cast("long").as("id"),
        xCol.cast("long").as("x"), yCol.cast("long").as("y")))

    val cells = pts
      .withColumn("cx", expr(s"x div ${epsU}L"))
      .withColumn("cy", expr(s"y div ${epsU}L"))
    // probe side: each point visits its 3×3 cell neighborhood; the
    // build side stays at its exact cell, so a pair is produced at
    // most once (b's cell is unique) per direction and a.id < b.id
    // keeps one direction only.
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    val probe = cells.withColumn("o", explode(offsets))
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        (col("cx") + col("o.dx")).as("pcx"), (col("cy") + col("o.dy")).as("pcy"))
    val pairs = CacheScope.persist(
      probe.join(cells.select(col("id").as("id_b"), col("x").as("xb"),
          col("y").as("yb"), col("cx"), col("cy")),
          col("pcx") === col("cx") && col("pcy") === col("cy") &&
            col("id_a") < col("id_b"))
        .where((col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")) <= lit(epsU * epsU))
        .select(col("id_a"), col("id_b")))

    // degree over ALL points (zero-neighbor points must still reach
    // the ε-count — at minPts ≤ 1 an isolated point IS a core
    // singleton, and only a left join can say so)
    val deg = pts.select("id").join(
      pairs.select(col("id_a").as("id"))
        .unionAll(pairs.select(col("id_b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("nnbr")),
      Seq("id"), "left")
      .na.fill(0L, Seq("nnbr"))
    // ε-neighborhood size counts the point itself (sklearn convention)
    val core = CacheScope.persist(
      deg.where(col("nnbr") + 1 >= minPts).select("id"))

    val coreEdges = pairs
      .join(core.withColumnRenamed("id", "id_a"), "id_a")
      .join(core.withColumnRenamed("id", "id_b"), "id_b")
    val comps = ConnectedComponents.labelPropagation(coreEdges, "id_a", "id_b")
    // cores with no core neighbor form singleton clusters
    val coreComp = CacheScope.persist(
      comps.unionAll(
        core.join(comps.select(col("id")), Seq("id"), "left_anti")
          .select(col("id"), col("id").as("component"))))

    // border: non-core with ≥1 core in range → min cluster among them
    val dirs = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
    val border = dirs
      .join(coreComp.select(col("id").as("v"), col("component")), "v")
      .join(core.withColumnRenamed("id", "u"), Seq("u"), "left_anti")
      .groupBy(col("u").as("id")).agg(min(col("component")).as("cluster_id"))

    val coreOut = coreComp.select(col("id"), lit("core").as("role"),
      col("component").as("cluster_id"))
    val borderOut = border.select(col("id"), lit("border").as("role"),
      col("cluster_id"))
    val noiseOut = pts.select("id")
      .join(coreOut.select("id").unionAll(borderOut.select("id")), Seq("id"), "left_anti")
      .select(col("id"), lit("noise").as("role"), lit(null).cast("long").as("cluster_id"))
    coreOut.unionAll(borderOut).unionAll(noiseOut)
  }
}
