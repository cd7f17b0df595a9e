package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

/** Spatial radius self-join: all point pairs within `radiusKm`,
  * without the O(n^2) cross product.
  *
  * Blocking is TWO-dimensional: 1-degree latitude bands × per-band
  * longitude cells. Great-circle distance is bounded below by the
  * meridian arc of the latitude difference (~111.19 km/deg on the
  * 6371 km sphere), so any pair within r km differs by at most
  * k = ceil(r/111.19) bands. A band's cells must be wide enough for
  * EVERY pair that meets in it — and the probing point can sit up to
  * k bands poleward of the band it probes, where a degree of
  * longitude is narrower. So cell width for band b is derived from
  * E = min(poleNearestEdge(b) + k, 90°), the pole-most latitude any
  * point of a qualifying pair probing b can have. (Sizing from the
  * band's OWN edge dropped polar pairs: at r=500 km the points
  * (85.68, 44.9) and (83.9999, 90.9) are 479.8 km apart yet landed
  * 2 cells apart in band 83's grid.)
  *
  * The width bound itself is the exact spherical one, not the linear
  * r/(111.19·cos E) approximation: haversine gives, for both points
  * at |φ| ≤ E, d ≥ 2R·asin(cos E · sin(Δλ/2)), so d ≤ r implies
  * Δλ ≤ 2·asin(sin(r/2R)/cos E). (The linear form is ~3% narrower
  * than this at 85°/500 km — sin x < x — i.e. slightly lossy even
  * within one band.) Bands whose E reaches 85° collapse to a single
  * cell (the 1-D fallback; cos → 0 blows the width past 360° anyway).
  * Cells wrap modulo 360° so antimeridian pairs block together.
  *
  * Each point is INDEXED once under (band, cell) and PROBES the
  * (2k+1)×3 neighbor keys; the equi join emits candidates that are
  * verified with the exact haversine (meter-rounded BEFORE the
  * threshold compare, so the kept set is engine-exact) and deduped
  * per pair after the filter. Without the lon dimension a band's
  * entire population lands in one block: block size grows linearly
  * with data and the within-block O(block²) compare dominates — the
  * sf1 scaling smoke measured exactly that (~10 min for 150k points);
  * 2-D cells keep blocks at neighborhood density, so candidates grow
  * with n·density, not n².
  */
object GeoJoin {

  def latBandRadiusPairs(df: DataFrame, idCol: Column, latCol: Column,
                         lonCol: Column, radiusKm: Double): DataFrame = {
    val k = math.ceil(radiusKm / 111.19).toInt
    val sinHalfR = math.sin(radiusKm / (2.0 * 6371.0)) // sin(r/2R)
    val polarCos = math.cos(math.toRadians(85.0))

    // widest lon-degree span of an r-km pair PROBING this band: exact
    // spherical bound at the pole-most latitude reachable within the
    // ±k-band probe window; bands whose window touches 85° → 1 cell
    def cellsOf(band: Column): Column = {
      val edge = least(lit(89.9999),
        greatest(abs(band.cast("double")), abs(band.cast("double") + 1)) + lit(k.toDouble))
      val c = cos(radians(edge))
      val s = lit(sinHalfR) / c
      val width = when(c <= lit(polarCos) || s >= lit(1.0), lit(360.0))
        .otherwise(least(lit(360.0), degrees(asin(s) * lit(2.0))))
      greatest(floor(lit(360.0) / width), lit(1.0)).cast("long")
    }
    def cellOf(band: Column, lon: Column): Column = {
      val n = cellsOf(band)
      pmod(floor((lon + lit(180.0)) * n.cast("double") / lit(360.0)).cast("long"), n)
    }

    val pts = df.select(idCol.as("id"), latCol.as("lat"), lonCol.as("lon"))
      .withColumn("band", floor(col("lat")).cast("long"))
    val indexed = pts.withColumn("cell", cellOf(col("band"), col("lon")))
    val probe = pts
      .withColumn("pband", explode(sequence(col("band") - k, col("band") + k)))
      .withColumn("dc", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("pcell",
        pmod(cellOf(col("pband"), col("lon")) + col("dc"), cellsOf(col("pband"))))
    probe.as("a").join(indexed.as("b"),
        col("a.pband") === col("b.band") && col("a.pcell") === col("b.cell") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(GeoFunctions.haversineKm(
          col("a.lat"), col("a.lon"), col("b.lat"), col("b.lon")) * 1000, 0)
          .cast("long").as("dist_m"))
      .where(col("dist_m") <= (radiusKm * 1000).toLong)
      // a pair can meet in several probed cells (wrap-around, dc
      // overlap at tiny cell counts): dedup after the cheap filter
      .groupBy("id_a", "id_b").agg(first(col("dist_m")).as("dist_m"))
  }
}
