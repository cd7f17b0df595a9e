package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

/** Spatial radius self-join: all point pairs within `radiusKm`,
  * without the O(n^2) cross product.
  *
  * Blocking: 1-degree LATITUDE bands. Great-circle distance is
  * bounded below by the meridian arc of the latitude difference
  * (~111.19 km/deg on the 6371 km sphere), so any pair within r km
  * differs by at most ceil(r/111.19) bands — probing that many
  * neighbor bands is LOSSLESS at every latitude. (Longitude grids are
  * the classic trap: a degree of longitude shrinks to ~0 km at the
  * poles, so a lon-cell neighbor join silently drops polar pairs.)
  * Each point lives in ONE band and probes 2k+1, so the equi join
  * emits every qualifying pair exactly once; candidates are then
  * verified with the exact haversine, meter-rounded BEFORE the
  * threshold compare so the kept set is engine-exact.
  */
object GeoJoin {

  def latBandRadiusPairs(df: DataFrame, idCol: Column, latCol: Column,
                         lonCol: Column, radiusKm: Double): DataFrame = {
    val k = math.ceil(radiusKm / 111.19).toInt
    val pts = df.select(idCol.as("id"), latCol.as("lat"), lonCol.as("lon"))
      .withColumn("band", floor(col("lat")).cast("long"))
    val probe = pts.withColumn("pband",
      explode(sequence(col("band") - k, col("band") + k)))
    probe.as("a").join(pts.as("b"),
        col("a.pband") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(GeoFunctions.haversineKm(
          col("a.lat"), col("a.lon"), col("b.lat"), col("b.lon")) * 1000, 0)
          .cast("long").as("dist_m"))
      .where(col("dist_m") <= (radiusKm * 1000).toLong)
  }
}
