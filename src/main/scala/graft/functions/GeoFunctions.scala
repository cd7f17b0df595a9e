package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial helpers. Reference: mlqueries.py:77 calculate_distance —
  * a Python UDF haversine evaluated driver-side per monument; here the
  * same formula is a codegen'd Column expression evaluated inside the
  * scan pipeline. */
object GeoFunctions {
  private val EarthRadiusKm = 6371.0

  /** Great-circle distance in km (haversine). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusKm) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }
}
