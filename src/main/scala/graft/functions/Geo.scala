package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geography point support (SURVEY §2.8 Geo / F9).
  *
  * The reference stores PostGIS geography(POINT) and extracts coordinates
  * with ST_X/ST_Y in queries (lib/BIGSdb/IsolateQueryPage.pm:2519-2522,
  * coordinate conversion lib/BIGSdb/Datastore.pm:3955-4004). Spark-side a
  * point is a (lat, lon) struct column; extraction is struct field access
  * (free under codegen), and distance is the haversine formula over
  * built-in trig — no UDF, no GIS dependency.
  */
object Geo {

  /** geography(POINT) equivalent: a typed struct. */
  def point(lat: Column, lon: Column): Column =
    struct(lat.cast("double").as("lat"), lon.cast("double").as("lon"))

  /** ST_Y — latitude. */
  def stY(p: Column): Column = p.getField("lat")

  /** ST_X — longitude. */
  def stX(p: Column): Column = p.getField("lon")

  private val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km (haversine) between two point structs. */
  def haversineKm(a: Column, b: Column): Column = {
    val dLat = radians(stY(b) - stY(a))
    val dLon = radians(stX(b) - stX(a))
    val h = pow(sin(dLat / 2), 2) +
      cos(radians(stY(a))) * cos(radians(stY(b))) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(h))
  }

  /** Map-bucket key for dashboard geo aggregation (A9 map widgets): the
    * containing grid cell at `cellDeg` resolution.
    */
  def gridCell(p: Column, cellDeg: Double): Column =
    struct(
      floor(stY(p) / cellDeg).cast("int").as("cell_lat"),
      floor(stX(p) / cellDeg).cast("int").as("cell_lon"))
}
