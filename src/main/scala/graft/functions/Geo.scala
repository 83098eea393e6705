package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Spatial distance join: all (left, right) pairs within `dKm`.
    *
    * Scale path: equi-join on LATITUDE bands of width dKm (left side
    * exploded to its band ±1, so any pair within dKm shares a band key),
    * then exact haversine refine. Latitude degrees are uniform (~110.6 km)
    * at every latitude, so band width never degrades toward the poles and
    * longitude wraparound needs no special casing — the band join is the
    * shuffle key, the refine is a codegen'd filter. Candidate count is
    * |left|·|right|·(3·band/180°) instead of the full cross product; a
    * 2-D grid would prune harder at low latitudes but breaks down near
    * the poles where lon degrees compress. Hot bands compose with
    * Skew.saltedJoin if a cluster of sites shares one band.
    *
    * Inputs: point struct columns (from [[point]]). Output: left columns +
    * right columns + `km`.
    */
  def withinDistanceJoin(
      left: DataFrame, right: DataFrame,
      leftPoint: String, rightPoint: String, dKm: Double): DataFrame = {
    val bandDeg = dKm / 110.574
    val l = left.withColumn("__band",
      explode(array(Seq(-1, 0, 1).map(o =>
        (floor(stY(col(leftPoint)) / bandDeg) + o).cast("long")): _*)))
    val r = right.withColumn("__band",
      floor(stY(col(rightPoint)) / bandDeg).cast("long"))
    l.join(r, Seq("__band"))
      .withColumn("km", haversineKm(col(leftPoint), col(rightPoint)))
      .filter(col("km") <= dKm)
      .drop("__band")
  }

  /** Z-order (Morton) key: interleave the low `bits` bits of two
    * non-negative integer coordinates — x in the even positions, y in the
    * odd. THE multi-dimensional clustering key for file layout: sorting by
    * z before a partitioned write co-locates spatial neighbors inside
    * row groups, so parquet min/max pruning skips files for 2-D range
    * predicates (the Delta OPTIMIZE ZORDER move, here as a plain column).
    * Statically unrolled literal shifts — pure integer codegen, exact on
    * any engine.
    */
  def zOrderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).map { b =>
      shiftleft(shiftright(x.cast("long"), b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y.cast("long"), b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
  }
}
