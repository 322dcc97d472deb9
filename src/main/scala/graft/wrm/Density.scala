package graft.wrm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial grid density analysis (A3/A5/J1/O3/F7-F9; reference
  * bike_spatial_density_analysis.py:18-190).
  *
  * The reference nested-loops grid cells × stations (O(cells·n)); here the
  * cell key is computed directly per point — `floor((coord - min)/delta)` —
  * and aggregated in one shuffle (O(n), SURVEY §2.3 J1). Cell membership is
  * half-open `[min, max)` with the top edge clamped into the last cell,
  * matching the reference's boundary handling.
  *
  * Grid geometry (bike_spatial_density_analysis.py:70-81,126-134): square
  * cells of `cellAreaM2` m² — side sqrt(area) meters, converted to degrees
  * with the flat-earth approximation (1° lat = 111320 m;
  * 1° lon = 111320·cos(lat_center) m — constants F9).
  */
object Density {

  final case class GridResult(
      cells: DataFrame,
      top10: Array[org.apache.spark.sql.Row],
      totalBikes: Long, nStations: Long, nBikes: Long)

  /** Per-cell density over the latest-station view. */
  def gridDensity(latest: DataFrame, cellAreaM2: Double = 1000.0): DataFrame = {
    val pts = latest.filter(col("lat").isNotNull && col("lon").isNotNull)

    // A3 bounds — tiny 1-row aggregate, broadcast to every partition.
    // lat_center accumulates in DECIMAL: a double avg() depends on
    // partition summation order, and lat_center feeds cos() and therefore
    // every cell_col — the decimal sum is order-independent and
    // bit-identical across engines. (Residual cross-engine risk: libm vs
    // JVM cos can differ by 1 ULP on the SAME input, which could flip a
    // floor() only for a point within ~1 ULP of a cell edge.)
    val bounds = pts.agg(
      min(col("lat")).as("lat_min"), max(col("lat")).as("lat_max"),
      min(col("lon")).as("lon_min"), max(col("lon")).as("lon_max"),
      (sum(col("lat").cast("decimal(28,12)")).cast("double") /
        count(lit(1))).as("lat_center"))

    val sideM = math.sqrt(cellAreaM2) // F7: e.g. 31.6 m for 1000 m²
    val latDelta = lit(sideM / 111320.0) // F9 meters→degrees lat
    val lonDelta = lit(sideM) / (lit(111320.0) * cos(radians(col("lat_center"))))

    val nRows = ceil((col("lat_max") - col("lat_min")) / latDelta).cast("int")
    val nCols = ceil((col("lon_max") - col("lon_min")) / lonDelta).cast("int")

    pts.crossJoin(broadcast(bounds))
      .withColumn("cell_row",
        least(floor((col("lat") - col("lat_min")) / latDelta),
          greatest(nRows - 1, lit(0)).cast("long")).cast("int"))
      .withColumn("cell_col",
        least(floor((col("lon") - col("lon_min")) / lonDelta),
          greatest(nCols - 1, lit(0)).cast("long")).cast("int"))
      .groupBy(col("cell_row"), col("cell_col"))
      .agg(
        // A5 per-cell aggregate (bike_spatial_density_analysis.py:168-185)
        sum(col("bikes")).as("bike_count"),
        count(when(col("record_type") === "station", 1)).as("station_count"),
        count(when(col("record_type") === "bike", 1)).as("mobile_bike_count"),
        // decimal-exact cell centers: order-independent under any
        // partitioning, bit-identical to the oracle's decimal sum
        (sum(col("lat").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("center_lat"),
        (sum(col("lon").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("center_lon"),
        sort_array(collect_list(struct(
          col("station_id"), col("name"), col("bikes"), col("record_type"))))
          .as("members"))
  }

  /** Plotly marker contract (bike_spatial_density_analysis.py:272-274):
    * per-cell marker size = max(5, ln(bike_count + 1) · 15) — log scale so
    * dense cells don't drown the map. Presentation-only column, kept out
    * of the oracle-checked grid output (ln() is not correctly-rounded, so
    * cross-engine bit-equality isn't guaranteed).
    */
  def withMarkerSize(cells: DataFrame): DataFrame =
    cells.withColumn("marker_size",
      greatest(lit(5.0), log(coalesce(col("bike_count"), lit(0L)) + 1) * 15.0))

  /** Map zoom from the bbox spans (bike_spatial_density_analysis.py:364):
    * max(8, min(15, 12 − log10(max(lat_range, lon_range)))).
    */
  def mapZoom(latRange: Double, lonRange: Double): Double =
    math.max(8.0, math.min(15.0, 12.0 - math.log10(math.max(latRange, lonRange))))

  /** Map viewport math (reference bike_density_map consumes these): center
    * = bbox midpoint; zoom from the larger bbox span via log2 against a
    * 360°-wide world tile (F7 log usage).
    */
  def zoomCenter(latMin: Double, latMax: Double,
                 lonMin: Double, lonMax: Double): (Double, Double, Double) = {
    val centerLat = (latMin + latMax) / 2
    val centerLon = (lonMin + lonMax) / 2
    val span = math.max(latMax - latMin, lonMax - lonMin)
    val zoom =
      if (span <= 0) 15.0
      else math.max(1.0, math.min(15.0, math.log(360.0 / span) / math.log(2.0)))
    (centerLat, centerLon, zoom)
  }

  /** Full analysis: per-cell grid + global tallies + top-10 densest
    * (bike_spatial_density_analysis.py:93-102).
    */
  def analyze(latest: DataFrame, cellAreaM2: Double = 1000.0): GridResult = {
    val cells = gridDensity(latest, cellAreaM2)
    val top10 = cells.orderBy(col("bike_count").desc, col("cell_row"), col("cell_col"))
      .limit(10).collect()
    val globals = latest.agg(
      sum(col("bikes")).as("total"),
      count(when(col("record_type") === "station", 1)).as("ns"),
      count(when(col("record_type") === "bike", 1)).as("nb")).collect()(0)
    GridResult(cells, top10,
      if (globals.isNullAt(0)) 0L else globals.getLong(0),
      globals.getLong(1), globals.getLong(2))
  }
}
