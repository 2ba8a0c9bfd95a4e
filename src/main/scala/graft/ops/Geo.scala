package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial primitives — the distance/radius-join/geocell toolkit
  * every location-bearing dataset needs, expressed so results replay
  * across engines: spherical trig in ONE fixed operation order with
  * 6dp-rounded outputs, cell ids in pure integer arithmetic.
  */
object Geo {

  /** Great-circle distance in meters (haversine, the public
    * formula): 2R·asin(sqrt(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))),
    * R = 6371008.8 (IUGG mean). One fixed operation order; round the
    * OUTPUT (callers compare rounded values so threshold cuts are
    * cross-engine deterministic).
    */
  def haversineM(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column = {
    val r = lit(6371008.8)
    val rad = lit(math.Pi / 180.0)
    val dphi = (lat2 - lat1) * rad / 2.0
    val dlmb = (lon2 - lon1) * rad / 2.0
    val a = sin(dphi) * sin(dphi) +
      cos(lat1 * rad) * cos(lat2 * rad) * sin(dlmb) * sin(dlmb)
    lit(2.0) * r * asin(sqrt(a))
  }

  /** RADIUS JOIN with latitude-band blocking: pairs within
    * `radiusM`, compared only inside adjacent latitude bands — the
    * standard spatial-join pruning (a pair within R can differ by at
    * most R in north-south distance, so banding at `bandM` >= R
    * meters of latitude guarantees candidates share a band or sit in
    * adjacent ones; longitude pruning would need cos-scaled widths —
    * the band join keeps the guarantee simple and exact). Candidates
    * are per-band quadratic (census-guarded); the final cut uses the
    * 6dp-ROUNDED distance so the emitted set replays exactly.
    * Inputs: (id, lat, lon) on both sides; emits a < b pairs when
    * self-joining the same frame (`selfPairs = true`).
    */
  def radiusJoin(a: DataFrame, b: DataFrame, radiusM: Double,
      selfPairs: Boolean = false, maxPerBand: Int = 100000)
      : DataFrame = {
    require(radiusM > 0, s"radiusJoin: radiusM $radiusM")
    // 1 degree latitude ~ 111.32 km; band height = radius
    val bandDeg = radiusM / 111320.0
    def banded(df: DataFrame, p: String) = df.select(
      col("id").as(s"id_$p"), col("lat").as(s"lat_$p"),
      col("lon").as(s"lon_$p"),
      floor(col("lat") / bandDeg).cast("long").as("__band"))
    val ba = banded(a, "a")
    // b appears in its own band and both neighbors, so every
    // within-R pair co-locates in at least one band of a
    val bb = banded(b, "b")
      .select(col("id_b"), col("lat_b"), col("lon_b"),
        explode(array(col("__band") - 1, col("__band"),
          col("__band") + 1)).as("__band"))
    if (maxPerBand > 0) {
      val worst = ba.groupBy(col("__band")).count()
        .agg(coalesce(max(col("count")), lit(0L))).first().getLong(0)
      require(worst <= maxPerBand,
        s"radiusJoin: densest latitude band holds $worst points " +
          s"(> $maxPerBand) — use a finer cell scheme")
    }
    val joined = ba.join(bb, Seq("__band"))
      .where(if (selfPairs) col("id_a") < col("id_b") else lit(true))
      .withColumn("dist_m", round(haversineM(col("lat_a"),
        col("lon_a"), col("lat_b"), col("lon_b")), 6))
      .where(col("dist_m") <= radiusM)
      .select(col("id_a"), col("id_b"), col("dist_m"))
      .distinct() // a pair can match in up to 2 shared bands
    joined
  }

  /** GEOHASH cell id as an integer Morton code: quantize lat to
    * [0, 2^bits) over [-90, 90] and lon over [-180, 180], then
    * bit-interleave (lon gets the even bits — the geohash
    * convention). Pure integer arithmetic after the one fixed-order
    * quantization, so cells replay exactly; prefix-truncating the
    * code (shifting out low bits) coarsens the cell like a shorter
    * geohash string. Composes with [[graft.io.Layout]]'s Z-order
    * machinery — this IS a Morton key over geographic space.
    */
  def geoCell(lat: Column, lon: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"geoCell: bits $bits")
    val scale = (1L << bits).toDouble
    val qlat = least(floor((lat + 90.0) / 180.0 * scale),
      lit((1L << bits) - 1L)).cast("long")
    val qlon = least(floor((lon + 180.0) / 360.0 * scale),
      lit((1L << bits) - 1L)).cast("long")
    graft.io.Layout.zValueN(Seq(qlon, qlat), bits)
  }
}
