package graft.ops

import graft.types._
import graft.frame.SeaFrame
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's single join operator re-expressed on Catalyst
  * (seafan gdata.go:1168-1296): equi-join on one shared-name key,
  * inner/left/right/outer, with
  *
  *   - duplicate non-key fields: left wins, right's dropped
  *     (gdata.go:1216-1224);
  *   - missing-side fill: NOT null — the feature default, else the
  *     kind's zero value 0 / 0.0 / "" / 1970-01-01 (gdata.go:1322-1344);
  *   - float keys rejected (gdata.go:1486-1499).
  *
  * Catalyst picks the physical strategy (broadcast-hash for small
  * sides, shuffled-hash/sort-merge otherwise, AQE skew-split at
  * runtime) — the reference's hand-rolled sort-merge is exactly what we
  * do NOT reimplement.
  */
object Joins {

  /** Kind-zero fill values per Spark type name (gdata.go:1322-1344). */
  def zeroFor(typeName: String): Any = typeName match {
    case "double" | "float" => 0.0
    case "integer" | "long" | "short" | "byte" => 0L
    case "string" => ""
    case "date" => java.sql.Date.valueOf("1970-01-01")
    case "timestamp" => java.sql.Timestamp.valueOf("1970-01-01 00:00:00")
    case _ => null
  }

  def join(left: DataFrame, right: DataFrame, on: String, joinType: String,
      defaults: Map[String, Any] = Map.empty,
      rejectFloatKey: Boolean = true): DataFrame = {
    val keyType = left.schema(on).dataType.typeName
    if (rejectFloatKey)
      require(keyType != "double" && keyType != "float",
        s"join: float key '$on' rejected (gdata.go:1486-1499)")
    require(right.schema.fieldNames.contains(on),
      s"join: key '$on' must exist on both sides")

    // left-priority duplicate drop: right contributes only its new fields
    val dupes = right.columns.filter(c => c != on && left.columns.contains(c))
    val r = dupes.foldLeft(right)((d, c) => d.drop(c))

    val joined = left.join(r, Seq(on), joinType)

    // default-fill instead of NULL on every missing-side column
    val leftOnly = left.columns.filterNot(_ == on).toSeq
    val rightOnly = r.columns.filterNot(_ == on).toSeq
    val fillable: Seq[String] = joinType match {
      case "inner" => Seq.empty
      case "left" | "left_outer" => rightOnly
      case "right" | "right_outer" => leftOnly
      case "outer" | "full" | "full_outer" => leftOnly ++ rightOnly
      case t => throw new IllegalArgumentException(s"join type $t")
    }
    val filled = fillable.foldLeft(joined) { (d, c) =>
      val fill = defaults.getOrElse(c, zeroFor(d.schema(c).dataType.typeName))
      if (fill == null) d
      else d.withColumn(c, coalesce(d(c), lit(fill).cast(d.schema(c).dataType)))
    }
    filled
  }

  /** Salted equi-join for skewed keys: the left (large, skewed) side
    * gets a random salt in [0, salts); the right side is exploded
    * across all salt values, so one hot key spreads over `salts`
    * reducers instead of one. AQE's skew-join split handles runtime
    * detection; this is the explicit form for when the skew is known
    * up front (e.g. a null-ish default key at 100 TB).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, on: String,
      joinType: String, salts: Int): DataFrame = {
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer",
      "saltedJoin supports inner/left (right side is replicated)")
    val l = left.withColumn("__salt",
      pmod(pmod(hash(monotonically_increasing_id()), lit(salts))
        + lit(salts), lit(salts)))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    val dupes = right.columns.filter(c => c != on && left.columns.contains(c))
    val rClean = dupes.foldLeft(r)((d, c) => d.drop(c))
    l.join(rClean, Seq(on, "__salt"), joinType).drop("__salt")
  }

  /** SeaFrame wrapper: joins data columns, re-sequences by (key, left
    * seq, right seq) since the reference's join output is sorted by the
    * key (gdata.go:1188-1198), and drops one-hot/embed features (they
    * must be re-derived after a join — gdata.go:1164-1167).
    */
  def seaJoin(left: SeaFrame, right: SeaFrame, on: String,
      joinType: String): SeaFrame = {
    val defaults: Map[String, Any] =
      (left.schema.metas ++ right.schema.metas)
        .flatMap(m => m.default.map(d => m.name -> (d: Any))).toMap
    val stripOneHot = (f: SeaFrame) =>
      f.schema.metas.filter(m => m.role == FeatureRole.OneHot ||
        m.role == FeatureRole.Embed).foldLeft(f)((acc, m) => acc.drop(m.name))
    val l = stripOneHot(left)
    val r = stripOneHot(right)
    val joined = join(l.result, r.result, on, joinType, defaults)
    val metas = (l.schema.metas ++
      r.schema.metas.filterNot(m => l.schema.has(m.name)))
      .filter(m => joined.columns.contains(m.name))
    SeaFrame.withSequence(joined, Seq(col(on).asc))
      .copy(schema = FeatureSchema(metas))
  }
}
