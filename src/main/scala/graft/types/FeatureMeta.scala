package graft.types

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** Feature roles, mirroring the reference's FRole enum
  * (seafan fields.go:56-64): continuous, categorical (label-encoded),
  * one-hot (derived from a Cat), embedding (derived from a Cat).
  */
sealed abstract class FeatureRole(val name: String)
object FeatureRole {
  case object Cts    extends FeatureRole("cts")
  case object Cat    extends FeatureRole("cat")
  case object OneHot extends FeatureRole("onehot")
  case object Embed  extends FeatureRole("embed")

  val all: Seq[FeatureRole] = Seq(Cts, Cat, OneHot, Embed)
  def parse(s: String): FeatureRole =
    all.find(_.name == s.toLowerCase)
      .getOrElse(throw new IllegalArgumentException(s"unknown role: $s"))
}

/** Per-feature encoding metadata, the analog of the reference's
  * FType + FParam (seafan fields.go:16-53): normalization location/scale
  * for continuous features, the sorted-value level dictionary for
  * categoricals, the default used for unseen values / join fill, and the
  * source column for derived one-hot/embedding features.
  *
  * Levels are keyed by the string rendering of the raw value; codes are
  * assigned in sorted-value order (reference data.go:703-715), so they
  * are reproducible from the data alone.
  */
case class FeatureMeta(
    name: String,
    role: FeatureRole,
    location: Double = 0.0,
    scale: Double = 1.0,
    normalized: Boolean = false,
    levels: Map[String, Int] = Map.empty,
    default: Option[String] = None,
    from: Option[String] = None,
    embCols: Int = 0) {

  def nCats: Int = levels.size

  /** Inverse level map: code -> raw string value. */
  lazy val inverseLevels: Map[Int, String] = levels.map(_.swap)
}

/** A named collection of feature metadata — the persistable schema
  * (reference FTypes.Save/LoadFTypes fields.go:132-286). Enables the
  * train/apply split: encode a NEW dataset under a PREVIOUS dataset's
  * fitted parameters.
  */
case class FeatureSchema(metas: Seq[FeatureMeta]) {
  private lazy val byName = metas.map(m => m.name -> m).toMap
  def apply(name: String): FeatureMeta = byName.getOrElse(
    name, throw new NoSuchElementException(s"no feature meta for '$name'"))
  def get(name: String): Option[FeatureMeta] = byName.get(name)
  def has(name: String): Boolean = byName.contains(name)
  def names: Seq[String] = metas.map(_.name)

  def updated(m: FeatureMeta): FeatureSchema =
    FeatureSchema(metas.filterNot(_.name == m.name) :+ m)
  def without(name: String): FeatureSchema =
    FeatureSchema(metas.filterNot(_.name == name))

  def toJson: String = FeatureSchema.write(this)
  def save(path: String): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), toJson)
  }
}

object FeatureSchema {
  val empty: FeatureSchema = FeatureSchema(Nil)

  private implicit val formats: Formats = DefaultFormats

  private def metaToJ(m: FeatureMeta): JValue = JObject(
    "name" -> JString(m.name),
    "role" -> JString(m.role.name),
    "location" -> JDouble(m.location),
    "scale" -> JDouble(m.scale),
    "normalized" -> JBool(m.normalized),
    "levels" -> JObject(m.levels.toList.sortBy(_._2)
      .map { case (k, v) => k -> (JInt(v): JValue) }),
    "default" -> m.default.map(JString).getOrElse(JNull),
    "from" -> m.from.map(JString).getOrElse(JNull),
    "embCols" -> JInt(m.embCols))

  def write(s: FeatureSchema): String =
    JsonMethods.pretty(JsonMethods.render(JArray(s.metas.map(metaToJ).toList)))

  def read(json: String): FeatureSchema = {
    val JArray(items) = JsonMethods.parse(json): @unchecked
    FeatureSchema(items.map { j =>
      FeatureMeta(
        name = (j \ "name").extract[String],
        role = FeatureRole.parse((j \ "role").extract[String]),
        location = (j \ "location").extract[Double],
        scale = (j \ "scale").extract[Double],
        normalized = (j \ "normalized").extract[Boolean],
        levels = (j \ "levels") match {
          case JObject(fs) => fs.map { case (k, v) => k -> v.extract[Int] }.toMap
          case _ => Map.empty[String, Int]
        },
        default = (j \ "default").extractOpt[String],
        from = (j \ "from").extractOpt[String],
        embCols = (j \ "embCols").extract[Int])
    })
  }

  def load(path: String): FeatureSchema =
    read(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
