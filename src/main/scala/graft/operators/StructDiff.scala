package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Table-structure equivalence check (SURVEY.md SC1).
  *
  * The reference's diff engine always compares structure before data
  * (`check-struct-only`, `/root/reference/syncdiff_config2/my_database_users.toml:11`;
  * verdict phrase consumed at `step3_run_syncdiff.sh:203-209`). Here it is a
  * driver-side field-by-field `StructType` comparison producing a typed diff
  * relation — column order is ignored (name-keyed), matching MySQL's
  * order-insensitive structure equivalence semantics.
  */
object StructDiff {

  case class FieldDiff(
      field: String,
      up_type: Option[String],
      down_type: Option[String],
      status: String)

  def diff(up: StructType, down: StructType): Seq[FieldDiff] = {
    val u = up.fields.map(f => f.name -> f).toMap
    val d = down.fields.map(f => f.name -> f).toMap
    (up.fields.map(_.name) ++ down.fields.map(_.name).filterNot(u.contains))
      .toSeq.distinct.sorted
      .flatMap { name =>
        (u.get(name), d.get(name)) match {
          case (Some(a), None) =>
            Some(FieldDiff(name, Some(a.dataType.simpleString), None, "missing_on_down"))
          case (None, Some(b)) =>
            Some(FieldDiff(name, None, Some(b.dataType.simpleString), "extra_on_down"))
          case (Some(a), Some(b)) if a.dataType != b.dataType =>
            Some(FieldDiff(name, Some(a.dataType.simpleString),
              Some(b.dataType.simpleString), "type_mismatch"))
          case (Some(a), Some(b)) if a.nullable != b.nullable =>
            Some(FieldDiff(name, Some(a.dataType.simpleString),
              Some(b.dataType.simpleString), "nullability_mismatch"))
          case _ => None
        }
      }
  }

  def equivalent(up: StructType, down: StructType): Boolean = diff(up, down).isEmpty

  def toDF(spark: SparkSession, diffs: Seq[FieldDiff]): DataFrame = {
    import spark.implicits._
    diffs.toDF()
  }
}
