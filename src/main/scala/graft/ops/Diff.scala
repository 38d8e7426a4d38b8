package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff (CDC extraction): classify every key as added / removed /
  * changed between two snapshots of the same table — the change-feed the
  * reference derives imperatively by re-pulling whole entities per day
  * (/root/reference/dags/dag_maestros.py:42 re-extracts a date window and
  * upserts). A declarative full-outer join yields the same delta in one
  * shuffle, and at 100 TB the join partitions by key like any other
  * equi-join — no driver-side row comparison anywhere.
  *
  * Keys must be non-null (join-key semantics); compare columns are
  * null-safe (`<=>`), so a null-to-value transition counts as changed.
  */
object Diff {

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keys.intersect(compareCols).isEmpty,
      s"snapshotDiff: key columns cannot also be compare columns " +
        s"(${keys.intersect(compareCols).mkString(", ")})")
    val o = oldDf.select((keys ++ compareCols).map(c => col(c).as(s"__o_$c")): _*)
    val n = newDf.select((keys ++ compareCols).map(c => col(c).as(s"__n_$c")): _*)
    val cond = keys.map(k => col(s"__o_$k") === col(s"__n_$k")).reduce(_ && _)
    val oldAbsent = col(s"__o_${keys.head}").isNull
    val newAbsent = col(s"__n_${keys.head}").isNull
    val changed: Column = compareCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, cond, "full_outer")
      .select(keys.map(k => coalesce(col(s"__o_$k"), col(s"__n_$k")).as(k)) :+
        when(oldAbsent, "added").when(newAbsent, "removed")
          .when(changed, "changed").otherwise("unchanged").as("change_type"): _*)
      .filter(col("change_type") =!= "unchanged")
  }

  final case class SchemaChange(column: String, change: String,
                                oldType: Option[String], newType: Option[String])

  /** Schema-level CDC: columns added, removed, or type-changed between two
    * batch schemas — the guard a schemaless feed (REST JSON, the document
    * store's union-schema reads) needs before a load widens or breaks a
    * warehouse table. Purely structural (driver-side; no data scan).
    * Nested struct fields compare by their full type signature.
    */
  def schemaDrift(oldSchema: org.apache.spark.sql.types.StructType,
                  newSchema: org.apache.spark.sql.types.StructType): Seq[SchemaChange] = {
    val o = oldSchema.fields.map(f => f.name -> f.dataType.sql).toMap
    val n = newSchema.fields.map(f => f.name -> f.dataType.sql).toMap
    val added = (n.keySet -- o.keySet).toSeq.sorted
      .map(c => SchemaChange(c, "added", None, Some(n(c))))
    val removed = (o.keySet -- n.keySet).toSeq.sorted
      .map(c => SchemaChange(c, "removed", Some(o(c)), None))
    val retyped = (o.keySet & n.keySet).toSeq.sorted
      .filter(c => o(c) != n(c))
      .map(c => SchemaChange(c, "retyped", Some(o(c)), Some(n(c))))
    added ++ removed ++ retyped
  }
}
