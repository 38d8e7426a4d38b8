package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class DocStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def freshPath() = {
    val d = java.nio.file.Files.createTempDirectory("graft-docstore").toString
    // Spark wants to create the directory itself on first write
    new java.io.File(d).delete()
    d
  }

  test("insert heterogeneous batches; find infers the union schema") {
    val path = freshPath()
    assert(DocStore.insertMany(
      Seq((1L, "widget"), (2L, "gadget")).toDF("id", "name"), path) == 2)
    // second batch has an extra field — schemaless collections allow this
    DocStore.insertMany(
      Seq((3L, "gizmo", 9.5)).toDF("id", "name", "price"), path)
    val all = DocStore.find(spark, path)
    assert(all.count() == 3)
    assert(all.columns.toSet == Set("id", "name", "price"))
    // docs from the first batch read the missing field as null
    assert(all.filter(col("price").isNull).count() == 2)
    val q = DocStore.find(spark, path, Some(col("name") === "gadget"))
    assert(q.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("updateMany applies $set to matching docs only, counts matches") {
    val path = freshPath()
    DocStore.insertMany(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("id", "grp", "v"), path)
    val n = DocStore.updateMany(spark, path, col("grp") === "a",
      Map("v" -> lit(0.0), "flag" -> lit("reset")))
    assert(n == 2)
    val after = DocStore.find(spark, path).orderBy("id")
      .select("id", "v", "flag").collect()
    assert(after.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 0.0), (2L, 2.0), (3L, 0.0)))
    assert(after.map(r => Option(r.getString(2))).toSeq ==
      Seq(Some("reset"), None, Some("reset")))
  }

  test("updateMany $set of a numeric value into a new field keeps its type") {
    val path = freshPath()
    DocStore.insertMany(Seq((1L, "a"), (2L, "b")).toDF("id", "grp"), path)
    assert(DocStore.updateMany(spark, path, col("grp") === "a",
      Map("price" -> lit(9.5), "qty" -> lit(3L))) == 1)
    val after = DocStore.find(spark, path)
    assert(after.schema("price").dataType == org.apache.spark.sql.types.DoubleType)
    assert(after.schema("qty").dataType == org.apache.spark.sql.types.LongType)
    // numeric filters work on the evolved field — the coercion bug broke this
    assert(after.filter(col("price") > 9.0).select("id").as[Long].collect().toSeq == Seq(1L))
    assert(after.filter(col("price").isNull).select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("updateMany counts matches on pre-update values when $set writes a filter column") {
    val path = freshPath()
    DocStore.insertMany(Seq((1L, "pending"), (2L, "pending"), (3L, "done"))
      .toDF("id", "status"), path)
    // canonical $set pattern: the set overwrites the very column the
    // filter reads — matched must reflect the pre-update state (2), not
    // the post-update one (0)
    val n = DocStore.updateMany(spark, path, col("status") === "pending",
      Map("status" -> lit("done")))
    assert(n == 2)
    assert(DocStore.find(spark, path).filter(col("status") === "done").count() == 3)
  }

  test("a collection stranded at __old by an interrupted swap is recovered on read") {
    val path = freshPath()
    DocStore.insertMany(Seq((1L, "a"), (2L, "b")).toDF("id", "grp"), path)
    // simulate a crash between swapIn's two renames: live retired to
    // __old, promotion of __new never happened
    val dir = new java.io.File(path)
    assert(dir.renameTo(new java.io.File(path + "__old")))
    new java.io.File(path + "__new").mkdirs() // partial, untrusted output
    val back = DocStore.find(spark, path)
    assert(back.count() == 2) // NOT masked as an empty collection
    // and mutations resume against the recovered data
    assert(DocStore.deleteMany(spark, path, Some(col("grp") === "a")) == 1)
    assert(DocStore.find(spark, path).select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("insertMany into a stranded collection restores it before appending") {
    val path = freshPath()
    DocStore.insertMany(Seq((1L, "a")).toDF("id", "grp"), path)
    // mid-swap crash state; the next operation is an APPEND — it must not
    // recreate the live path and orphan the stranded docs
    assert(new java.io.File(path).renameTo(new java.io.File(path + "__old")))
    DocStore.insertMany(Seq((2L, "b")).toDF("id", "grp"), path)
    assert(DocStore.find(spark, path).select("id").as[Long].collect().toSet == Set(1L, 2L))
    assert(!new java.io.File(path + "__old").exists())
  }

  test("a failure while materializing the rewrite leaves the collection intact") {
    val path = freshPath()
    DocStore.insertMany(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "grp", "v"), path)
    // the $set expression throws mid-job — simulates a crash before the swap
    intercept[Exception] {
      DocStore.updateMany(spark, path, col("grp") === "a",
        Map("v" -> raise_error(lit("simulated mid-rewrite crash")).cast("double")))
    }
    val after = DocStore.find(spark, path).orderBy("id")
    assert(after.count() == 2)
    assert(after.select("v").as[Double].collect().toSeq == Seq(1.0, 2.0))
  }

  test("deleteMany refuses the empty query unless protection is off") {
    val path = freshPath()
    DocStore.insertMany(Seq((1L, "x"), (2L, "y")).toDF("id", "name"), path)
    intercept[DocStore.DeleteProtectionException] {
      DocStore.deleteMany(spark, path, None)
    }
    assert(DocStore.find(spark, path).count() == 2) // untouched
    assert(DocStore.deleteMany(spark, path, Some(col("name") === "x")) == 1)
    assert(DocStore.find(spark, path).select("id").as[Long].collect().toSeq == Seq(2L))
    // explicit opt-out empties the collection
    assert(DocStore.deleteMany(spark, path, None, deleteProtection = false) == 1)
    assert(DocStore.find(spark, path).count() == 0)
  }
}
