package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ExpectSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(5.0)),
    (2L, Some("b"), Some(55.0)),   // out of range
    (3L, None: Option[String], Some(7.0)), // null label
    (3L, Some("z"), None: Option[Double])  // dup id, label outside set, null value
  ).toDF("id", "label", "v")

  private def result(rules: Seq[Expect.Rule]): Map[String, (Long, Long, Int)] =
    Expect.check(df, rules).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap

  test("row-local rules: null predicate results count as violations") {
    val got = result(Seq(
      Expect.NotNull("label"),
      Expect.InRange("v", 0, 50),
      Expect.InSet("label", Seq("a", "b")),
      Expect.Satisfies("v_pos", col("v") > 0)))
    assert(got("not_null_label") == ((1L, 4L, 0)))
    // 55 out of range AND the null v — both violations
    assert(got("range_v") == ((2L, 4L, 0)))
    // null label and 'z' both violate the set
    assert(got("in_set_label") == ((2L, 4L, 0)))
    // null v > 0 is null -> violation
    assert(got("v_pos") == ((1L, 4L, 0)))
  }

  test("uniqueness and referential rules") {
    val dim = Seq(1L, 2L).toDF("k")
    val got = result(Seq(
      Expect.Unique(Seq("id")),
      Expect.Unique(Seq("id", "label")),
      Expect.RefIntegrity("ref_ids", "id", dim, "k")))
    assert(got("unique_id") == ((1L, 4L, 0)))     // id 3 twice
    assert(got("unique_id·label") == ((0L, 4L, 1))) // (id,label) pairs distinct
    // both id=3 rows are orphans; null keys would be ignored
    assert(got("ref_ids") == ((2L, 4L, 0)))
  }

  test("colliding rule names are rejected, and Unique names cannot collide") {
    // Unique(a,b) vs Unique(a_b) produce distinct names (the "·" joiner)
    assert(Expect.Unique(Seq("a", "b")).name != Expect.Unique(Seq("a_b")).name)
    // two rules that DO share a name refuse outright
    intercept[IllegalArgumentException] {
      Expect.check(df, Seq(
        Expect.Satisfies("dup", col("id") > 0),
        Expect.Satisfies("dup", col("v") > 0)))
    }
  }

  test("all-green rules report pass=1 and empty rule list refuses") {
    val got = result(Seq(Expect.NotNull("id")))
    assert(got("not_null_id") == ((0L, 4L, 1)))
    intercept[IllegalArgumentException] { Expect.check(df, Seq.empty) }
  }

  test("an empty batch violates nothing: every rule passes with 0/0") {
    val empty = df.filter(col("id") < 0)
    val dim = Seq(1L).toDF("k")
    val got = Expect.check(empty, Seq(
        Expect.NotNull("label"),
        Expect.InRange("v", 0, 50),
        Expect.Unique(Seq("id")),
        Expect.RefIntegrity("ref_ids", "id", dim, "k")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    got.foreach { case (rule, t) => assert(t == ((0L, 0L, 1)), rule) }
  }
}
