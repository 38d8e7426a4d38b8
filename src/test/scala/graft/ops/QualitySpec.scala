package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("fkViolations surfaces orphan children only") {
    val child = Seq((1, "a"), (2, "b"), (99, "orphan")).toDF("fk", "v")
    val parent = Seq(1, 2, 3).toDF("pk")
    val bad = Quality.fkViolations(child, parent, "fk", "pk").collect()
    assert(bad.map(_.getInt(0)).toSeq == Seq(99))
  }

  test("uniqueViolations reports duplicated key groups with counts") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val bad = Quality.uniqueViolations(df, Seq("k")).collect()
    assert(bad.length == 1 && bad(0).getInt(0) == 1 && bad(0).getLong(1) == 2L)
  }

  test("nullViolations catches any required-column null") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (Some(3), None))
      .toDF("k", "v")
    assert(Quality.nullViolations(df, Seq("k", "v")).count() == 2)
  }

  test("profile reports nulls/distinct/min/max per column") {
    val df = Seq(("x", Some(1)), ("y", None), ("x", Some(5))).toDF("s", "n")
    val p = Quality.profile(df, Seq("s", "n")).orderBy("column").collect()
    val n = p(0) // column "n"
    assert(n.getLong(1) == 3 && n.getLong(2) == 1 && n.getLong(3) == 2)
    assert(n.getString(4) == "1" && n.getString(5) == "5")
    val s = p(1)
    assert(s.getLong(2) == 0 && s.getString(4) == "x" && s.getString(5) == "y")
  }
}
