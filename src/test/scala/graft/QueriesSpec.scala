package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks over the full query registry at smoke scale. */
class QueriesSpec extends SparkTestBase {

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("entry (flagship) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs at sf0.001 and returns rows") {
      assert(fn(spark, sf001).count() > 0, s"$name returned 0 rows")
    }
  }

  test("approx_count_distinct stays within 5% of exact (a8 exactness bound)") {
    val rows = SparkEntry.queries("a8_approx_distinct")(spark, sf001).collect()
    import org.apache.spark.sql.functions._
    val exact = graft.core.Tables.lineitem(spark, sf001)
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (flag, approx) = (r.getString(0), r.getLong(1))
      val e = exact(flag).toDouble
      assert(math.abs(approx - e) / e < 0.05, s"$flag: approx=$approx exact=$e")
    }
  }
}

/** ScalaCheck-generated invariants for the ops kernel (SURVEY.md §5.4).
  * Generators sampled directly (no scalatest bridge in the offline cache).
  */
class PropertiesSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import org.scalacheck.Gen
  import graft.ops.{Cleaning, Normalize}
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Int, Double)]] = Gen.nonEmptyListOf(
    for {
      k <- Gen.choose(1L, 5L)
      line <- Gen.choose(1, 9)
      qty <- Gen.choose(1, 10000).map(_ / 100.0)
    } yield (k, line, qty))

  private def cases(n: Int): Seq[List[(Long, Int, Double)]] =
    (0 until n).flatMap(i => rowsGen.apply(Gen.Parameters.default,
      org.scalacheck.rng.Seed(42L + i)))

  test("property: nest/explode preserves row count and quantity sum") {
    for (rows <- cases(15)) {
      val df = rows.toDF("k", "line", "qty")
      val back = Normalize.explodeChild(
        Normalize.nest(df, Seq("k"), Seq("line", "qty"), "items"), "items", Seq("k"))
      assert(back.count() == rows.size)
      val expected = BigDecimal(rows.map(r => BigDecimal(r._3)).sum.toDouble)
      val got = BigDecimal(back.agg(sum("qty")).head().getDouble(0))
      assert((expected - got).abs < 1e-6)
    }
  }

  test("property: signFlip is involutive on any predicate") {
    for (rows <- cases(15)) {
      val df = rows.toDF("k", "line", "qty")
      val pred = col("line") % 2 === 0
      val twice = Cleaning.signFlip(Seq("qty"), pred)(
        Cleaning.signFlip(Seq("qty"), pred)(df))
      assert(twice.orderBy("k", "line", "qty").collect().toSeq ==
             df.orderBy("k", "line", "qty").collect().toSeq)
    }
  }
}
