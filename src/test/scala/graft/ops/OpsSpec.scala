package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase

class ConformSpec extends SparkTestBase {
  import spark.implicits._
  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", StringType),
    StructField("missing", IntegerType)))

  test("conformTo adds missing columns as typed nulls, in schema order") {
    val df = Seq((1, "x", 9.5)).toDF("a", "extra", "b")
    val out = Conform.conformTo(schema)(df)
    assert(out.columns.toSeq == Seq("a", "b", "missing"))
    assert(out.schema("missing").dataType == IntegerType)
    val r = out.head()
    assert(r.getLong(0) == 1L && r.getString(1) == "9.5" && r.isNullAt(2))
  }

  test("conformTo drops extra columns") {
    val df = Seq((1L, "x", "drop-me")).toDF("a", "b", "extra")
    assert(!Conform.conformTo(schema)(df).columns.contains("extra"))
  }

  test("conformTo is idempotent") {
    val df = Seq((1, "x")).toDF("a", "b")
    val once  = Conform.conformTo(schema)(df)
    val twice = Conform.conformTo(schema)(once)
    assert(once.schema == twice.schema)
    assert(once.collect().toSeq == twice.collect().toSeq)
  }
}

class CleaningSpec extends SparkTestBase {
  import spark.implicits._

  test("nullifyEmpty maps '' to null, keeps other values") {
    val df = Seq(("", "keep"), ("v", "")).toDF("x", "y")
    val out = Cleaning.nullifyEmpty(Seq("x"))(df).collect()
    assert(out(0).isNullAt(0) && out(0).getString(1) == "keep")
    assert(out(1).getString(0) == "v" && out(1).getString(1) == "")
  }

  test("recode maps listed values and passes others through") {
    val df = Seq("O", "F", "Z").toDF("s")
    val out = df.select(Cleaning.recode(col("s"), Seq("O" -> "OPEN", "F" -> "FILLED")).as("r"))
      .as[String].collect().toSeq
    assert(out == Seq("OPEN", "FILLED", "Z"))
  }

  test("signFlip flips only matching rows and is involutive") {
    val df = Seq((8, 10.0), (3, 10.0)).toDF("t", "amt")
    val once = Cleaning.signFlip(Seq("amt"), col("t") === 8)(df)
    assert(once.orderBy("t").as[(Int, Double)].collect().toSeq ==
      Seq((3, 10.0), (8, -10.0)))
    val twice = Cleaning.signFlip(Seq("amt"), col("t") === 8)(once)
    assert(twice.orderBy("t").as[(Int, Double)].collect().toSeq ==
      Seq((3, 10.0), (8, 10.0)))
  }

  test("splitInto splits invoice numbers into typed parts") {
    val df = Seq("0001-00001234").toDF("inv")
    val r = Cleaning.splitInto("inv", "-", Seq("pv", "nro"))(df).head()
    assert(r.getAs[String]("pv") == "0001" && r.getAs[String]("nro") == "00001234")
  }

  test("prefixUnlessContains prefixes only non-matching values") {
    val df = Seq("CLI42", "42").toDF("c")
    val out = df.select(Cleaning.prefixUnlessContains(col("c"), "CLI", "000").as("r"))
      .as[String].collect().toSeq
    assert(out == Seq("CLI42", "00042"))
  }

  test("nullSafeJoin: both -> 'a; b', first only -> a, else null") {
    val df = Seq(("S", "C"), ("S", null), (null, "C"), (null, null))
      .toDF("state", "city")
    val out = df.select(Cleaning.nullSafeJoin(col("state"), col("city"), "; ").as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(out == Seq("S; C", "S", null, null))
  }
}

class DatesSpec extends SparkTestBase {
  import spark.implicits._

  test("parseTimestampMulti handles mixed formats, null on garbage") {
    val df = Seq("2024-01-02T03:04:05", "02/01/2024", "garbage").toDF("s")
    val out = df.select(Dates.parseTimestampMulti(col("s"),
        Seq(Dates.IsoT, Dates.Dmy)).cast("string").as("t"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(out == Seq("2024-01-02 03:04:05", "2024-01-02 00:00:00", null))
  }

  test("isoDatePrefix takes the date part of an ISO string") {
    val df = Seq("2024-05-06T07:08:09").toDF("s")
    assert(df.select(Dates.isoDatePrefix(col("s")).cast("string")).head().getString(0)
      == "2024-05-06")
  }

  test("formatMs23 renders the 23-char SQL Server datetime shape") {
    val df = Seq("2024-01-02 03:04:05.123456").toDF("s")
    val out = df.select(Dates.formatMs23(col("s").cast("timestamp")).as("f"))
      .head().getString(0)
    assert(out == "2024-01-02 03:04:05.123" && out.length == 23)
  }
}

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  test("keepFirst keeps exactly the first row under the given order") {
    val df = Seq((1, "b", 20), (1, "a", 10), (2, "c", 30)).toDF("k", "ord", "v")
    val out = Dedup.keepFirst(Seq("k"), Seq(col("ord")))(df)
      .orderBy("k").as[(Int, String, Int)].collect().toSeq
    assert(out == Seq((1, "a", 10), (2, "c", 30)))
  }

  test("keepFirst is partitioning-invariant") {
    val df = (1 to 100).map(i => (i % 7, i)).toDF("k", "v")
    val a = Dedup.keepFirst(Seq("k"), Seq(col("v")))(df.repartition(1))
      .orderBy("k").collect().toSeq
    val b = Dedup.keepFirst(Seq("k"), Seq(col("v")))(df.repartition(13))
      .orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("exactByKey dedups on a derived key keeping ordered-first") {
    val df = Seq(("A", 1), ("a", 2), ("b", 3)).toDF("s", "v")
    val out = Dedup.exactByKey(lower(col("s")), Seq(col("v")))(df)
      .orderBy("v").as[(String, Int)].collect().toSeq
    assert(out == Seq(("A", 1), ("b", 3)))
  }
}

class NormalizeSpec extends SparkTestBase {
  import spark.implicits._
  private def flat = Seq(
    (1L, 1, 10.0), (1L, 2, 20.0), (2L, 1, 5.0)).toDF("k", "line", "qty")

  test("nest/explodeChild round-trip preserves rows and sums") {
    val nested = Normalize.nest(flat, Seq("k"), Seq("line", "qty"), "items")
    assert(nested.count() == 2)
    val back = Normalize.explodeChild(nested, "items", Seq("k"))
    assert(back.count() == flat.count())
    val sums = back.agg(sum("qty")).head().getDouble(0)
    assert(sums == 35.0)
  }

  test("explodeChild hoists child struct fields with parent keys") {
    val nested = Normalize.nest(flat, Seq("k"), Seq("line", "qty"), "items")
    val back = Normalize.explodeChild(nested, "items", Seq("k"))
    assert(back.columns.toSeq == Seq("k", "line", "qty"))
  }

  test("explodeChildOuter keeps parents with empty children") {
    val df = Seq((1L, Seq((1, 2.0))), (2L, Seq.empty[(Int, Double)]))
      .toDF("k", "items")
    assert(Normalize.explodeChild(df, "items", Seq("k")).count() == 1)
    val outer = Normalize.explodeChildOuter(df, "items", Seq("k"))
    assert(outer.count() == 2)
    assert(outer.filter(col("k") === 2).head().isNullAt(1))
  }

  test("headers drops child arrays only") {
    val df = Seq((1L, "h", Seq(1, 2))).toDF("k", "name", "items")
    assert(Normalize.headers(df, Seq("items")).columns.toSeq == Seq("k", "name"))
  }
}

class EnrichSpec extends SparkTestBase {
  import spark.implicits._

  test("mapLookup enriches with null-on-miss (Series.map semantics)") {
    val facts = Seq("North", "South", "Unknown").toDF("store")
    val dim = Seq(("North", 1), ("South", 2)).toDF("name", "code")
    val out = Enrich.mapLookup(facts, dim, "store", "name", "code", "store_code")
      .orderBy("store").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1))).toSeq
    assert(out == Seq(("North", 1), ("South", 2), ("Unknown", -1)))
  }

  test("antiJoin keeps only keys absent from existing") {
    val df = Seq(1, 2, 3).toDF("k")
    val existing = Seq(2).toDF("k")
    assert(Enrich.antiJoin(df, existing, Seq("k")).as[Int].collect().sorted.toSeq == Seq(1, 3))
  }

  test("semiJoin keeps only keys present in the key set") {
    val df = Seq(1, 2, 3).toDF("k")
    val keys = Seq(2, 3, 3).toDF("k")
    assert(Enrich.semiJoin(df, keys, Seq("k")).as[Int].collect().sorted.toSeq == Seq(2, 3))
  }
}

class RetrySpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.core.Retry

  test("withBackoff retries until success") {
    var calls = 0
    val out = Retry.withBackoff(attempts = 3, sleep = _ => ())({
      calls += 1
      if (calls < 3) sys.error("boom") else "ok"
    })
    assert(out == "ok" && calls == 3)
  }

  test("withBackoff rethrows after exhausting attempts") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withBackoff(attempts = 2, sleep = _ => ())({ calls += 1; sys.error("nope") })
    }
    assert(e.getMessage == "nope" && calls == 2)
  }
}
