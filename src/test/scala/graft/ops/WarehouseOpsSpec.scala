package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Unit pins for the warehouse-maintenance ops (Diff, Incremental, Scd)
  * beyond their gate oracles.
  */
class WarehouseOpsSpec extends SparkTestBase {

  test("snapshotDiff classifies added/removed/changed, null-safely") {
    import spark.implicits._
    val old = Seq((1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]),
                  (4L, Some("d")))
      .toDF("k", "v")
    val neu = Seq((1L, Some("a")),            // unchanged -> filtered out
                  (2L, Some("B")),            // changed
                  (3L, Some("now")),          // null -> value: changed
                  (5L, Some("e")))            // added; 4 removed
      .toDF("k", "v")
    val r = Diff.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .collect().map(row => row.getLong(0) -> row.getString(1)).toMap
    assert(r == Map(2L -> "changed", 3L -> "changed", 4L -> "removed", 5L -> "added"))
  }

  test("snapshotDiff refuses a key that is also a compare column") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Diff.snapshotDiff(df, df, Seq("k"), Seq("k", "v"))
    }
    assert(e.getMessage.contains("key columns"))
  }

  test("mergeAggregate supports non-sum combines (min/max)") {
    import spark.implicits._
    val stored = Seq(("x", 5L, 2.0), ("y", 1L, 9.0)).toDF("k", "cnt", "mn")
    val delta = Seq(("x", 3L, 1.0), ("z", 2L, 4.0)).toDF("k", "cnt", "mn")
    val r = Incremental.mergeAggregate(stored, delta, Seq("k"),
        combines = Map("mn" -> (c => min(c))))
      .collect().map(row => (row.getString(0), row.getLong(1), row.getDouble(2))).toSet
    assert(r == Set(("x", 8L, 1.0), ("y", 1L, 9.0), ("z", 2L, 4.0)))
  }

  test("deltaJoin: base join plus delta rows equals the full join, exactly") {
    import spark.implicits._
    val a = (1L to 40L).map(i => (i, s"a$i")).toDF("k", "av")
    val b = (1L to 120L).map(i => (i % 50, s"b$i")).toDF("k", "bv")
    val a0 = a.filter(col("k") % 3 =!= 0); val dA = a.filter(col("k") % 3 === 0)
    val b0 = b.filter(col("bv").endsWith("0") === false)
    val dB = b.filter(col("bv").endsWith("0"))
    def j(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      x.join(y, "k")
    val full = j(a, b).collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    val inc = j(a0, b0).unionByName(Incremental.deltaJoin(a0, dA, b0, dB)(j))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    assert(inc == full)
  }

  test("snapshotDiff property: classification matches per-key brute force") {
    import spark.implicits._
    import org.scalacheck.Gen
    val mapGen: Gen[Map[Long, Option[Int]]] =
      Gen.mapOf(Gen.zip(Gen.choose(0L, 30L), Gen.option(Gen.choose(0, 5))))
    val cases = (0 until 12).flatMap { i =>
      for {
        a <- mapGen(Gen.Parameters.default, org.scalacheck.rng.Seed(7L + i))
        b <- mapGen(Gen.Parameters.default, org.scalacheck.rng.Seed(99L + i))
      } yield (a, b)
    }
    assert(cases.nonEmpty)
    for ((oldM, newM) <- cases) {
      val old = oldM.toSeq.toDF("k", "v")
      val neu = newM.toSeq.toDF("k", "v")
      val got = Diff.snapshotDiff(old, neu, Seq("k"), Seq("v"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expected = (oldM.keySet ++ newM.keySet).flatMap { k =>
        (oldM.get(k), newM.get(k)) match {
          case (None, Some(_))              => Some(k -> "added")
          case (Some(_), None)              => Some(k -> "removed")
          case (Some(a), Some(b)) if a != b => Some(k -> "changed")
          case _                            => None
        }
      }.toMap
      assert(got == expected, s"old=$oldM new=$newM")
    }
  }

  test("schemaDrift reports added/removed/retyped columns, nested types by signature") {
    import org.apache.spark.sql.types._
    val old = StructType(Seq(
      StructField("id", LongType), StructField("price", DoubleType),
      StructField("meta", StructType(Seq(StructField("w", IntegerType))))))
    val neu = StructType(Seq(
      StructField("id", LongType), StructField("price", StringType),
      StructField("meta", StructType(Seq(StructField("w", LongType)))),
      StructField("tag", StringType)))
    val drift = Diff.schemaDrift(old, neu)
    assert(drift.map(c => (c.column, c.change)).toSet ==
      Set(("tag", "added"), ("price", "retyped"), ("meta", "retyped")))
    assert(Diff.schemaDrift(old, old).isEmpty)
  }

  test("levenshteinJoin is lossless vs brute force on real names") {
    import spark.implicits._
    val part = graft.core.Tables.part(spark, sf001).select("p_partkey", "p_name")
    val probes = part.select(col("p_partkey").as("probe_key"),
      expr("substr(p_name, 2)").as("probe"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("p_partkey", "probe_key").as[(Long, Long)].collect().toSet
    val banded = pairs(FuzzyJoin.levenshteinJoin(part, probes, "p_name", "probe", 1))
    val brute = pairs(part.crossJoin(probes)
      .filter(levenshtein(col("p_name"), col("probe")) <= 1))
    assert(banded == brute && brute.nonEmpty)
    // every probe finds at least its own origin (one char dropped = dist 1)
    assert(brute.count { case (pk, qk) => pk == qk } ==
      part.count())
  }

  test("levenshteinJoin covers every edit type and position, incl. tiny strings") {
    import spark.implicits._
    val l = Seq((1L, "abcdefgh"), (2L, "ab"), (3L, "a"), (4L, "zzzzzzzz"))
      .toDF("lid", "lname")
    val r = Seq(
      (10L, "abcdefgh"),  // exact
      (11L, "Xbcdefgh"),  // substitution at head
      (12L, "abcdefgX"),  // substitution at tail
      (13L, "abcdefghX"), // insertion at tail
      (14L, "Xabcdefgh"), // insertion at head
      (15L, "bcdefgh"),   // deletion at head
      (16L, "abcdefg"),   // deletion at tail
      (17L, "abcdXfgh"),  // substitution mid (straddles the segment cut)
      (18L, "b"),         // tiny: dist 1 from "a" and "ab"
      (19L, "")           // tiny: dist 1 from "a"
    ).toDF("rid", "rname")
    val got = FuzzyJoin.levenshteinJoin(l, r, "lname", "rname", maxDist = 1)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val brute = l.crossJoin(r)
      .filter(levenshtein(col("lname"), col("rname")) <= 1)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == brute)
    assert(brute.contains((1L, 17L)) && brute.contains((3L, 18L)) &&
      brute.contains((3L, 19L)) && brute.contains((2L, 18L)))
  }

  test("levenshteinJoin lossless at maxDist=2 vs brute force") {
    import spark.implicits._
    val part = graft.core.Tables.part(spark, sf001)
      .select("p_partkey", "p_name").limit(60)
    val probes = part.select(col("p_partkey").as("probe_key"),
      expr("substr(p_name, 3)").as("probe")) // two chars dropped -> dist 2
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("p_partkey", "probe_key").as[(Long, Long)].collect().toSet
    val blocked = pairs(FuzzyJoin.levenshteinJoin(part, probes, "p_name", "probe", 2))
    val brute = pairs(part.crossJoin(probes)
      .filter(levenshtein(col("p_name"), col("probe")) <= 2))
    assert(blocked == brute && brute.nonEmpty)
  }

  test("passjoin keys through the SQL surface match the Column API exactly") {
    import spark.implicits._
    val df = Seq("almond antique blue", "dial toner", "x").toDF("s")
    df.createOrReplaceTempView("pj_v")
    for ((sqlFn, colFn) <- Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
      "passjoin_index_keys" -> (c => graft.functions.functions.passjoin_index_keys(c, 1)),
      "passjoin_probe_keys" -> (c => graft.functions.functions.passjoin_probe_keys(c, 1)))) {
      val viaSql = spark.sql(s"SELECT $sqlFn(s, 1) FROM pj_v ORDER BY s")
        .collect().map(_.getSeq[String](0))
      val viaCol = df.select(colFn(col("s"))).orderBy("s")
        .collect().map(_.getSeq[String](0))
      assert(viaSql.toSeq == viaCol.toSeq, sqlFn)
    }
  }

  test("scd intervals chain: each valid_to equals the key's next valid_from; last is open") {
    val iv = Scd.intervals(graft.core.Tables.events(spark, sf001),
        keys = Seq("user_id"), orderCols = Seq(col("ts"), col("event_id")),
        validFromCol = "ts")
      .select("user_id", "valid_from", "valid_to")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2))))
      .groupBy(_._1)
    iv.values.foreach { rows =>
      val sorted = rows.sortBy(_._2.getTime)
      sorted.sliding(2).foreach {
        case Array((_, _, Some(to)), (_, from, _)) => assert(to == from)
        case _ => ()
      }
      assert(sorted.last._3.isEmpty, "latest record must be open-ended")
      assert(sorted.init.forall(_._3.nonEmpty))
    }
    assert(iv.nonEmpty)
  }
}
