package graft.text

import graft.SparkTestBase

class NfcNormalizeSpec extends SparkTestBase {
  import spark.implicits._
  import graft.functions.functions.nfc_normalize
  import org.apache.spark.sql.functions.col

  test("composes combining sequences; idempotent; ASCII passes through; null stays null") {
    val rows = Seq(
      (1L, Some("é")),          // -> é (U+00E9)
      (2L, Some("Å")),          // -> Å (U+00C5)
      (3L, Some("plain ascii!")),
      (4L, Some("é")),           // already composed
      (5L, None: Option[String]))
      .toDF("id", "s")
    val got = rows.select(col("id"), nfc_normalize(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).contains("é") && got(2L).contains("Å"))
    assert(got(3L).contains("plain ascii!"))
    assert(got(4L).contains("é"))
    assert(got(5L).isEmpty)
    // idempotence: normalizing the normalized output changes nothing
    val twice = rows.select(col("id"),
        nfc_normalize(nfc_normalize(col("s"))).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(twice == got)
    // SQL surface (GraftExtensions) matches the Column API
    rows.createOrReplaceTempView("nfc_in")
    val sqlGot = spark.sql("SELECT id, nfc_normalize(s) AS n FROM nfc_in")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(sqlGot == got)
  }
}

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.functions.ngrams

/** The codegen'd Ngrams expression must be drop-in equivalent to the
  * composed higher-order form it replaced (transform(sequence) + concat_ws
  * + array_distinct), including edge cases and the SQL surface.
  */
class NgramsSpec extends SparkTestBase {
  import spark.implicits._

  private def composed(t: org.apache.spark.sql.Column, n: Int) =
    transform(sequence(lit(1), size(t) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(t, i + k)): _*))

  test("matches the composed higher-order form on real docs (n=2,3, plain and distinct)") {
    val docs = graft.core.Tables.documents(spark, sf001)
      .select(split(lower(trim(col("text"))), "\\s+").as("t"))
    for (n <- Seq(2, 3)) {
      val diff = docs.select(
          ngrams(col("t"), n).as("fast"),
          composed(col("t"), n).as("slow"),
          ngrams(col("t"), n, distinct = true).as("fastD"),
          array_distinct(composed(col("t"), n)).as("slowD"))
        .filter(col("fast") =!= col("slow") || col("fastD") =!= col("slowD"))
        .count()
      assert(diff == 0, s"n=$n mismatch vs composed form")
    }
  }

  test("edge cases: short arrays, n=1, null tokens, null array") {
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("a")),
      (3L, Seq.empty[String]),
      (4L, Seq("x", "x", "x"))
    ).toDF("id", "t")
    val out = df.select(col("id"), ngrams(col("t"), 2).as("g2"),
        ngrams(col("t"), 1).as("g1"),
        ngrams(col("t"), 2, distinct = true).as("g2d"))
      .orderBy("id").collect()
    assert(out(0).getSeq[String](1) == Seq("a b", "b c"))
    assert(out(1).getSeq[String](1) == Seq.empty)      // shorter than n
    assert(out(2).getSeq[String](1) == Seq.empty)      // empty input
    assert(out(0).getSeq[String](2) == Seq("a", "b", "c")) // n=1 identity
    assert(out(3).getSeq[String](1) == Seq("x x", "x x"))
    assert(out(3).getSeq[String](3) == Seq("x x"))     // keep-first distinct
    // null tokens skipped inside a gram (concat_ws semantics)
    val withNull = Seq(Tuple1(Seq("a", null, "c"))).toDF("t")
      .select(ngrams(col("t"), 2).as("g")).head().getSeq[String](0)
    assert(withNull == Seq("a", "c"))
    // null array -> null result (UnaryExpression null propagation)
    val nullArr = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("t")
      .select(ngrams(col("t"), 2).as("g")).head()
    assert(nullArr.isNullAt(0))
  }

  test("SQL surface: ngrams(tokens, n[, distinct]) registered") {
    val r = spark.sql(
      "SELECT ngrams(split('a b a b', ' '), 2) AS g, ngrams(split('a b a b', ' '), 2, true) AS gd")
      .head()
    assert(r.getSeq[String](0) == Seq("a b", "b a", "a b"))
    assert(r.getSeq[String](1) == Seq("a b", "b a"))
  }
}
