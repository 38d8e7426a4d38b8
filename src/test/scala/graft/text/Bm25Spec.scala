package graft.text

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark shuffle spark join spark agg"),          // tf(spark)=3, short
    (2L, "spark shuffle join agg window filter"),        // tf(spark)=1
    (3L, "pandas loop pandas apply row wise mutation"),  // tf(spark)=0
    (4L, "spark " + ("filler " * 40).trim)               // tf(spark)=1, long doc
  ).toDF("doc_id", "text")

  private def scores(terms: Seq[String]) =
    Bm25.score(corpus, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("score increases with term frequency") {
    val s = scores(Seq("spark"))
    assert(s(1L) > s(2L), s.toString)
    assert(s(3L) == 0.0)
  }

  test("length normalization: same tf, longer doc scores lower") {
    val s = scores(Seq("spark"))
    assert(s(2L) > s(4L), s.toString) // both tf=1; doc 4 is much longer
  }

  test("rarer terms carry higher idf weight") {
    val (_, _, stats) = Bm25.termStats(corpus, "text", Seq("spark", "pandas"))
    val byTerm = stats.map(s => s.term -> s).toMap
    assert(byTerm("pandas").df < byTerm("spark").df)
    assert(byTerm("pandas").idf > byTerm("spark").idf)
  }

  test("degenerate inputs: case-insensitive terms, empty term set, empty corpus") {
    val cased = scores(Seq("SPARK"))
    assert(cased == scores(Seq("spark")), "terms must match the lowercased tokenizer")
    val empty = scores(Seq.empty)
    assert(empty.values.forall(_ == 0.0))
    val none = Bm25.score(corpus.limit(0), "doc_id", "text", Seq("spark"))
    assert(none.count() == 0)
  }

  test("multi-term query is the sum of per-term contributions") {
    val both = scores(Seq("spark", "pandas"))
    val a = scores(Seq("spark"))
    val b = scores(Seq("pandas"))
    corpus.select("doc_id").as[Long].collect().foreach { id =>
      assert(math.abs(both(id) - (a(id) + b(id))) < 1e-9)
    }
  }
}
