package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables

/** Invariants for the corpus-preparation layer (queries/Corpus.scala) that
  * are stronger than the DuckDB oracle restatements: redaction semantics at
  * the unit level, the greedy-packing bound, sampling determinism and quota
  * bounds, and a brute-force decontamination cross-check.
  */
class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  // ---- Redact unit semantics -------------------------------------------

  test("Redact.pii scrubs emails, IPv4s and phone runs; idempotent; clean text untouched") {
    val rows = Seq(
      "reach me at jane.doe+x@sub.example.org today",
      "server 192.168.0.1 and 10.0.255.7 up",
      "call 555-0142 now",
      "mixed a@b.co 1.2.3.4 555-0100 end",
      "nothing sensitive here 123-45 1.2.3 x@y"
    ).toDF("t")
    val out = rows.select(Redact.pii(col("t")).as("c"),
      Redact.isClean(Redact.pii(col("t"))).as("ok")).collect()
    assert(out(0).getString(0) == "reach me at <EMAIL> today")
    assert(out(1).getString(0) == "server <IP> and <IP> up")
    assert(out(2).getString(0) == "call <PHONE> now")
    assert(out(3).getString(0) == "mixed <EMAIL> <IP> <PHONE> end")
    // sub-threshold shapes (two-part dotted, 2-digit suffix, bare a@b) survive
    assert(out(4).getString(0) == "nothing sensitive here 123-45 1.2.3 x@y")
    assert(out.forall(_.getBoolean(1)), "pii() output must satisfy isClean")
    // idempotence: placeholders contain no match material
    val twice = rows.select(Redact.pii(Redact.pii(col("t"))).as("c")).collect()
    assert(out.map(_.getString(0)).toSeq == twice.map(_.getString(0)).toSeq)
  }

  // ---- greedy packing bound --------------------------------------------

  test("pk1_pack: every bin minus its largest doc fits the 4096 budget; bins contiguous per stratum") {
    val docs = Tables.documents(spark, sf001)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val binned = docs.withColumn("cum", sum("n_chars").over(w))
      .withColumn("bin", expr("(cum - n_chars) div 4096"))
    val stats = binned.groupBy("lang", "bin")
      .agg(sum("n_chars").as("chars"), max("n_chars").as("maxDoc"))
      .collect()
    stats.foreach { r =>
      val (chars, maxDoc) = (r.getLong(2), r.getLong(3))
      assert(chars - maxDoc < 4096,
        s"${r.getString(0)} bin ${r.getLong(1)}: $chars chars even without its largest $maxDoc doc")
    }
    val gaps = stats.map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .map { case (lang, bins) => lang -> bins.map(_._2).sorted.toSeq }
    gaps.foreach { case (lang, bins) =>
      assert(bins == (0L until bins.size).toSeq, s"$lang bins not contiguous: $bins")
    }
  }

  test("pk2_pack_rows: every offset equals the cumulative length of the texts before it") {
    // boundary alignment: reassembling each bin from the documents table in
    // doc_id order must reproduce the offsets AND the packed-text hash —
    // i.e. offsets are real substring boundaries, not bookkeeping
    val docs = Tables.documents(spark, sf001).select("lang", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).map { case (lang, rows) =>
        lang -> rows.sortBy(_._2).map(t => t._2 -> t._3)
      }
    val byDoc = docs.values.flatten.toMap
    val out = graft.SparkEntry.queries("pk2_pack_rows")(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ids = r.getAs[String]("doc_ids").split(",").map(_.toLong)
      val offs = r.getAs[String]("offsets").split(",").map(_.toLong)
      assert(ids.length == r.getAs[Long]("n_docs") && ids.length == offs.length)
      assert(offs.head == 0L, "first member starts at offset 0")
      val texts = ids.map(byDoc)
      val cum = texts.map(_.length.toLong).scanLeft(0L)(_ + _).init
      assert(offs.toSeq == cum.toSeq,
        s"${r.getAs[String]("lang")} bin ${r.getAs[Long]("bin")}: offsets $offs vs cumulative lengths $cum")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(texts.mkString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md5 == r.getAs[String]("packed_md5"))
    }
    // members of a bin are consecutive in stratum doc order (no doc skipped)
    val seen = out.map(r => r.getAs[String]("lang") ->
      r.getAs[String]("doc_ids").split(",").map(_.toLong).toSeq)
      .groupBy(_._1).map { case (l, g) => l -> g.flatMap(_._2).sorted.toSeq }
    docs.foreach { case (lang, rows) =>
      assert(seen(lang) == rows.map(_._1).toSeq.sorted, s"$lang membership drift")
    }
  }

  // ---- sampling ---------------------------------------------------------

  test("smp1_hash_sample is deterministic and close to its 3/16 target at sf0.001") {
    val q = graft.SparkEntry.queries("smp1_hash_sample")
    val a = q(spark, sf001).collect().map(_.getLong(0)).toSeq
    val b = q(spark, sf001).collect().map(_.getLong(0)).toSeq
    assert(a == b, "hash sample must be stable across runs")
    val total = Tables.documents(spark, sf001).count()
    val frac = a.size.toDouble / total
    assert(frac > 0.05 && frac < 0.35, s"sample fraction $frac implausible for 3/16")
  }

  test("smp4_split: exact integer proportions per stratum, deterministic, total cover") {
    val q = graft.SparkEntry.queries("smp4_split")
    val rows = q(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // deterministic across runs
    assert(rows.toSeq == q(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq)
    // every document assigned exactly once
    assert(rows.length == Tables.documents(spark, sf001).count())
    assert(rows.map(_._2).distinct.length == rows.length)
    // per-stratum proportions are the exact integer cuts
    rows.groupBy(_._1).foreach { case (lang, g) =>
      val n = g.length
      val bySplit = g.groupBy(_._3).view.mapValues(_.length).toMap
      assert(bySplit.getOrElse("train", 0) == n * 8 / 10, s"$lang train")
      assert(bySplit.getOrElse("val", 0) == n / 10, s"$lang val")
      assert(bySplit.getOrElse("test", 0) == n - n * 8 / 10 - n / 10, s"$lang test")
    }
  }

  test("smp2_stratified: at most 20 per language, exactly 20 where the stratum has >= 20") {
    val rows = graft.SparkEntry.queries("smp2_stratified")(spark, sf001)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = Tables.documents(spark, sf001).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(rows(lang) == math.min(20L, n), s"$lang: quota ${rows(lang)} vs stratum $n")
    }
  }

  // ---- decontamination brute-force cross-check -------------------------

  test("dc1_decontam: kept docs share zero trigrams with the benchmark set (brute force)") {
    def trigrams(text: String): Set[String] = {
      val t = text.trim.toLowerCase.split("\\s+")
      if (t.length < 3) Set.empty
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val all = Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> trigrams(r.getString(1)))
    val bench = all.filter(_._1 % 97 == 0).flatMap(_._2).toSet
    val expectKept = all.filter { case (id, tg) =>
      id % 97 != 0 && tg.intersect(bench).isEmpty
    }.map(_._1).toSet
    val got = graft.SparkEntry.queries("dc1_decontam")(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    assert(got == expectKept,
      s"missing=${expectKept -- got} extra=${got -- expectKept}")
  }

  // ---- percentiles and banding -----------------------------------------

  test("a12_percentile matches a driver-side sort on one group; monotone across probes") {
    val rows = graft.SparkEntry.queries("a12_percentile")(spark, sf001).collect()
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3))
    }
    val flag = rows.head.getString(0)
    val xs = Tables.lineitem(spark, sf001).filter(col("l_returnflag") === flag)
      .select("l_quantity").collect().map(_.getDouble(0)).sorted
    def q(p: Double): Double = {
      val pos = p * (xs.length - 1)
      val lo = pos.toInt
      if (lo == xs.length - 1) xs(lo)
      else xs(lo) + (xs(lo + 1) - xs(lo)) * (pos - lo)
    }
    assert(rows.head.getDouble(1) == q(0.25) &&
           rows.head.getDouble(2) == q(0.5) &&
           rows.head.getDouble(3) == q(0.75))
  }

  test("a13_approx_quantile stays within 2% of the exact p50 (a12)") {
    val exact = graft.SparkEntry.queries("a12_percentile")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    graft.SparkEntry.queries("a13_approx_quantile")(spark, sf001)
      .collect().foreach { r =>
        val (flag, approx) = (r.getString(0), r.getDouble(1))
        val e = exact(flag)
        assert(math.abs(approx - e) / e <= 0.02, s"$flag: approx=$approx exact=$e")
      }
  }

  test("j9_range_bucket partitions every lineitem row exactly once") {
    val rows = graft.SparkEntry.queries("j9_range_bucket")(spark, sf001).collect()
    val banded = rows.map(_.getLong(1)).sum
    assert(banded == Tables.lineitem(spark, sf001).count())
  }

  // ---- repetition metrics ----------------------------------------------

  test("t8_repetition ratios are in range and exact on a known duplicate-heavy doc") {
    val rows = graft.SparkEntry.queries("t8_repetition")(spark, sf001).collect()
    rows.foreach { r =>
      val (n, dup, top) = (r.getInt(1), r.getDouble(2), r.getDouble(3))
      assert(dup >= 0.0 && dup < 1.0, s"doc ${r.getLong(0)} dup=$dup")
      assert(top >= 1.0 / n && top <= 1.0, s"doc ${r.getLong(0)} top=$top")
    }
    // hand-checked: "a b a b a" -> bigrams [a b, b a, a b, b a] -> dup 0.5;
    // top token 'a' appears 3/5
    val one = Seq((1L, "a b a b a")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"))
    val t = split(lower(trim(col("text"))), "\\s+")
    val bg = transform(sequence(lit(1), size(t) - 1),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1)))
    val topTok = array_max(transform(array_distinct(t),
      x => size(filter(t, y => y === x))))
    val r = one.select(
      (lit(1.0) - size(array_distinct(bg)).cast("double") / size(bg)).as("dup"),
      (topTok.cast("double") / size(t)).as("top")).collect().head
    assert(r.getDouble(0) == 0.5 && r.getDouble(1) == 0.6)
  }

  test("Html.stripTags: multiline comments, quoted '>', one-level entity decode") {
    def strip(s: String): String =
      Seq(s).toDF("t").select(Html.stripTags(col("t")).as("c"))
        .collect().head.getString(0)
    assert(strip("a<!-- line1\nline2 > tricky -->b") == "a b",
      "comment spanning lines with '>' inside")
    assert(strip("""x<img alt="a > b" src='c>d'>y""") == "x y",
      "'>' inside double- and single-quoted attributes")
    assert(strip("&amp;lt; &amp;amp;") == "&lt; &amp;",
      "exactly one unescape level (html.unescape-once contract)")
    assert(strip("  a   \t b  ") == "a b", "whitespace collapse + trim")
  }
}
