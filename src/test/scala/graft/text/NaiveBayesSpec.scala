package graft.text

import graft.SparkTestBase

class NaiveBayesSpec extends SparkTestBase {
  import spark.implicits._

  /** Signal-bearing corpus: two classes with mostly-disjoint vocabularies
    * plus shared noise words. (The driver's synthetic documents table has
    * NO text↔label correlation by construction — this spec is where the
    * classifier's learning behavior is pinned; the nb1 oracle pins its
    * cross-engine exactness.)
    */
  private def corpus(n: Int, seedShift: Int) = {
    val fruit = Vector("apple", "banana", "cherry", "plum", "grape")
    val animal = Vector("dog", "cat", "horse", "otter", "crow")
    val noise = Vector("the", "a", "of")
    (1 to n).map { i =>
      val label = if (i % 2 == 0) "fruit" else "animal"
      val vocab = if (label == "fruit") fruit else animal
      val words = (0 until 8).map { j =>
        val h = (i * 131 + j * 37 + seedShift) % 10
        if (h < 7) vocab(h % vocab.size) else noise(h % noise.size)
      }
      (i.toLong, label, words.mkString(" "))
    }.toDF("id", "label", "text")
  }

  test("learns near-perfectly when the text carries class signal") {
    val train = corpus(200, 0)
    val test = corpus(80, 1) // different word draws, same generative classes
    val out = NaiveBayes.predict(train, test, "id", "label", "text")
    val rows = out.collect()
    assert(rows.length == 80)
    val acc = rows.map(_.getInt(3)).sum.toDouble / rows.length
    assert(acc >= 0.95, s"accuracy $acc")
  }

  test("predictions are deterministic under repartitioning") {
    val train = corpus(100, 0)
    val test = corpus(40, 1)
    val a = NaiveBayes.predict(train, test, "id", "label", "text")
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    val b = NaiveBayes.predict(train.repartition(7), test.repartition(5),
        "id", "label", "text")
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(a == b)
  }

  test("a class absent from training is never predicted; priors break pure-noise ties") {
    val train = Seq((1L, "x", "foo bar"), (2L, "x", "foo baz"), (3L, "y", "qux quux"))
      .toDF("id", "label", "text")
    val test = Seq((10L, "z", "unseen words only")).toDF("id", "label", "text")
    val out = NaiveBayes.predict(train, test, "id", "label", "text").collect()
    assert(out.length == 1)
    // all tokens unseen -> per-token likelihoods differ only via class
    // totals; prior favors x (2 docs vs 1)
    assert(out.head.getString(2) == "x" && out.head.getInt(3) == 0)
  }
}
