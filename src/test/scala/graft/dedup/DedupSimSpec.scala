package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.HashImpls
import graft.functions.functions._
import graft.sim.Ann

class HashImplsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private def arr(ss: String*) =
    new GenericArrayData(ss.map(UTF8String.fromString).toArray[Any])

  test("fnv64 is deterministic and input-sensitive") {
    val a = HashImpls.fnv64(UTF8String.fromString("abc"))
    assert(a == HashImpls.fnv64(UTF8String.fromString("abc")))
    assert(a != HashImpls.fnv64(UTF8String.fromString("abd")))
  }

  test("minhashSig: adding a shingle can only lower each slot") {
    val base = HashImpls.minhashSig(arr("a", "b"), 16, 42L).toLongArray()
    val more = HashImpls.minhashSig(arr("a", "b", "c"), 16, 42L).toLongArray()
    assert(base.zip(more).forall { case (x, y) => y <= x })
  }

  test("minhashSig of identical sets is identical; empty set = MaxValue") {
    assert(HashImpls.minhashSig(arr("x", "y"), 8, 1L).toLongArray().toSeq ==
           HashImpls.minhashSig(arr("y", "x"), 8, 1L).toLongArray().toSeq)
    assert(HashImpls.minhashSig(arr(), 4, 1L).toLongArray().forall(_ == Long.MaxValue))
  }

  test("simhash64: identical docs equal, near docs within small hamming") {
    val a = HashImpls.simhash64(arr("w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8"))
    val b = HashImpls.simhash64(arr("w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8"))
    val c = HashImpls.simhash64(arr("w1", "w2", "w3", "w4", "w5", "w6", "w7", "zz"))
    assert(a == b)
    assert(java.lang.Long.bitCount(a ^ c) < 32) // near doc ≪ random 64-bit (~32)
  }

  test("minhash signature estimates Jaccard within statistical error") {
    // sets with known overlap: |A∩B| = 60, |A∪B| = 100+140-60 = 180
    val a = arr((1 to 100).map(i => s"sh$i"): _*)
    val b = arr((41 to 180).map(i => s"sh$i"): _*)
    val sa = HashImpls.minhashSig(a, 128, 42L).toLongArray()
    val sb = HashImpls.minhashSig(b, 128, 42L).toLongArray()
    val est = sa.zip(sb).count { case (x, y) => x == y } / 128.0
    val trueJ = 60.0 / 180.0
    // stderr = sqrt(j(1-j)/128) ≈ 0.044; 3 sigma ≈ 0.13
    assert(math.abs(est - trueJ) < 0.13, s"est=$est true=$trueJ")
  }

  test("rhpSig packs numPlanes bits") {
    val emb = new GenericArrayData(Array.tabulate(8)(i => (i + 1).toFloat).toArray[Any])
    val sig = HashImpls.rhpSig(emb, 16, 42L)
    assert((sig >>> 16) == 0L)
    assert(sig == HashImpls.rhpSig(emb, 16, 42L))
  }
}

class ExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("minhash_sig column path (codegen) matches the kernel") {
    val df = Seq(Seq("a", "b", "c")).toDF("toks")
    val viaCol = df.select(minhash_sig(col("toks"), 8, 7L)).head().getSeq[Long](0)
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val direct = HashImpls.minhashSig(
      new GenericArrayData(Seq("a", "b", "c").map(UTF8String.fromString).toArray[Any]),
      8, 7L).toLongArray().toSeq
    assert(viaCol == direct)
  }

  test("simhash64 column is deterministic across partitionings") {
    val docs = (1 to 50).map(i => (i, s"tok$i tok${i + 1} tok${i + 2}"))
    val df1 = docs.toDF("id", "text").repartition(1)
    val df13 = docs.toDF("id", "text").repartition(13)
    def sigs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), simhash64(split(col("text"), " ")).as("s"))
        .orderBy("id").as[(Int, Long)].collect().toSeq
    assert(sigs(df1) == sigs(df13))
  }

  test("SQL surface (GraftExtensions) matches the Column API") {
    val df = Seq((1L, "a b c"), (2L, "x y z")).toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT id, simhash64(split(text, ' ')) AS s, " +
      "minhash_sig(split(text, ' '), 8, 7) AS m FROM ext_docs ORDER BY id").collect()
    val viaCol = df.select(col("id"), simhash64(split(col("text"), " ")).as("s"),
        minhash_sig(split(col("text"), " "), 8, 7L).as("m"))
      .orderBy("id").collect()
    assert(viaSql.map(_.getLong(1)).toSeq == viaCol.map(_.getLong(1)).toSeq)
    assert(viaSql.map(_.getSeq[Long](2)).toSeq == viaCol.map(_.getSeq[Long](2)).toSeq)
  }

  test("top_k aggregate: bounded, sorted desc, partitioning-invariant") {
    import graft.functions.TopKAgg.top_k
    val df = (1 to 1000).map(i => (i % 7, (i * 37 % 1000) / 10.0)).toDF("k", "v")
    def run(parts: Int) =
      df.repartition(parts).groupBy("k").agg(top_k(col("v"), 5).as("t"))
        .orderBy("k").collect().map(_.getSeq[Double](1)).toSeq
    val a = run(1)
    assert(a.forall(_.length == 5))
    assert(a.forall(s => s == s.sorted.reverse), "must be sorted descending")
    assert(a == run(13), "partial/merge path must equal single-partition path")
    // fewer rows than k -> shorter array
    val small = Seq((1, 2.0), (1, 1.0)).toDF("k", "v")
      .groupBy("k").agg(top_k(col("v"), 5).as("t")).head().getSeq[Double](1)
    assert(small == Seq(2.0, 1.0))
  }

  test("hamming64 of x with itself is 0, of complement is 64") {
    val df = Seq((0x0f0fL, 0x0f0fL, ~0x0f0fL)).toDF("a", "b", "c")
    val r = df.select(hamming64(col("a"), col("b")), hamming64(col("a"), col("c"))).head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 64)
  }
}

class MinHashDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private def corpus = Seq(
    (1L, base),
    (2L, base),                                     // exact dup of 1
    (3L, base + " extra"),                          // near dup of 1
    (4L, "completely different words about spark engines and shuffles at scale"),
    (5L, "unrelated content mentioning parquet files and broadcast joins only")
  ).toDF("doc_id", "text")

  test("shingles are distinct word k-grams") {
    val sh = corpus.filter(col("doc_id") === 1)
      .select(split(lower(trim(col("text"))), "\\s+").as("t"))
      .select(MinHashDedup.shingles(col("t"), 3).as("sh"))
      .head().getSeq[String](0)
    assert(sh.contains("the quick brown") && sh.distinct.size == sh.size)
  }

  test("shingles kernel == composed HOF shape (sorted), incl. short/empty/repetitive docs") {
    // the codegen'd kernel replaced this exact composed form; its contract
    // is the same shingle SET in sorted order — pinned element-for-element,
    // with the short-doc edge (tokens < k => whole text as ONE shingle,
    // never zero) and the empty-text edge (zero shingles)
    def composed(toks: org.apache.spark.sql.Column, k: Int) =
      array_sort(array_distinct(
        filter(
          transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
            i => concat_ws(" ", slice(toks, i + 1, lit(k)))),
          s => s =!= "")))
    val docs = Seq(
      1L -> base,
      2L -> "one two",                    // shorter than k: one whole-text shingle
      3L -> "solo",                       // single token
      4L -> "",                           // empty text: zero shingles
      5L -> "a a a a a",                  // degenerate repetition: one distinct shingle
      6L -> "b a b a b a c",              // dup shingles at different offsets
      7L -> (1 to 40).map(i => s"t${i % 7}").mkString(" ")
    ).toDF("doc_id", "text")
    for (k <- Seq(1, 2, 3, 5)) {
      val both = docs
        .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
        .select(col("doc_id"),
          MinHashDedup.shingles(col("t"), k).as("kernel"),
          composed(col("t"), k).as("ref"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"k=$k doc=${r.getLong(0)}: kernel=${r.getSeq[String](1)} ref=${r.getSeq[String](2)}")
      }
    }
  }

  test("merge-walk jaccard == array_intersect/array_union jaccard on every corpus pair") {
    // verifiedPairsFromShingles swapped the hash-set intersect/union for
    // sorted_intersect_count with |A∪B| = |A|+|B|-|A∩B|; pin the doubles
    // bit-identical over all pairs (threshold 0 => nothing filtered)
    val sh = MinHashDedup.shingleSets(corpus, "doc_id", "text", 3)
    val allPairs = corpus.select(col("doc_id").as("id_a"))
      .crossJoin(corpus.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    val kernel = MinHashDedup
      .verifiedPairsFromShingles(sh, allPairs, "doc_id", threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ref = allPairs
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(kernel.keySet == ref.keySet)
    kernel.foreach { case (k, v) => assert(v == ref(k), s"pair $k: $v != ${ref(k)}") }
  }

  test("nearDupGroups clusters exact+near dups, isolates distinct docs") {
    val g = MinHashDedup.nearDupGroups(corpus, "doc_id", "text",
        bands = 16, rowsPerBand = 4, threshold = 0.5)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val byId = g.map(t => t._1 -> t._2).toMap
    assert(byId(1L) == byId(2L) && byId(2L) == byId(3L), s"dups split: $g")
    assert(byId(4L) == 4L && byId(5L) == 5L, s"distinct docs merged: $g")
    assert(g.find(_._1 == 1L).get._3 == 3L) // group size
  }

  test("verifiedPairs computes exact jaccard and applies the threshold") {
    val pairs = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val v = MinHashDedup.verifiedPairs(corpus, pairs, "doc_id", "text", threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(v.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(v.head._3 == 1.0)
  }

  test("distributed label propagation equals the union-find path") {
    def run(localThreshold: Int) =
      MinHashDedup.nearDupGroups(corpus, "doc_id", "text",
          bands = 16, rowsPerBand = 4, threshold = 0.5,
          localThreshold = localThreshold)
        .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(run(0) == run(1000000)) // 0 forces the distributed branch
  }

  test("candidatePairs drops oversized buckets — and the drop is observed, not silent") {
    val many = (1L to 20L).map(i => (i, base)).toDF("doc_id", "text")
    val keys = MinHashDedup.bandKeys(many, "doc_id", "text", bands = 4, rowsPerBand = 4)
    val (b0, r0) = (BucketDrops.totalDroppedBuckets, BucketDrops.totalDroppedRows)
    assert(MinHashDedup.candidatePairs(keys, "doc_id", maxBucket = 5).count() == 0)
    // 20 identical docs -> 4 bands x one 20-doc bucket, all over the cap
    assert(BucketDrops.totalDroppedBuckets - b0 >= 4,
      s"drop counter did not fire (delta=${BucketDrops.totalDroppedBuckets - b0})")
    assert(BucketDrops.totalDroppedRows - r0 >= 80)
    val (b1, _) = (BucketDrops.totalDroppedBuckets, BucketDrops.totalDroppedRows)
    assert(MinHashDedup.candidatePairs(keys, "doc_id", maxBucket = 50).count() == 190)
    assert(BucketDrops.totalDroppedBuckets == b1) // under-cap run drops nothing
  }
}

class SimHashDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("nearPairs finds near-identical docs and skips unrelated ones") {
    // long docs: simhash votes need many tokens to be stable; one changed
    // token out of ~40 flips only the marginal bits
    val shared = (1 to 40).map(i => s"token$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " ending1"),
      (2L, shared + " ending2"),
      (3L, (100 to 140).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = SimHashDedup.nearPairs(docs, "doc_id", "text", maxHamming = 16)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)).contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("nearPairs under a forced bucket cap fires the drop counter") {
    val shared = (1 to 40).map(i => s"token$i").mkString(" ")
    // 12 near-identical docs: every block bucket holds ~12 docs, so a cap
    // of 3 drops them all — the counter must make that visible
    val docs = (1L to 12L).map(i => (i, shared + s" ending$i")).toDF("doc_id", "text")
    val before = BucketDrops.totalDroppedBuckets
    val full = SimHashDedup.nearPairs(docs, "doc_id", "text", maxHamming = 4).count()
    val capped = SimHashDedup.nearPairs(docs, "doc_id", "text",
      maxHamming = 4, maxBucket = 3).count()
    assert(capped < full, s"cap did not bite: $capped vs $full")
    assert(BucketDrops.totalDroppedBuckets > before, "simhash drop counter silent")
  }

  test("nearPairs recall is exact at the requested radius (pigeonhole)") {
    // brute-force all-pairs Hamming over the real corpus vs the banded path
    // — candidate generation must be lossless for hamming <= maxHamming
    val docs = graft.core.Tables.documents(spark, sf001)
    val sigs = SimHashDedup.signatures(docs, "doc_id", "text")
    val a = sigs.select(col("doc_id").as("id_a"), col("simhash").as("sim_a"))
    val b = sigs.select(col("doc_id").as("id_b"), col("simhash").as("sim_b"))
    def run(maxHamming: Int): Set[(Long, Long)] = {
      val brute = a.join(b, col("id_a") < col("id_b"))
        .filter(hamming64(col("sim_a"), col("sim_b")) <= maxHamming)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val banded = SimHashDedup.nearPairs(docs, "doc_id", "text",
          maxHamming = maxHamming, maxBucket = 100000)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded == brute, s"radius $maxHamming: banded != brute")
      brute
    }
    run(3)
    val at16 = run(16)
    assert(at16.nonEmpty, "radius-16 test is vacuous on this corpus")
  }

  test("probe1 nearPairs is lossless at large radii with half the blocks") {
    // 1-error-tolerant blocks (9 blocks of 7-8 bits at r=16, vs 17 blocks
    // of 3-4 bits exact) must return exactly the brute-force pair set
    val docs = graft.core.Tables.documents(spark, sf001)
    val sigs = SimHashDedup.signatures(docs, "doc_id", "text")
    val a = sigs.select(col("doc_id").as("id_a"), col("simhash").as("sim_a"))
    val b = sigs.select(col("doc_id").as("id_b"), col("simhash").as("sim_b"))
    for (r <- Seq(10, 16)) {
      val brute = a.join(b, col("id_a") < col("id_b"))
        .filter(hamming64(col("sim_a"), col("sim_b")) <= r)
        .select("id_a", "id_b")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val probed = SimHashDedup.nearPairs(docs, "doc_id", "text",
          maxHamming = r, maxBucket = 100000, probe1 = true)
        .select("id_a", "id_b")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(probed == brute, s"radius $r: probed != brute " +
        s"(missing=${(brute -- probed).size}, extra=${(probed -- brute).size})")
      assert(brute.nonEmpty, s"radius-$r probe test is vacuous")
    }
  }

  test("variable-width blocks cover all 64 signature bits") {
    import spark.implicits._
    val sigs = Seq((1L, -1L), (2L, 0x123456789abcdefL)).toDF("doc_id", "simhash")
    // reconstructing the signature from its block values must be lossless
    // for counts that don't divide 64 (variable-width blocks)
    Seq(4, 7, 17).foreach { blocks =>
      val keys = SimHashDedup.blockKeys(sigs, "doc_id", blocks)
        .select("doc_id", "block", "block_value")
        .as[(Long, Int, Long)].collect()
      assert(keys.length == 2 * blocks)
      val base = 64 / blocks
      val extra = 64 % blocks
      val widths = Seq.tabulate(blocks)(b => if (b < extra) base + 1 else base)
      val offsets = widths.scanLeft(0)(_ + _)
      Seq(-1L, 0x123456789abcdefL).zip(Seq(1L, 2L)).foreach { case (sig, id) =>
        val rebuilt = keys.filter(_._1 == id)
          .map { case (_, blk, v) => v << offsets(blk) }
          .reduce(_ | _)
        assert(rebuilt == sig, s"blocks=$blocks id=$id")
      }
    }
  }
}

class AnnSpec extends SparkTestBase {

  private lazy val emb = graft.core.Tables.embeddings(spark, sf001)
  private lazy val queries = emb.filter(col("vec_id") < 20)

  test("bruteForceTopK returns k self-free neighbors with valid cosines") {
    val r = Ann.bruteForceTopK(emb, queries, 5).collect()
    assert(r.length == 20 * 5)
    assert(r.forall(row => row.getLong(row.fieldIndex("q_id")) !=
                           row.getLong(row.fieldIndex("vec_id"))))
    assert(r.forall(row => math.abs(row.getDouble(row.fieldIndex("cos"))) <= 1.0 + 1e-9))
  }

  test("ivfTopK returns k exact-ranked rows from probed cells") {
    val r = Ann.ivfTopK(emb, queries, 5, nCells = 16, nProbe = 8)
    val byQ = r.collect().groupBy(_.getLong(0))
    assert(byQ.size == 20 && byQ.values.forall(_.length == 5))
    // with nProbe == nCells the search is exhaustive -> equals brute force
    val all = Ann.ivfTopK(emb, queries, 5, nCells = 8, nProbe = 8)
      .select("q_id", "rk", "vec_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = Ann.bruteForceTopK(emb, queries, 5)
      .select("q_id", "rk", "vec_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(all == exact)
  }

  test("embedding near-dup groups cluster duplicated vectors") {
    import spark.implicits._
    import graft.sim.EmbeddingDedup
    val base = emb.limit(50)
    val dupes = base.filter(col("vec_id") < 3)
      .withColumn("vec_id", col("vec_id") + 1000) // exact copies, new ids
    val corpus = base.unionByName(dupes)
    val g = EmbeddingDedup.groups(corpus, threshold = 0.999)
    val grouped = g.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 3).foreach { i =>
      assert(grouped(i.toLong) == grouped(i + 1000L), s"copy $i not grouped")
    }
    assert(g.filter(col("group_size") === 1).count() == 47)
    // distributed branch (localThreshold = 0) must produce identical groups
    val gd = EmbeddingDedup.groups(corpus, threshold = 0.999, localThreshold = 0)
    assert(gd.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
           g.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("ivfTopK with Lloyd iterations: recall@10 >= 0.9 on CLUSTERED data") {
    import spark.implicits._
    // 8 well-separated cluster directions with deterministic jitter — the
    // case where sample-init centroids (id-order biased) under-recall and
    // k-means refinement must recover the cluster structure
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 16)
    val k = 10
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(r.fieldIndex("q_id")),
                             r.getLong(r.fieldIndex("vec_id"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = asMap(Ann.bruteForceTopK(corpus, queries, k))
    val ivf = asMap(Ann.ivfTopK(corpus, queries, k,
      nCells = 8, nProbe = 4, lloydIters = 3))
    val recalls = exact.map { case (q, e) =>
      ivf.get(q).map(a => (a & e).size.toDouble / e.size).getOrElse(0.0)
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.9, s"clustered recall@$k = $recall")
  }

  test("ivfTopK recall holds when ids correlate with clusters (seed-spread)") {
    import spark.implicits._
    // adversarial id layout: ids 0-49 are ALL cluster 0, 50-99 cluster 1,
    // ... — id-order seeding would put every initial centroid in cluster 0
    val rnd = new scala.util.Random(11)
    val dim = 16
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0 until 400).map { i =>
      val c = centers(i / 50)
      (i.toLong, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    // queries drawn across all clusters
    val queries = corpus.filter(col("vec_id") % 50 === 0)
    val k = 10
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(r.fieldIndex("q_id")),
                             r.getLong(r.fieldIndex("vec_id"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = asMap(Ann.bruteForceTopK(corpus, queries, k))
    val ivf = asMap(Ann.ivfTopK(corpus, queries, k,
      nCells = 8, nProbe = 4, lloydIters = 3))
    val recalls = exact.map { case (q, e) =>
      ivf.get(q).map(a => (a & e).size.toDouble / e.size).getOrElse(0.0)
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.9, s"id-clustered recall@$k = $recall")
  }

  test("fitIvf + ivfSearch serve batches identically to the one-shot path") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Seq.fill(8)((rnd.nextGaussian()).toFloat)))
    val corpus = vecs.toDF("vec_id", "embedding").cache()
    val model = Ann.fitIvf(corpus, nCells = 4, lloydIters = 2)
    val cells = corpus.select(col("vec_id"), col("embedding"),
      model.assign(col("embedding")).as("cell")).cache()
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // two different query batches served off the SAME fitted model/cells
    val q1 = corpus.filter(col("vec_id") < 10)
    val q2 = corpus.filter(col("vec_id") >= 190)
    assert(asSet(Ann.ivfSearch(model, cells, q1, k = 5)) ==
           asSet(Ann.ivfTopK(corpus, q1, k = 5, nCells = 4, lloydIters = 2)))
    assert(asSet(Ann.ivfSearch(model, cells, q2, k = 5)) ==
           asSet(Ann.ivfTopK(corpus, q2, k = 5, nCells = 4, lloydIters = 2)))
    cells.unpersist(); corpus.unpersist()
  }

  test("lshTopK recall@10 >= 0.9 vs brute force") {
    val k = 10
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(r.fieldIndex("q_id")),
                             r.getLong(r.fieldIndex("vec_id"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact  = asMap(Ann.bruteForceTopK(emb, queries, k))
    val approx = asMap(Ann.lshTopK(emb, queries, k, numPlanes = 32, bands = 16))
    val recalls = exact.map { case (q, e) =>
      approx.get(q).map(a => (a & e).size.toDouble / e.size).getOrElse(0.0)
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.9, s"recall@$k = $recall")
  }
}
