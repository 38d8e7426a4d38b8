package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.{MinHashDedup, SimHashDedup}
import graft.sim.Ann
import Registry._

/** Near-dup dedup / similarity-search coverage (brief: training-data
  * pipeline operators). The LSH paths are not ANSI-SQL-expressible so most
  * entries are rows-only; their correctness is pinned by ScalaTest
  * invariants (recall vs brute force, signature determinism) instead.
  */
object DedupSim {

  val defs: Seq[(String, Entry)] = Seq(

    // ---- MinHash+LSH near-dup grouping: every doc gets its component's
    //      min doc_id; singleton groups = unique docs (rows == corpus size)
    "m1_minhash_groups" -> rowsOnly(
      (s, d) =>
        MinHashDedup.nearDupGroups(Tables.documents(s, d), "doc_id", "text")
          .orderBy("doc_id")),

    // ---- SimHash signatures + per-doc near-neighbor count within
    //      Hamming radius (banded blocking, never all-pairs)
    "m2_simhash_near" -> rowsOnly(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sigs = SimHashDedup.signatures(docs, "doc_id", "text")
        val pairs = SimHashDedup.nearPairs(docs, "doc_id", "text", maxHamming = 16)
        val deg = pairs.select(col("id_a").as("doc_id"))
          .unionByName(pairs.select(col("id_b").as("doc_id")))
          .groupBy("doc_id").agg(count(lit(1)).as("n_near"))
        sigs.join(deg, Seq("doc_id"), "left")
          .select(col("doc_id"), col("simhash"),
                  coalesce(col("n_near"), lit(0L)).as("n_near"))
          .orderBy("doc_id")
      }),

    // ---- n-gram (bigram) Jaccard similarity between consecutive docs —
    //      the exact-verify kernel of the near-dup path, oracle-checkable
    "t5_bigram_jaccard" -> withOracle(
      (s, d) => {
        val docs = Tables.documents(s, d)
        def bigrams(c: org.apache.spark.sql.Column) = {
          val t = split(lower(trim(c)), "\\s+")
          array_distinct(transform(sequence(lit(1), size(t) - 1),
            i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
        }
        val a = docs.select(col("doc_id"), bigrams(col("text")).as("bg_a"))
        val b = docs.select((col("doc_id") - 1).as("doc_id"), bigrams(col("text")).as("bg_b"))
        a.join(b, Seq("doc_id"))
          .select(col("doc_id"),
            (size(array_intersect(col("bg_a"), col("bg_b"))).cast("double") /
             size(array_union(col("bg_a"), col("bg_b")))).as("jaccard"))
          .orderBy("doc_id")
      },
      """WITH bg AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(t)),
        |           i -> t[i] || ' ' || t[i+1])) AS bg
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |        FROM documents))
        |SELECT a.doc_id,
        |       CAST(len(list_intersect(a.bg, b.bg)) AS DOUBLE) /
        |       len(list_distinct(list_concat(a.bg, b.bg))) AS jaccard
        |FROM bg a JOIN bg b ON b.doc_id = a.doc_id + 1
        |ORDER BY a.doc_id""".stripMargin),

    // ---- LSH ANN top-k (recall vs e1_knn_brute pinned in ScalaTest)
    "e2_ann_lsh" -> rowsOnly(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Ann.lshTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
          .select("q_id", "rk", "vec_id")
          .orderBy("q_id", "rk")
      }),

    // ---- IVF-style ANN (coarse cells + probe + exact re-rank)
    "e3_ann_ivf" -> rowsOnly(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Ann.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
            nCells = 16, nProbe = 4)
          .select("q_id", "rk", "vec_id")
          .orderBy("q_id", "rk")
      }),

    // ---- embedding-cosine near-dup groups (LSH-bucketed candidates)
    "e4_embedding_neardup" -> rowsOnly(
      (s, d) =>
        graft.sim.EmbeddingDedup.groups(Tables.embeddings(s, d), threshold = 0.95)
          .orderBy("vec_id")),

    // ---- multimodal: binary-column feature extraction (stubbed decode,
    //      real mapPartitions plumbing — graft.multimodal)
    "mm1_media_features" -> rowsOnly(
      (s, d) => {
        val media = graft.multimodal.Multimodal.synthesizeFromDocuments(
          Tables.documents(s, d))
        graft.multimodal.Multimodal.extractFeatures(media)
          .toDF()
          .select(col("id"), col("modality"), col("n_bytes"),
            round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
            round(element_at(col("features"), 2).cast("double"), 4).as("f1"))
          .orderBy("id")
      })
  )
}
