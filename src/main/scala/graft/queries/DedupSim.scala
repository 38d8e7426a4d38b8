package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dedup.{MinHashDedup, SetSimJoin, SimHashDedup}
import graft.sim.{Ann, IvfPq, Pca, Pq}
import Registry._

/** Near-dup dedup / similarity-search coverage (brief: training-data
  * pipeline operators). The LSH paths are not ANSI-SQL-expressible so most
  * entries are rows-only; their correctness is pinned by ScalaTest
  * invariants (recall vs brute force, signature determinism) instead.
  */
object DedupSim {

  // Fit-once/serve-many for the ANN family lives with the models now —
  // Ann.cachedIvf (e3/st11), Pq.cachedPq (e5), IvfPq.cachedIvfPq (e6):
  // each is the two-layer cache (in-JVM FitCache + cross-restart
  // ModelStore load-if-present -> fit-and-save), so the benched serving
  // shape pays the fit once per dataset CONTENT, surviving driver
  // restarts, and cached vs fresh runs stay row-identical (deterministic
  // fits; restart story pinned in ModelStoreSpec).

  /** pr1/pr2 share ONE degree-annotated, materialized edge table and node
    * set per (session, dataset): both walk the same supplier-part graph,
    * and the distinct-pair shuffle + degree groupBy + checkpoint is graph
    * prep, not per-variant work. Keyed by the session too — a
    * localCheckpointed frame is pinned to its session's executors and
    * must not outlive it.
    */
  private val graphPrep =
    new graft.core.FitCache[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]

  /** (degree-annotated edges, node ids) for the bipartite supplier-part
    * graph: ids 2*suppkey / 2*partkey+1 (parity-disjoint at any SF).
    */
  private def suppPartGraph(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    graphPrep.getOrFit(("supp-part-graph", s), d) {
      val li = Tables.lineitem(s, d)
        .select((col("l_suppkey") * 2).as("a"), (col("l_partkey") * 2 + 1).as("b"))
        .distinct()
      val edges = li.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(li.select(col("b").as("src"), col("a").as("dst")))
      val nodes = Tables.supplier(s, d).select((col("s_suppkey") * 2).as("id"))
        .unionAll(Tables.part(s, d).select((col("p_partkey") * 2 + 1).as("id")))
        .localCheckpoint(true)
      (graft.graph.PageRank.prepareEdges(edges), nodes)
    }

  // NOTE deliberately NOT shared: j14 and d5 both derive the exact
  // J >= 0.9 pair table, and a production pipeline would materialize it
  // once — but j14's registered semantics IS that join, so serving it
  // from a cross-query cache would turn its bench number into a
  // materialized-view read and hide the join's cost from the whole bench
  // (min-of-reps discards the one build). The pr1/pr2 graphPrep sharing
  // is different in kind: degree annotation is PREP, and each variant
  // still pays its own six iteration rounds.

  /** e9's fit-once state: the PCA whitening model and an IVF index fitted
    * in the whitened space. Serving then pays two shuffle-free projections
    * (whiten, cell-assign) plus the probed search — the shape a real
    * retrieval deployment runs per query batch. Brute-force-in-whitened-
    * space remains the recall oracle inside PcaSpec. The cold path loads
    * the fitted PAIR from ModelStore (one blob — a torn pair could serve
    * an index whose space no longer matches the whitener) and falls back
    * to fit-and-save, like the rest of the ANN family.
    */
  private val whitenedAnnModels = new graft.core.FitCache[(Pca.PcaModel, Ann.IvfModel)]

  /** pr1's DuckDB restatement, generated: 6 power-iteration rounds
    * unrolled as chained CTEs (recursive CTEs forbid the GROUP BY the
    * contribution sum needs). Every constant mirrors the Spark call:
    * scale 1e9, damping 85/100, base (15*1e9) div 100.
    */
  private def pr1Oracle: String = {
    val rounds = (1 to 6).map { k =>
      s"""c$k AS (
         |  SELECT e.dst AS id, CAST(sum(p.r // d.outdeg) AS BIGINT) AS s
         |  FROM pr${k - 1} p
         |  JOIN edges e ON p.id = e.src
         |  JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst),
         |pr$k AS (
         |  SELECT n.id,
         |         CAST(150000000 + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN c$k c ON c.id = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (
       |  SELECT DISTINCT l_suppkey * 2 AS a, l_partkey * 2 + 1 AS b
       |  FROM lineitem),
       |edges AS (
       |  SELECT a AS src, b AS dst FROM li
       |  UNION ALL
       |  SELECT b, a FROM li),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM edges GROUP BY src),
       |nodes AS (
       |  SELECT s_suppkey * 2 AS id FROM supplier
       |  UNION ALL
       |  SELECT p_partkey * 2 + 1 FROM part),
       |pr0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS r FROM nodes),
       |$rounds
       |SELECT id, r FROM pr6 ORDER BY id""".stripMargin
  }

  /** pr2's oracle: pr1's unroll with the restart mass (initial rank AND
    * per-round base) confined to the seed set.
    */
  private def pr2Oracle: String = {
    val rounds = (1 to 6).map { k =>
      s"""c$k AS (
         |  SELECT e.dst AS id, CAST(sum(p.r // d.outdeg) AS BIGINT) AS s
         |  FROM pr${k - 1} p
         |  JOIN edges e ON p.id = e.src
         |  JOIN deg d ON d.src = e.src
         |  GROUP BY e.dst),
         |pr$k AS (
         |  SELECT n.id,
         |         CAST((CASE WHEN sd.id IS NOT NULL THEN 150000000 ELSE 0 END)
         |              + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes n
         |  LEFT JOIN seeds sd ON sd.id = n.id
         |  LEFT JOIN c$k c ON c.id = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (
       |  SELECT DISTINCT l_suppkey * 2 AS a, l_partkey * 2 + 1 AS b
       |  FROM lineitem),
       |edges AS (
       |  SELECT a AS src, b AS dst FROM li
       |  UNION ALL
       |  SELECT b, a FROM li),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM edges GROUP BY src),
       |nodes AS (
       |  SELECT s_suppkey * 2 AS id FROM supplier
       |  UNION ALL
       |  SELECT p_partkey * 2 + 1 FROM part),
       |seeds AS (SELECT s_suppkey * 2 AS id FROM supplier WHERE s_suppkey <= 5),
       |pr0 AS (SELECT n.id,
       |               CAST(CASE WHEN sd.id IS NOT NULL THEN 1000000000 ELSE 0 END
       |                    AS BIGINT) AS r
       |        FROM nodes n LEFT JOIN seeds sd ON sd.id = n.id),
       |$rounds
       |SELECT id, r FROM pr6 ORDER BY id""".stripMargin
  }

  val defs: Seq[(String, Entry)] = Seq(

    // ---- MinHash+LSH near-dup grouping: every doc gets its component's
    //      min doc_id; singleton groups = unique docs (rows == corpus size).
    //      Oracle: BRUTE-FORCE exact-Jaccard pairs + recursive-CTE
    //      transitive closure in DuckDB. Valid because (a) the engine
    //      verifies candidates with the same exact Jaccard, so its pairs
    //      are a subset of brute force, and (b) on this corpus every true
    //      pair has Jaccard >= 0.88, where the 16x4 banding miss
    //      probability is ~1e-7 — LSH recall is exact here, and the hash
    //      compare would catch it if it ever weren't. Jaccard itself is
    //      one double division of exact ints — bit-identical across
    //      engines, so the 0.7 threshold cannot disagree.
    "m1_minhash_groups" -> withOracle(
      (s, d) =>
        MinHashDedup.nearDupGroups(Tables.documents(s, d), "doc_id", "text")
          .orderBy("doc_id"),
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_filter(
        |    list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |      i -> array_to_string(t[i:least(i + 2, len(t))], ' ')),
        |    s -> s <> '')) AS sh
        |  FROM toks
        |), pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7
        |), edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |), labels AS (
        |  SELECT src AS doc_id, min(dst) AS min_reach FROM reach GROUP BY src
        |)
        |SELECT d.doc_id,
        |       CAST(COALESCE(least(l.min_reach, d.doc_id), d.doc_id) AS BIGINT) AS group_id,
        |       CAST(count(*) OVER (PARTITION BY COALESCE(least(l.min_reach, d.doc_id), d.doc_id)) AS BIGINT) AS group_size
        |FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
        |ORDER BY d.doc_id""".stripMargin),

    // ---- canonical-representative selection over near-dup groups: the
    //      step an actual dedup pipeline runs AFTER grouping — keep the
    //      best doc of each group (longest, ties to the smallest id)
    //      and drop the rest. One window partitioned by group on top of
    //      m1's components; oracle extends m1's brute-force + closure
    //      restatement with the same pick.
    "d4_canonical_docs" -> withOracle(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("group_id").orderBy(col("n_chars").desc, col("doc_id"))
        MinHashDedup.nearDupGroups(Tables.documents(s, d), "doc_id", "text")
          .join(Tables.documents(s, d).select("doc_id", "n_chars"), Seq("doc_id"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select("group_id", "doc_id", "n_chars", "group_size")
          .orderBy("group_id")
      },
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_filter(
        |    list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |      i -> array_to_string(t[i:least(i + 2, len(t))], ' ')),
        |    s -> s <> '')) AS sh
        |  FROM toks
        |), pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7
        |), edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |), labels AS (
        |  SELECT src AS doc_id, min(dst) AS min_reach FROM reach GROUP BY src
        |), grp AS (
        |  SELECT d.doc_id,
        |         CAST(COALESCE(least(l.min_reach, d.doc_id), d.doc_id) AS BIGINT)
        |           AS group_id,
        |         d.n_chars
        |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
        |), rk AS (
        |  SELECT doc_id, group_id, n_chars,
        |         row_number() OVER (PARTITION BY group_id
        |                            ORDER BY n_chars DESC, doc_id) AS rk,
        |         CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT)
        |           AS group_size
        |  FROM grp)
        |SELECT group_id, doc_id, n_chars, group_size FROM rk
        |WHERE rk = 1 ORDER BY group_id""".stripMargin),

    // ---- distributed connected components (large-star/small-star
    //      contraction — the O(log n)-round scale path behind near-dup
    //      grouping). The graph is deterministic: 10-node doc-id chains
    //      (worst case for label propagation, routine for star
    //      contraction) plus sparse cross-links merging some chains.
    //      Oracle: recursive-CTE transitive closure over the same edges.
    "cc1_components" -> withOracle(
      (s, d) => {
        val ids = Tables.documents(s, d).select(col("doc_id"))
        val chain = ids.filter(col("doc_id") % 10 =!= 9)
          .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
        val cross = ids.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("id_a"), (col("doc_id") + 50).as("id_b"))
        val edges = chain.unionByName(cross)
          .join(ids.select(col("doc_id").as("id_b")), Seq("id_b")) // endpoint must exist
        val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
        MinHashDedup.groups(ids, edges, "doc_id") // star contraction inside
          .withColumnRenamed("group_id", "component")
          .withColumn("comp_size", count(lit(1)).over(w))
          .orderBy("doc_id")
      },
      """WITH RECURSIVE ids AS (SELECT doc_id FROM documents),
        |e0 AS (
        |  SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM ids WHERE doc_id % 10 <> 9
        |  UNION ALL
        |  SELECT doc_id, doc_id + 50 FROM ids WHERE doc_id % 97 = 0),
        |e1 AS (SELECT id_a, id_b FROM e0 JOIN ids ON id_b = doc_id),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM e1
        |          UNION SELECT id_b, id_a FROM e1),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (SELECT src AS doc_id, min(dst) AS mn FROM reach GROUP BY src)
        |SELECT d.doc_id,
        |       CAST(COALESCE(least(l.mn, d.doc_id), d.doc_id) AS BIGINT) AS component,
        |       CAST(count(*) OVER (PARTITION BY
        |         COALESCE(least(l.mn, d.doc_id), d.doc_id)) AS BIGINT) AS comp_size
        |FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
        |ORDER BY d.doc_id""".stripMargin),

    // ---- L2 normalization of the embedding column, ORACLED: the norm is
    //      a strictly sequential left-to-right fold (Spark `aggregate` ==
    //      DuckDB list_aggregate over the same list order), every product
    //      and the final sqrt correctly rounded from identical inputs —
    //      so even a float pipeline stage can cross the hash-exact gate
    //      when the fold order is pinned. Emits the norm and the first
    //      two normalized components.
    "e8_embed_norm" -> withOracle(
      (s, d) => {
        val v = col("embedding").cast("array<double>")
        val norm = sqrt(aggregate(transform(v, x => x * x),
          lit(0.0), (acc, x) => acc + x))
        Tables.embeddings(s, d)
          .select(col("vec_id"), norm.as("l2"),
            (element_at(v, 1) / norm).as("c1"),
            (element_at(v, 2) / norm).as("c2"))
          .orderBy("vec_id")
      },
      """SELECT vec_id,
        |       sqrt(list_aggregate(list_transform(embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS l2,
        |       CAST(embedding[1] AS DOUBLE) /
        |         sqrt(list_aggregate(list_transform(embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS c1,
        |       CAST(embedding[2] AS DOUBLE) /
        |         sqrt(list_aggregate(list_transform(embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS c2
        |FROM embeddings ORDER BY vec_id""".stripMargin),

    // ---- SQ8 int8-quantized ANN (Ann.sq8Encode/sq8Search): the corpus
    //      at a quarter of the bytes, scored by integer dot products and
    //      dequantized by per-vector constants. Encoding is a pure
    //      projection (no fit pass, no model state — at 100 TB it rides
    //      the ingest scan). FULLY ORACLED, uniquely in the ANN family:
    //      round/floor and IEEE mul/div are engine-exact, so DuckDB
    //      restates quantization, integer scoring, and the dequantized
    //      ranking verbatim. Recall vs float brute force pinned in
    //      Sq8Spec.
    "e10_ann_sq8" -> withOracle(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val codes = graft.sim.Ann.sq8Encode(emb)
        graft.sim.Ann.sq8Search(codes, emb.filter(col("vec_id") < 10), k = 5)
          .orderBy("q_id", "rk")
      },
      """WITH enc AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 /
        |             greatest(list_max(list_transform(embedding,
        |               y -> abs(CAST(y AS DOUBLE)))), 1e-300) + 0.5) AS BIGINT)) AS q8,
        |         greatest(list_max(list_transform(embedding,
        |           y -> abs(CAST(y AS DOUBLE)))), 1e-300) AS m,
        |         greatest(sqrt(list_aggregate(list_transform(embedding,
        |           y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum')), 1e-300) AS nrm
        |  FROM embeddings)
        |SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id, qdot FROM (
        |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
        |         CAST(list_sum(list_transform(range(1, 65),
        |           i -> q.q8[i] * c.q8[i])) AS BIGINT) AS qdot,
        |         row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |           (CAST(list_sum(list_transform(range(1, 65),
        |              i -> q.q8[i] * c.q8[i])) AS DOUBLE) * c.m / c.nrm) DESC,
        |           c.vec_id) AS rk
        |  FROM enc q JOIN enc c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
        |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin),

    // ---- FILTERED vector search, exact baseline: top-k among corpus
    //      rows matching a metadata predicate (label = 3) — the
    //      vector-DB filtered-search surface (the filter composes as a
    //      plain .filter BEFORE the ranking, so it pushes to the scan;
    //      post-filtering a top-k would return holes). Brute force =
    //      oracle-able exactly, the e1 pattern plus the predicate.
    "e11_ann_filtered" -> withOracle(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Ann.bruteForceTopK(emb.filter(col("label") === 3),
            emb.filter(col("vec_id") < 10), k = 5)
          .select("q_id", "rk", "vec_id")
          .orderBy("q_id", "rk")
      },
      """SELECT q_id, CAST(rk AS INTEGER) AS rk, vec_id
        |FROM (
        |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
        |         row_number() OVER (PARTITION BY q.vec_id
        |           ORDER BY (list_sum(list_transform(range(1, 65),
        |                       i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
        |             / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
        |              * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))))) DESC,
        |           c.vec_id)
        |           AS rk
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id < 10 AND c.vec_id <> q.vec_id AND c.label = 3
        |) WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin),

    // ---- FILTERED IVF search with ADAPTIVE probing
    //      (Ann.ivfSearchAdaptive): label = 3 keeps ~10% of the corpus,
    //      so a fixed-nProbe probe of the query's nearest cells can hold
    //      fewer than k survivors; the probe set is instead sized by
    //      per-cell survivor counts until it covers the candidate target,
    //      guaranteeing k results at any selectivity. Reuses e3's cached
    //      IVF fit (same key/geometry — one Lloyd fit serves both).
    //      rows-only: ANN approximate by contract (e3's justification);
    //      AnnFilterSpec pins exactness when the target covers all
    //      survivors, completeness + recall >= 0.9 under a selective
    //      filter on clustered data, and probe-set economy under a dense
    //      one.
    "e12_ann_ivf_filtered" -> rowsOnly(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val model = Ann.cachedIvf(d, emb, nCells = 16, lloydIters = 2)
        val cells = emb
          .select(col("vec_id"), col("embedding"), col("label"),
            model.assign(col("embedding")).as("cell"))
          .filter(col("label") === 3)
        Ann.ivfSearchAdaptive(model, cells, emb.filter(col("vec_id") < 10),
            k = 5, oversample = 4.0)
          .select("q_id", "rk", "vec_id")
          .orderBy("q_id", "rk")
      }),

    // ---- PCA whitening of the embedding column (sim.Pca): decorrelate +
    //      variance-equalize before quantization/LSH — one bounded-state
    //      fit pass (count/sum/gram partials, d x d Jacobi on the driver),
    //      then a shuffle-free projection map. Eigensolves aren't SQL ->
    //      rows-only; PcaSpec pins the 2x2 golden, orthonormality,
    //      identity covariance after whitening, and projection purity.
    "e7_pca_whiten" -> rowsOnly(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val model = Pca.fit(emb, k = 8)
        Pca.whiten(emb, model).toDF()
          .select(col("vec_id"), posexplode(col("white")))
          .withColumnsRenamed(Map("pos" -> "component", "col" -> "value"))
          .orderBy("vec_id", "component")
      }),

    // ---- ANN in the WHITENED space: cosine after PCA whitening is the
    //      Mahalanobis-style similarity that down-weights the dominant
    //      directions — the standard retrieval preconditioner. The
    //      registered query is the SERVING path (fit PCA + whitened-space
    //      IVF once per dataset, then whiten-project + cell-assign +
    //      probed search per batch): at 100 TB nobody re-fits per query
    //      batch, so the benched shape shouldn't either. Recall of this
    //      exact composition vs brute-force-in-whitened-space is pinned
    //      in PcaSpec; whiten itself is pinned bit-for-bit there.
    "e9_ann_whitened" -> rowsOnly(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val (pca, ivf) = whitenedAnnModels.getOrFit("whitened", d) {
          val path = graft.sim.ModelStore.whitenedAnnPath(d, k = 16, nCells = 16)
          (try Some(graft.sim.ModelStore.loadWhitenedAnn(s, path))
           catch { case scala.util.control.NonFatal(_) => None })
            .getOrElse {
              val m = Pca.fit(emb, k = 16)
              val w = Pca.whiten(emb, m).toDF()
                .select(col("vec_id"), col("white").as("embedding"))
              val fitted = (m, Ann.fitIvf(w, nCells = 16, lloydIters = 2))
              try graft.sim.ModelStore.saveWhitenedAnn(s, path, fitted._1, fitted._2)
              catch { case scala.util.control.NonFatal(_) => () }
              fitted
            }
        }
        val white = Pca.whiten(emb, pca).toDF()
          .select(col("vec_id"), col("white").as("embedding"))
        val cells = white.select(col("vec_id"), col("embedding"),
          ivf.assign(col("embedding")).as("cell"))
        Ann.ivfSearch(ivf, cells, white.filter(col("vec_id") < 10),
            k = 5, nProbe = 6)
          .select("q_id", "rk", "vec_id")
          .orderBy("q_id", "rk")
      }),

    // ---- integer-arithmetic PageRank over the supplier-part bipartite
    //      graph (graph.PageRank): every rank a long in 1e-9 units, every
    //      contribution a floor division — the aggregation is order-immune
    //      integer math, so an iterative graph algorithm crosses the
    //      hash-exact gate (the t14 quantization trick on a fixpoint).
    //      Node ids: 2*suppkey / 2*partkey+1 (parity-disjoint at any SF).
    "pr1_pagerank" -> withOracle(
      (s, d) => {
        val (edges, nodes) = suppPartGraph(s, d)
        graft.graph.PageRank.ranks(edges, nodes, iters = 6).orderBy("id")
      },
      pr1Oracle),

    // (PageRank-to-convergence exists as graph.PageRank.ranksToFixpoint,
    // pinned in PageRankSpec; it is NOT registered as a bench query
    // because damping 0.85 contracts at 0.85^k — tight tolerances
    // honestly need ~50+ rounds, the wrong shape for a per-round bench.
    // pr1's fixed-round form is the benched surface.)

    // ---- personalized PageRank: restart mass on a 5-supplier seed set
    //      only — ranks measure proximity to the seeds (graph retrieval /
    //      related-items), not global authority. Same integer-exact
    //      round algebra as pr1; oracle = 6 unrolled CTE rounds with the
    //      seeded base.
    "pr2_ppr" -> withOracle(
      (s, d) => {
        val (edges, nodes) = suppPartGraph(s, d)
        val seeds = Tables.supplier(s, d).filter(col("s_suppkey") <= 5)
          .select((col("s_suppkey") * 2).as("id"))
        graft.graph.PageRank.personalizedRanks(edges, nodes, seeds, iters = 6)
          .orderBy("id")
      },
      pr2Oracle),

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

    // ---- m2's large-radius scale path: HmSearch-style 1-bit probing
    //      (9 wide blocks instead of 17 narrow ones at r=16). Same output
    //      shape as m2 and a lossless candidate set, so the per-doc degree
    //      counts must be IDENTICAL to m2's — pinned by the probed==brute
    //      DedupSimSpec test and comparable row-for-row in the gate dump.
    "m3_simhash_probed" -> rowsOnly(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sigs = SimHashDedup.signatures(docs, "doc_id", "text")
        val pairs = SimHashDedup.nearPairs(docs, "doc_id", "text",
          maxHamming = 16, probe1 = true)
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
        // codegen'd n-gram kernel (graft.functions.Ngrams) — the composed
        // higher-order form was interpreted and re-evaluated the tokenizer
        // per element
        val docs = Tables.documents(s, d)
        val bigrams = graft.functions.functions.ngrams(
          split(lower(trim(col("text"))), "\\s+"), 2, distinct = true)
        val a = docs.select(col("doc_id"), bigrams.as("bg_a"))
        val b = docs.select((col("doc_id") - 1).as("doc_id"), bigrams.as("bg_b"))
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

    // ---- IVF-style ANN (coarse cells + probe + exact re-rank). Fit is
    //      cached per dataset (ivfModels): the benched path is cell-assign
    //      (shuffle-free projection) + probed search — identical rows to
    //      the one-shot ivfTopK because the fit is deterministic, which
    //      AnnSpec pins (cached-serving == ivfTopK row-for-row).
    "e3_ann_ivf" -> rowsOnly(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val model = Ann.cachedIvf(d, emb, nCells = 16, lloydIters = 2)
        val cells = emb.select(col("vec_id"), col("embedding"),
          model.assign(col("embedding")).as("cell"))
        Ann.ivfSearch(model, cells, emb.filter(col("vec_id") < 10),
            k = 5, nProbe = 4)
          .select("q_id", "rk", "vec_id")
          .orderBy("q_id", "rk")
      }),

    // ---- product-quantization ANN: 16-byte codes + ADC scan + exact
    //      refine (recall vs e1_knn_brute pinned in PqSpec). Codebooks
    //      are fitted once per dataset (pqModels) — the query measures
    //      the serving path, row-identical to the one-shot pqTopK
    //      (PqSpec pins it).
    "e5_ann_pq" -> rowsOnly(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val model = Pq.cachedPq(d, emb)
        Pq.pqSearch(model, Pq.encodeCorpus(model, emb), emb,
            emb.filter(col("vec_id") < 10), k = 5)
          .select("q_id", "rk", "vec_id")
          .orderBy("q_id", "rk")
      }),

    // ---- residual IVF-PQ: coarse cells + per-cell PQ over residuals
    //      (LOPQ; recall vs e1 pinned in IvfPqSpec). Fit is cached per
    //      dataset (see ivfPqModels) — the query measures the serving
    //      path: encode projection + probe + ADC scan + exact refine.
    "e6_ann_ivfpq" -> rowsOnly(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val model = IvfPq.cachedIvfPq(d, emb)
        IvfPq.search(model, IvfPq.encodeCorpus(model, emb), emb,
            emb.filter(col("vec_id") < 10), k = 5)
          .select("q_id", "rk", "vec_id")
          .orderBy("q_id", "rk")
      }),

    // ---- embedding-cosine near-dup groups (LSH-bucketed candidates).
    //      Oracle: brute-force cosine pairs + transitive closure, the same
    //      shape as m1. The testdata corpus has NO pair above 0.95 (max
    //      observed ~0.51), so the oracle additionally pins that the LSH
    //      path produces no false positives; the grouped-duplicates case
    //      is covered by AnnSpec's synthetic-copy test.
    "e4_embedding_neardup" -> withOracle(
      (s, d) =>
        graft.sim.EmbeddingDedup.groups(Tables.embeddings(s, d), threshold = 0.95)
          .orderBy("vec_id"),
      """WITH RECURSIVE v AS (
        |  SELECT vec_id, embedding AS e FROM embeddings
        |), pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id
        |  WHERE (list_sum(list_transform(range(1, len(a.e) + 1),
        |           i -> CAST(a.e[i] AS DOUBLE) * CAST(b.e[i] AS DOUBLE)))
        |     / (sqrt(list_sum(list_transform(range(1, len(a.e) + 1),
        |           i -> CAST(a.e[i] AS DOUBLE) * CAST(a.e[i] AS DOUBLE))))
        |      * sqrt(list_sum(list_transform(range(1, len(b.e) + 1),
        |           i -> CAST(b.e[i] AS DOUBLE) * CAST(b.e[i] AS DOUBLE)))))) >= 0.95
        |), edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src
        |), labels AS (
        |  SELECT src AS vec_id, min(dst) AS min_reach FROM reach GROUP BY src
        |)
        |SELECT d.vec_id,
        |       CAST(COALESCE(least(l.min_reach, d.vec_id), d.vec_id) AS BIGINT) AS group_id,
        |       CAST(count(*) OVER (PARTITION BY COALESCE(least(l.min_reach, d.vec_id), d.vec_id)) AS BIGINT) AS group_size
        |FROM embeddings d LEFT JOIN labels l ON d.vec_id = l.vec_id
        |ORDER BY d.vec_id""".stripMargin),

    // ---- multimodal: binary-column feature extraction — REAL JDK-native
    //      decode (ImageIO PNG/JPEG, RIFF/WAV) over real generated bytes;
    //      video stays opaque-histogram (no JDK video codec)
    "mm1_media_features" -> rowsOnly(
      (s, d) => {
        val media = graft.multimodal.Multimodal.synthesizeFromDocuments(
          Tables.documents(s, d))
        graft.multimodal.Multimodal.extractFeatures(media)
          .toDF()
          .select(col("id"), col("modality"), col("kind"), col("n_bytes"),
            round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
            round(element_at(col("features"), 2).cast("double"), 4).as("f1"))
          .orderBy("id")
      }),

    // ---- real image resize (decode -> nearest-neighbor -> PNG re-encode
    //      in mapPartitions; binary never shuffles). MultimodalSpec pins
    //      pixel-exact dims and colors.
    "mm2_media_resize" -> rowsOnly(
      (s, d) => {
        val media = graft.multimodal.Multimodal.synthesizeFromDocuments(
          Tables.documents(s, d))
        graft.multimodal.Multimodal.resizeImages(media, maxEdge = 8)
          .toDF()
          .select("id", "src_width", "src_height",
            "target_width", "target_height", "n_bytes")
          .orderBy("id")
      }),

    // ---- real video container metadata: pure-JDK MP4/ISO-BMFF box walk
    //      (moov/mvhd timescale+duration, trak count, hdlr types) over
    //      real generated MP4 bytes, plus frame-sample timestamps derived
    //      from the PARSED duration (goldens in MultimodalSpec)
    "mm4_video_meta" -> rowsOnly(
      (s, d) => {
        val media = graft.multimodal.Multimodal.synthesizeFromDocuments(
          Tables.documents(s, d))
        val meta = graft.multimodal.Multimodal.videoMeta(media).toDF()
        val frames = graft.multimodal.Multimodal.frameSampleTimestamps(media, n = 4)
          .groupBy("id").agg(count(lit(1)).as("n_frames"),
            max("frame_ms").as("last_frame_ms"))
        meta.join(frames, Seq("id"))
          .select("id", "timescale", "duration_ms", "n_tracks",
            "has_video", "has_audio", "n_frames", "last_frame_ms")
          .orderBy("id")
      }),

    // ---- real audio frame sampling (per-segment PCM16 RMS)
    "mm3_audio_segments" -> rowsOnly(
      (s, d) => {
        val media = graft.multimodal.Multimodal.synthesizeFromDocuments(
          Tables.documents(s, d))
        graft.multimodal.Multimodal.audioSegments(media, nSegments = 4)
          .toDF()
          .select(col("id"), col("n_segments"),
            round(element_at(col("segment_rms"), 1).cast("double"), 4).as("rms0"),
            round(element_at(col("segment_rms"), 4).cast("double"), 4).as("rms3"))
          .orderBy("id")
      }),

    // ---- image near-dup via perceptual hash: resized/re-encoded copies
    //      of one image (different bytes, different dimensions) collapse
    //      to the same 64-bit aHash, then grouping is ordinary relational
    //      work on 8 bytes/image — the image-dedup analogue of m2's text
    //      simhash, sharing its Hamming machinery (nearPairsOnSig) for the
    //      near-miss radius. Exactness pinned in PhashSpec against
    //      independently-computed expected bit patterns.
    "mm5_image_phash" -> rowsOnly(
      (s, d) => {
        val imgs = graft.multimodal.Multimodal.synthesizeImageVariants(
          Tables.documents(s, d))
        val ph = graft.multimodal.Multimodal.imagePhash(imgs).toDF()
        val groups = ph.groupBy("phash")
          .agg(min("id").as("group_rep"), count(lit(1)).as("n_members"))
        ph.join(groups, Seq("phash"))
          .select("id", "phash", "group_rep", "n_members")
          .orderBy("id")
      }),

    // ---- video near-dup via REAL frame pixels: MJPEG samples located by
    //      the parsed stsd/stsz/stsc/stco tables, each frame JPEG-decoded
    //      and perceptual-hashed, per-bit majority vote collapsing a video
    //      to one 64-bit signature — so re-encoded/resized copies of the
    //      same footage group relationally on 8 bytes/video, closing the
    //      frame-pixel boundary mm4 left (the JDK decodes JPEG; H.264
    //      stays honestly out). Goldens: hand-assembled MJPEG fixtures in
    //      MultimodalSpec (the writer doesn't grade its own homework).
    "mm6_video_phash" -> rowsOnly(
      (s, d) => {
        val vids = graft.multimodal.Multimodal.synthesizeMjpegVariants(
          Tables.documents(s, d))
        val ph = graft.multimodal.Multimodal.videoFramePhashes(vids).toDF()
        val groups = ph.groupBy("video_phash")
          .agg(min("id").as("group_rep"), count(lit(1)).as("n_members"))
        ph.join(groups, Seq("video_phash"))
          .select("id", "n_frames", "video_phash", "group_rep", "n_members")
          .orderBy("id")
      }),

    // ---- SemDeDup (Abbas et al. 2023): k-means the embedding space, then
    //      prune cosine-near-duplicates WITHIN each cluster — the
    //      clustering bounds the quadratic step, which is the whole
    //      scaling argument. Exact cross-engine: quantized-integer
    //      vectors, fixed-seed fixed-iteration Lloyd (ties -> smallest
    //      cluster), and the cosine threshold as an integer cross-multiply
    //      (25·dot² >= 4·|a|²·|b|² <=> cos >= 0.4), so the oracle
    //      below replays the identical algorithm in SQL — both Lloyd
    //      rounds unrolled as long-format centroid CTEs. (The paper's
    //      CLIP-space 0.95 finds nothing in the synthetic embeddings —
    //      max pairwise cos is 0.51 — so the registered threshold is 0.4
    //      to keep the pruning path non-trivially exercised; the operator
    //      default stays at the published 0.95.)
    "sem1_semdedup" -> withOracle(
      (s, d) =>
        graft.sim.SemDedup.dedup(Tables.embeddings(s, d), k = 10, iters = 2,
            thrNum = 4L, thrDen = 25L)
          .orderBy("vec_id"),
      """WITH q AS (
        |  SELECT vec_id,
        |         list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
        |  FROM embeddings),
        |dims AS (SELECT CAST(i AS INTEGER) AS i FROM range(1, 65) t(i)),
        |seed AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cl, qv
        |  FROM q ORDER BY vec_id LIMIT 10),
        |c0 AS (SELECT cl, i, list_extract(qv, i) AS m FROM seed, dims),
        |d0 AS (
        |  SELECT v.vec_id, c.cl,
        |         CAST(sum((list_extract(v.qv, c.i) - c.m)
        |                * (list_extract(v.qv, c.i) - c.m)) AS BIGINT) AS dist
        |  FROM q v CROSS JOIN c0 c GROUP BY v.vec_id, c.cl),
        |a0 AS (
        |  SELECT vec_id, cl FROM (
        |    SELECT vec_id, cl,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
        |    FROM d0) WHERE rn = 1),
        |m1 AS (
        |  SELECT a.cl, d.i,
        |         CAST(floor(CAST(sum(list_extract(v.qv, d.i)) AS DOUBLE)
        |                    / count(*) + 0.5) AS BIGINT) AS m
        |  FROM a0 a JOIN q v USING (vec_id) CROSS JOIN dims d
        |  GROUP BY a.cl, d.i),
        |c1 AS (
        |  SELECT c0.cl, c0.i, COALESCE(m1.m, c0.m) AS m
        |  FROM c0 LEFT JOIN m1 ON m1.cl = c0.cl AND m1.i = c0.i),
        |d1 AS (
        |  SELECT v.vec_id, c.cl,
        |         CAST(sum((list_extract(v.qv, c.i) - c.m)
        |                * (list_extract(v.qv, c.i) - c.m)) AS BIGINT) AS dist
        |  FROM q v CROSS JOIN c1 c GROUP BY v.vec_id, c.cl),
        |a1 AS (
        |  SELECT vec_id, cl FROM (
        |    SELECT vec_id, cl,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
        |    FROM d1) WHERE rn = 1),
        |m2 AS (
        |  SELECT a.cl, d.i,
        |         CAST(floor(CAST(sum(list_extract(v.qv, d.i)) AS DOUBLE)
        |                    / count(*) + 0.5) AS BIGINT) AS m
        |  FROM a1 a JOIN q v USING (vec_id) CROSS JOIN dims d
        |  GROUP BY a.cl, d.i),
        |c2 AS (
        |  SELECT c1.cl, c1.i, COALESCE(m2.m, c1.m) AS m
        |  FROM c1 LEFT JOIN m2 ON m2.cl = c1.cl AND m2.i = c1.i),
        |d2 AS (
        |  SELECT v.vec_id, c.cl,
        |         CAST(sum((list_extract(v.qv, c.i) - c.m)
        |                * (list_extract(v.qv, c.i) - c.m)) AS BIGINT) AS dist
        |  FROM q v CROSS JOIN c2 c GROUP BY v.vec_id, c.cl),
        |a2 AS (
        |  SELECT vec_id, cl FROM (
        |    SELECT vec_id, cl,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
        |    FROM d2) WHERE rn = 1),
        |av AS (
        |  SELECT a2.vec_id, a2.cl, q.qv,
        |         CAST(list_sum(list_transform(q.qv, x -> x * x)) AS BIGINT) AS n2
        |  FROM a2 JOIN q USING (vec_id)),
        |pd AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.n2 AS na, b.n2 AS nb,
        |         CAST(list_sum(list_transform(range(1, 65),
        |           i -> list_extract(a.qv, i) * list_extract(b.qv, i))) AS BIGINT) AS dot
        |  FROM av a JOIN av b ON a.cl = b.cl AND a.vec_id < b.vec_id),
        |dups AS (
        |  SELECT DISTINCT id_b AS vec_id FROM pd
        |  WHERE dot >= 0 AND 25 * dot * dot >= 4 * na * nb)
        |SELECT a2.vec_id, CAST(a2.cl AS BIGINT) AS cluster,
        |       CAST(CASE WHEN du.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM a2 LEFT JOIN dups du USING (vec_id)
        |ORDER BY a2.vec_id""".stripMargin),

    // ---- EXACT Jaccard-threshold set-similarity self-join via AllPairs
    //      prefix filtering (dedup.SetSimJoin): every pair at J >= 0.9,
    //      found WITHOUT the all-pairs cartesian the oracle runs —
    //      rarest-first prefixes bound the candidate join, the verify is
    //      exact, and all threshold math is integer. The one exact-join
    //      member of the near-dup family (m1/m2 are probabilistic), so it
    //      is fully oracle-checkable.
    "j14_setsim_join" -> withOracle(
      // materialize before the output sort: the global orderBy's range
      // sampler would otherwise re-execute the whole candidate+verify
      // pipeline a second time (measured 10.7 s -> 4.5 s isolated min at
      // sf0.1; the pair table is small next to the work that built it)
      (s, d) => SetSimJoin
        .selfJoin(Tables.documents(s, d), "doc_id", "text", num = 9, den = 10)
        .localCheckpoint()
        .orderBy("id_a", "id_b"),
      """WITH s AS (
        |  SELECT doc_id,
        |         list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS ts
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS inter,
        |         CAST(len(list_distinct(list_concat(a.ts, b.ts))) AS BIGINT) AS uni
        |  FROM s a JOIN s b ON b.doc_id > a.doc_id)
        |SELECT id_a, id_b, inter, uni, CAST(inter AS DOUBLE) / uni AS jaccard
        |FROM p WHERE inter * 10 >= uni * 9
        |ORDER BY id_a, id_b""".stripMargin),

    // ---- exact near-dup CLUSTERS: j14's exact-Jaccard pair graph closed
    //      into connected components, with the keep-smallest-id canonical
    //      flag — the full exact-dedup pipeline (pair -> group -> keep) as
    //      one query, every stage oracle-checkable (unlike m1's LSH path
    //      the pair graph itself is exact). Pairs are materialized once:
    //      componentGroups iterates over them, and re-deriving the join
    //      per iteration would multiply its cost.
    "d5_setsim_groups" -> withOracle(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = SetSimJoin
          .selfJoin(docs, "doc_id", "text", num = 9, den = 10)
          .select("id_a", "id_b").localCheckpoint()
        val g = MinHashDedup.componentGroups(docs, pairs, "doc_id")
        val w = org.apache.spark.sql.expressions.Window.partitionBy("group_id")
        g.withColumn("group_size", count(lit(1)).over(w))
          .withColumn("kept", (col("doc_id") === col("group_id")).cast("long"))
          .select("doc_id", "group_id", "group_size", "kept")
          .orderBy("doc_id")
      },
      """WITH RECURSIVE s AS (
        |  SELECT doc_id,
        |         list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS ts
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM s a JOIN s b ON b.doc_id > a.doc_id
        |  WHERE len(list_intersect(a.ts, b.ts)) * 10 >=
        |        len(list_distinct(list_concat(a.ts, b.ts))) * 9),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (SELECT src AS doc_id, min(dst) AS min_reach FROM reach GROUP BY src),
        |lab AS (
        |  SELECT d.doc_id,
        |         COALESCE(least(l.min_reach, d.doc_id), d.doc_id) AS group_id
        |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)
        |SELECT doc_id, CAST(group_id AS BIGINT) AS group_id,
        |       CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size,
        |       CAST(CASE WHEN doc_id = group_id THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM lab ORDER BY doc_id""".stripMargin),

    // ---- the EXACT twin of m1's LSH path: the same 3-shingle Jaccard-0.7
    //      pair semantics MinHashDedup verifies, but found by prefix
    //      filtering instead of banding — zero recall loss by
    //      construction, still no all-pairs. Registered so the two paths
    //      are cross-checkable query-to-query (SetSimJoinSpec pins
    //      LSH-verified pairs as a subset of these and measures banding
    //      recall against this exact truth).
    "j16_shingle_setsim" -> withOracle(
      (s, d) => {
        val sh = MinHashDedup.shingleSets(Tables.documents(s, d), "doc_id", "text", 3)
        val sets = sh.select(col("doc_id").as("id"), array_sort(col("sh")).as("ts"))
          .withColumn("sz", size(col("ts")).cast("long"))
        SetSimJoin.selfJoinOnSets(sets, num = 7, den = 10)
          .orderBy("id_a", "id_b")
      },
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_filter(
        |    list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |      i -> array_to_string(t[i:least(i + 2, len(t))], ' ')),
        |    s -> s <> '')) AS sh
        |  FROM toks),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
        |         CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS uni
        |  FROM sh a JOIN sh b ON b.doc_id > a.doc_id)
        |SELECT id_a, id_b, inter, uni, CAST(inter AS DOUBLE) / uni AS jaccard
        |FROM p WHERE inter * 10 >= uni * 7
        |ORDER BY id_a, id_b""".stripMargin),

    // ---- the incremental-ingest shape of j14: a newly landed batch
    //      (source src1) exact-Jaccard-joined against the existing corpus
    //      only — pair generation touches batch-prefix x corpus-prefix,
    //      never corpus x corpus, which is what a daily 100 TB ingest
    //      actually runs. Prefixes on both sides share ONE global token
    //      order (combined document frequencies) so the prefix theorem
    //      holds across the split.
    "j15_setsim_incremental" -> withOracle(
      (s, d) => {
        val docs = Tables.documents(s, d)
        SetSimJoin.joinBetween(
            docs.filter(col("source") =!= "src1"),
            docs.filter(col("source") === "src1"),
            "doc_id", "text", num = 9, den = 10)
          .localCheckpoint() // j14's sampler-re-execution note applies
          .orderBy("id_a", "id_b")
      },
      """WITH s AS (
        |  SELECT doc_id, source,
        |         list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS ts
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS inter,
        |         CAST(len(list_distinct(list_concat(a.ts, b.ts))) AS BIGINT) AS uni
        |  FROM s a JOIN s b ON a.source <> 'src1' AND b.source = 'src1')
        |SELECT id_a, id_b, inter, uni, CAST(inter AS DOUBLE) / uni AS jaccard
        |FROM p WHERE inter * 10 >= uni * 9
        |ORDER BY id_a, id_b""".stripMargin)
  )
}
