package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import Registry._

/** Learned-signal queries: hybrid retrieval fusion and a trained
  * classifier — the "model-shaped" corpus operations an LLM data pipeline
  * runs after the purely rule-based filters (SURVEY.md §2 extension brief:
  * quality scoring / language ID as first-class components).
  *
  * Everything here follows the engine's cross-engine-exactness discipline:
  * transcendentals are quantized to integer micro-nat units at the last
  * possible moment (the t14/t16 pattern), ranks and ratios are integer
  * division — so even a trained classifier's per-document predictions are
  * hash-exact against the DuckDB oracle.
  */
object Learn {

  private val k1 = 1.2
  private val b = 0.75

  val defs: Seq[(String, Entry)] = Seq(

    // ---- reciprocal-rank fusion of two retrieval channels: BM25 top-20
    //      (t16's scorer) fused with token-set Jaccard top-20 per query,
    //      RRF units floor(1e9/(60+rank)) summed across channels —
    //      all-integer, so the fused ranking is deterministic and
    //      hash-exact. This is the hybrid-search shape (lexical +
    //      set-overlap channel; swap the second channel for e1's cosine
    //      kNN when the corpus has embeddings — same fusion plan).
    //      Scale: both channels are broadcast-query joins over postings —
    //      the corpus streams once per channel, ranks are per-query
    //      windows over candidate sets (bounded by matched docs), and the
    //      fusion join touches 2*20 rows per query.
    "rrf1_hybrid" -> withOracle(
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val qterms = Seq(
          (1, "data"), (1, "query"), (2, "spark"), (2, "hash"),
          (3, "the"), (3, "data"), (4, "query"), (4, "spark"), (4, "hash"))
          .toDF("query_id", "term")
        val t = split(lower(trim(col("text"))), "\\s+")
        // NOT materialized, deliberately: both channels consume this
        // token table, but an eager localCheckpoint of the exploded rows
        // measured 3.0 -> 4.1 s (interleaved min-of-3) — caching 270k
        // exploded rows costs more than re-tokenizing a 5 000-doc scan
        // per channel, and at corpus scale the explode is the cheap part
        // of each channel's own aggregation pass anyway
        val tok = docs
          .select(col("doc_id"), size(t).as("dl"), explode(t).as("token"))
          .filter(col("token") =!= "")

        // channel 1: BM25 (identical scorer to t16, top-20)
        val post = tok
          .join(broadcast(qterms.select("term").distinct()), tok("token") === col("term"))
          .groupBy(col("token"), col("doc_id"), col("dl"))
          .agg(count(lit(1)).as("tf"))
        val stats = docs.agg(count(lit(1)).as("n"), avg(size(t)).as("avgdl"))
        val idf = post.groupBy("token").agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(stats))
          .select(col("token"),
            (floor(greatest(lit(0.0),
              log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
              * lit(10000000.0) + lit(0.5)) / lit(10000000.0)).as("idf"),
            col("avgdl"))
        val contrib = post.join(broadcast(idf), "token")
          .select(col("token"), col("doc_id"),
            floor(col("idf") * col("tf").cast("double") * lit(k1 + 1)
              / (col("tf").cast("double") +
                 lit(k1) * (lit(1 - b) + (lit(b) * col("dl").cast("double")) / col("avgdl")))
              * lit(1000000.0) + lit(0.5)).cast("long").as("units"))
        val wq = Window.partitionBy(col("query_id"))
        val bm = broadcast(qterms).join(contrib, qterms("term") === contrib("token"))
          .groupBy(col("query_id"), col("doc_id"))
          .agg(sum("units").as("score_u"))
          .withColumn("rk_bm",
            row_number().over(wq.orderBy(col("score_u").desc, col("doc_id"))))
          .filter(col("rk_bm") <= 20)
          .select("query_id", "doc_id", "rk_bm")

        // channel 2: token-set Jaccard (integer parts-per-billion)
        val dtok = tok.select("doc_id", "token").distinct()
        val nd = dtok.groupBy("doc_id").agg(count(lit(1)).as("ndoc"))
        val nq = qterms.groupBy("query_id").agg(countDistinct("term").as("nq"))
        val inter = dtok
          .join(broadcast(qterms.select("query_id", "term").distinct()),
            dtok("token") === col("term"))
          .groupBy("query_id", "doc_id").agg(count(lit(1)).as("inter"))
        val jc = inter.join(nd, "doc_id").join(broadcast(nq), "query_id")
          .withColumn("jac_ppb", expr("(inter * 1000000000L) div (ndoc + nq - inter)"))
          .withColumn("rk_jc",
            row_number().over(wq.orderBy(col("jac_ppb").desc, col("doc_id"))))
          .filter(col("rk_jc") <= 20)
          .select("query_id", "doc_id", "rk_jc")

        // fusion: RRF units are integer floor-divisions, absent channel = 0
        val fused = bm.join(jc, Seq("query_id", "doc_id"), "full_outer")
          .select(col("query_id"), col("doc_id"),
            (coalesce(expr("1000000000L div (60L + rk_bm)"), lit(0L)) +
             coalesce(expr("1000000000L div (60L + rk_jc)"), lit(0L))).as("rrf_u"))
        fused
          .withColumn("rk", row_number().over(wq.orderBy(col("rrf_u").desc, col("doc_id"))))
          .filter(col("rk") <= 10)
          .select("query_id", "rk", "doc_id", "rrf_u")
          .orderBy("query_id", "rk")
      },
      """WITH q(query_id, term) AS (VALUES (1,'data'),(1,'query'),(2,'spark'),(2,'hash'),
        |                                  (3,'the'),(3,'data'),(4,'query'),(4,'spark'),(4,'hash')),
        |tok AS (
        |  SELECT doc_id, len(t) AS dl, unnest(t) AS token
        |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents)),
        |post AS (
        |  SELECT token, doc_id, dl, count(*) AS tf
        |  FROM tok WHERE token <> '' AND token IN (SELECT DISTINCT term FROM q)
        |  GROUP BY token, doc_id, dl),
        |stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         avg(len(regexp_split_to_array(lower(trim(text)), '\s+'))) AS avgdl
        |  FROM documents),
        |idf AS (
        |  SELECT token,
        |         floor(greatest(0.0, ln((CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0))
        |               * 10000000.0 + 0.5) / 10000000.0 AS idf,
        |         avgdl
        |  FROM (SELECT token, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY token), stats),
        |contrib AS (
        |  SELECT p.token, p.doc_id,
        |         CAST(floor(i.idf * CAST(p.tf AS DOUBLE) * (1.2 + 1)
        |               / (CAST(p.tf AS DOUBLE) + 1.2 * ((1 - 0.75) + (0.75 * CAST(p.dl AS DOUBLE)) / i.avgdl))
        |               * 1000000.0 + 0.5) AS BIGINT) AS units
        |  FROM post p JOIN idf i USING (token)),
        |bm AS (
        |  SELECT query_id, doc_id, rk_bm FROM (
        |    SELECT query_id, doc_id,
        |           row_number() OVER (PARTITION BY query_id ORDER BY score_u DESC, doc_id) AS rk_bm
        |    FROM (SELECT q.query_id, c.doc_id, CAST(sum(c.units) AS BIGINT) AS score_u
        |          FROM q JOIN contrib c ON c.token = q.term
        |          GROUP BY q.query_id, c.doc_id))
        |  WHERE rk_bm <= 20),
        |dtok AS (SELECT DISTINCT doc_id, token FROM tok),
        |nd AS (SELECT doc_id, count(*) AS ndoc FROM dtok GROUP BY 1),
        |nq AS (SELECT query_id, count(DISTINCT term) AS nq FROM q GROUP BY 1),
        |inter AS (
        |  SELECT qt.query_id, d.doc_id, count(*) AS inter
        |  FROM (SELECT DISTINCT query_id, term FROM q) qt JOIN dtok d ON qt.term = d.token
        |  GROUP BY 1, 2),
        |jc AS (
        |  SELECT query_id, doc_id, rk_jc FROM (
        |    SELECT i.query_id, i.doc_id,
        |           row_number() OVER (PARTITION BY i.query_id
        |               ORDER BY (i.inter * 1000000000) // (nd.ndoc + nq.nq - i.inter) DESC,
        |                        i.doc_id) AS rk_jc
        |    FROM inter i JOIN nd USING (doc_id) JOIN nq USING (query_id))
        |  WHERE rk_jc <= 20),
        |fused AS (
        |  SELECT COALESCE(b.query_id, j.query_id) AS query_id,
        |         COALESCE(b.doc_id, j.doc_id) AS doc_id,
        |         COALESCE(1000000000 // (60 + b.rk_bm), 0)
        |           + COALESCE(1000000000 // (60 + j.rk_jc), 0) AS rrf_u
        |  FROM bm b FULL OUTER JOIN jc j ON b.query_id = j.query_id AND b.doc_id = j.doc_id)
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, doc_id, CAST(rrf_u AS BIGINT) AS rrf_u
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |          ORDER BY rrf_u DESC, doc_id) AS rk FROM fused)
        |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin),

    // ---- multinomial Naive Bayes language classifier
    //      (graft.text.NaiveBayes): train on even doc_ids, score odd
    //      doc_ids, predict argmin negative log-likelihood — integer
    //      micro-nat quantization makes every per-doc prediction
    //      hash-exact against the oracle. NOTE the synthetic corpus's
    //      lang column is random metadata uncorrelated with the text, so
    //      accuracy here is at chance BY THE DATA'S CONSTRUCTION; the
    //      oracle pins the algebra's exactness, and NaiveBayesSpec pins
    //      that the same operator reaches ~1.0 accuracy on a corpus that
    //      actually carries class signal.
    "nb1_nb_classify" -> withOracle(
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.text.NaiveBayes.predict(
            docs.filter(col("doc_id") % 2 === 0),
            docs.filter(col("doc_id") % 2 === 1),
            "doc_id", "lang", "text")
          .orderBy("doc_id")
      },
      """WITH train AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
        |test AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
        |toktr AS (SELECT lang, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |          FROM train),
        |cnt AS (SELECT lang, token, count(*) AS c FROM toktr WHERE token <> '' GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM cnt GROUP BY 1),
        |vocab AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM cnt),
        |prior AS (SELECT lang, count(*) AS nd FROM train GROUP BY 1),
        |ntot AS (SELECT count(*) AS ntot FROM train),
        |cls AS (SELECT t.lang AS cand, t.tot, v,
        |               CAST(floor(-ln(CAST(nd AS DOUBLE) / ntot) * 10000000.0 + 0.5) AS BIGINT)
        |                 AS prior_q
        |        FROM tot t JOIN prior p ON t.lang = p.lang, vocab, ntot),
        |tokte AS (SELECT doc_id, lang AS actual,
        |                 unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |          FROM test),
        |qq AS (SELECT tt.doc_id, tt.actual, cls.cand,
        |              CAST(floor(-ln((CAST(COALESCE(c.c, 0) AS DOUBLE) + 1.0)
        |                             / (CAST(cls.tot AS DOUBLE) + CAST(cls.v AS DOUBLE) + 1.0))
        |                         * 10000000.0 + 0.5) AS BIGINT) AS q
        |       FROM (SELECT * FROM tokte WHERE token <> '') tt
        |       CROSS JOIN cls
        |       LEFT JOIN cnt c ON c.lang = cls.cand AND c.token = tt.token),
        |sc AS (SELECT doc_id, actual, cand, CAST(sum(q) AS BIGINT) AS ll_u
        |       FROM qq GROUP BY 1, 2, 3),
        |fin AS (SELECT doc_id, actual, sc.cand, ll_u + prior_q AS score_u
        |        FROM sc JOIN cls ON sc.cand = cls.cand)
        |SELECT doc_id, actual, cand AS predicted,
        |       CAST(CASE WHEN cand = actual THEN 1 ELSE 0 END AS INTEGER) AS hit
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |          ORDER BY score_u, cand) AS rk FROM fin)
        |WHERE rk = 1 ORDER BY doc_id""".stripMargin),

    // ---- contrastive negative sampling: k pseudo-random non-self
    //      partners per document via a deterministic hash ring over the
    //      doc_id rank — RNG-free (the smp1 discipline), so batches are
    //      reproducible across engines and runs. The global index comes
    //      from the two-pass distributed rank (Ranks.withGlobalRowNumber)
    //      — never a single-partition window; the partner lookup is one
    //      keyed self-join. offset ∈ [1, n-1] guarantees partner != self.
    "ne1_negative_pairs" -> withOracle(
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id")
        val (idx, n) = graft.ops.Ranks.withGlobalRowNumber(
          docs, Seq(col("doc_id")), "idx")
        val cand = idx
          .select(col("doc_id"), col("idx"),
            explode(sequence(lit(1L), lit(4L))).as("k"))
          .withColumn("nidx",
            lit(1L) + (col("idx") - lit(1L) +
              (lit(1L) + (col("idx") * lit(2654435761L) + col("k") * lit(40503L))
                % lit(n - 1))) % lit(n))
        cand.join(idx.select(col("idx").as("nidx"), col("doc_id").as("neg_doc_id")),
            "nidx")
          .select("doc_id", "k", "neg_doc_id")
          .orderBy("doc_id", "k")
      },
      """WITH idx AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS idx
        |             FROM documents),
        |n AS (SELECT count(*) AS n FROM documents),
        |cand AS (
        |  SELECT doc_id, idx, k,
        |         1 + ((idx - 1 + (1 + (idx * 2654435761 + k * 40503) % (n - 1))) % n)
        |           AS nidx
        |  FROM idx, n, (SELECT unnest(generate_series(1, 4)) AS k))
        |SELECT c.doc_id, CAST(c.k AS BIGINT) AS k, i.doc_id AS neg_doc_id
        |FROM cand c JOIN idx i ON i.idx = c.nidx
        |ORDER BY c.doc_id, k""".stripMargin),

    // ---- curriculum interleave: order training docs easy-to-hard
    //      (n_chars as the difficulty proxy — swap in t14's perplexity on
    //      a real corpus) while round-robining across sources so no
    //      source floods any curriculum window. One per-source window +
    //      the output's range-partitioned sort — no global row_number.
    "cur1_interleave" -> withOracle(
      (s, d) => {
        val w = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("rn", row_number().over(w))
          .orderBy("rn", "source", "doc_id")
      },
      """SELECT doc_id, source, n_chars,
        |       CAST(row_number() OVER (PARTITION BY source
        |            ORDER BY n_chars, doc_id) AS INTEGER) AS rn
        |FROM documents ORDER BY rn, source, doc_id""".stripMargin),

    // ---- seeded epoch shuffle: the training-order permutation as a
    //      DETERMINISTIC function of (doc_id, epoch seed) — md5 rank, no
    //      RNG state (smp1's discipline), so every worker, restart, and
    //      engine derives the identical order for an epoch, and different
    //      epochs decorrelate. The "shuffle" is a range-partitioned sort
    //      on the hash — no single-partition stage.
    "trn1_epoch_shuffle" -> withOracle(
      (s, d) => {
        val epoch = 3
        val key = md5(concat_ws(":", lit(epoch.toString), col("doc_id").cast("string"))
          .cast("binary"))
        Tables.documents(s, d)
          .select(col("doc_id"), key.as("shuffle_key"))
          .orderBy("shuffle_key", "doc_id")
      },
      """SELECT doc_id, md5('3:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin)
  )
}
