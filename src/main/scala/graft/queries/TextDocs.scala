package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Dedup
import Registry._

/** Training-data-pipeline text/document operators over `documents.parquet`
  * and brute-force similarity over `embeddings.parquet` (builder brief:
  * dedup / text analysis / similarity as first-class components).
  *
  * Everything here is expression-only (no UDFs) so it rides whole-stage
  * codegen; per-document work is embarrassingly parallel — at 100 TB these
  * are pure scan-shaped jobs.
  */
object TextDocs {

  private def toks(text: Column): Column = split(trim(text), "\\s+")

  private val stopwords = Seq("the", "a", "of", "and", "to")

  val defs: Seq[(String, Entry)] = Seq(

    // ---- exact dedup on a key subset, deterministic keep-first
    "d1_dedup_docs" -> withOracle(
      (s, d) =>
        Dedup.keepFirst(Seq("lang", "source"), Seq(col("doc_id")))(Tables.documents(s, d))
          .select("doc_id", "lang", "source")
          .orderBy("lang", "source"),
      """SELECT doc_id, lang, source
        |FROM (SELECT *, row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        |      FROM documents)
        |WHERE rn = 1 ORDER BY lang, source""".stripMargin),

    // ---- token counting (whitespace tokenizer)
    "t1_token_stats" -> withOracle(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), size(toks(col("text"))).as("n_tokens"), col("n_chars"))
          .orderBy("doc_id"),
      """SELECT doc_id,
        |       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        |       n_chars
        |FROM documents ORDER BY doc_id""".stripMargin),

    // ---- quality scoring: length / punctuation / stopword ratios
    "t2_quality" -> withOracle(
      (s, d) => {
        val t = toks(col("text"))
        val sumLen = aggregate(transform(t, x => length(x)), lit(0), (a, x) => a + x)
        val nStop = size(filter(t, x => x.isin(stopwords: _*)))
        Tables.documents(s, d)
          .select(col("doc_id"),
            size(t).as("n_tokens"),
            round(sumLen.cast("double") / size(t), 3).as("avg_tok_len"),
            round(nStop.cast("double") / size(t), 3).as("stop_ratio"),
            round(length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("double") /
                  length(col("text")), 4).as("punct_ratio"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |       CAST(len(t) AS INTEGER) AS n_tokens,
        |       round(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t), 3) AS avg_tok_len,
        |       round(CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to'))) AS DOUBLE) / len(t), 3) AS stop_ratio,
        |       round(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text), 4) AS punct_ratio
        |FROM (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS t
        |      FROM documents) ORDER BY doc_id""".stripMargin),

    // ---- language-ID: marker-token n-gram heuristic with deterministic
    //      argmax (synthetic corpus => synthetic marker sets)
    "t3_lang_guess" -> withOracle(
      (s, d) => {
        val t = toks(col("text"))
        def score(ws: Seq[String]) = size(filter(t, x => x.isin(ws: _*)))
        Tables.documents(s, d)
          .withColumn("c_en", score(Seq("the", "a")))
          .withColumn("c_es", score(Seq("data", "query")))
          .withColumn("c_zh", score(Seq("spark", "hash")))
          .select(col("doc_id"), col("lang"),
            when(col("c_en") >= col("c_es") && col("c_en") >= col("c_zh"), "en")
              .when(col("c_es") >= col("c_zh"), "es")
              .otherwise("zh").as("lang_guess"))
          .orderBy("doc_id")
      },
      """SELECT doc_id, lang,
        |       CASE WHEN c_en >= c_es AND c_en >= c_zh THEN 'en'
        |            WHEN c_es >= c_zh THEN 'es' ELSE 'zh' END AS lang_guess
        |FROM (SELECT doc_id, lang,
        |             len(list_filter(t, x -> x IN ('the','a')))      AS c_en,
        |             len(list_filter(t, x -> x IN ('data','query'))) AS c_es,
        |             len(list_filter(t, x -> x IN ('spark','hash'))) AS c_zh
        |      FROM (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS t
        |            FROM documents)) ORDER BY doc_id""".stripMargin),

    // ---- document fingerprinting: 31-base polynomial rolling hash mod
    //      1e9+7 over codepoints (order-sensitive, collision-cheap)
    "t4_fingerprint" -> withOracle(
      (s, d) => {
        val chars = filter(split(col("text"), ""), c => c =!= "")
        val codes = transform(chars, c => ascii(c).cast("long"))
        val fp = aggregate(codes, lit(0L), (h, c) => pmod(h * 31 + c, lit(1000000007L)))
        Tables.documents(s, d)
          .select(col("doc_id"), fp.as("fingerprint"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |                   list_transform(string_split(text, ''), x -> CAST(ord(x) AS BIGINT))),
        |                   (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin),

    // ---- TF-IDF-style relevance score for a fixed query term set. The
    //      idf factor is kept as the raw N/df ratio (not log) so both
    //      engines compute bit-identical doubles; the score expression is
    //      written in the same operation order on both sides. Corpus stats
    //      (N, df) fold in via crossJoin(broadcast(one-row agg)) — a single
    //      plan, no driver-side counts, so scoring stays one job at any
    //      corpus size.
    "t6_tfidf" -> withOracle(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val t = toks(col("text"))
        def tf(term: String) = size(filter(t, x => x === term)).cast("double")
        def df(term: String) =
          sum(when(array_contains(t, term), 1L).otherwise(0L)).cast("double")
        val stats = docs.agg(count(lit(1)).cast("double").as("n"),
          df("data").as("df_data"), df("query").as("df_query"))
        docs.crossJoin(broadcast(stats))
          .select(col("doc_id"),
            (tf("data") * (col("n") / col("df_data")) +
             tf("query") * (col("n") / col("df_query"))).as("score"))
          .orderBy("doc_id")
      },
      """WITH stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |         CAST(count(*) FILTER (WHERE list_contains(regexp_split_to_array(trim(text), '\s+'), 'data')) AS DOUBLE) AS df_data,
        |         CAST(count(*) FILTER (WHERE list_contains(regexp_split_to_array(trim(text), '\s+'), 'query')) AS DOUBLE) AS df_query
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(len(list_filter(t, x -> x = 'data')) AS DOUBLE) * (n / df_data)
        |     + CAST(len(list_filter(t, x -> x = 'query')) AS DOUBLE) * (n / df_query) AS score
        |FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents), stats
        |ORDER BY doc_id""".stripMargin),

    // ---- BM25 scoring. Oracle-checked on RAW doubles: every input to the
    //      score is exact integer math except idf, which Bm25 quantizes to
    //      a 1e-7 grid precisely so engine libm differences (Math.log vs
    //      DuckDB ln: observed 3 ulps apart) cannot reach the output. The
    //      SQL mirrors Bm25.score's operation order term by term.
    "t7_bm25" -> withOracle(
      (s, d) =>
        graft.text.Bm25.score(Tables.documents(s, d), "doc_id", "text",
            terms = Seq("data", "query", "spark"))
          .select(col("doc_id"), col("bm25"))
          .orderBy("doc_id"),
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents
        |), stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, avg(len(t)) AS avgdl,
        |         CAST(sum(CASE WHEN list_contains(t, 'data')  THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |         CAST(sum(CASE WHEN list_contains(t, 'query') THEN 1 ELSE 0 END) AS BIGINT) AS df2,
        |         CAST(sum(CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END) AS BIGINT) AS df3
        |  FROM toks
        |), idf AS (
        |  SELECT avgdl,
        |    floor(greatest(0.0, ln((CAST(n - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5) + 1.0)) * 10000000.0 + 0.5) / 10000000.0 AS idf1,
        |    floor(greatest(0.0, ln((CAST(n - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5) + 1.0)) * 10000000.0 + 0.5) / 10000000.0 AS idf2,
        |    floor(greatest(0.0, ln((CAST(n - df3 AS DOUBLE) + 0.5) / (CAST(df3 AS DOUBLE) + 0.5) + 1.0)) * 10000000.0 + 0.5) / 10000000.0 AS idf3
        |  FROM stats
        |), tf AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(t, x -> x = 'data'))  AS DOUBLE) AS tf1,
        |         CAST(len(list_filter(t, x -> x = 'query')) AS DOUBLE) AS tf2,
        |         CAST(len(list_filter(t, x -> x = 'spark')) AS DOUBLE) AS tf3,
        |         CAST(len(t) AS DOUBLE) AS dl
        |  FROM toks
        |)
        |SELECT doc_id,
        |  0.0 + idf1 * tf1 * (1.2 + 1) / (tf1 + 1.2 * ((1 - 0.75) + (0.75 * dl) / avgdl))
        |      + idf2 * tf2 * (1.2 + 1) / (tf2 + 1.2 * ((1 - 0.75) + (0.75 * dl) / avgdl))
        |      + idf3 * tf3 * (1.2 + 1) / (tf3 + 1.2 * ((1 - 0.75) + (0.75 * dl) / avgdl)) AS bm25
        |FROM tf, idf ORDER BY doc_id""".stripMargin),

    // ---- BM25 top-k RETRIEVAL via an inverted index: the search-engine
    //      shape (query terms -> postings -> score only matching docs ->
    //      top-k), not t7's score-every-document shape. Scale-honest: the
    //      tiny term set broadcasts, postings materialize ONLY for queried
    //      terms (the filter rides the explode, so shuffle volume is
    //      O(matching postings), not O(corpus tokens)), df/avgdl fold in as
    //      one-row broadcasts, and the final top-k is a per-query-key window
    //      over candidate docs. Float parity: idf is quantized to the 1e-7
    //      grid (t7's trick — ln is the only transcendental), every other
    //      input is exact integer math, and each term's contribution is
    //      floored to integer 1e-6 units BEFORE the per-(query,doc) sum, so
    //      the sum is aggregation-order-immune and the gate checks the
    //      ranking hash-exactly. Reference has no retrieval operator at all
    //      (ref: transform/aggregations.py scores columns in-frame).
    "t16_bm25_topk" -> withOracle(
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val qterms = Seq(
          (1, "data"), (1, "query"), (2, "spark"), (2, "hash"),
          (3, "the"), (3, "data"), (4, "query"), (4, "spark"), (4, "hash"))
          .toDF("query_id", "term")
        val t = split(lower(trim(col("text"))), "\\s+")
        val tok = docs
          .select(col("doc_id"), size(t).as("dl"), explode(t).as("token"))
          .filter(col("token") =!= "")
        val post = tok
          .join(broadcast(qterms.select("term").distinct()),
            tok("token") === col("term"))
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
            floor(col("idf") * col("tf").cast("double") * lit(1.2 + 1)
              / (col("tf").cast("double") +
                 lit(1.2) * (lit(1 - 0.75) + (lit(0.75) * col("dl").cast("double")) / col("avgdl")))
              * lit(1000000.0) + lit(0.5)).cast("long").as("units"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score_u").desc, col("doc_id"))
        broadcast(qterms).join(contrib, qterms("term") === contrib("token"))
          .groupBy(col("query_id"), col("doc_id"))
          .agg(sum("units").as("score_u"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select("query_id", "rk", "doc_id", "score_u")
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
        |ranked AS (
        |  SELECT query_id, doc_id, score_u,
        |         row_number() OVER (PARTITION BY query_id ORDER BY score_u DESC, doc_id) AS rk
        |  FROM (SELECT q.query_id, c.doc_id, CAST(sum(c.units) AS BIGINT) AS score_u
        |        FROM q JOIN contrib c ON c.token = q.term
        |        GROUP BY q.query_id, c.doc_id))
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, doc_id, score_u
        |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin),

    // ---- brute-force cosine top-k: the exact baseline for ANN. Queries are
    //      broadcast; the corpus streams — linear in corpus size, no
    //      all-pairs shuffle.
    "e1_knn_brute" -> withOracle(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val dot   = aggregate(zip_with(col("q_emb"), col("embedding"),
                      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, v) => a + v)
        val normQ = sqrt(aggregate(transform(col("q_emb"),
                      x => x.cast("double") * x.cast("double")), lit(0.0), (a, v) => a + v))
        val normC = sqrt(aggregate(transform(col("embedding"),
                      x => x.cast("double") * x.cast("double")), lit(0.0), (a, v) => a + v))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id"))
        emb.join(broadcast(q), col("q_id") =!= col("vec_id"))
          .withColumn("cos", dot / (normQ * normC))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
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
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
        |) WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin),

    // ---- Unicode NFC normalization (graft.functions.NfcNormalize — a
    //      codegen'd Catalyst expression, not a UDF): "e"+COMBINING ACUTE
    //      and precomposed "é" must hash/dedup/join identically, the
    //      standard corpus canonicalization step. The corpus text is
    //      ASCII, so the query synthesizes decomposed suffixes (the x7
    //      raw-input pattern); character counts shrink under composition
    //      and both engines count codepoints.
    "t20_nfc_normalize" -> withOracle(
      (s, d) => {
        val decomposed = concat(lower(col("n_name")), lit("éÅ"))
        Tables.nation(s, d).select(col("n_nationkey"),
            graft.functions.functions.nfc_normalize(decomposed).as("norm"),
            length(decomposed).as("len_raw"),
            length(graft.functions.functions.nfc_normalize(decomposed)).as("len_norm"))
          .orderBy("n_nationkey")
      },
      """SELECT n_nationkey,
        |       nfc_normalize(lower(n_name) || 'e' || chr(769) || 'A' || chr(778)) AS norm,
        |       CAST(length(lower(n_name) || 'e' || chr(769) || 'A' || chr(778)) AS INTEGER) AS len_raw,
        |       CAST(length(nfc_normalize(lower(n_name) || 'e' || chr(769) || 'A' || chr(778))) AS INTEGER)
        |         AS len_norm
        |FROM nation ORDER BY n_nationkey""".stripMargin)
  )
}
