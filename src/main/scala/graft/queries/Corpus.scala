package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Redact
import Registry._

/** Corpus-preparation operators a training-data pipeline needs beyond
  * dedup/similarity: repetition metrics, PII redaction, deterministic
  * sampling, sequence packing, benchmark decontamination, plus exact
  * percentiles and a range join on the relational side.
  *
  * Everything is expression-only and scan-shaped except where a shuffle is
  * semantically required (stratified window, packing window, decontam join);
  * the decontamination join broadcasts the benchmark side — at 100 TB the
  * corpus streams once, the benchmark n-gram set rides with the executors.
  */
object Corpus {

  private def toks(c: org.apache.spark.sql.Column) =
    split(lower(trim(c)), "\\s+")

  /** Deterministic rank key for hash sampling: md5 of the id's decimal
    * string (mirrors DuckDB's md5(CAST(id AS VARCHAR)) byte for byte).
    */
  private def md5Key(c: org.apache.spark.sql.Column) =
    md5(c.cast("string").cast("binary"))

  /** Codegen'd n-gram kernel (graft.functions.Ngrams). The composed
    * higher-order form was both interpreted and O(n^2) when the tokenizer
    * inlined into the lambda (measured 12 s vs 0.55 s on 5k docs); the
    * custom expression stays inside whole-stage codegen entirely.
    */
  private def ngrams(t: org.apache.spark.sql.Column, n: Int) =
    graft.functions.functions.ngrams(t, n)

  /** DSIR hashed-ngram importance weights (Xie et al. 2023), shared by
    * dsir1 (threshold keep) and dsir2 (budget cut): unigram+bigram
    * features md5-bucketed to 256, target = the src1 slice, raw = whole
    * corpus, per-bucket add-one log ratios quantized to integer micro-nats
    * so the per-doc sum is exact in any aggregation order. Returns
    * (doc_id, n_feats, weight). Bucket stats are 256-row broadcast
    * aggregates; the corpus streams once through the bigram window and
    * the bucket join.
    */
  private def dsirWeights(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
    val tok = docs.select(col("doc_id"), col("source"),
      posexplode(toks(col("text"))).as(Seq("pos", "token")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val uni = tok.select(col("doc_id"), col("source"), col("token").as("feat"))
    val bi = tok
      .withColumn("nxt", lead("token", 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), col("source"),
        concat_ws(" ", col("token"), col("nxt")).as("feat"))
    val feats = uni.unionByName(bi)
      .withColumn("bucket", substring(md5(col("feat")), 1, 2))
    val ct = feats.filter(col("source") === "src1")
      .groupBy("bucket").agg(count(lit(1)).as("ct"))
    val cr = feats.groupBy("bucket").agg(count(lit(1)).as("cr"))
    val nt = ct.agg(sum("ct").as("nt"))
    val nr = cr.agg(sum("cr").as("nr"))
    val score = cr.join(ct, Seq("bucket"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("bucket"),
        floor((log((coalesce(col("ct"), lit(0L)) + lit(1.0)) /
                   (col("nt") + lit(256))) -
               log((col("cr") + lit(1.0)) / (col("nr") + lit(256))))
          * lit(1e7) + lit(0.5)).cast("long").as("s"))
    feats.join(broadcast(score), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("s").as("weight"))
  }

  /** DuckDB restatement of [[dsirWeights]], ending in CTE `w`
    * (doc_id, n_feats, weight) — prefix for the dsir* oracles.
    */
  private val dsirWeightCtes: String =
    """WITH base AS (
      |  SELECT doc_id, source,
      |         regexp_split_to_array(lower(trim(text)), '\s+') AS t
      |  FROM documents),
      |ex AS (
      |  SELECT doc_id, source, t,
      |         unnest(range(1, len(t) + 1)) AS pos
      |  FROM base),
      |tok AS (
      |  SELECT doc_id, source, pos, list_extract(t, pos) AS token FROM ex),
      |bi AS (
      |  SELECT doc_id, source,
      |         token || ' ' || lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS feat
      |  FROM tok),
      |feats AS (
      |  SELECT doc_id, source, token AS feat, substr(md5(token), 1, 2) AS bucket
      |  FROM tok
      |  UNION ALL
      |  SELECT doc_id, source, feat, substr(md5(feat), 1, 2) AS bucket
      |  FROM bi WHERE feat IS NOT NULL),
      |ct AS (SELECT bucket, count(*) AS ct FROM feats WHERE source = 'src1' GROUP BY 1),
      |cr AS (SELECT bucket, count(*) AS cr FROM feats GROUP BY 1),
      |nt AS (SELECT CAST(sum(ct) AS BIGINT) AS nt FROM ct),
      |nr AS (SELECT CAST(sum(cr) AS BIGINT) AS nr FROM cr),
      |score AS (
      |  SELECT cr.bucket,
      |         CAST(floor((ln((COALESCE(ct.ct, 0) + 1.0) / (nt + 256))
      |                   - ln((cr.cr + 1.0) / (nr + 256))) * 10000000.0 + 0.5)
      |           AS BIGINT) AS s
      |  FROM cr LEFT JOIN ct USING (bucket), nt, nr),
      |w AS (
      |  SELECT f.doc_id,
      |         CAST(count(*) AS BIGINT) AS n_feats,
      |         CAST(sum(sc.s) AS BIGINT) AS weight
      |  FROM feats f JOIN score sc USING (bucket)
      |  GROUP BY f.doc_id)""".stripMargin

  val defs: Seq[(String, Entry)] = Seq(

    // ---- Gopher-style repetition metrics: duplicate-bigram fraction and
    //      most-frequent-token share. Ratios are integer/integer double
    //      divisions (bit-exact cross-engine), never rounded.
    "t8_repetition" -> withOracle(
      (s, d) => {
        val t = col("t")
        val bg = ngrams(t, 2)
        val topTok = array_max(transform(array_distinct(t),
          x => size(filter(t, y => y === x))))
        Tables.documents(s, d)
          .select(col("doc_id"), toks(col("text")).as("t"))
          .select(col("doc_id"),
            size(t).as("n_tokens"),
            (lit(1.0) - size(array_distinct(bg)).cast("double") / size(bg))
              .as("dup_bigram_ratio"),
            (topTok.cast("double") / size(t)).as("top_token_ratio"))
          .orderBy("doc_id")
      },
      """WITH tk AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, t,
        |         list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bg
        |  FROM tk)
        |SELECT doc_id,
        |       CAST(len(t) AS INTEGER) AS n_tokens,
        |       1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg) AS dup_bigram_ratio,
        |       CAST(list_max(list_transform(list_distinct(t),
        |              x -> len(list_filter(t, y -> y = x)))) AS DOUBLE) / len(t)
        |         AS top_token_ratio
        |FROM bg ORDER BY doc_id""".stripMargin),

    // ---- PII redaction. The synthetic corpus carries no PII, so the query
    //      plants a deterministic email/IP/phone per doc (same construction
    //      in the oracle) and the redaction rules must scrub all three.
    "pii1_redact" -> withOracle(
      (s, d) => {
        val planted = concat(col("text"),
          lit(" contact "), col("source"), lit("@example.com ip 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".7 tel 555-01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0"))
        Tables.documents(s, d)
          .select(col("doc_id"), Redact.pii(planted).as("clean"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    text || ' contact ' || source || '@example.com ip 10.0.' ||
        |      CAST(doc_id % 256 AS VARCHAR) || '.7 tel 555-01' ||
        |      lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS clean
        |FROM documents ORDER BY doc_id""".stripMargin),

    // ---- HTML boilerplate strip (ops.Html): the synthetic corpus carries
    //      no markup, so the query PLANTS deterministic tags + entities per
    //      doc (same construction in the oracle — the pii1 pattern) and the
    //      strip must remove every tag, decode entities exactly one level,
    //      and collapse whitespace.
    "t13_html_strip" -> withOracle(
      (s, d) => {
        val planted = concat(
          lit("<html><body class=\""), col("lang"), lit("\"><h1>"), col("source"),
          lit("</h1><!-- if x > 3 --><img alt=\"x > y\"><p>"),
          substring(col("text"), 1, 80),
          lit(" &amp;co &lt;3&gt; &quot;q&quot; &nbsp;tail</p></body></html>"))
        Tables.documents(s, d)
          .select(col("doc_id"), graft.ops.Html.stripTags(planted).as("clean"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(
        |        '<html><body class="' || lang || '"><h1>' || source ||
        |        '</h1><!-- if x > 3 --><img alt="x > y"><p>' || substr(text, 1, 80) ||
        |        ' &amp;co &lt;3&gt; &quot;q&quot; &nbsp;tail</p></body></html>',
        |        '(?s)<!--.*?-->', ' ', 'g'),
        |      '<(?:[^>"'']|"[^"]*"|''[^'']*'')*>', ' ', 'g'),
        |    '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |    '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'),
        |  '\s+', ' ', 'g')) AS clean
        |FROM documents ORDER BY doc_id""".stripMargin),

    // ---- REAL byte-pair-encoding tokenization (text.Bpe, Sennrich et
    //      al. 2016): merges trained on the word-frequency dict (one
    //      groupBy + bounded top-V collect — the codebook pattern), then
    //      applied per-partition with the greedy lowest-rank loop. The
    //      iterative merge algebra is not SQL-expressible -> rows-only;
    //      BpeSpec pins the published example's merge table, the
    //      concatenation invariant, and partitioning-invariance of both
    //      phases.
    "t15_bpe_tokens" -> rowsOnly(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val merges = graft.text.Bpe.trainMerges(
          graft.text.Bpe.wordFreq(docs), nMerges = 50)
        graft.text.Bpe.encodeDocs(docs, merges).toDF().orderBy("doc_id")
      }),

    // ---- unigram LM perplexity scoring (CCNet-style quality filter):
    //      add-one-smoothed LM over the top-100 vocabulary with the
    //      remaining mass pooled into one UNK class; each doc scored by
    //      mean negative log-likelihood per token. Cross-engine exactness
    //      via the BM25 trick, pushed further: per-token -ln(p) is
    //      quantized to INTEGER micro-nats (floor(x*1e7+0.5) as long), so
    //      the per-doc aggregation is exact integer arithmetic — immune to
    //      summation order — and the final mean is two exactly-rounded
    //      double divisions. ln() ulp drift could only flip a floor
    //      boundary with probability ~1e-9 per distinct vocab entry.
    //      Scale: vocab/totals are broadcast one-row/100-row frames; the
    //      corpus streams once through the join.
    "t14_perplexity" -> withOracle(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("token"))
        val cnt = tok.groupBy("token").agg(count(lit(1)).as("c"))
        val top = cnt.orderBy(col("c").desc, col("token")).limit(100)
        val tot = cnt.agg(sum("c").as("n"))
        val ts = top.agg(sum("c").as("tsum"))
        val p = when(col("c").isNotNull,
            (col("c") + lit(1.0)) / (col("n") + lit(101)))
          .otherwise((col("n") - col("tsum") + lit(1.0)) / (col("n") + lit(101)))
        tok.join(broadcast(top), Seq("token"), "left")
          .crossJoin(broadcast(tot)).crossJoin(broadcast(ts))
          .select(col("doc_id"),
            floor(-log(p) * lit(1e7) + lit(0.5)).cast("long").as("q"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum("q").as("micro_nats"))
          .withColumn("mean_nats",
            col("micro_nats").cast("double") / col("n_tokens") / lit(1e7))
          .orderBy("doc_id")
      },
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
        |top AS (SELECT token, c FROM cnt ORDER BY c DESC, token LIMIT 100),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
        |ts AS (SELECT CAST(sum(c) AS BIGINT) AS tsum FROM top),
        |q AS (
        |  SELECT t.doc_id,
        |         CAST(floor(-ln(CASE WHEN tp.c IS NOT NULL
        |                             THEN (tp.c + 1.0) / (n + 101)
        |                             ELSE (n - tsum + 1.0) / (n + 101) END)
        |                    * 10000000.0 + 0.5) AS BIGINT) AS q
        |  FROM tok t LEFT JOIN top tp USING (token), tot, ts)
        |SELECT doc_id, count(*) AS n_tokens, CAST(sum(q) AS BIGINT) AS micro_nats,
        |       CAST(sum(q) AS DOUBLE) / count(*) / 10000000.0 AS mean_nats
        |FROM q GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // ---- deterministic hash sampling: md5 of the key, keep 3/16 of the
    //      space. Reproducible on any engine, no RNG state, scan-shaped —
    //      the canonical way to cut a stable subsample from 100 TB.
    "smp1_hash_sample" -> withOracle(
      (s, d) =>
        Tables.documents(s, d)
          .filter(substring(md5Key(col("doc_id")), 1, 1)
            .isin("0", "1", "2"))
          .select("doc_id", "lang", "source")
          .orderBy("doc_id"),
      """SELECT doc_id, lang, source FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2')
        |ORDER BY doc_id""".stripMargin),

    // ---- corpus mixture sampling (DataComp-shaped): hit target source
    //      proportions while keeping as much data as possible. Weights
    //      w_s come from the source id (1..4 cycling); the binding source
    //      sets the total T = min(n_s * sumW div w_s), each source keeps
    //      its top k_s = w_s * T div sumW docs by md5 rank. ALL integer
    //      arithmetic — no float proportion ever computed, so the oracle
    //      match is exact by construction. Per-source stats are two tiny
    //      broadcast aggregates; the only corpus-sized work is the
    //      rank-within-source window.
    "mix1_mixture" -> withOracle(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val stats = docs.groupBy("source").agg(count(lit(1)).as("n"))
          .withColumn("w",
            regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 4 + 1)
        val withSw = stats.crossJoin(broadcast(stats.agg(sum("w").as("sw"))))
        val withCap = withSw.withColumn("cap", expr("n * sw div w"))
        val ks = withCap
          .crossJoin(broadcast(withCap.agg(min("cap").as("t"))))
          .withColumn("k", expr("w * t div sw"))
          .select("source", "k")
        val rnk = Window.partitionBy("source")
          .orderBy(md5Key(col("doc_id")), col("doc_id"))
        docs.join(broadcast(ks), Seq("source"))
          .withColumn("rk", row_number().over(rnk))
          .filter(col("rk") <= col("k"))
          .select("doc_id", "source")
          .orderBy("doc_id")
      },
      """WITH stats AS (
        |  SELECT source, count(*) AS n,
        |         CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 4 + 1 AS w
        |  FROM documents GROUP BY source),
        |sw AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM stats),
        |caps AS (SELECT source, n, w, sw, n * sw // w AS cap FROM stats, sw),
        |t AS (SELECT min(cap) AS t FROM caps),
        |ks AS (SELECT source, w * t // sw AS k FROM caps, t),
        |rk AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT r.doc_id, r.source FROM rk r JOIN ks USING (source)
        |WHERE r.rk <= k ORDER BY r.doc_id""".stripMargin),

    // ---- temperature-scaled mixture (alpha = 0.5, the multilingual
    //      sampling standard — Conneau et al., XLM-R): source weights
    //      proportional to sqrt(n_s), so rare sources are upweighted
    //      relative to proportional sampling; then mix1's all-integer
    //      keep-maximal threshold algebra verbatim. The only float is
    //      sqrt itself — IEEE-correctly-rounded in both engines, and a
    //      non-square's sqrt sits far further from an integer than one
    //      ulp, so floor(sqrt(n)) is cross-engine exact.
    "mix2_temperature" -> withOracle(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val stats = docs.groupBy("source").agg(count(lit(1)).as("n"))
          .withColumn("w", floor(sqrt(col("n").cast("double"))).cast("long"))
        val withSw = stats.crossJoin(broadcast(stats.agg(sum("w").as("sw"))))
        val withCap = withSw.withColumn("cap", expr("n * sw div w"))
        val ks = withCap
          .crossJoin(broadcast(withCap.agg(min("cap").as("t"))))
          .withColumn("k", expr("w * t div sw"))
          .select("source", "k")
        val rnk = Window.partitionBy("source")
          .orderBy(md5Key(col("doc_id")), col("doc_id"))
        docs.join(broadcast(ks), Seq("source"))
          .withColumn("rk", row_number().over(rnk))
          .filter(col("rk") <= col("k"))
          .select("doc_id", "source")
          .orderBy("doc_id")
      },
      """WITH stats AS (
        |  SELECT source, count(*) AS n,
        |         CAST(floor(sqrt(count(*))) AS BIGINT) AS w
        |  FROM documents GROUP BY source),
        |sw AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM stats),
        |caps AS (SELECT source, n, w, sw, n * sw // w AS cap FROM stats, sw),
        |t AS (SELECT min(cap) AS t FROM caps),
        |ks AS (SELECT source, w * t // sw AS k FROM caps, t),
        |rk AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT r.doc_id, r.source FROM rk r JOIN ks USING (source)
        |WHERE r.rk <= k ORDER BY r.doc_id""".stripMargin),

    // ---- quality-weighted sampling (DSIR-shaped): each doc kept with
    //      probability proportional to a quality weight (here length-based,
    //      capped at 1), decided by comparing a 6-hex-digit md5 prefix
    //      against the weight mapped onto the same 16^6 grid — deterministic
    //      on any engine, no RNG state, scan-shaped. Equal-length hex
    //      strings compare lexicographically = numerically, which is what
    //      makes the string comparison exact.
    "smp3_weighted" -> withOracle(
      (s, d) => {
        val w = least(lit(1.0), col("n_chars") / lit(400.0))
        val thr = lpad(lower(hex(
          least(floor(w * 16777216).cast("long"), lit(16777215L)))), 6, "0")
        Tables.documents(s, d)
          .filter(substring(md5Key(col("doc_id")), 1, 6) < thr)
          .select("doc_id", "lang", "n_chars")
          .orderBy("doc_id")
      },
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) <
        |      lpad(lower(to_hex(CAST(least(floor(least(1.0, n_chars/400.0)
        |        * 16777216), 16777215) AS BIGINT))), 6, '0')
        |ORDER BY doc_id""".stripMargin),

    // ---- key-skew profile: the diagnostic a shuffle-heavy job needs
    //      BEFORE it runs at 100 TB (is a salted join warranted?). All
    //      outputs exact: integer aggregates, a .5-grid median, and a
    //      top-key share that is one int/int double division.
    "q4_skew_profile" -> withOracle(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
          .agg(count(lit(1)).as("n_keys"), sum("cnt").as("total_rows"),
            max("cnt").as("max_cnt"), min("cnt").as("min_cnt"),
            percentile(col("cnt"), lit(0.5)).as("med_cnt"))
          .withColumn("top_share",
            col("max_cnt").cast("double") / col("total_rows"))
          .orderBy("n_keys"),
      """WITH c AS (SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |       CAST(sum(cnt) AS BIGINT) AS total_rows,
        |       CAST(max(cnt) AS BIGINT) AS max_cnt,
        |       CAST(min(cnt) AS BIGINT) AS min_cnt,
        |       quantile_cont(cnt, 0.5) AS med_cnt,
        |       CAST(max(cnt) AS DOUBLE) / sum(cnt) AS top_share
        |FROM c ORDER BY n_keys""".stripMargin),

    // ---- stratified sampling: fixed quota per language, ranked by key
    //      hash so the pick is deterministic and uniform within stratum.
    "smp2_stratified" -> withOracle(
      (s, d) => {
        val w = Window.partitionBy("lang")
          .orderBy(md5Key(col("doc_id")), col("doc_id"))
        Tables.documents(s, d)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 20)
          .select("lang", "rk", "doc_id")
          .orderBy("lang", "rk")
      },
      """SELECT lang, CAST(rk AS INTEGER) AS rk, doc_id
        |FROM (SELECT lang, doc_id,
        |             row_number() OVER (PARTITION BY lang
        |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |      FROM documents)
        |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin),

    // ---- sequence packing: greedy contiguous fill of 4096-char bins per
    //      language stratum (docs in key order; a doc lands in the bin its
    //      preceding chars have filled). One window per stratum — packing
    //      parallelizes across strata, and within a stratum the running sum
    //      is the only sequential state. Bins may overflow by at most the
    //      last doc (pinned in CorpusSpec).
    "pk1_pack" -> withOracle(
      (s, d) => {
        val w = Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, d)
          .withColumn("cum", sum("n_chars").over(w))
          .withColumn("bin", expr("(cum - n_chars) div 4096"))
          .groupBy("lang", "bin")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
          .orderBy("lang", "bin")
      },
      """WITH c AS (
        |  SELECT lang, n_chars,
        |         sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM documents)
        |SELECT lang, CAST((cum - n_chars) // 4096 AS BIGINT) AS bin,
        |       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM c GROUP BY lang, bin ORDER BY lang, bin""".stripMargin),

    // ---- deterministic stratified train/val/test split: per-language
    //      md5-rank (the smp1 key — RNG-free, reshuffle-proof) cut at
    //      ALL-INTEGER thresholds floor(.8n) / floor(.8n)+floor(.1n), so
    //      proportions are exact per stratum and every engine agrees on
    //      every boundary row. The assignment is a pure function of the
    //      data — re-running on a grown corpus moves as few docs as a
    //      hash split can.
    "smp4_split" -> withOracle(
      (s, d) => {
        val w = Window.partitionBy("lang").orderBy(md5Key(col("doc_id")), col("doc_id"))
        Tables.documents(s, d)
          .withColumn("rk", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
          .withColumn("split",
            when(col("rk") <= expr("(n * 8) div 10"), "train")
              .when(col("rk") <= expr("(n * 8) div 10 + n div 10"), "val")
              .otherwise("test"))
          .select("lang", "doc_id", "split")
          .orderBy("doc_id")
      },
      """WITH r AS (
        |  SELECT lang, doc_id,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT lang, doc_id,
        |       CASE WHEN rk <= (n * 8) // 10 THEN 'train'
        |            WHEN rk <= (n * 8) // 10 + n // 10 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM r ORDER BY doc_id""".stripMargin),

    // ---- materialized sequence packing: pk1 assigns bins; a training-data
    //      exporter needs the packed rows themselves — concatenated text
    //      plus the boundary offset of every member doc, so a loader can
    //      split a sequence back into documents without re-tokenizing.
    //      Same one-window-per-stratum plan as pk1; the pack itself is a
    //      grouped sort_array over (doc_id, start, text) structs, so member
    //      order is data-defined, not shuffle-defined. Gate compares the
    //      packed text by md5 (the ld1 pattern) and the offsets/ids as
    //      comma-joined strings; CorpusSpec pins that each offset equals
    //      the cumulative length of the texts packed before it.
    "pk2_pack_rows" -> withOracle(
      (s, d) => {
        val w = Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val first = element_at(col("ds"), 1)
        Tables.documents(s, d)
          .withColumn("cum", sum("n_chars").over(w))
          .withColumn("start", col("cum") - col("n_chars"))
          .withColumn("bin", expr("start div 4096"))
          .groupBy("lang", "bin")
          .agg(collect_list(struct(col("doc_id"), col("start"), col("text"))).as("ds"))
          .withColumn("ds", array_sort(col("ds"))) // structs sort by doc_id (unique per stratum)
          .select(
            col("lang"), col("bin"),
            size(col("ds")).cast("long").as("n_docs"),
            concat_ws(",", transform(col("ds"), x => x("doc_id").cast("string")))
              .as("doc_ids"),
            concat_ws(",", transform(col("ds"),
                x => (x("start") - first("start")).cast("string")))
              .as("offsets"),
            md5(concat_ws("", transform(col("ds"), x => x("text"))))
              .as("packed_md5"))
          .orderBy("lang", "bin")
      },
      """WITH c AS (
        |  SELECT lang, doc_id, text,
        |         sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |           ROWS UNBOUNDED PRECEDING) - n_chars AS start
        |  FROM documents),
        |b AS (
        |  SELECT lang, doc_id, text, start,
        |         CAST(start // 4096 AS BIGINT) AS bin,
        |         min(start) OVER (PARTITION BY lang, CAST(start // 4096 AS BIGINT))
        |           AS min_start
        |  FROM c)
        |SELECT lang, bin,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids,
        |       string_agg(CAST(start - min_start AS VARCHAR), ',' ORDER BY doc_id)
        |         AS offsets,
        |       md5(string_agg(text, '' ORDER BY doc_id)) AS packed_md5
        |FROM b GROUP BY lang, bin ORDER BY lang, bin""".stripMargin),

    // ---- benchmark decontamination: drop corpus docs sharing any trigram
    //      with the held-out set (doc_id % 97 == 0 plays the benchmark).
    //      The benchmark trigram set is broadcast; the corpus streams once.
    "dc1_decontam" -> withOracle(
      (s, d) => {
        val t = col("t")
        val tri = graft.functions.functions.ngrams(t, 3, distinct = true)
        val withTri = Tables.spreadForCpu(Tables.documents(s, d))
          .select(col("doc_id"), col("lang"), toks(col("text")).as("t"))
          .select(col("doc_id"), col("lang"), tri.as("tri"))
        val bench = withTri.filter(col("doc_id") % 97 === 0)
          .select(explode(col("tri")).as("g")).distinct()
        val corpus = withTri.filter(col("doc_id") % 97 =!= 0)
        val contaminated = corpus.select(col("doc_id"), explode(col("tri")).as("g"))
          .join(broadcast(bench), Seq("g"))
          .select("doc_id").distinct()
        corpus.join(contaminated, Seq("doc_id"), "left_anti")
          .select("doc_id", "lang")
          .orderBy("doc_id")
      },
      """WITH tri AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_transform(range(1, len(t) - 1),
        |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tri
        |  FROM (SELECT doc_id, lang,
        |               regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |        FROM documents)),
        |bench AS (
        |  SELECT DISTINCT g
        |  FROM (SELECT unnest(tri) AS g FROM tri WHERE doc_id % 97 = 0)),
        |bad AS (
        |  SELECT DISTINCT doc_id
        |  FROM (SELECT doc_id, unnest(tri) AS g FROM tri WHERE doc_id % 97 <> 0) c
        |  JOIN bench USING (g))
        |SELECT doc_id, lang FROM tri
        |WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
        |ORDER BY doc_id""".stripMargin),

    // ---- the WHOLE preprocessing pipeline as ONE Catalyst plan — quality
    //      floor, content-keyed exact dedup, benchmark decontamination,
    //      stratified split — the composition a pretraining run actually
    //      executes, declared end-to-end so the optimizer sees every stage
    //      at once (filters push below the dedup window, the bench side
    //      broadcasts, each window shuffles once by its own key). The
    //      oracle chains the per-stage restatements the individual gate
    //      queries already proved.
    "pipe_corpus_prep" -> withOracle(
      (s, d) => {
        val docs = Tables.spreadForCpu(Tables.documents(s, d))
        // 1. quality floor
        val q = docs.filter(col("n_chars") >= 100)
        // 2. exact dedup, keep-first per content hash (md5 keys the
        //    shuffle: 16 bytes, not the document)
        val wD = Window.partitionBy(md5(col("text").cast("binary")))
          .orderBy(col("doc_id"))
        val dd = q.withColumn("dk", row_number().over(wD))
          .filter(col("dk") === 1)
        // 3. decontamination vs the held-out slice (dc1's broadcast shape)
        val tri = graft.functions.functions.ngrams(col("t"), 3, distinct = true)
        val withTri = dd.select(col("doc_id"), col("lang"), toks(col("text")).as("t"))
          .select(col("doc_id"), col("lang"), tri.as("tri"))
        val bench = withTri.filter(col("doc_id") % 97 === 0)
          .select(explode(col("tri")).as("g")).distinct()
        val corpus = withTri.filter(col("doc_id") % 97 =!= 0)
        val bad = corpus.select(col("doc_id"), explode(col("tri")).as("g"))
          .join(broadcast(bench), Seq("g")).select("doc_id").distinct()
        val clean = corpus.join(bad, Seq("doc_id"), "left_anti")
          .select("doc_id", "lang")
        // 4. deterministic stratified split (smp4's integer thresholds)
        val wS = Window.partitionBy("lang")
          .orderBy(md5Key(col("doc_id")), col("doc_id"))
        clean.withColumn("rk", row_number().over(wS))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
          .withColumn("split",
            when(col("rk") <= expr("(n * 8) div 10"), "train")
              .when(col("rk") <= expr("(n * 8) div 10 + n div 10"), "val")
              .otherwise("test"))
          .select("doc_id", "lang", "split")
          .orderBy("doc_id")
      },
      """WITH q AS (
        |  SELECT * FROM documents WHERE n_chars >= 100),
        |dd AS (
        |  SELECT doc_id, lang, text FROM (
        |    SELECT q.*, row_number() OVER (PARTITION BY md5(text)
        |                                   ORDER BY doc_id) AS dk
        |    FROM q) WHERE dk = 1),
        |tri AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_transform(range(1, len(t) - 1),
        |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tri
        |  FROM (SELECT doc_id, lang,
        |               regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |        FROM dd)),
        |bench AS (
        |  SELECT DISTINCT g
        |  FROM (SELECT unnest(tri) AS g FROM tri WHERE doc_id % 97 = 0)),
        |corpus AS (SELECT * FROM tri WHERE doc_id % 97 <> 0),
        |bad AS (
        |  SELECT DISTINCT doc_id
        |  FROM (SELECT doc_id, unnest(tri) AS g FROM corpus) c
        |  JOIN bench USING (g)),
        |clean AS (
        |  SELECT doc_id, lang FROM corpus
        |  WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
        |r AS (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM clean)
        |SELECT doc_id, lang,
        |       CASE WHEN rk <= (n * 8) // 10 THEN 'train'
        |            WHEN rk <= (n * 8) // 10 + n // 10 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM r ORDER BY doc_id""".stripMargin),

    // ---- overlapping-window document chunking (the RAG/context-window
    //      chunker): 64-token chunks on a 48-token stride, each with its
    //      start offset and true length — pure array built-ins (sequence +
    //      explode + slice), so chunking is one generate stage inside
    //      codegen, no UDF, no shuffle until the caller aggregates.
    //      Chunk text witnesses as md5 (the ld1 pattern keeps the gate
    //      payload bounded).
    "ch1_chunk_overlap" -> withOracle(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), toks(col("text")).as("t"))
          .select(col("doc_id"), col("t"),
            explode(sequence(lit(0), expr("(size(t) - 1) div 48"))).as("k"))
          .select(col("doc_id"), col("k").cast("long").as("chunk_idx"),
            (col("k") * 48 + 1).cast("long").as("start_token"),
            least(lit(64), size(col("t")) - col("k") * 48).cast("long").as("n_tok"),
            md5(concat_ws(" ", slice(col("t"), col("k") * 48 + 1, lit(64)))
              .cast("binary")).as("chunk_md5"))
          .orderBy("doc_id", "chunk_idx"),
      """WITH tk AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents)
        |SELECT doc_id, k AS chunk_idx,
        |       k * 48 + 1 AS start_token,
        |       least(64, len(t) - k * 48) AS n_tok,
        |       md5(array_to_string(t[k * 48 + 1 : k * 48 + 64], ' ')) AS chunk_md5
        |FROM tk, unnest(range(0, (len(t) - 1) // 48 + 1)) AS r(k)
        |ORDER BY doc_id, chunk_idx""".stripMargin),

    // ---- decontamination as a FRACTION, not a flag (the GPT-3 appendix-C
    //      shape): per-doc share of distinct trigrams that appear in the
    //      held-out bench set, plus the keep decision at a 20% threshold —
    //      dc1's binary any-overlap answer drops a 10k-token doc for one
    //      collision; the graded answer is what production filters act on.
    //      Same broadcast-bench plan as dc1: the bench side is the small
    //      one by construction, the corpus side streams.
    "dc2_overlap_frac" -> withOracle(
      (s, d) => {
        val t = col("t")
        val tri = graft.functions.functions.ngrams(t, 3, distinct = true)
        val withTri = Tables.spreadForCpu(Tables.documents(s, d))
          .select(col("doc_id"), toks(col("text")).as("t"))
          .select(col("doc_id"), tri.as("tri"))
          .filter(size(col("tri")) > 0) // <3 tokens: fraction undefined
        val bench = withTri.filter(col("doc_id") % 97 === 0)
          .select(explode(col("tri")).as("g")).distinct()
        val corpus = withTri.filter(col("doc_id") % 97 =!= 0)
        val hits = corpus.select(col("doc_id"), explode(col("tri")).as("g"))
          .join(broadcast(bench), Seq("g"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
        corpus.select(col("doc_id"), size(col("tri")).cast("long").as("n_grams"))
          .join(hits, Seq("doc_id"), "left")
          .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
          .withColumn("overlap_frac", col("n_hit").cast("double") / col("n_grams"))
          .withColumn("keep", col("overlap_frac") <= lit(0.2))
          .select("doc_id", "n_grams", "n_hit", "overlap_frac", "keep")
          .orderBy("doc_id")
      },
      """WITH tri0 AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(t) - 1),
        |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tri
        |  FROM (SELECT doc_id,
        |               regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |        FROM documents)),
        |tri AS (SELECT doc_id, tri FROM tri0 WHERE len(tri) > 0),
        |bench AS (
        |  SELECT DISTINCT g
        |  FROM (SELECT unnest(tri) AS g FROM tri WHERE doc_id % 97 = 0)),
        |corpus AS (SELECT * FROM tri WHERE doc_id % 97 <> 0),
        |hits AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit
        |  FROM (SELECT doc_id, unnest(tri) AS g FROM corpus) c
        |  JOIN bench USING (g)
        |  GROUP BY doc_id)
        |SELECT c.doc_id, CAST(len(c.tri) AS BIGINT) AS n_grams,
        |       coalesce(h.n_hit, 0) AS n_hit,
        |       CAST(coalesce(h.n_hit, 0) AS DOUBLE) / len(c.tri) AS overlap_frac,
        |       (CAST(coalesce(h.n_hit, 0) AS DOUBLE) / len(c.tri)) <= 0.2 AS keep
        |FROM corpus c LEFT JOIN hits h USING (doc_id)
        |ORDER BY doc_id""".stripMargin),

    // ---- duplicated-substring spans (Lee et al. suffix-array dedup
    //      signal, shingle-approximated): per-doc fraction of 5-token
    //      spans that recur anywhere in the corpus. The gate runs the
    //      PRODUCTION path (xxhash64 shingle keys — 8-byte shuffle
    //      payload); the oracle groups by the gram string, so a 64-bit
    //      collision would surface as a hash mismatch here.
    "sd1_dup_spans" -> withOracle(
      (s, d) =>
        graft.dedup.SpanDedup.dupSpanStats(Tables.documents(s, d), n = 5)
          .orderBy("doc_id"),
      """WITH tk AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 3), i ->
        |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])) AS gram
        |  FROM tk WHERE len(t) >= 5),
        |occ AS (SELECT gram, count(*) AS n FROM g GROUP BY 1)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_shingles,
        |       CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |       CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_fraction
        |FROM g JOIN occ USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // ---- C4/RefinedWeb-style line-level corpus dedup: cut every doc into
    //      deterministic 10-token segments (the synthetic corpus has no
    //      newlines, so segments play the "line"), keep only the FIRST
    //      corpus-wide occurrence of each distinct segment (doc order,
    //      then position), and reassemble the surviving text. Unlike sd1
    //      (which only measures duplication) this REWRITES the corpus —
    //      the actual C4 cleanup operation. One shuffle, partitioned by
    //      segment content, carrying each segment exactly once per
    //      occurrence; at 100 TB the shuffle is the corpus re-keyed by
    //      line, the same cost profile as the published C4 pipeline.
    "ld1_line_dedup" -> withOracle(
      (s, d) => {
        // tokenizer staged in its own projection (higher-order lambdas
        // re-evaluate inlined children per element — the O(n^2) lesson)
        val staged = Tables.documents(s, d)
          .select(col("doc_id"), toks(col("text")).as("__t"))
        val segd = staged.select(col("doc_id"),
          transform(
            sequence(lit(0), ((size(col("__t")) - 1) / 10).cast("int")),
            i => concat_ws(" ", slice(col("__t"), i * 10 + 1, lit(10)))).as("segs"))
        val lines = segd
          .select(col("doc_id"), posexplode(col("segs")))
          .withColumnsRenamed(Map("col" -> "seg"))
        val w = Window.partitionBy("seg").orderBy("doc_id", "pos")
        val kept = lines.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        val rebuilt = kept.groupBy("doc_id")
          .agg(count(lit(1)).as("n_kept"),
            concat_ws(" ",
              transform(array_sort(collect_list(struct(col("pos"), col("seg")))),
                x => x("seg"))).as("dedup_text"))
        segd.select(col("doc_id"), size(col("segs")).as("n_segs"))
          .join(rebuilt, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_segs"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("dedup_text"), lit("")).as("dedup_text"))
          .orderBy("doc_id")
      },
      """WITH tk AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |sg AS (
        |  SELECT doc_id,
        |         list_transform(range(0, (len(t) - 1) // 10 + 1),
        |           i -> array_to_string(t[i*10+1 : i*10+10], ' ')) AS segs
        |  FROM tk),
        |ln AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(segs) + 1),
        |           i -> {'pos': i, 'seg': segs[i]})) AS u
        |  FROM sg),
        |rk AS (
        |  SELECT doc_id, u.pos AS pos, u.seg AS seg,
        |         row_number() OVER (PARTITION BY u.seg
        |                            ORDER BY doc_id, u.pos) AS rn
        |  FROM ln),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |         string_agg(seg, ' ' ORDER BY pos) AS dedup_text
        |  FROM rk WHERE rn = 1 GROUP BY doc_id)
        |SELECT s.doc_id, CAST(len(s.segs) AS INTEGER) AS n_segs,
        |       CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
        |       COALESCE(a.dedup_text, '') AS dedup_text
        |FROM sg s LEFT JOIN agg a ON s.doc_id = a.doc_id
        |ORDER BY s.doc_id""".stripMargin),

    // ---- corpus vocabulary: token frequency top-50 with deterministic
    //      tie-break — the classic shuffle-heavy word count. Partial
    //      (map-side) aggregation means executors ship one partial count
    //      per distinct token per partition, not one row per token
    //      occurrence; at 100 TB the shuffle carries the vocabulary, not
    //      the corpus.
    "t9_vocab" -> withOracle(
      (s, d) =>
        Tables.documents(s, d)
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
          .filter(col("token") =!= "")
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(50),
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |      FROM documents)
        |WHERE token <> ''
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin),

    // ---- token co-occurrence with lift (= PMI without the log — same
    //      ranking, but an exact integer-ratio double instead of libm
    //      log drift). Pairs are restricted to the top-100 vocabulary:
    //      the standard bound that keeps the per-doc pair fan-out at
    //      choose(100,2) however long the document, so the self-join's
    //      shuffle is corpus-bounded at 100 TB. Vocabulary and pair
    //      ranking both carry total tie-breaks.
    "t10_cooc_lift" -> withOracle(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tok = docs
          .select(col("doc_id"), explode(array_distinct(toks(col("text")))).as("token"))
          .filter(col("token") =!= "")
        val vocab = tok.groupBy("token").agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("token")).limit(100)
        val vt = tok.join(broadcast(vocab), Seq("token"))
        val n = docs.select(count(lit(1)).as("n_docs"))
        vt.select(col("doc_id"), col("token").as("t1"), col("df").as("df1"))
          .join(vt.select(col("doc_id"), col("token").as("t2"), col("df").as("df2")),
            Seq("doc_id"))
          .filter(col("t1") < col("t2"))
          .groupBy("t1", "df1", "t2", "df2").agg(count(lit(1)).as("n_both"))
          .crossJoin(broadcast(n))
          .select(col("t1"), col("t2"), col("n_both"),
            ((col("n_both") * col("n_docs")).cast("double") / (col("df1") * col("df2")))
              .as("lift"))
          .orderBy(col("n_both").desc, col("t1"), col("t2"))
          .limit(30)
      },
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tok2 AS (SELECT * FROM tok WHERE token <> ''),
        |vocab AS (
        |  SELECT token, count(*) AS df FROM tok2 GROUP BY 1
        |  ORDER BY df DESC, token LIMIT 100),
        |vt AS (SELECT t.doc_id, t.token, v.df FROM tok2 t JOIN vocab v USING (token)),
        |pairs AS (
        |  SELECT a.token AS t1, a.df AS df1, b.token AS t2, b.df AS df2,
        |         count(*) AS n_both
        |  FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.token < b.token
        |  GROUP BY 1, 2, 3, 4),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT t1, t2, CAST(n_both AS BIGINT) AS n_both,
        |       CAST(n_both * n_docs AS DOUBLE) / (df1 * df2) AS lift
        |FROM pairs, n
        |ORDER BY n_both DESC, t1, t2 LIMIT 30""".stripMargin),

    // ---- document-length histogram (50-char bins): the profiling shape a
    //      corpus dashboard needs; integer bucketing, no rounding anywhere
    "q3_histogram" -> withOracle(
      (s, d) =>
        Tables.documents(s, d)
          .groupBy(expr("n_chars div 50").as("bucket"))
          .agg(count(lit(1)).as("n_docs"),
               min("n_chars").as("lo"), max("n_chars").as("hi"))
          .orderBy("bucket"),
      """SELECT n_chars // 50 AS bucket, count(*) AS n_docs,
        |       min(n_chars) AS lo, max(n_chars) AS hi
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- approximate percentile (t-digest style sketch): the scale path
    //      for quantiles when exact percentile's full sort-per-group is too
    //      expensive. Sketch internals are engine-specific by design —
    //      rows-only in the gate; CorpusSpec bounds it against the exact
    //      quarter-grid values of a12.
    "a13_approx_quantile" -> rowsOnly(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(approx_percentile(col("l_quantity"), lit(0.5), lit(10000)).as("p50_approx"))
          .orderBy("l_returnflag")),

    // ---- STORED mergeable quantile sketch (functions.QuantileSketch:
    //      deterministic MRL-style multi-level collapse): per-flag
    //      sketches built once (the bytes are a storable column), merged
    //      WITHOUT rescanning rows, probed for global quantiles — the
    //      build-once/query-many percentile shape at 100 TB, completing
    //      the stored-sketch family (a20/a21 HLL, a14 CMS, a16 MG).
    //      Values are merge-order-sensitive by contract (like a13's GK),
    //      so rows-only; QuantileSketchSpec pins rank error <= 1% vs the
    //      exact sort at two partitionings, merged-n exactness, and
    //      byte determinism on a fixed partitioning.
    "a23_quantile_sketch" -> rowsOnly(
      (s, d) => {
        import graft.functions.QuantileSketch._
        val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(quantile_sketch(col("l_extendedprice"), 256).as("sk"))
          .agg(quantile_sketch_merge(col("sk")).as("all"))
          .select(posexplode(sketch_quantiles(col("all"), probs)))
          .select((element_at(typedLit(probs), col("pos") + 1)).as("p"),
            round(col("col"), 2).as("est"))
          .orderBy("p")
      }),

    // ---- COLUMN-driven sketch probes: the "p99 by day for these 40
    //      percentiles" serve shape — stored per-group sketches joined
    //      against a quantile-REQUEST table, probes read from the request
    //      row (array<double> column), NOT a literal list baked into the
    //      plan. The request side is driver-built and broadcast (it is
    //      request-sized, never data-sized); the sketch side never
    //      rescans the rows that built it. Rows-only for the same
    //      merge-order reason as a23; QuantileSketchSpec pins the column
    //      path identical to the literal path on equal probes.
    "a24_sketch_probe_requests" -> rowsOnly(
      (s, d) => {
        import s.implicits._
        import graft.functions.QuantileSketch._
        val sketches = Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(quantile_sketch(col("l_extendedprice"), 256).as("sk"))
        val requests = Seq(
          ("A", Seq(0.5, 0.95)),
          ("N", Seq(0.25, 0.75, 0.99)),
          ("R", Seq(0.9))).toDF("l_returnflag", "probs")
        sketches.join(broadcast(requests), "l_returnflag")
          .select(col("l_returnflag"), col("probs"),
            posexplode(sketch_quantiles(col("sk"), col("probs"))))
          .select(col("l_returnflag"),
            element_at(col("probs"), col("pos") + 1).as("p"),
            round(col("col"), 2).as("est"))
          .orderBy("l_returnflag", "p")
      }),

    // ---- per-group approximate quantiles over a STORED histogram sketch
    //      (Ranks.groupQuantileHistogram + groupApproxQuantiles): the
    //      per-language length-quantile shape a corpus-mixing pipeline
    //      runs. The sketch is (lang, bucket, cnt) rows — mergeable by
    //      summing cnt, bounded by domain/width per group — and the
    //      estimator emits the [lo, hi] bounds of the bucket holding rank
    //      ceil(p*n_g), so error <= bucketWidth by construction (the
    //      exact-quantile-inside-bounds guarantee is pinned vs a19's
    //      machinery in RanksSpec). All-integer bucketing makes the whole
    //      path oracle-exact, a stronger gate than sketch rows-only.
    "a22_group_quantile_hist" -> withOracle(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val hist = graft.ops.Ranks.groupQuantileHistogram(
          docs, Seq("lang"), col("n_chars"), bucketWidth = 64L)
        graft.ops.Ranks.groupApproxQuantiles(
            hist, Seq("lang"), Seq(0.25, 0.5, 0.75), bucketWidth = 64L)
          .orderBy("lang", "p")
      },
      """WITH h AS (
        |  SELECT lang, n_chars // 64 AS bucket, CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |c AS (
        |  SELECT lang, bucket, cnt,
        |         CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY bucket)
        |              AS BIGINT) AS cum,
        |         CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM h)
        |SELECT lang, CAST(p AS DOUBLE) AS p,
        |       CAST(bucket * 64 AS BIGINT) AS lo,
        |       CAST(bucket * 64 + 63 AS BIGINT) AS hi
        |FROM c JOIN (VALUES (0.25), (0.5), (0.75)) AS ps(p)
        |  ON cum >= ceil(CAST(p AS DOUBLE) * n)
        | AND cum - cnt < ceil(CAST(p AS DOUBLE) * n)
        |ORDER BY lang, p""".stripMargin),

    // ---- Z-order clustering key (ops.Zorder): the bit-interleave kernel
    //      the layout op range-partitions by. Pure integer bit math, so
    //      the oracle can restate it exactly; the layout/skipping effect
    //      itself (per-file min/max envelopes on both columns) is pinned
    //      in ZorderSpec where file stats are observable.
    "z1_zorder_key" -> withOracle(
      (s, d) =>
        Tables.lineitem(s, d)
          .select((col("l_partkey") % 256).as("px"), (col("l_suppkey") % 256).as("py"))
          .distinct()
          .select(col("px"), col("py"),
            graft.ops.Zorder.zkey(col("px"), col("py"), bits = 8).as("zkey"))
          .orderBy("zkey", "px", "py"),
      """SELECT px, py,
        |       CAST(list_sum(list_transform(range(0, 8), i ->
        |         ((px >> i) & 1) * (1::BIGINT << (2*i)) +
        |         ((py >> i) & 1) * (1::BIGINT << (2*i + 1)))) AS BIGINT) AS zkey
        |FROM (SELECT DISTINCT l_partkey % 256 AS px, l_suppkey % 256 AS py
        |      FROM lineitem)
        |ORDER BY zkey, px, py""".stripMargin),

    // ---- 3-column Z-order key (stride-3 interleave): the same layout
    //      contract as z1 extended to (x, y, z) boxes — e.g. clustering a
    //      fact table on (customer, part, supplier) at once.
    "z2_zorder3" -> withOracle(
      (s, d) =>
        Tables.lineitem(s, d)
          .select((col("l_partkey") % 64).as("px"), (col("l_suppkey") % 64).as("py"),
            (col("l_orderkey") % 64).as("pz"))
          .distinct()
          .select(col("px"), col("py"), col("pz"),
            graft.ops.Zorder.zkey3(col("px"), col("py"), col("pz"), bits = 6).as("zkey"))
          .orderBy("zkey", "px", "py", "pz"),
      """SELECT px, py, pz,
        |       CAST(list_sum(list_transform(range(0, 6), i ->
        |         ((px >> i) & 1) * (1::BIGINT << (3*i)) +
        |         ((py >> i) & 1) * (1::BIGINT << (3*i + 1)) +
        |         ((pz >> i) & 1) * (1::BIGINT << (3*i + 2)))) AS BIGINT) AS zkey
        |FROM (SELECT DISTINCT l_partkey % 64 AS px, l_suppkey % 64 AS py,
        |             l_orderkey % 64 AS pz
        |      FROM lineitem)
        |ORDER BY zkey, px, py, pz""".stripMargin),

    // ---- count-min sketch counts (relational CMS — see ops.Sketch): the
    //      scale path for frequency estimation when distinct keys outgrow
    //      an exact groupBy's shuffle. Estimates only ever over-count
    //      (SketchSpec property); at this width/key-set no key collides in
    //      all 4 rows — deterministically, fixed hashes — so the estimates
    //      are EXACT and the oracle is the plain exact count: the gate pins
    //      the whole build+probe path, not a tolerance band.
    "a14_cms_counts" -> withOracle(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val sketch = graft.ops.Sketch.cmsBuild(li, col("l_suppkey"), depth = 4, width = 8192)
        val cands = li.select("l_suppkey").distinct()
        graft.ops.Sketch.cmsEstimate(sketch, cands, "l_suppkey")
          .orderBy("l_suppkey")
      },
      """SELECT l_suppkey, count(*) AS est_count
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin),

    // ---- CMS join-cardinality estimate (sketch inner product): the
    //      pre-flight "how big is this join" answer from two cell tables
    //      instead of running the join. Self-join of lineitem on suppkey —
    //      the estimate must equal sum over keys of n(s)^2 exactly at this
    //      width (no two keys share a cell in every row, deterministically),
    //      so the oracle states the exact quantity.
    "a15_cms_joinsize" -> withOracle(
      (s, d) => {
        val sk = graft.ops.Sketch.cmsBuild(
          Tables.lineitem(s, d), col("l_suppkey"), depth = 4, width = 8192)
        graft.ops.Sketch.cmsJoinSize(sk, sk).orderBy("est_join_rows")
      },
      """SELECT CAST(sum(n * n) AS BIGINT) AS est_join_rows
        |FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_suppkey)
        |ORDER BY est_join_rows""".stripMargin),

    // ---- exact heavy hitters (ops.HeavyHitters): Misra-Gries candidate
    //      pass (bounded per-partition state, candidates provably ⊇ every
    //      key at the threshold) + exact count of candidates only — the
    //      frequent-items answer when distinct keys outgrow an exact
    //      groupBy's shuffle. Output is exact, so the oracle is the plain
    //      GROUP BY ... HAVING. 0.8%: a handful of users qualify at each
    //      SF, most don't.
    "a16_heavy_hitters" -> withOracle(
      (s, d) =>
        graft.ops.HeavyHitters.heavyHitters(
            Tables.events(s, d), col("user_id"), minFraction = 0.008,
            budget = 128, outKey = "user_id")
          .orderBy("user_id"),
      """SELECT user_id, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(count(*) AS DOUBLE) /
        |         (SELECT CAST(count(*) AS DOUBLE) FROM events) AS frac
        |FROM events GROUP BY user_id
        |HAVING count(*) >= CAST(0.008 AS DOUBLE) *
        |  (SELECT count(*) FROM events)
        |ORDER BY user_id""".stripMargin),

    // ---- relational HLL registers (ops.Hll): storable/mergeable distinct
    //      sketch — per-source register tables merged, then estimated,
    //      must equal the whole-corpus build exactly (register max is
    //      order- and partition-immune integer state). Register hashing
    //      (xxhash64) has no DuckDB twin -> rows-only; HllSpec pins the
    //      3-sigma error bound vs exact, linear-counting exactness, and
    //      merge == whole.
    "a20_hll_registers" -> rowsOnly(
      (s, d) => {
        // ONE scan builds a register table per event type (the per-day
        // sketch-store pattern); collapsing the groups with a plain
        // bucket-max IS the merge, because registers are rows. The tiny
        // merged table materializes once for the two output branches.
        val perType = graft.ops.Hll.hllBuildGrouped(
          Tables.events(s, d), col("user_id"), Seq("event_type"), p = 12)
        val regs = perType.groupBy("bucket").agg(max("max_rho").as("max_rho"))
          .localCheckpoint(true)
        graft.ops.Hll.hllEstimate(graft.ops.Hll.HllSketch(regs, 12))
          .crossJoin(regs.agg(
            count(lit(1)).as("n_registers"), sum("max_rho").as("rho_sum")))
      }),

    // ---- per-group distinct estimates from the stored register table
    //      (a20's artifact read back per source): distinct-users-per-
    //      event-type without rescanning raw data — the sketch-store
    //      read path. Rows-only (same xxhash64 reason as a20); HllSpec
    //      pins the per-group error bound vs exact.
    "a21_hll_grouped" -> rowsOnly(
      (s, d) => {
        val perType = graft.ops.Hll.hllBuildGrouped(
          Tables.events(s, d), col("user_id"), Seq("event_type"), p = 12)
        graft.ops.Hll.hllEstimateGrouped(perType, Seq("event_type"), p = 12)
          .orderBy("event_type")
      }),

    // ---- KMV (k-minimum-values) distinct sketch (ops.Kmv): per-source
    //      distinct-3-shingle estimates WITHOUT a distinct shuffle — the
    //      build ships at most k=256 longs per source per task (bounded
    //      TypedImperativeAggregate, map-side combined), estimates read
    //      the sketch only. ORACLED: the hash is an md5 prefix (13 hex
    //      chars = 52 bits, double-exact) and the Beyer et al. estimator
    //      is one exact-integer division — DuckDB restates bottom-k +
    //      estimate verbatim. Unsaturated sources fall back to exact
    //      counts in both engines.
    "a25_kmv_distinct" -> withOracle(
      (s, d) => {
        val t = toks(col("text"))
        val sh = Tables.spreadForCpu(Tables.documents(s, d))
          .select(col("source"), explode(ngrams(t, 3)).as("g"))
        val sk = graft.ops.Kmv.build(sh, col("source"), col("g"), k = 256)
        graft.ops.Kmv.estimateDistinct(sk, k = 256)
          .withColumnRenamed("grp", "source")
          .orderBy("source")
      },
      """WITH sh AS (
        |  SELECT DISTINCT source,
        |         CAST(('0x' || substr(md5(g), 1, 13)) AS BIGINT) AS hv
        |  FROM (SELECT source, unnest(list_transform(range(1, len(t) - 1),
        |               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        |        FROM (SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |              FROM documents))),
        |ranked AS (
        |  SELECT source, hv, row_number() OVER (PARTITION BY source ORDER BY hv) AS rk
        |  FROM sh),
        |agg AS (
        |  SELECT source, CAST(count(*) AS INTEGER) AS n_sketch, max(hv) AS kth
        |  FROM ranked WHERE rk <= 256 GROUP BY source)
        |SELECT source, n_sketch, kth,
        |       CASE WHEN n_sketch < 256 THEN CAST(n_sketch AS DOUBLE)
        |            ELSE CAST(1148417904979476480 AS DOUBLE) / CAST(kth AS DOUBLE)
        |       END AS est_distinct
        |FROM agg ORDER BY source""".stripMargin),

    // ---- cross-source overlap matrix from the SAME stored KMV sketches
    //      (ops.Kmv.pairwiseOverlap): estimated shared-shingle count for
    //      every source pair — the contamination/redundancy diagnostic a
    //      pipeline runs before mixing sources. HLL registers can't
    //      express intersections (union-only; inclusion-exclusion error
    //      scales with the union); a merged KMV bottom-k is a uniform
    //      sample of A ∪ B whose members witness side membership, so
    //      est(∩) = (shared share) x est(∪). The 45-pair join reads 10
    //      sketch rows, never the data. ORACLED end to end (exact-integer
    //      hash order + IEEE-exact estimator arithmetic on both engines).
    "a26_kmv_overlap" -> withOracle(
      (s, d) => {
        val t = toks(col("text"))
        val sh = Tables.spreadForCpu(Tables.documents(s, d))
          .select(col("source"), explode(ngrams(t, 3)).as("g"))
        val sk = graft.ops.Kmv.build(sh, col("source"), col("g"), k = 256)
        graft.ops.Kmv.pairwiseOverlap(sk, k = 256)
          .orderBy("grp_a", "grp_b")
      },
      """WITH sh AS (
        |  SELECT DISTINCT source,
        |         CAST(('0x' || substr(md5(g), 1, 13)) AS BIGINT) AS hv
        |  FROM (SELECT source, unnest(list_transform(range(1, len(t) - 1),
        |               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
        |        FROM (SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |              FROM documents))),
        |ranked AS (
        |  SELECT source, hv, row_number() OVER (PARTITION BY source ORDER BY hv) AS rk
        |  FROM sh),
        |mins AS (SELECT source, hv FROM ranked WHERE rk <= 256),
        |prs AS (SELECT a.source AS grp_a, b.source AS grp_b
        |        FROM (SELECT DISTINCT source FROM mins) a
        |        JOIN (SELECT DISTINCT source FROM mins) b ON a.source < b.source),
        |u AS (
        |  SELECT grp_a, grp_b, hv, max(ina) AS ina, max(inb) AS inb
        |  FROM (SELECT p.grp_a, p.grp_b, m.hv,
        |               CASE WHEN m.source = p.grp_a THEN 1 ELSE 0 END AS ina,
        |               CASE WHEN m.source = p.grp_b THEN 1 ELSE 0 END AS inb
        |        FROM prs p JOIN mins m ON m.source = p.grp_a OR m.source = p.grp_b)
        |  GROUP BY grp_a, grp_b, hv),
        |mg AS (SELECT grp_a, grp_b, hv, ina, inb,
        |              row_number() OVER (PARTITION BY grp_a, grp_b ORDER BY hv) AS rk
        |       FROM u),
        |agg AS (SELECT grp_a, grp_b, CAST(count(*) AS INTEGER) AS n_u,
        |               CAST(sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END)
        |                 AS INTEGER) AS c,
        |               max(hv) AS kth
        |        FROM mg WHERE rk <= 256 GROUP BY grp_a, grp_b)
        |SELECT grp_a, grp_b, n_u, c,
        |       CASE WHEN n_u < 256 THEN CAST(n_u AS DOUBLE)
        |            ELSE CAST(1148417904979476480 AS DOUBLE) / CAST(kth AS DOUBLE)
        |       END AS est_union,
        |       CAST(c AS DOUBLE) / CAST(n_u AS DOUBLE) AS est_jaccard,
        |       (CAST(c AS DOUBLE) / CAST(n_u AS DOUBLE)) *
        |       (CASE WHEN n_u < 256 THEN CAST(n_u AS DOUBLE)
        |             ELSE CAST(1148417904979476480 AS DOUBLE) / CAST(kth AS DOUBLE)
        |        END) AS est_intersect
        |FROM agg ORDER BY grp_a, grp_b""".stripMargin),

    // ---- exact GLOBAL order statistics via the distributed rank
    //      (ops.Ranks): the rows at ranks ceil(p*n) — quantile_disc
    //      semantics with exact VALUES, no single-partition sort anywhere
    //      (a12 interpolates within groups; this is the whole-table exact
    //      answer approx_percentile can only bound)
    "a17_rank_percentile" -> withOracle(
      (s, d) =>
        graft.ops.Ranks.orderStatistics(
            Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
            Seq(col("o_totalprice"), col("o_orderkey")),
            ps = Seq(0.25, 0.5, 0.75))
          .select("rank", "o_orderkey", "o_totalprice")
          .orderBy("rank"),
      """WITH r AS (
        |  SELECT o_orderkey, o_totalprice,
        |         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rk,
        |         count(*) OVER () AS n
        |  FROM orders)
        |SELECT CAST(rk AS BIGINT) AS rank, o_orderkey, o_totalprice FROM r
        |WHERE rk IN (CAST(ceil(0.25 * n) AS BIGINT),
        |             CAST(ceil(0.5 * n) AS BIGINT),
        |             CAST(ceil(0.75 * n) AS BIGINT))
        |ORDER BY rank""".stripMargin),

    // ---- exact EQUI-DEPTH histogram: bucket boundaries chosen so every
    //      bucket holds the same row count — the hard histogram, since
    //      depth needs the global order (q3's equi-WIDTH needs only a
    //      division). Ranks.ntileSpread supplies the distributed total
    //      order; the bucket envelope agg on top is an ordinary map-side-
    //      combined groupBy. This is the optimizer-statistics shape
    //      (selectivity estimation) and the data-layout shape (balanced
    //      range files) in one query.
    "a18_equidepth_hist" -> withOracle(
      (s, d) =>
        graft.ops.Ranks.ntileSpread(
            Tables.events(s, d).select("event_id", "value"),
            8, Seq(col("value"), col("event_id")))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_rows"),
               min("value").as("lo"), max("value").as("hi"))
          .orderBy("bucket"),
      """WITH r AS (
        |  SELECT value,
        |         CAST(ntile(8) OVER (ORDER BY value, event_id) AS INTEGER)
        |           AS bucket
        |  FROM events)
        |SELECT bucket, count(*) AS n_rows, min(value) AS lo, max(value) AS hi
        |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin),

    // ---- exact order statistics PER GROUP (Ranks.groupOrderStatistics):
    //      a17 stratified — the rows at ceil(p*n_g) within each group. A
    //      window partitioned by the group keys is already distributed
    //      (one task per group hash bucket), so no range machinery; a row
    //      that is two percentiles at once in a tiny group appears once
    //      per p, which keeps the output deterministic.
    "a19_group_orderstats" -> withOracle(
      (s, d) =>
        graft.ops.Ranks.groupOrderStatistics(
            Tables.orders(s, d)
              .select("o_orderpriority", "o_orderkey", "o_totalprice"),
            groupBy = Seq("o_orderpriority"),
            order = Seq(col("o_totalprice"), col("o_orderkey")),
            ps = Seq(0.25, 0.5, 0.75))
          .select("o_orderpriority", "p", "rank", "o_orderkey", "o_totalprice")
          .orderBy("o_orderpriority", "p"),
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice, o_orderkey) AS rk,
        |         count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, CAST(p AS DOUBLE) AS p, CAST(rk AS BIGINT) AS rank,
        |       o_orderkey, o_totalprice
        |FROM r JOIN (VALUES (0.25), (0.5), (0.75)) AS ps(p)
        |  ON rk = CAST(ceil(CAST(p AS DOUBLE) * n) AS BIGINT)
        |ORDER BY o_orderpriority, p""".stripMargin),

    // ---- exact percentiles per group. l_quantity is integral and the
    //      quarter-grid fractions are exact in binary, so linear
    //      interpolation is bit-identical whatever the engine's formula
    //      order — no rounding needed or allowed.
    "a12_percentile" -> withOracle(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(percentile(col("l_quantity"), lit(0.25)).as("p25"),
               percentile(col("l_quantity"), lit(0.5)).as("p50"),
               percentile(col("l_quantity"), lit(0.75)).as("p75"))
          .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.25) AS p25,
        |       quantile_cont(l_quantity, 0.5)  AS p50,
        |       quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- range join: non-equi banding of a fact column against a tiny
    //      boundary table. The bucket side is broadcast (nested-loop join
    //      against 3 rows — the only sane plan for a non-equi join at
    //      100 TB: fact streams, bounds ride along). Double sums stay exact
    //      because quantities are small integers.
    "j9_range_bucket" -> withOracle(
      (s, d) => {
        import s.implicits._
        val buckets = Seq((1L, 10L, "low"), (11L, 25L, "mid"), (26L, 50L, "high"))
          .toDF("lo", "hi", "label")
        Tables.lineitem(s, d)
          .join(broadcast(buckets),
            col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
          .orderBy("label")
      },
      """SELECT label, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem l
        |JOIN (VALUES (1, 10, 'low'), (11, 25, 'mid'), (26, 50, 'high'))
        |  b(lo, hi, label)
        |ON l.l_quantity >= lo AND l.l_quantity <= hi
        |GROUP BY label ORDER BY label""".stripMargin),

    // ---- Bloom-pruned semi-join: the fact scan drops non-matching rows
    //      BEFORE the shuffle via a broadcast bit-sketch of the key set
    //      (the regime where the dim no longer fits a broadcast hash
    //      table); the exact semi-join after removes false positives, so
    //      the result — and this oracle — are exact. Quantity sums stay
    //      bit-exact (small integers in doubles).
    "j10_bloom_semi" -> withOracle(
      (s, d) => {
        val hot = Tables.orders(s, d)
          .filter(col("o_totalprice") > 150000).select("o_orderkey")
        graft.ops.BloomJoin
          .bloomSemiJoin(Tables.lineitem(s, d), hot, "l_orderkey", "o_orderkey",
            expectedKeys = 100000L)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- Bloom-fast-path anti-join (incremental-ingest dedup: keep only
    //      rows a previous load has NOT seen). Bloom-negative rows skip
    //      the join entirely; only the bloom-positive fraction pays the
    //      exact anti-join shuffle. Result is exact — the complement of
    //      j10 — and the two oracles partition lineitem between them.
    "j11_bloom_anti" -> withOracle(
      (s, d) => {
        val seen = Tables.orders(s, d)
          .filter(col("o_totalprice") > 150000).select("o_orderkey")
        graft.ops.BloomJoin
          .bloomAntiJoin(Tables.lineitem(s, d), seen, "l_orderkey", "o_orderkey",
            expectedKeys = 100000L)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- inverted-index build: top-100 terms by document frequency with
    //      a bounded posting sample (sorted doc ids, first 10, joined to a
    //      string so both engines compare byte-identically). collect_list
    //      + sort_array is deterministic whatever the shuffle order.
    "t11_postings" -> withOracle(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), explode(array_distinct(toks(col("text")))).as("token"))
          .filter(col("token") =!= "")
          .groupBy("token")
          .agg(count(lit(1)).as("df"),
            concat_ws(",", slice(sort_array(collect_list(col("doc_id"))), 1, 10))
              .as("sample_docs"))
          .orderBy(col("df").desc, col("token"))
          .limit(100),
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents)
        |SELECT token, count(*) AS df,
        |       array_to_string(list_sort(list(doc_id))[1:10], ',') AS sample_docs
        |FROM tok WHERE token <> ''
        |GROUP BY token ORDER BY df DESC, token LIMIT 100""".stripMargin),

    // ---- Gopher quality rules (Rae et al. 2021, Appendix A1.1): the
    //      published rule battery as one scan-shaped pass. Every ratio
    //      test is an integer cross-multiply (10·sym <= words instead of
    //      sym/words <= 0.1), so no float boundary exists and the oracle
    //      is exact. Rules: word count in [50, 100k]; mean word length in
    //      [3, 10]; symbol-to-word ratio ('#' chars + '...' runs) <= 0.1;
    //      <= 90% of lines bullet-led and <= 30% ellipsis-ended; >= 80% of
    //      words contain a letter; >= 2 distinct Gopher stop words. Scale:
    //      pure per-row expressions, no shuffle, no UDF.
    "t17_gopher_rules" -> withOracle(
      (s, d) => {
        val t = split(trim(col("text")), "\\s+")
        val n = size(t)
        val sumLen = aggregate(transform(t, x => length(x)), lit(0), (a, x) => a + x)
        val nSym = (length(col("text")) -
          length(regexp_replace(col("text"), "#", ""))) +
          (length(col("text")) -
            length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / lit(3)
        val lines = split(col("text"), "\n")
        val nLines = size(lines)
        val nBullet = size(filter(lines, l =>
          l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•")))
        val nEllip = size(filter(lines, l => l.endsWith("...")))
        val nAlpha = size(filter(t, x => x.rlike("[a-zA-Z]")))
        val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
        val nStops = size(filter(
          array(gopherStops.map(lit): _*), w => array_contains(t, w)))
        def b(c: org.apache.spark.sql.Column) = when(c, 1L).otherwise(0L)
        Tables.documents(s, d)
          .select(col("doc_id"), n.as("n_words"),
            b(n >= 50 && n <= 100000).as("r_wordcount"),
            b(sumLen >= n * 3 && sumLen <= n * 10).as("r_meanlen"),
            b(nSym * 10 <= n).as("r_symbols"),
            b(nBullet * 10 <= nLines * 9 && nEllip * 10 <= nLines * 3).as("r_bullets"),
            b(nAlpha * 5 >= n * 4).as("r_alpha"),
            b(nStops >= 2).as("r_stopwords"))
          .withColumn("pass",
            col("r_wordcount") * col("r_meanlen") * col("r_symbols") *
              col("r_bullets") * col("r_alpha") * col("r_stopwords"))
          .orderBy("doc_id")
      },
      """WITH base AS (
        |  SELECT doc_id, text,
        |         regexp_split_to_array(trim(text), '\s+') AS t,
        |         string_split(text, chr(10)) AS lines
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |         CAST(len(t) AS INTEGER) AS n,
        |         CAST(list_sum(list_transform(t, x -> length(x))) AS INTEGER) AS sumlen,
        |         CAST(length(text) - length(replace(text, '#', ''))
        |              + (length(text) - length(replace(text, '...', ''))) / 3
        |           AS INTEGER) AS nsym,
        |         CAST(len(lines) AS INTEGER) AS nlines,
        |         CAST(len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '* %'
        |              OR l LIKE chr(8226) || '%')) AS INTEGER) AS nbullet,
        |         CAST(len(list_filter(lines, l -> l LIKE '%...')) AS INTEGER) AS nellip,
        |         CAST(len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]'))) AS INTEGER) AS nalpha,
        |         CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
        |              w -> list_contains(t, w))) AS INTEGER) AS nstops
        |  FROM base)
        |SELECT doc_id, n AS n_words,
        |       CAST(CASE WHEN n >= 50 AND n <= 100000 THEN 1 ELSE 0 END AS BIGINT) AS r_wordcount,
        |       CAST(CASE WHEN sumlen >= n * 3 AND sumlen <= n * 10 THEN 1 ELSE 0 END AS BIGINT) AS r_meanlen,
        |       CAST(CASE WHEN nsym * 10 <= n THEN 1 ELSE 0 END AS BIGINT) AS r_symbols,
        |       CAST(CASE WHEN nbullet * 10 <= nlines * 9 AND nellip * 10 <= nlines * 3
        |            THEN 1 ELSE 0 END AS BIGINT) AS r_bullets,
        |       CAST(CASE WHEN nalpha * 5 >= n * 4 THEN 1 ELSE 0 END AS BIGINT) AS r_alpha,
        |       CAST(CASE WHEN nstops >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stopwords,
        |       CAST(CASE WHEN n >= 50 AND n <= 100000 THEN 1 ELSE 0 END
        |          * CASE WHEN sumlen >= n * 3 AND sumlen <= n * 10 THEN 1 ELSE 0 END
        |          * CASE WHEN nsym * 10 <= n THEN 1 ELSE 0 END
        |          * CASE WHEN nbullet * 10 <= nlines * 9 AND nellip * 10 <= nlines * 3
        |                 THEN 1 ELSE 0 END
        |          * CASE WHEN nalpha * 5 >= n * 4 THEN 1 ELSE 0 END
        |          * CASE WHEN nstops >= 2 THEN 1 ELSE 0 END AS BIGINT) AS pass
        |FROM m ORDER BY doc_id""".stripMargin),

    // ---- C4 cleaning rules (Raffel et al. 2020, arXiv:1910.10683 §2.2):
    //      line-level — keep only lines ending in terminal punctuation,
    //      with >= 3 words, not mentioning javascript; document-level —
    //      >= 3 sentences after line filtering, no '{', no 'lorem ipsum'.
    //      The corpus text has no line/punctuation structure (single-line
    //      token streams), so the query PLANTS it deterministically from
    //      each doc's own tokens + doc_id (the t13/t20 synthesized-input
    //      pattern): some lines end unpunctuated (doc_id%3), one line is
    //      too short, one mentions javascript (doc_id%5), lorem/brace
    //      injections key on doc_id%17 / %13 — so every rule fires both
    //      ways across the corpus and the whole pipeline is exact
    //      integer/string work both engines restate verbatim. Scale:
    //      pure per-row expressions, no shuffle, no UDF.
    "t21_c4_rules" -> withOracle(
      (s, d) => {
        val t = split(trim(col("text")), "\\s+")
        def tok(i: Int) = element_at(t, i)
        val id = col("doc_id")
        val l1 = concat_ws(" ", tok(1), tok(2), tok(3), tok(4), lit("alpha."))
        val l2 = when(id % 3 === 0, concat_ws(" ", tok(5), tok(6), tok(7)))
          .otherwise(concat(concat_ws(" ", tok(5), tok(6), tok(7)), lit("!")))
        val l3 = lit("too short.")
        val l4 = when(id % 5 === 0,
            concat_ws(" ", tok(8), tok(9), lit("javascript required here.")))
          .otherwise(concat_ws(" ", tok(8), tok(9), tok(10), lit("omega?")))
        val l5 = when(id % 17 === 0, lit("lorem ipsum dolor sit."))
          .otherwise(lit("plain closing line here."))
        val l6 = when(id % 13 === 0, lit("function() { return 1; }"))
          .otherwise(lit("no code blocks anywhere."))
        val ptext = concat_ws("\n", l1, l2, l3, l4, l5, l6)
        val lines = split(ptext, "\n")
        val kept = filter(lines, l =>
          l.rlike("[.!?]$") && size(split(l, " ")) >= 3 &&
            !l.contains("javascript"))
        val kt = concat_ws("\n", kept)
        val nSent = length(kt) - length(regexp_replace(kt, "[.!?]", ""))
        def b(c: org.apache.spark.sql.Column) = when(c, 1L).otherwise(0L)
        Tables.documents(s, d)
          .select(col("doc_id"), size(kept).cast("long").as("n_kept"),
            nSent.cast("long").as("n_sent"),
            b(nSent >= 3).as("r_sent"),
            b(!ptext.contains("{")).as("r_brace"),
            b(!lower(ptext).contains("lorem ipsum")).as("r_lorem"))
          .withColumn("pass", col("r_sent") * col("r_brace") * col("r_lorem"))
          .orderBy("doc_id")
      },
      """WITH p AS (
        |  SELECT doc_id,
        |         regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |built AS (
        |  SELECT doc_id,
        |         concat_ws(chr(10),
        |           concat_ws(' ', t[1], t[2], t[3], t[4], 'alpha.'),
        |           CASE WHEN doc_id % 3 = 0 THEN concat_ws(' ', t[5], t[6], t[7])
        |                ELSE concat_ws(' ', t[5], t[6], t[7]) || '!' END,
        |           'too short.',
        |           CASE WHEN doc_id % 5 = 0
        |                THEN concat_ws(' ', t[8], t[9], 'javascript required here.')
        |                ELSE concat_ws(' ', t[8], t[9], t[10], 'omega?') END,
        |           CASE WHEN doc_id % 17 = 0 THEN 'lorem ipsum dolor sit.'
        |                ELSE 'plain closing line here.' END,
        |           CASE WHEN doc_id % 13 = 0 THEN 'function() { return 1; }'
        |                ELSE 'no code blocks anywhere.' END) AS ptext
        |  FROM p),
        |k AS (
        |  SELECT doc_id, ptext,
        |         array_to_string(list_filter(string_split(ptext, chr(10)), l ->
        |           regexp_matches(l, '[.!?]$') AND len(string_split(l, ' ')) >= 3
        |           AND NOT contains(l, 'javascript')), chr(10)) AS kt,
        |         len(list_filter(string_split(ptext, chr(10)), l ->
        |           regexp_matches(l, '[.!?]$') AND len(string_split(l, ' ')) >= 3
        |           AND NOT contains(l, 'javascript'))) AS n_kept
        |  FROM built),
        |m AS (
        |  SELECT doc_id, CAST(n_kept AS BIGINT) AS n_kept,
        |         CAST(length(kt) - length(regexp_replace(kt, '[.!?]', '', 'g'))
        |           AS BIGINT) AS n_sent,
        |         contains(ptext, '{') AS has_brace,
        |         contains(lower(ptext), 'lorem ipsum') AS has_lorem
        |  FROM k)
        |SELECT doc_id, n_kept, n_sent,
        |       CAST(CASE WHEN n_sent >= 3 THEN 1 ELSE 0 END AS BIGINT) AS r_sent,
        |       CAST(CASE WHEN has_brace THEN 0 ELSE 1 END AS BIGINT) AS r_brace,
        |       CAST(CASE WHEN has_lorem THEN 0 ELSE 1 END AS BIGINT) AS r_lorem,
        |       CAST(CASE WHEN n_sent >= 3 THEN 1 ELSE 0 END
        |          * CASE WHEN has_brace THEN 0 ELSE 1 END
        |          * CASE WHEN has_lorem THEN 0 ELSE 1 END AS BIGINT) AS pass
        |FROM m ORDER BY doc_id""".stripMargin),

    // ---- DSIR importance resampling (Xie et al. 2023, arXiv:2302.03169):
    //      hashed-ngram importance weights. Features = unigrams + bigrams,
    //      hashed into 256 buckets by md5 prefix (portable across
    //      engines); the target distribution comes from the src1 slice,
    //      the raw distribution from the whole corpus; each bucket's
    //      add-one-smoothed log ratio ln(p_t/p_r) is quantized to INTEGER
    //      micro-nats (the t14 trick) so per-doc summation is exact
    //      integer arithmetic in any order. A doc is kept when its total
    //      log ratio is positive — more target-like than raw — which
    //      avoids a global top-N window entirely. Scale: bucket stats are
    //      two 256-row broadcast aggregates + one-row totals; the corpus
    //      streams once through the bigram window and the bucket join.
    "dsir1_importance" -> withOracle(
      (s, d) =>
        dsirWeights(s, d)
          .withColumn("mean_ratio",
            col("weight").cast("double") / col("n_feats") / lit(1e7))
          .withColumn("kept", when(col("weight") > 0, 1L).otherwise(0L))
          .orderBy("doc_id"),
      s"""$dsirWeightCtes
        |SELECT doc_id, n_feats, weight,
        |       CAST(weight AS DOUBLE) / n_feats / 10000000.0 AS mean_ratio,
        |       CAST(CASE WHEN weight > 0 THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM w ORDER BY doc_id""".stripMargin),

    // ---- DSIR with a FIXED selection budget: the paper's actual protocol
    //      resamples a target number of documents, which naively is a
    //      global ORDER BY weight DESC LIMIT B — a single-partition sort
    //      at 100 TB. ops.Ranks' two-pass distributed row number assigns
    //      the global rank with one range shuffle + a boundary-offset map,
    //      so the budget cut is a filter. Weight table identical to dsir1
    //      (shared code both sides); oracle ranks with a window.
    "dsir2_topn" -> withOracle(
      (s, d) => {
        // materialize the weight table before ranking: Ranks' two passes
        // would otherwise each recompute the whole feature pipeline, and
        // (doc_id, weight) is tiny relative to the corpus that produced it
        // (measured 2.35 s -> 1.3 s at sf0.1)
        val (ranked, _) = graft.ops.Ranks.withGlobalRowNumber(
          dsirWeights(s, d).select("doc_id", "weight").localCheckpoint(),
          Seq(col("weight").desc, col("doc_id")), "rn")
        ranked.filter(col("rn") <= 100)
          .select(col("doc_id"), col("weight"), col("rn"))
          .orderBy("rn")
      },
      s"""$dsirWeightCtes
        |SELECT doc_id, weight,
        |       CAST(row_number() OVER (ORDER BY weight DESC, doc_id) AS BIGINT) AS rn
        |FROM w QUALIFY rn <= 100 ORDER BY rn""".stripMargin),

    // ---- per-source KL divergence from the corpus token distribution:
    //      the domain-drift diagnostic a corpus-mixing pipeline reads
    //      before reweighting (which sources are token-distribution
    //      outliers?). KL(p_s||p) = sum_t p_s(t)·ln(p_s(t)/p(t)); each
    //      token's contribution is computed from exact integer counts in
    //      double (deterministic on identical inputs) and quantized to
    //      nano-nats, so the per-source sum is order-immune integer
    //      arithmetic. Scale: two token-keyed aggregations and one
    //      token-keyed join (all partial-agg'd); per-source totals are a
    //      broadcast; nothing is driver-sized.
    "t18_source_kl" -> withOracle(
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("source"), explode(toks(col("text"))).as("token"))
        val cs = tok.groupBy("source", "token").agg(count(lit(1)).as("c_st"))
        val ct = tok.groupBy("token").agg(count(lit(1)).as("c_t"))
        val ns = cs.groupBy("source").agg(sum("c_st").as("n_s"))
        val nt = ct.agg(sum("c_t").as("n"))
        val q = floor((col("c_st").cast("double") / col("n_s")) *
            log((col("c_st").cast("double") * col("n")) /
                (col("n_s").cast("double") * col("c_t")))
            * lit(1e9) + lit(0.5)).cast("long")
        cs.join(ct, Seq("token"))
          .join(broadcast(ns), Seq("source"))
          .crossJoin(broadcast(nt))
          .select(col("source"), q.as("q"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_distinct"), sum("q").as("kl_nano"))
          .withColumn("kl_nats", col("kl_nano").cast("double") / lit(1e9))
          .orderBy("source")
      },
      """WITH tok AS (
        |  SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |  FROM documents),
        |cs AS (SELECT source, token, count(*) AS c_st FROM tok GROUP BY 1, 2),
        |ct AS (SELECT token, count(*) AS c_t FROM tok GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM cs GROUP BY 1),
        |nt AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM ct),
        |term AS (
        |  SELECT cs.source,
        |         CAST(floor((CAST(cs.c_st AS DOUBLE) / ns.n_s)
        |              * ln((CAST(cs.c_st AS DOUBLE) * nt.n)
        |                   / (CAST(ns.n_s AS DOUBLE) * ct.c_t))
        |              * 1000000000.0 + 0.5) AS BIGINT) AS q
        |  FROM cs JOIN ct USING (token) JOIN ns USING (source), nt)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_distinct,
        |       CAST(sum(q) AS BIGINT) AS kl_nano,
        |       CAST(sum(q) AS DOUBLE) / 1000000000.0 AS kl_nats
        |FROM term GROUP BY source ORDER BY source""".stripMargin),

    // ---- robust per-source outlier flags on document length
    //      (ops.Robust): median/MAD instead of mean/stddev so the
    //      detector is not dragged by the outliers it hunts. Discrete
    //      lower medians (rank ceil(n/2), a19's quantile_disc semantics)
    //      and an integer k*MAD cut make the whole thing oracle-exact.
    "q5_mad_outliers" -> withOracle(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            size(toks(col("text"))).cast("long").as("n_tok"))
        graft.ops.Robust
          .madOutliers(docs, Seq("source"), "n_tok", col("doc_id"), k = 3)
          .select("doc_id", "source", "n_tok", "med", "dev", "mad", "is_outlier")
          .orderBy("doc_id")
      },
      """WITH d AS (
        |  SELECT doc_id, source,
        |         CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r1 AS (
        |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY n_tok, doc_id) AS rk,
        |         count(*) OVER (PARTITION BY source) AS n
        |  FROM d),
        |med AS (SELECT source, n_tok AS med FROM r1 WHERE rk = (n + 1) // 2),
        |dv AS (
        |  SELECT d.doc_id, d.source, d.n_tok, m.med, abs(d.n_tok - m.med) AS dev
        |  FROM d JOIN med m USING (source)),
        |r2 AS (
        |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rk,
        |         count(*) OVER (PARTITION BY source) AS n
        |  FROM dv),
        |mad AS (SELECT source, dev AS mad FROM r2 WHERE rk = (n + 1) // 2)
        |SELECT v.doc_id, v.source, v.n_tok, CAST(v.med AS BIGINT) AS med,
        |       CAST(v.dev AS BIGINT) AS dev, CAST(a.mad AS BIGINT) AS mad,
        |       CAST(CASE WHEN v.dev > 3 * a.mad THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
        |FROM dv v JOIN mad a USING (source)
        |ORDER BY v.doc_id""".stripMargin),

    // ---- per-source winsorization at discrete quartiles (ops.Robust):
    //      the clip a mixing pipeline applies to heavy-tailed per-doc
    //      statistics before averaging. Quartile ranks are integer
    //      arithmetic ((n+3) div 4), bounds are values from the data —
    //      everything oracle-exact.
    "q6_winsorize" -> withOracle(
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            size(toks(col("text"))).cast("long").as("n_tok"))
        graft.ops.Robust.winsorize(docs, Seq("source"), "n_tok", col("doc_id"))
          .select("doc_id", "source", "n_tok", "lo", "hi", "clipped")
          .orderBy("doc_id")
      },
      """WITH d AS (
        |  SELECT doc_id, source,
        |         CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY n_tok, doc_id) AS rk,
        |         count(*) OVER (PARTITION BY source) AS n
        |  FROM d),
        |b AS (
        |  SELECT source, CAST(min(n_tok) AS BIGINT) AS lo, CAST(max(n_tok) AS BIGINT) AS hi
        |  FROM r WHERE rk = (n + 3) // 4 OR rk = (3 * n + 3) // 4
        |  GROUP BY source)
        |SELECT d.doc_id, d.source, d.n_tok, b.lo, b.hi,
        |       CAST(least(greatest(d.n_tok, b.lo), b.hi) AS BIGINT) AS clipped
        |FROM d JOIN b USING (source)
        |ORDER BY d.doc_id""".stripMargin),

    // ---- character-level Shannon entropy per document — the standard
    //      gibberish/degenerate-text signal (low entropy = repeated
    //      characters, high = uniform noise). Per-term contributions
    //      quantized to integer nano-nats (t18's discipline) so the
    //      per-doc sum is aggregation-order-immune. Scale: the char
    //      explode partial-aggregates to at most |alphabet| rows per doc
    //      before the shuffle. Character = UTF-16 unit here (Java split
    //      on ""); identical to DuckDB's codepoint split for BMP text —
    //      supplementary characters (emoji etc.) would count as two units
    //      on the Spark side, a documented non-issue for this corpus.
    "t19_char_entropy" -> withOracle(
      (s, d) => {
        val ch = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        val cc = ch.groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
        val n = cc.groupBy("doc_id").agg(sum("c").as("n"))
        val q = floor((col("c").cast("double") / col("n")) *
            log(col("n").cast("double") / col("c")) * lit(1e9) + lit(0.5))
          .cast("long")
        cc.join(n, Seq("doc_id"))
          .select(col("doc_id"), q.as("q"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_alpha"), sum("q").as("ent_nano"))
          .withColumn("ent_nats", col("ent_nano").cast("double") / lit(1e9))
          .orderBy("doc_id")
      },
      """WITH ch AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS ch
        |  FROM documents),
        |cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
        |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cc GROUP BY 1),
        |term AS (
        |  SELECT cc.doc_id,
        |         CAST(floor((CAST(cc.c AS DOUBLE) / n.n)
        |              * ln(CAST(n.n AS DOUBLE) / cc.c)
        |              * 1000000000.0 + 0.5) AS BIGINT) AS q
        |  FROM cc JOIN n USING (doc_id))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_alpha,
        |       CAST(sum(q) AS BIGINT) AS ent_nano,
        |       CAST(sum(q) AS DOUBLE) / 1000000000.0 AS ent_nats
        |FROM term GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  )
}
