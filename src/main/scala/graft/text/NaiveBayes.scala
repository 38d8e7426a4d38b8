package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over whitespace tokens — the fastText-style
  * lightweight text classifier an LLM data pipeline uses for language ID
  * and quality filtering (CCNet's fastText gate; GPT-3's quality
  * classifier), re-expressed as pure relational algebra:
  *
  *  - train = one groupBy over the training corpus (per-class token
  *    counts) plus three tiny aggregates (class totals, vocab size,
  *    priors) that broadcast;
  *  - score = the test corpus streamed ONCE through a (class, token)-keyed
  *    join, fanned out nClasses ways — linear in corpus size, no
  *    iteration, no driver state, no UDF.
  *
  * Cross-engine exactness discipline (the t14 pattern): every
  * -ln(likelihood) is quantized to integer micro-nats BEFORE summation,
  * so per-document scores are exact integers (immune to summation order)
  * and the argmin — tie-broken by class name — is deterministic. ln() ulp
  * drift could only flip a floor boundary with probability ~1e-9 per
  * distinct (class, token).
  *
  * The reference has no classifier surface; this is extension-brief
  * territory (text-analysis family, SURVEY.md §2 brief).
  */
object NaiveBayes {

  private def toks(c: Column) = split(lower(trim(c)), "\\s+")

  /** Laplace-smoothed multinomial NB: train per-class token stats on
    * `train`, score every row of `test`; both frames need (`idCol`,
    * `labelCol`, `textCol`). Returns (idCol, actual, predicted, hit) —
    * one row per test document that has at least one token.
    *
    * Unseen tokens get count 0 under the same (c+1)/(tot+V+1) smoothing,
    * so no likelihood is ever zero. Classes are whatever labels appear in
    * `train`; a test label absent from training can never be predicted
    * (and scores hit=0), which is the honest behavior.
    */
  def predict(train: DataFrame, test: DataFrame,
              idCol: String, labelCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val tokTr = train.select(col(labelCol).as("lang"), explode(t).as("token"))
      .filter(col("token") =!= "")
    val cnt = tokTr.groupBy("lang", "token").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("lang").agg(sum("c").as("tot"))
    val vocab = cnt.select("token").distinct().agg(count(lit(1)).as("v"))
    val prior = train.groupBy(col(labelCol).as("lang")).agg(count(lit(1)).as("nd"))
    val ntot = train.agg(count(lit(1)).as("ntot"))
    val cls = tot.join(prior, "lang").crossJoin(vocab).crossJoin(ntot)
      .select(col("lang").as("cand"), col("tot"), col("v"),
        floor(-log(col("nd").cast("double") / col("ntot")) * lit(1e7) + lit(0.5))
          .cast("long").as("prior_q"))
    val tokTe = test
      .select(col(idCol), col(labelCol).as("actual"), explode(t).as("token"))
      .filter(col("token") =!= "")
    val scored = tokTe.crossJoin(broadcast(cls.select("cand", "tot", "v")))
      .join(cnt.select(col("lang").as("cand"), col("token"), col("c")),
        Seq("cand", "token"), "left")
      .select(col(idCol), col("actual"), col("cand"),
        floor(-log((coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) /
                   (col("tot").cast("double") + col("v").cast("double") + lit(1.0)))
          * lit(1e7) + lit(0.5)).cast("long").as("q"))
      .groupBy(col(idCol), col("actual"), col("cand")).agg(sum("q").as("ll_u"))
    val w = Window.partitionBy(idCol).orderBy(col("score_u"), col("cand"))
    scored.join(broadcast(cls.select("cand", "prior_q")), "cand")
      .select(col(idCol), col("actual"), col("cand"),
        (col("ll_u") + col("prior_q")).as("score_u"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col(idCol), col("actual"), col("cand").as("predicted"),
        when(col("cand") === col("actual"), 1).otherwise(0).as("hit"))
  }
}
