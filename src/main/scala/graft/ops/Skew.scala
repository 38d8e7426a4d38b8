package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers.
  *
  * AQE's skew-join handling is on session-wide (graft.core.Sessions); these
  * cover the cases AQE doesn't: a hot grouping key in an aggregation, and a
  * hot join key against a broadcastable dim. The salt is deterministic
  * (hash of a row-identity column, not rand()) so replays and retries see
  * identical partitioning — required for idempotent sinks.
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate on (keys, salt) —
    * spreading a hot key over `saltBuckets` reducers — then final-combine
    * on keys. `partials` supplies per-phase expressions: e.g. a global sum
    * is sum(partial sums), a global count is sum(partial counts).
    * Result is EXACTLY the plain groupBy for sum/count/min/max combines.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltCol: Column,
                      saltBuckets: Int,
                      partials: Seq[(Column, String)],
                      finals: Seq[(String, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltCol), lit(saltBuckets)))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._1.as(partials.head._2),
           partials.tail.map { case (c, n) => c.as(n) }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(finals.head._2(col(finals.head._1)).as(finals.head._1),
           finals.tail.map { case (n, f) => f(col(n)).as(n) }: _*)
  }

  /** Convenience: salted sum+count (covers the reference's A1/A5 shapes
    * under a hot key).
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     saltCol: Column, saltBuckets: Int = 16): DataFrame =
    saltedAggregate(df, keys, saltCol, saltBuckets,
      partials = Seq(sum(valueCol) -> "sum_value", count(lit(1)) -> "cnt"),
      finals = Seq("sum_value" -> (c => sum(c)), "cnt" -> (c => sum(c))))

  /** Salted equi-join for a hot fact key against a dim that is too big to
    * broadcast but modest enough to replicate `saltBuckets` times: each
    * fact row gets a deterministic salt from its own identity column
    * (NOT the join key — rows sharing the hot key must spread), the dim
    * explodes one copy per salt value, and the join runs on
    * (key, salt) — so the hot key's rows land on `saltBuckets` reducers
    * instead of one. Exactly equal to the plain inner join: every fact
    * row matches precisely the one dim copy carrying its salt.
    * Deterministic salt (hash, not rand()) keeps replays identical.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 identityCol: Column, saltBuckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(hash(identityCol), lit(saltBuckets)))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    saltedFact.join(saltedDim, keys :+ "__salt").drop("__salt")
  }
}
