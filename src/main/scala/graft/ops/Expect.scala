package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations, evaluated with the minimum
  * number of passes: every row-local rule (not-null, range, set
  * membership, arbitrary predicate) folds into ONE aggregate over ONE
  * scan; each uniqueness rule is one (count, count-distinct) aggregate;
  * each referential rule is one anti-join count against its dimension
  * (broadcast when small — Spark's planner decides). Output is one row
  * per rule: (rule, violations, total, pass).
  *
  * This is the engine-side generalization of the reference's ad-hoc
  * pre-load validity checks (row-count/null guards before `to_sql`,
  * /root/reference/dags/CotyData_IPN.py:191-248) into a reusable,
  * scan-bounded contract check — the "expectations" pattern a warehouse
  * gate runs before promoting a batch.
  */
object Expect {

  sealed trait Rule { def name: String }
  /** Row-local predicate must hold (null predicate result = violation). */
  final case class Satisfies(name: String, predicate: Column) extends Rule
  final case class NotNull(colName: String) extends Rule {
    val name = s"not_null_$colName"
  }
  /** Inclusive bounds. */
  final case class InRange(colName: String, lo: Double, hi: Double) extends Rule {
    val name = s"range_$colName"
  }
  final case class InSet(colName: String, values: Seq[String]) extends Rule {
    val name = s"in_set_$colName"
  }
  /** `cols` combinations must not repeat: violations = rows - distinct.
    * The column list joins with "·" (not "_", which can appear inside
    * identifiers): Unique(Seq("a","b")) and Unique(Seq("a_b")) must not
    * collapse to the same rule name.
    */
  final case class Unique(cols: Seq[String]) extends Rule {
    val name = s"unique_${cols.mkString("·")}"
  }
  /** Every non-null `colName` must exist in `dim.dimCol`: violations =
    * rows whose key finds no partner (anti-join count).
    */
  final case class RefIntegrity(name: String, colName: String,
                                dim: DataFrame, dimCol: String) extends Rule

  private def violationCond(r: Rule): Column = r match {
    case Satisfies(_, p)   => !coalesce(p, lit(false))
    case NotNull(c)        => col(c).isNull
    case InRange(c, lo, hi) =>
      !coalesce(col(c) >= lo && col(c) <= hi, lit(false))
    case InSet(c, vs)      => !coalesce(col(c).isin(vs: _*), lit(false))
    case _ => throw new IllegalArgumentException(s"not row-local: $r")
  }

  /** One row per rule: (rule, violations, total, pass). Row-local rules
    * share a single scan; see object doc for the pass structure.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    // rule names key the output — two rules sharing one produce rows a
    // consumer cannot tell apart, so reject the call outright
    val dup = rules.groupBy(_.name).collect { case (n, rs) if rs.size > 1 => n }
    require(dup.isEmpty, s"duplicate rule names: ${dup.mkString(", ")}")
    val rowLocal = rules.filter {
      case _: Satisfies | _: NotNull | _: InRange | _: InSet => true
      case _ => false
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // one materialized (rule-count + total) row shared by everything that
    // needs the table's cardinality — referential rules must NOT each
    // re-scan df for a total (checkpointed: a one-row frame, one scan)
    lazy val totalDf: DataFrame =
      df.agg(count(lit(1)).as("total")).localCheckpoint(true)
    if (rowLocal.nonEmpty) {
      // coalesce: sum() over ZERO rows is NULL, and an empty batch
      // violates nothing — without it every rule on an empty frame
      // reports (NULL, 0, fail)
      val aggs = count(lit(1)).as("__total") +:
        rowLocal.zipWithIndex.map { case (r, i) =>
          coalesce(sum(when(violationCond(r), 1L).otherwise(0L)), lit(0L))
            .as(s"__v$i")
        }
      val one = df.agg(aggs.head, aggs.tail: _*)
      frames += one.select(explode(array(rowLocal.zipWithIndex.map { case (r, i) =>
          struct(lit(r.name).as("rule"), col(s"__v$i").as("violations"),
            col("__total").as("total"))
        }: _*)).as("r"))
        .select(col("r.rule"), col("r.violations"), col("r.total"))
    }
    rules.foreach {
      case u @ Unique(cols) =>
        // NOT count(distinct ...): SQL distinct-count SKIPS rows where any
        // key is null, silently under-reporting duplicates of null-bearing
        // combos. groupBy treats null as a value, which is what "this
        // combination must not repeat" means.
        frames += df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum("__c"), lit(0L)).as("total"),
            count(lit(1)).as("__d"))
          .select(lit(u.name).as("rule"),
            (col("total") - col("__d")).as("violations"), col("total"))
      case r @ RefIntegrity(_, c, dim, dimCol) =>
        val orphans = df.filter(col(c).isNotNull)
          .join(dim.select(col(dimCol).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("violations"))
        frames += orphans.crossJoin(totalDf)
          .select(lit(r.name).as("rule"), col("violations"), col("total"))
      case _ => () // row-local, handled above
    }
    frames.reduce(_ unionByName _)
      .withColumn("pass", when(col("violations") === 0, 1).otherwise(0))
  }
}
