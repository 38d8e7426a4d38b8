package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-based sources (S6 and the engine's native formats).
  *
  * The reference's one file source is `pd.read_excel(..., usecols=[...])`
  * (/root/reference/dags/Funciones_CotyData.py:349 — which also calls an
  * undefined helper, a known reference defect). Real .xlsx lives in
  * [[Xlsx]] (JDK-native ZIP+StAX, distributed parse); CSV/JSON here give
  * the same surface for plain-text feeds, with an explicit schema and
  * column pruning (`usecols` ≙ select, which Catalyst pushes into the
  * scan).
  */
object Files {

  def csv(spark: SparkSession, path: String, schema: StructType,
          useCols: Seq[String] = Nil, header: Boolean = true,
          delimiter: String = ","): DataFrame = {
    val df = spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .schema(schema)
      .csv(path)
    if (useCols.isEmpty) df else df.select(useCols.map(df.col): _*)
  }

  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC round-trip — the other columnar format warehouse estates feed
    * us; Spark's native reader gives the same pushdown/pruning story as
    * parquet (PushedFilters/ReadSchema reach the scan).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
               mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)
}
