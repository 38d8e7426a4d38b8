package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.ops.{Cleaning, Conform, Dedup, Normalize}
import Registry._

/** Flagship end-to-end slice: the sales-documents pipeline (SURVEY.md §3.2).
  *
  * The reference consumes nested sales documents (header + Items[]) and
  * emits flat warehouse rows (/root/reference/dags/CotyData_IPN.py:251-316):
  * split the document, explode the detail lines with parent keys, derive
  * measures, flip signs on credit notes, rename to warehouse columns,
  * conform the schema, dedup before load.
  *
  * Here the nested documents are constructed from the star schema (orders =
  * headers, lineitem = Items[]) so the DuckDB oracle can state the expected
  * flat result directly — the pipeline must invert its own nesting exactly.
  */
object Flagship {

  private val detailSchema = StructType(Seq(
    StructField("ID_VENTA", LongType),
    StructField("NUMERO_LINEA", IntegerType),
    StructField("ITEM_ID", LongType),
    StructField("CANTIDAD_VENTA", DoubleType),
    StructField("SUBTOTAL_NETO", DoubleType),
    StructField("COSTO_NETO", DoubleType),
    StructField("UTILIDAD_TOTAL_NETA", DoubleType)))

  /** Priority codes standing in for the credit-note InvoiceType set
    * (/root/reference/dags/CotyData_IPN.py:73-75).
    */
  private val creditCodes = Seq("2", "4")

  val defs: Seq[(String, Entry)] = Seq(
    "pipe_sales_details" -> withOracle(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o  = Tables.orders(s, d)

        // extract: nested sales documents (header + Items[]), G1 inverse
        val items = Normalize.nest(li, Seq("l_orderkey"),
          Seq("l_linenumber", "l_partkey", "l_quantity", "l_extendedprice", "l_discount"),
          "Items")
        val docs = o.join(items, o("o_orderkey") === items("l_orderkey")).drop("l_orderkey")

        // header transform: invoice-number split (X1) -> credit-note flag (F1)
        val hdr = Cleaning.splitInto("o_orderpriority", "-", Seq("prio_code", "prio_label"))(docs)

        // G2: explode details, parent keys injected
        val det = Normalize.explodeChild(hdr, "Items", Seq("o_orderkey", "prio_code"))

        // P6: derived measures; P8: credit-note sign flip on the derived cols
        val derived = det
          .withColumn("SUBTOTAL_NETO", round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
          .withColumn("COSTO_NETO", round(col("l_extendedprice") * 0.8, 4))
          .withColumn("UTILIDAD_TOTAL_NETA",
            round(col("l_extendedprice") * (lit(1) - col("l_discount")) -
                  col("l_extendedprice") * 0.8, 4))
          .withColumnRenamed("l_quantity", "CANTIDAD_VENTA")
        val flipped = Cleaning.signFlip(
          Seq("CANTIDAD_VENTA", "SUBTOTAL_NETO", "UTILIDAD_TOTAL_NETA"),
          col("prio_code").isin(creditCodes: _*))(derived)

        // P3/P4: warehouse renames + schema conform. (Dedup-before-load is
        // keyed on the full detail identity; (ID_VENTA, NUMERO_LINEA) alone
        // is not unique in this data — see a4_dedup_first for keep-first.)
        val named = flipped
          .withColumnRenamed("o_orderkey", "ID_VENTA")
          .withColumnRenamed("l_linenumber", "NUMERO_LINEA")
          .withColumnRenamed("l_partkey", "ITEM_ID")
        Conform.conformTo(detailSchema)(named)
          .orderBy("ID_VENTA", "NUMERO_LINEA", "ITEM_ID", "CANTIDAD_VENTA", "COSTO_NETO")
      },
      """SELECT o_orderkey AS ID_VENTA,
        |       l_linenumber AS NUMERO_LINEA,
        |       l_partkey AS ITEM_ID,
        |       CASE WHEN string_split(o_orderpriority, '-')[1] IN ('2','4')
        |            THEN -l_quantity ELSE l_quantity END AS CANTIDAD_VENTA,
        |       CASE WHEN string_split(o_orderpriority, '-')[1] IN ('2','4')
        |            THEN -round(l_extendedprice * (1 - l_discount), 4)
        |            ELSE round(l_extendedprice * (1 - l_discount), 4) END AS SUBTOTAL_NETO,
        |       round(l_extendedprice * 0.8, 4) AS COSTO_NETO,
        |       CASE WHEN string_split(o_orderpriority, '-')[1] IN ('2','4')
        |            THEN -round(l_extendedprice * (1 - l_discount) - l_extendedprice * 0.8, 4)
        |            ELSE round(l_extendedprice * (1 - l_discount) - l_extendedprice * 0.8, 4) END AS UTILIDAD_TOTAL_NETA
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY 1, 2, 3, 4, 6""".stripMargin),

    // ---- second oracle-backed pipeline: the ACTUAL DeliveryNotes
    //      transform (explode + (REFER_ID, ITEM_ID) group-sum,
    //      /root/reference/dags/CotyData_IPN.py:1235) over delivery-note
    //      documents synthesized from the star schema
    "pipe_dn_details" -> withOracle(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val docs = li.groupBy("l_orderkey")
          .agg(sort_array(collect_list(struct(
            col("l_partkey").as("ItemID"), col("l_quantity").as("UnitQty")))).as("Items"))
          .select(col("l_orderkey").as("SaleReferID"),
            concat(lit("R-"), col("l_orderkey")).as("SaleReferNumber"),
            col("Items"))
        graft.pipelines.DeliveryNotes.transformDetails(docs)
          .select(col("REFER_ID"), col("ITEM_ID"), col("NUMERO_REMITO"),
            round(col("CANTIDAD_REMITIDA"), 2).as("CANTIDAD_REMITIDA"))
          .orderBy("REFER_ID", "ITEM_ID")
      },
      """SELECT l_orderkey AS REFER_ID, l_partkey AS ITEM_ID,
        |       'R-' || l_orderkey AS NUMERO_REMITO,
        |       round(sum(l_quantity), 2) AS CANTIDAD_REMITIDA
        |FROM lineitem GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin)
  )
}
