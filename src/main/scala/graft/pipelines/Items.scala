package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Normalize

/** Items pipeline: item master + child tables (barcodes, suppliers,
  * 3-level attributes, combo details) and delete/undelete flag derivation
  * (/root/reference/dags/CotyData_IPN.py:478-556, :609-718).
  *
  * The reference does N+1 HTTP fetches per item for the child lists (S3,
  * its biggest scalability sin); here children arrive as nested arrays on
  * the item document and every child table is a narrow explode.
  */
object Items {

  val auditSchema = StructType(Seq(
    StructField("CreationDatetime", StringType),
    StructField("ModificationDatetime", StringType),
    StructField("DeletionDatetime", StringType),
    StructField("UnDeletionDatetime", StringType)))

  val docSchema = StructType(Seq(
    StructField("Id", LongType), StructField("Code", StringType),
    StructField("Guid", StringType), StructField("FamilyId", IntegerType),
    StructField("CategoryId", IntegerType), StructField("TradeMarkId", IntegerType),
    StructField("Description", StringType), StructField("IsDeleted", BooleanType),
    StructField("IsItemsGroup", BooleanType), StructField("DoNotAllowToBuy", BooleanType),
    StructField("DoNotAllowToSell", BooleanType),
    StructField("Audit", auditSchema),
    StructField("barcodes", ArrayType(StructType(Seq(StructField("Barcode", StringType))))),
    StructField("suppliers", ArrayType(StructType(Seq(
      StructField("Supplier", StructType(Seq(StructField("Id", LongType)))))))),
    StructField("attributes", ArrayType(StructType(Seq(
      StructField("Attributes", ArrayType(StructType(Seq(
        StructField("Values", ArrayType(StructType(Seq(StructField("Id", LongType)))))))))))))
    ,
    StructField("groupDetails", ArrayType(StructType(Seq(
      StructField("Id", LongType), StructField("UnitQty", DoubleType)))))))

  /** Master rows: ARTICULO_HABILITADO = !IsDeleted
    * (/root/reference/dags/CotyData_IPN.py:502).
    */
  def master(docs: DataFrame): DataFrame =
    docs.select(
      col("Id").as("ITEM_ID"), col("Code").as("SKU"),
      col("Description").as("DESCRIPCION_ARTICULO"),
      col("FamilyId").as("CODIGO_FAMILIA"), col("CategoryId").as("CODIGO_CATEGORIA"),
      col("TradeMarkId").as("CODIGO_MARCA"),
      (!col("IsDeleted")).cast("int").as("ARTICULO_HABILITADO"),
      col("IsItemsGroup").cast("int").as("ES_COMBO"),
      (!col("DoNotAllowToBuy")).cast("int").as("PERMITE_COMPRA"),
      (!col("DoNotAllowToSell")).cast("int").as("PERMITE_VENTA"),
      col("Audit.CreationDatetime").cast("timestamp").as("FECHA_ALTA"))

  /** Barcode child table (G10, /root/reference/dags/CotyData_IPN.py:509-520). */
  def barcodes(docs: DataFrame): DataFrame =
    Normalize.explodeChild(docs.withColumnRenamed("Id", "ITEM_ID"), "barcodes", Seq("ITEM_ID"))
      .withColumnRenamed("Barcode", "CODIGO_BARRAS")

  /** Supplier links (/root/reference/dags/CotyData_IPN.py:538-546). */
  def suppliers(docs: DataFrame): DataFrame =
    Normalize.explodeChild(docs.withColumnRenamed("Id", "ITEM_ID"), "suppliers", Seq("ITEM_ID"))
      .select(col("ITEM_ID"), col("Supplier.Id").as("CODIGO_PROVEEDOR"))

  /** 3-level attribute flatten (G8, /root/reference/dags/CotyData_IPN.py:528-536):
    * attributes[] -> Attributes[] -> Values[] via chained explode.
    */
  def attributeValues(docs: DataFrame): DataFrame = {
    val l1 = Normalize.explodeChild(docs.withColumnRenamed("Id", "ITEM_ID"),
      "attributes", Seq("ITEM_ID"))
    val l2 = Normalize.explodeChild(l1, "Attributes", Seq("ITEM_ID"))
    Normalize.explodeChild(l2, "Values", Seq("ITEM_ID"))
      .withColumnRenamed("Id", "ID_VALOR_ATRIBUTO")
  }

  /** Combo components (G9, /root/reference/dags/CotyData_IPN.py:548-556),
    * only for IsItemsGroup items (:481-488).
    */
  def comboDetails(docs: DataFrame): DataFrame =
    Normalize.explodeChild(
      docs.filter(col("IsItemsGroup")).withColumnRenamed("Id", "ITEM_ID"),
      "groupDetails", Seq("ITEM_ID"))
      .withColumnsRenamed(Map("Id" -> "COMPONENTE_ID", "UnitQty" -> "CANTIDAD"))

  /** Enabled-flag from latest delete/undelete (A2/X15,
    * /root/reference/dags/CotyData_IPN.py:702-708): max(DeletionDatetime) vs
    * max(UnDeletionDatetime) per SKU; deletion later -> disabled.
    */
  def enabledFlags(docs: DataFrame): DataFrame =
    docs.groupBy(col("Code").as("SKU"))
      .agg(max(col("Audit.DeletionDatetime").cast("timestamp")).as("del_ts"),
           max(col("Audit.UnDeletionDatetime").cast("timestamp")).as("undel_ts"))
      .withColumn("ARTICULO_HABILITADO",
        when(col("del_ts").isNotNull &&
             (col("undel_ts").isNull || col("del_ts") > col("undel_ts")), 0).otherwise(1))
      .select("SKU", "ARTICULO_HABILITADO")
}
