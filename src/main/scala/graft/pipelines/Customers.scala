package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Cleaning, Dates}

/** Customers V3 pipeline: nested customer -> CLIENTES rows
  * (/root/reference/dags/CotyData_IPN.py:2205-2224).
  *
  * Exercises the struct/array extraction family: dot-path struct access
  * (X11), first-match array filter (X12), positional array index quirk
  * (X13 — the reference reads Addresses[1].ZipCode), null-safe "State;
  * City" concat (X14). All higher-order array functions — no explode
  * needed, so the transform is a pure projection on the scan.
  */
object Customers {

  val addressSchema = StructType(Seq(
    StructField("Type", StringType), StructField("ZipCode", StringType),
    StructField("City", StringType), StructField("State", StringType)))

  val docSchema = StructType(Seq(
    StructField("Id", LongType), StructField("CustomerCode", StringType),
    StructField("CustomerFiscalName", StringType),
    StructField("CustomAttribute", StructType(Seq(StructField("Name", StringType)))),
    StructField("Tax", StructType(Seq(StructField("IdentificationNumber", StringType)))),
    StructField("PriceList", StructType(Seq(StructField("Id", IntegerType)))),
    StructField("Audit", StructType(Seq(StructField("CreationDate", StringType)))),
    StructField("Addresses", ArrayType(addressSchema))))

  /** V3 transform, parameterized by company id (the reference loops
    * rz ∈ [1,2,4], /root/reference/dags/CotyData_IPN.py:2228-2235).
    */
  def transform(docs: DataFrame, razonSocial: Int): DataFrame = {
    val fiscal = element_at(
      filter(col("Addresses"), a => a.getField("Type") === "fiscal_address"), 1)
    docs.select(
      col("CustomerCode").as("ID_CLIENTE"),
      col("Id").as("NUMERO_CLIENTE"),
      col("CustomerFiscalName").as("RAZON_SOCIAL_CLIENTE"),
      col("Tax.IdentificationNumber").as("CUIT"),
      col("PriceList.Id").as("ID_PRECIOS_LISTA"),
      // ISO date prefix of Audit.CreationDate (split 'T',
      // /root/reference/dags/CotyData_IPN.py:2221)
      Dates.isoDatePrefix(col("Audit.CreationDate")).as("FECHA_ALTA"),
      // positional quirk preserved: the 2nd address's zip (:2213)
      element_at(col("Addresses"), 2).getField("ZipCode").as("CODIGO_POSTAL"),
      // null-safe "State; City" from the first fiscal address (:2215-2217)
      Cleaning.nullSafeJoin(fiscal.getField("State"), fiscal.getField("City"), "; ")
        .as("LOCALIDAD"),
      // ''-as-null group attribute (:2210 guarded .get)
      when(col("CustomAttribute.Name") === "", lit(null))
        .otherwise(col("CustomAttribute.Name")).as("GRUPO"),
      lit(razonSocial).as("ID_RAZON_SOCIAL"))
  }
}
