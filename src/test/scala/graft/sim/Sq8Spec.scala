package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.Tables

/** SQ8 int8 scalar quantization (Ann.sq8Encode / sq8Search).
  *
  * Pins: the quantization error bound that holds by construction
  * (|x - c*m/127| <= m/254 per component); codes bounded in [-127, 127]
  * and stored as bytes (the 4x compression claim is the schema, not a
  * promise); recall@5 vs exact float cosine; partition invariance of the
  * ranking; and the IVF composition (SQ8 scoring within a probed cell ==
  * the flat SQ8 ranking post-filtered to that cell's candidates).
  */
class Sq8Spec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001).cache()
  private lazy val queries = emb.filter(col("vec_id") < 20)

  test("codes are int8 (schema + range) and dequantize within m/254 per component") {
    val enc = Ann.sq8Encode(emb)
    assert(enc.schema("sq8").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType === org.apache.spark.sql.types.ByteType)
    val worst = emb
      .join(enc.select("vec_id", "sq8", "sq8_scale"), "vec_id")
      .select(col("sq8_scale"),
        posexplode(zip_with(col("embedding"), col("sq8"),
          (x, c) => abs(x.cast("double") - c.cast("double") * col("sq8_scale") / 127.0))))
      .agg(max(col("col") / (col("sq8_scale") / 254.0))).collect().head.getDouble(0)
    assert(worst <= 1.0 + 1e-9, s"component error exceeded m/254: ratio $worst")
    val range = enc
      .agg(max(array_max(col("sq8"))), min(array_min(col("sq8")))).collect().head
    assert(range.getByte(0) <= 127 && range.getByte(1) >= -127)
  }

  test("recall@5 vs exact float cosine >= 0.9") {
    val exact = Ann.bruteForceTopK(emb, queries, k = 5)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = Ann.sq8Search(Ann.sq8Encode(emb), queries, k = 5)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & sq8).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@5 = $recall")
  }

  test("ranking is partition-invariant") {
    def run(parts: Int) =
      Ann.sq8Search(Ann.sq8Encode(emb.repartition(parts)), queries, k = 5)
        .orderBy("q_id", "rk").collect().toSeq
    assert(run(1) === run(13))
  }

  test("exact duplicate of a query ranks first with the maximal self-dot") {
    val base = Seq(
      (1L, Array(0.5f, -0.25f, 0.125f, 1.0f)),
      (2L, Array(0.5f, -0.25f, 0.125f, 1.0f)), // exact copy of 1
      (3L, Array(-1.0f, 0.5f, 0.25f, -0.5f)),
      (4L, Array(0.1f, 0.9f, -0.3f, 0.2f))
    ).toDF("vec_id", "embedding")
    val hits = Ann.sq8Search(Ann.sq8Encode(base), base.filter(col("vec_id") === 1), k = 3)
      .orderBy("rk").collect()
    assert(hits.head.getAs[Long]("vec_id") === 2L)
    // identical vectors quantize identically -> qdot(q, copy) = |q8|^2
    val self = Ann.sq8Encode(base).filter(col("vec_id") === 1)
      .select(aggregate(transform(col("sq8"), c => c.cast("long") * c.cast("long")),
        lit(0L), (a, x) => a + x)).collect().head.getLong(0)
    assert(hits.head.getAs[Long]("qdot") === self)
  }

  test("IVF composition: scoring within a probed cell == post-filtered flat ranking") {
    val model = Ann.fitIvf(emb, nCells = 8, lloydIters = 2)
    val codes = Ann.sq8Encode(emb)
    val cells = emb.select(col("vec_id"), model.assign(col("embedding")).as("cell"))
    val q0 = emb.filter(col("vec_id") === 0)
    val q0Cell = q0.select(model.assign(col("embedding"))).collect().head.getLong(0)
    // serving shape: candidates = the probed cell's codes only
    val probed = Ann.sq8Search(
        codes.join(cells.filter(col("cell") === q0Cell).select("vec_id"), "vec_id"),
        q0, k = 5)
      .orderBy("rk").collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("qdot"))).toSeq
    // reference: flat ranking over everything, filtered to the same cell
    val inCell = cells.filter(col("cell") === q0Cell)
      .collect().map(_.getLong(0)).toSet
    val flat = Ann.sq8Search(codes, q0, k = emb.count().toInt)
      .orderBy("rk").collect()
      .filter(r => inCell(r.getAs[Long]("vec_id")))
      .take(5).map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("qdot"))).toSeq
    assert(probed === flat)
  }
}
