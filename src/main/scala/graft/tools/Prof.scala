package graft.tools
object Prof {
  def main(a: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("32", "prof")
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.1").cache()
    println("docs=" + docs.count())
    def time[T](label: String)(f: => T): T = { val t0=System.nanoTime(); val r=f; println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    import graft.dedup.MinHashDedup._
    val sh = shingleSets(docs, "doc_id", "text", 3).cache()
    time("shingles"){ sh.count() }
    println("avg shingles/doc=" + sh.select(avg(size(col("sh")))).head.getDouble(0))
    val keys = bandKeysFromShingles(sh, "doc_id", 16, 8)
    time("bandKeys"){ keys.cache().count() }
    val cands = candidatePairs(keys, "doc_id")
    time("cands"){ println("cands=" + cands.cache().count()) }
    val dups = verifiedPairsFromShingles(sh, cands, "doc_id", 0.7)
    time("verify"){ println("dups=" + dups.cache().count()) }
    val g = groups(docs, dups, "doc_id")
    time("groups"){ g.count() }
    time("full"){ nearDupGroups(docs, "doc_id", "text").count() }
    spark.stop()
  }
}
