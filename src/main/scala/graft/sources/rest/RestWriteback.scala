package graft.sources.rest

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.core.Retry

/** REST write-back (K9) and per-record enrichment (S3).
  *
  * K9 in the reference: POST a delivery note then poll until
  * `ReturnCode == 1` (/root/reference/dags/API_IPN.py:428-472, poll loop
  * :464-469), PATCH cancels (:473-490), PUT inventory (:741-807) — all
  * driver-side, serial. Here posting is distributed (`foreachPartition`
  * shape via mapPartitions so results are data, not side-channel), and the
  * poll-until-state loop stays a driver helper.
  *
  * S3 in the reference: per-item N+1 GETs from `Item.__init__`
  * (/root/reference/dags/CotyData_IPN.py:478-488) — its biggest
  * scalability sin. Two implementations behind one interface (SURVEY.md
  * §7.4): the faithful-but-parallel `enrichPerRecord` (pooled client per
  * partition) and the scale-path `enrichBatched` (bulk endpoint -> one
  * broadcast join).
  */
object RestWriteback {

  final case class PostResult(id: Long, httpCode: Int, returnCode: Int, body: String)

  /** Transport for a single record; `RecordClient` instances are created
    * once per partition (connection pooling point).
    */
  trait RecordClient extends Serializable {
    def post(id: Long, json: String): PostResult
    def status(id: Long): Int
    def close(): Unit = ()
  }
  trait ClientFactory extends Serializable { def open(): RecordClient }

  /** Distributed POST: one client per partition, one call per row, results
    * as a Dataset (inspectable, joinable, dead-letterable) instead of
    * fire-and-forget side effects.
    */
  def postAll(rows: Dataset[(Long, String)], factory: ClientFactory): Dataset[PostResult] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val client = factory.open()
      // iterator wrapper closes the client when the partition is drained
      new Iterator[PostResult] {
        def hasNext: Boolean = { val h = it.hasNext; if (!h) client.close(); h }
        def next(): PostResult = { val (id, json) = it.next(); client.post(id, json) }
      }
    }
  }

  /** Driver-side poll-until-confirmed (ReturnCode == 1 loop,
    * /root/reference/dags/API_IPN.py:464-469), with injectable sleep.
    */
  def pollUntilConfirmed(id: Long, client: RecordClient, attempts: Int = 10,
                         delayMs: Long = 1000, sleep: Long => Unit = Thread.sleep): Boolean = {
    var i = 0
    while (i < attempts) {
      if (client.status(id) == 1) return true
      sleep(delayMs)
      i += 1
    }
    false
  }

  /** S3 faithful path: per-record lookup with a pooled per-partition
    * client, wrapped in the reference's retry policy.
    */
  def enrichPerRecord(df: Dataset[Long], factory: ClientFactory): Dataset[(Long, Int)] = {
    import df.sparkSession.implicits._
    df.mapPartitions { it =>
      val client = factory.open()
      new Iterator[(Long, Int)] {
        def hasNext: Boolean = { val h = it.hasNext; if (!h) client.close(); h }
        def next(): (Long, Int) = {
          val id = it.next()
          id -> Retry.withBackoff(attempts = 3, sleep = _ => ())(client.status(id))
        }
      }
    }
  }

  /** S3 scale path: the N+1 redesigned as one bulk fetch + broadcast join
    * — the shape every at-scale enrichment should take.
    */
  def enrichBatched(df: DataFrame, bulk: DataFrame, key: String): DataFrame =
    df.join(org.apache.spark.sql.functions.broadcast(bulk), Seq(key), "left")
}
