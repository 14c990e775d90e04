package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exactly-once transactional streaming sink over [[graft.operators
  * .ManifestTable]] — the missing half of plain-parquet streaming: Spark's
  * file sink is append-only with a private log readers must cooperate
  * with, and a bare `foreachBatch { _.write.parquet(...) }` is at-least-
  * once (a batch retry after a sink-side crash duplicates rows). The
  * standard fix (the Delta/Iceberg streaming-sink design) is to make the
  * sink transactional and IDEMPOTENT PER BATCH ID: Spark's foreachBatch
  * contract replays a failed micro-batch with the SAME batchId and the
  * same data, so a sink that commits each batchId atomically at most once
  * is exactly-once end-to-end.
  *
  * [[commitBatch]] delegates both halves to the manifest protocol: the
  * atomic visibility point is the manifest rename, and the batchId rides
  * as the commit's stable `tag` — a retry whose files are already
  * referenced by the head snapshot is a no-op, and a torn first attempt
  * (data written, manifest never renamed) is invisible garbage that the
  * retry deletes and redoes. Readers see each micro-batch's rows exactly
  * once or not yet — never partially, never twice.
  *
  * Scale posture: per batch, one parquet write of the batch's own rows
  * and one O(files) manifest swap — cost is the micro-batch, never the
  * table. Compose with [[graft.operators.Compact]] when micro-batches
  * accumulate small files.
  */
object TxnSink {

  /** Commit one micro-batch; returns the committed (or already-committed)
    * snapshot version. Use as the body of `writeStream.foreachBatch`.
    *
    * The idempotence tag is namespaced by the STREAMING QUERY's identity,
    * matching Spark's (queryId, batchId) convention (r12 ADVICE): a bare
    * `batch-<id>` tag would make two different queries (or one restarted
    * with a fresh checkpoint) writing the same table silently skip each
    * other's batch 0, 1, ... as "already committed" — data loss, not a
    * conflict. `queryId` defaults to the `sql.streaming.queryId` local
    * property StreamExecution sets on the micro-batch thread foreachBatch
    * runs on, so in-stream use needs no extra plumbing; the id persists in
    * the checkpoint, so a restart of the SAME query (same checkpoint)
    * still no-ops its replays, while a fresh checkpoint gets a fresh
    * namespace and appends. Driver-side replays outside the stream (tests,
    * manual recovery) must pass the query's id explicitly — outside a
    * stream the property is unset, and a silent fallback to a bare
    * `batch-<id>` namespace would be a trap, not a convenience (r13
    * ADVICE): the in-stream commits it is supposed to replay live under
    * `<queryId>-batch-<id>`, so the mismatched-namespace replay would
    * RE-APPEND an already-committed batch as a duplicate instead of
    * no-oping — the exact failure this sink exists to prevent. No query
    * id from either source is therefore an error, not a namespace.
    */
  def commitBatch(dir: String, batch: DataFrame, batchId: Long,
      queryId: String = null): Long = {
    val qid = Option(queryId).orElse(Option(
      batch.sparkSession.sparkContext.getLocalProperty("sql.streaming.queryId")))
      .getOrElse(throw new IllegalArgumentException(
        "TxnSink.commitBatch has no query identity: outside a streaming " +
          "micro-batch thread the sql.streaming.queryId property is unset, " +
          "so pass queryId explicitly (StreamingQuery.id — stable in the " +
          "checkpoint). A bare batch-" + batchId + " tag would not match " +
          "in-stream commits made under '<queryId>-batch-" + batchId +
          "' and the replay would re-append the batch as a duplicate."))
    graft.operators.ManifestTable.commit(batch.sparkSession, dir, batch,
      replace = false, tag = s"$qid-batch-$batchId")
  }
}
