package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by minimum-label propagation (the
  * hash-min pattern): each iteration every vertex adopts the smallest
  * label among itself and its neighbours — one equi-join + one aggregation
  * per round, converging in O(component diameter) rounds. This is the
  * transitive-closure step a dedup pipeline needs on top of pairwise
  * near-dup output: pairs (a,b),(b,c) collapse to ONE cluster with one
  * survivor, which per-pair min-id logic cannot do.
  *
  * Scale posture: every round shuffles only (vertex, label) pairs and the
  * edge list on vertex id; per-round RDD snapshots truncate lineage so the
  * plan stays flat across iterations. Skewed hub vertices aggregate via
  * map-side partial min. Convergence is checked every TWO propagation
  * steps: label propagation is monotone (labels only decrease), so two
  * steps are a no-op iff each is — and halving the driver actions halves
  * the per-round scheduling overhead that dominates at small round sizes.
  *
  * Block bookkeeping: all per-round snapshots AND the final labels are
  * freed before returning — the result is sealed (eagerly materialized)
  * through the caller's [[Tracked]], which owns the one surviving block.
  */
object Components {

  /** @param edges  undirected edge list
    * @param inputs the Tracked that holds the caches FEEDING `edges` (the
    *               edge-pair cache, shingle tables) and nothing else. The
    *               name is the contract: EVERY intermediate kept on this
    *               handle is freed as soon as the first propagation round
    *               has materialized the symmetric edge cache — a Tracked
    *               carrying caches some sibling pipeline still reads must
    *               NOT be passed here (it would silently recompute them).
    *               The sealed result is registered as owned on the same
    *               handle, so `inputs.release()` reclaims everything.
    * @return (id, cluster) — cluster = smallest vertex id reachable
    */
  def connected(edges: DataFrame, a: String = "a_id", b: String = "b_id",
      inputs: Tracked = new Tracked): DataFrame = {
    val spark = edges.sparkSession
    // the edge list is cached PRE-PARTITIONED on v — the only key it ever
    // joins on — so no propagation round re-shuffles it: each step's join
    // exchanges only the (vertex, label) frame. At scale the edge list is
    // the dominant frame; shuffling it once instead of once-per-round is
    // the difference between O(E) and O(E·diameter) network traffic.
    // NO distinct() on the symmetric expansion: min-label propagation is
    // idempotent under duplicate edges (min over a multiset of neighbour
    // labels = min over the set), our pair generators already emit
    // distinct (a<b) pairs, and the dedup would cost a full extra shuffle
    // of the dominant frame per run. Callers with heavily duplicated edge
    // lists should pre-distinct — a size/perf choice, never correctness.
    val sym = edges.select(col(a).cast("long").as("u"), col(b).cast("long").as("v"))
      .union(edges.select(col(b).cast("long").as("u"), col(a).cast("long").as("v")))
      .repartition(col("v"))
      .persist()
    // Lineage truncation with explicit block bookkeeping: each checkpoint's
    // frame is snapped to a persisted RDD we hold a handle to, so every
    // snapshot is unpersisted before returning — localCheckpoint would
    // strand O(rounds) block sets that neither Dataset.unpersist nor the
    // SQL cache manager can free.
    var kept: List[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]] = Nil
    def snap(df: DataFrame): DataFrame = {
      val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      kept = rdd :: kept
      spark.createDataFrame(rdd, df.schema)
    }
    // one propagation step, composed lazily: every vertex u hears the
    // current label of each neighbour v and keeps the minimum. `lbl0` (the
    // label at the START of the current action) is threaded through so the
    // convergence check is a filter on the same frame — no extra
    // compare-join stage per action.
    def step(cur: DataFrame): DataFrame = {
      val heard = sym
        .join(cur.select(col("id").as("v"), col("lbl").as("nlbl")), "v")
        .groupBy(col("u").as("id")).agg(min(col("nlbl")).as("nmin"))
      cur.join(heard, Seq("id"), "left")
        .select(col("id"), col("lbl0"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
    }
    // no snapshot for the initial labels: the frame is one distinct over
    // the (cached) edge list — depth-1 lineage, nothing to truncate, and
    // skipping the RDD persist saves a materialization in round 1
    var lbl = sym.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("lbl0"), col("id").as("lbl"))
    var changed = 1L
    var firstRound = true
    while (changed > 0) {
      val next = snap(step(step( // two steps per action (monotone labels)
        lbl.select(col("id"), col("lbl").as("lbl0"), col("lbl")))))
      changed = next.filter(col("lbl") < col("lbl0")).count()
      lbl = next
      if (firstRound) {
        // round 1's action materialized the symmetric edge cache, so the
        // caller's tracked INPUT caches (pair stream, shingle tables) are
        // dead weight now — free them instead of pinning ~double the edge
        // storage for the remaining O(diameter) rounds
        inputs.free()
        firstRound = false
      }
    }
    val out = inputs.seal(lbl.select(col("id"), col("lbl").as("cluster")))
    sym.unpersist(blocking = false)
    kept.foreach(_.unpersist(blocking = false))
    out
  }
}
