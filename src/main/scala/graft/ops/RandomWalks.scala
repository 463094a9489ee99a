package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation — the DeepWalk / node2vec
  * input primitive (Perozzi et al. 2014; Grover & Leskovec 2016): short
  * walks sampled from each seed vertex become the "sentences" a
  * skip-gram embedding trains on. The reference's traversal surface stops
  * at bounded k-hop expansion (mongraph.py:252-274 `_explode_node`); walk
  * sampling is the graph-ML extension of the same undirected adjacency
  * (mongraph.py:236-241 traverses both endpoint directions).
  *
  * Determinism: no `rand()`. The next hop from a frontier is the
  * neighbor minimizing a replayable affine priority
  * `(A·((walk·131 + step·17 + cand) mod P) + B) mod P` — the
  * [[graft.ops.llm.Shuffle]] Knuth–Lewis constants, integer-exact in both
  * engines, tie-broken by candidate id. A re-run (or a resumed job)
  * regenerates the identical corpus, the property a training pipeline
  * needs from its data order (same discipline as `shuffle_deterministic`).
  *
  * Scale shape: each step is ONE join of the frontier against the
  * undirected edge relation keyed on the current node, then a
  * map-side-combinable `min(struct(priority, cand))` per walk — no
  * posting lists, no windows over edges. The frontier has one row per
  * walk; production walk corpora run W walks per vertex, so the frontier
  * is |V|·W rows shuffled on the node key each step (or broadcast, when
  * the seed set is small as here). State between steps is the frontier
  * alone — O(walks), never O(edges).
  */
object RandomWalks {

  import graft.ops.llm.Shuffle.{A, B, P}

  /** Priority of candidate `cand` for (walk, step): affine fold of the
    * triple, exact BIGINT arithmetic (inner value < 131·P + misc, the
    * multiply by A stays far inside 2⁶³).
    */
  private def priority(walk: org.apache.spark.sql.Column, step: Int,
      cand: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (lit(A) * (((walk % P) * 131L + lit(step * 17L) + (cand % P)) % P) + B) % P

  /** `steps`-step deterministic walks from `seeds` (one column `walk_id`,
    * doubling as the start node) over undirected edges `und(a, b)`.
    * Returns `(walk_id, step, node)` — step 0 is the seed itself.
    */
  def walks(seeds: DataFrame, und: DataFrame, steps: Int): DataFrame =
    walksCore(seeds, und, None, steps)

  /** Walks over the MATERIALIZED bucket-partitioned adjacency
    * ([[graft.model.DerivedGraph.undAdjacency]]) — same rows as
    * [[walks]] on the equivalent live view (spec-pinned), but each step's
    * scan partition-prunes to the ≤ |frontier| bucket directories the
    * walkers stand in: at sf100 under storage policy "none" the live form
    * re-decoded the whole fact parquet twice per step (48 s min for 32
    * walks); pruned steps read a handful of files. The same span cutoff
    * as Traverse.kHopIdsAdj keeps wide frontiers (W·|V| production walks)
    * on the policy-persisted full view.
    */
  def walksAdj(seeds: DataFrame, adj: graft.model.DerivedGraph.Adj,
      steps: Int): DataFrame =
    walksCore(seeds, adj.full,
      Some((adj.byBucket, adj.buckets, Traverse.spanCutoff(adj))), steps)

  private def walksCore(seeds: DataFrame, und: DataFrame,
      byBucket: Option[(DataFrame, Int, Int)], steps: Int): DataFrame = {
    var frontier = seeds.select(col("walk_id"), col("walk_id").as("node"))
    var out = frontier.withColumn("step", lit(0L))
    for (step <- 1 to steps) {
      // bucket set of the walkers' current nodes — one tiny job (the
      // frontier is one row per walk); spans past the cutoff fall back
      // to the full view exactly like Traverse.kHopCore
      val stepAdj = byBucket match {
        case Some((raw, nb, cutoff)) =>
          val bks = frontier
            .select(pmod(col("node"), lit(nb.toLong)).cast("int").as("bk"))
            .distinct().collect().map(_.getInt(0)).toSeq
          if (bks.length < nb && bks.length <= cutoff)
            raw.filter(col("bk").isin(bks.map(Integer.valueOf): _*))
          else und
        case None => und
      }
      // The frontier (one row per walk) is the small side by construction
      // — broadcast it so each step is one scan of the edge relation with
      // NO edge shuffle (unhinted, the agg-produced frontier has no size
      // estimate and Catalyst sort-merge-joined 2|E| rows per step:
      // measured 5.6 s -> 0.3 s aged at sf0.1 for 32 walks). A production
      // |V|·W frontier past the broadcast threshold would drop the hint
      // and shuffle BOTH sides on the node key instead.
      val cand = broadcast(frontier).join(stepAdj, frontier("node") === stepAdj("a"))
        .select(col("walk_id"), col("b").as("cand"))
        .withColumn("pri", priority(col("walk_id"), step, col("cand")))
      // persist each frontier: without it, the final union's branch for
      // step k re-executes every join 1..k (edges scanned 1+2+…+steps
      // times); with it each step's one edge scan is paid once
      frontier = cand.groupBy("walk_id")
        .agg(min(struct(col("pri"), col("cand"))).as("m"))
        .select(col("walk_id"), col("m.cand").as("node"))
        .persist()
      out = out.unionByName(frontier.withColumn("step", lit(step.toLong)))
    }
    out.select("walk_id", "step", "node")
  }
}
