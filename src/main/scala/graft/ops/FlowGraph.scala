package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Functional-graph labeling over D8 flow directions — the hydrology layer
  * on top of the terrain derivatives (cf. `TileIndex.flowdirD8`, reference
  * semantics anchor `src/elevation/getElevation.ts` for the underlying grid
  * reads): every cell drains to exactly one downhill successor, so the flow
  * graph is functional (out-degree ≤ 1) and acyclic (strict descent), and
  * watershed delineation = "which sink does each cell reach".
  */
object FlowGraph {

  /** Label every node of a functional graph with its terminal (sink) node by
    * pointer doubling: after round k each label has skipped 2ᵏ edges, so a
    * path of length L resolves in ⌈log₂L⌉ rounds — the O(log n) discipline
    * a 10¹²-cell raster needs (sequential walking would take L rounds and a
    * driver loop per step). Each round is ONE self-join shuffle keyed by the
    * label; the fixpoint probe is a cheap count (labels not yet at a sink),
    * mirroring the count+anti-join pattern of
    * [[TextDedup.connectedComponentsStar]].
    *
    * @param succ (cell, succ) — exactly one row per node; sinks self-loop
    *             (succ = cell). Strict-descent callers guarantee acyclicity;
    *             a cycle would never converge, so the round cap fails fast.
    * @param maxRounds hard cap on doubling rounds (2^maxRounds ≥ longest
    *                  path required)
    * @return (cell, sink)
    */
  def sinkLabels(succ: DataFrame, maxRounds: Int = 40): DataFrame = {
    val sinks = succ.filter(col("succ") === col("cell"))
      .select(col("cell").as("s_cell"))
    var l = succ.select(col("cell"), col("succ").as("lbl"))
      .localCheckpoint()
    var rounds = 0
    var pending = l.join(sinks, l("lbl") === sinks("s_cell"), "left_anti").count()
    while (pending > 0) {
      rounds += 1
      require(rounds <= maxRounds,
        s"sinkLabels did not converge in $maxRounds doubling rounds — cycle?")
      val hop = l.select(col("cell").as("h_cell"), col("lbl").as("h_lbl"))
      l = l.join(hop, l("lbl") === hop("h_cell"))
        .select(col("cell"), col("h_lbl").as("lbl"))
        .localCheckpoint()
      pending = l.join(sinks, l("lbl") === sinks("s_cell"), "left_anti").count()
    }
    l.select(col("cell"), col("lbl").as("sink"))
  }
}
