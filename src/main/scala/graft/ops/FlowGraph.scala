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

  /** Flow accumulation: for every node, how many nodes drain THROUGH it
    * (upstream contributing area, self included) — the D8 hydrology
    * companion of [[sinkLabels]] (flowdir → watershed → accumulation).
    *
    * Sequential propagation needs longest-path rounds; this enumerates each
    * node's full downstream path with the PATH-DOUBLING recurrence instead:
    * with P_k = {(v,u) : u = succ^i(v), 1 ≤ i ≤ 2^k} and J_k = succ^(2^k),
    *
    * {{{ P_{k+1} = P_k ∪ {(v,w) : (J_k(v), w) ∈ P_k},  J_{k+1} = J_k ∘ J_k }}}
    *
    * so a path of length L is fully enumerated in ⌈log₂L⌉ rounds of two
    * key-bounded joins. acc(u) = 1 + |{v : (v,u)}| (paths absorb at the
    * sink, so pairs are distinct-deduped per round). Total pair volume is
    * Σ path lengths — the same O(n·L̄) the problem's answer itself costs to
    * certify (the oracle's recursive CTE walks identical pairs); the
    * doubling buys the ROUND count, which is what a 1000-executor job pays
    * for. Fixpoint probe = pair-count stability, as in [[sinkLabels]].
    *
    * @param succ (cell, succ) functional graph; sinks self-loop
    * @return (cell, acc) — acc ≥ 1, sinks carry their whole basin size
    */
  def accumulation(succ: DataFrame, maxRounds: Int = 40): DataFrame = {
    val s = succ.select(col("cell").cast("long"), col("succ").cast("long"))
      .localCheckpoint(false)
    var p = s.filter(col("succ") =!= col("cell"))
      .select(col("cell").as("v"), col("succ").as("u"))
      .localCheckpoint(false)
    var j = s.select(col("cell").as("v"), col("succ").as("j"))
      .localCheckpoint(false)
    var n = p.count()
    var rounds = 0
    var grew = n > 0
    while (grew) {
      rounds += 1
      require(rounds <= maxRounds,
        s"accumulation did not converge in $maxRounds doubling rounds — cycle?")
      val shifted = j.join(p.select(col("v").as("j"), col("u")), "j")
        .select(col("v"), col("u"))
      val p2 = p.union(shifted).distinct().localCheckpoint(false)
      val j2 = j.join(j.select(col("v").as("j"), col("j").as("j2")), "j")
        .select(col("v"), col("j2").as("j"))
        .localCheckpoint(false)
      val n2 = p2.count()
      grew = n2 > n
      p = p2; j = j2; n = n2
    }
    s.select(col("cell"))
      .join(p.groupBy(col("u").as("cell")).agg(count(lit(1)).as("ups")),
        Seq("cell"), "left")
      .select(col("cell"),
        (coalesce(col("ups"), lit(0L)) + lit(1L)).as("acc"))
  }

  /** Strahler stream order over a flow tree (Strahler 1957, public) — the
    * hydrology classic that ranks a drainage network's branches: leaves
    * are order 1; an internal node takes its children's max order m,
    * promoted to m+1 exactly when ≥2 children attain m. Computed
    * bottom-up in synchronized rounds: each round assigns every node
    * whose children are ALL assigned, so round count = tree height (a
    * drainage tree's height is O(log n) for natural branching; the guard
    * throws rather than spin on a degenerate chain). Per round: one
    * children-join + two key-bounded aggs — no driver-side tree walk,
    * every round's work is proportional to the still-unassigned frontier.
    *
    * @param edges (child, parent) — a forest (each child one parent)
    * @return (node, strahler_ord) for every node in the forest
    */
  def strahler(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    val e = edges.select(col("child"), col("parent"))
      .filter(col("child") =!= col("parent")).distinct()
      .localCheckpoint(false)
    val nodes = e.select(col("child").as("node"))
      .unionAll(e.select(col("parent").as("node"))).distinct()
      .localCheckpoint(false)
    val parents = e.select(col("parent").as("node")).distinct()
    var assigned = nodes.join(parents, Seq("node"), "left_anti")
      .select(col("node"), lit(1L).as("strahler_ord"))
      .localCheckpoint(false)
    var remaining = nodes.join(assigned, Seq("node"), "left_anti").count()
    var rounds = 0
    while (remaining > 0) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"strahler: no fixpoint after $maxRounds rounds — tree height " +
            "exceeds the guard (degenerate chain?); raise maxRounds")
      // two-phase: ready parents (all children assigned), then count of
      // children attaining the max order
      val ready = e.join(assigned.select(col("node").as("child"),
          col("strahler_ord").as("ord")), Seq("child"), "left")
        .groupBy(col("parent").as("node"))
        .agg(count(lit(1)).as("nc"), count(col("ord")).as("na"),
          max("ord").as("mo"))
        .filter(col("nc") === col("na"))
        .join(assigned.select(col("node")), Seq("node"), "left_anti")
        .localCheckpoint(false)
      val newly = e.join(assigned.select(col("node").as("child"),
          col("strahler_ord").as("ord")), Seq("child"))
        .join(ready.select(col("node").as("parent"), col("mo")), Seq("parent"))
        .filter(col("ord") === col("mo"))
        .groupBy(col("parent").as("node"), col("mo"))
        .agg(count(lit(1)).as("ct"))
        .select(col("node"),
          (col("mo") + when(col("ct") >= 2, 1L).otherwise(0L))
            .as("strahler_ord"))
      assigned = assigned.unionAll(newly).localCheckpoint(false)
      remaining -= newly.count()
      rounds += 1
    }
    assigned
  }
}
