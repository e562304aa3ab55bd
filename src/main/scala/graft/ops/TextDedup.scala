package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Training-data deduplication / similarity operators over a `documents`
  * table (doc_id, text). Everything is built from org.apache.spark.sql
  * built-in functions (no UDFs) so the whole pipeline stays inside
  * whole-stage codegen and scales by partitioning alone; the only shuffles
  * are the band-bucket self-join (LSH) and final aggregations.
  *
  * The shared scalar hash is `md5`-based so an independent engine (the
  * DuckDB oracle) reproduces every value bit-for-bit:
  * `h(s) = conv(substring(md5(s), 1, 15), 16, 10)` — a 60-bit integer.
  */
object TextDedup {

  /** Modulus for minhash permutations (prime < 2^20 keeps a*h well under
    * Long overflow in ANSI mode: a < 2^8, h' < 2^20 ⇒ a*h'+b < 2^28).
    */
  val P = 1048573L

  /** 60-bit md5-derived hash of a string column (oracle-replicable). */
  def h60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Word array (whitespace tokenization — matches the reference corpus's
    * space-separated synthetic text).
    */
  def words(text: Column): Column = split(text, " ")

  /** Word n-gram shingles. Documents shorter than n words get the whole
    * text as their single shingle (guards Spark's descending `sequence`).
    *
    * The words array is LET-BOUND via a single-element `transform` before
    * the per-shingle lambda: a lambda variable is evaluated once per row,
    * whereas referencing the `split` expression directly re-executes it at
    * every `element_at` (n per shingle + 2 — O(m²·n) splits per document;
    * measured 21 s → 1.3 s for the posting build at sf0.1).
    */
  def shingles(text: Column, n: Int): Column =
    element_at(transform(array(words(text)), w =>
      when(size(w) >= n,
        transform(sequence(lit(1), size(w) - lit(n - 1)),
          i => concat_ws(" ", (0 until n).map(o => element_at(w, i + lit(o))): _*)))
        .otherwise(array(text))), 1)

  /** Reduced shingle hashes: `h60(shingle) mod P` per shingle. Materialize
    * this ONCE per document before fanning out to the minhash lanes —
    * Catalyst does not CSE the shingle+md5 subtree across array elements, so
    * deriving each lane from `text` directly costs nHashes× the hashing.
    */
  def shingleHashes(text: Column, shingleN: Int): Column =
    transform(shingles(text, shingleN), x => h60(x) % lit(P))

  /** MinHash signature over pre-hashed shingles: element j =
    * `min over h of ((2j+3)·h + (5j+7)) mod P`.
    */
  def minhashSigFromHashes(hv: Column, nHashes: Int): Column =
    array((0 until nHashes).map { j =>
      val a = 2L * j + 3L
      val b = 5L * j + 7L
      array_min(transform(hv, h => (lit(a) * h + lit(b)) % lit(P)))
    }: _*)

  def minhashSig(text: Column, shingleN: Int, nHashes: Int): Column =
    minhashSigFromHashes(shingleHashes(text, shingleN), nHashes)

  /** LSH candidate pairs: docs sharing at least one band of `rowsPerBand`
    * consecutive signature values. Returns distinct (doc_a < doc_b).
    * The band self-join is the scale path: each doc emits `bands` rows,
    * buckets shuffle-join on (band_id, band_key) — never a cross join.
    */
  def minhashPairs(docs: DataFrame, shingleN: Int = 3, nHashes: Int = 8,
                   bands: Int = 4): DataFrame = {
    require(nHashes % bands == 0, "nHashes must be divisible by bands")
    val r = nHashes / bands
    // two projections so the hashed-shingle array is computed once per doc,
    // then the 8 lanes derive from the materialized column
    val sig = docs
      .select(col("doc_id"), shingleHashes(col("text"), shingleN).as("hv"))
      .select(col("doc_id"), minhashSigFromHashes(col("hv"), nHashes).as("sig"))
    // band key packs the band's rows into one long (values < P < 2^20)
    // lazy localCheckpoint: the banded signatures materialize once and both
    // sides of the self-join read the materialized partitions — without it
    // the doc_a/doc_b renames defeat exchange reuse and the whole
    // shingle+md5 pipeline executes twice
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until bands).map { bnd =>
        (0 until r).map(i => element_at(col("sig"), bnd * r + i + 1))
          .reduceLeft((acc, v) => acc * lit(P) + v)
      }: _*)).as(Seq("band_id", "band_key")))
      .localCheckpoint(false)
    val a = banded.select(col("band_id"), col("band_key"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band_id"), col("band_key"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band_id", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** LSH bucket-size skew audit — the scale diagnostic an LSH dedup run
    * monitors BEFORE firing the band self-join: per band the bucket count,
    * the largest bucket, and Σ C(sz,2) candidate pairs (the exact join
    * cost; one hot bucket of size k costs k²/2 comparisons, which is how
    * boilerplate shingles melt a cluster). Same signature/band derivation
    * as [[minhashPairs]], stopped at the bucket histogram — no self-join.
    *
    * @return (band_id, n_buckets, n_rows, max_bucket, candidate_pairs)
    */
  def minhashBucketStats(docs: DataFrame, shingleN: Int = 3, nHashes: Int = 8,
                         bands: Int = 4): DataFrame = {
    require(nHashes % bands == 0, "nHashes must be divisible by bands")
    val r = nHashes / bands
    val sig = docs
      .select(col("doc_id"), shingleHashes(col("text"), shingleN).as("hv"))
      .select(col("doc_id"), minhashSigFromHashes(col("hv"), nHashes).as("sig"))
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until bands).map { bnd =>
        (0 until r).map(i => element_at(col("sig"), bnd * r + i + 1))
          .reduceLeft((acc, v) => acc * lit(P) + v)
      }: _*)).as(Seq("band_id", "band_key")))
    banded.groupBy("band_id", "band_key").agg(count(lit(1)).as("sz"))
      .groupBy("band_id")
      .agg(count(lit(1)).as("n_buckets"), sum("sz").as("n_rows"),
        max("sz").as("max_bucket"),
        sum(expr("sz * (sz - 1) div 2")).as("candidate_pairs"))
  }

  /** Signature-agreement Jaccard ESTIMATE for the band-join candidates:
    * `est_ppm = n_agree · 10⁶ div nHashes` where n_agree counts lanes with
    * equal minhash values — the standard MinHash estimator (E[n_agree/n] =
    * Jaccard), integer-exact in both engines. The signature subtree is
    * computed once (lazy localCheckpoint) and feeds the band join AND both
    * sides of the estimate join, so the corpus shingles exactly once; the
    * candidate set is the same bucketed band join as [[minhashPairs]] —
    * never all-pairs. At 100 TB this is the cheap pre-filter that ranks
    * candidate pairs before any exact intersection is computed.
    *
    * @return (doc_a, doc_b, n_agree, est_ppm), doc_a < doc_b, one row per
    *         candidate pair
    */
  def minhashEstimatePairs(docs: DataFrame, shingleN: Int = 3,
                           nHashes: Int = 8, bands: Int = 4): DataFrame = {
    require(nHashes % bands == 0, "nHashes must be divisible by bands")
    val r = nHashes / bands
    val sig = docs
      .select(col("doc_id"), shingleHashes(col("text"), shingleN).as("hv"))
      .select(col("doc_id"), minhashSigFromHashes(col("hv"), nHashes).as("sig"))
      .localCheckpoint(false)
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until bands).map { bnd =>
        (0 until r).map(i => element_at(col("sig"), bnd * r + i + 1))
          .reduceLeft((acc, v) => acc * lit(P) + v)
      }: _*)).as(Seq("band_id", "band_key")))
    val a = banded.select(col("band_id"), col("band_key"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band_id"), col("band_key"), col("doc_id").as("doc_b"))
    val pairs = a.join(b, Seq("band_id", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    pairs
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .withColumn("n_agree",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, lit(1)).otherwise(lit(0))),
          lit(0), (s, v) => s + v).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("n_agree"),
        expr(s"n_agree * 1000000L div $nHashes").as("est_ppm"))
  }

  /** Connected components over an undirected near-dup pair graph by
    * iterative min-label propagation: every node starts as its own
    * component; each round every node takes the min label among itself and
    * its direct neighbors; fixpoint when no label shrinks. Rounds =
    * component diameter, which for near-duplicate graphs is small by
    * construction (exact copies form cliques via identical signatures;
    * near-copy chains are short) — at 10^9 nodes each round is one shuffle
    * join + one aggregation, both on the node id, so AQE reuses the
    * partitioning. `maxRounds` bounds the driver loop against adversarially
    * long chains (a path graph needs diameter rounds): past it the
    * computation aborts with a pointer to [[connectedComponentsStar]], the
    * O(log n)-round alternating star contraction, instead of silently
    * looping for hours.
    *
    * @param edges (doc_a, doc_b) undirected pairs, e.g. [[minhashPairs]]
    * @param nodes (doc_id) — every doc, including singletons
    * @param maxRounds abort threshold on propagation rounds (= the largest
    *                  component diameter this call is willing to chase)
    * @return (doc_id, comp) where comp = min doc_id of the component
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame,
                          maxRounds: Int = 50): DataFrame = {
    // symmetric edge list, materialized once: the upstream pair derivation
    // (minhash) is expensive and both directions read it
    val sym = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(false)
    // propagate only over nodes that appear in an edge: an isolated node is
    // trivially its own component, and at 10^9 docs with a few percent
    // duplicates this keeps every round's joins proportional to the EDGE
    // set, not the corpus. left_semi against `nodes`: an edge endpoint
    // absent from `nodes` must neither appear in the output nor donate its
    // id as a component label (the output contract is rows for `nodes`)
    val active = sym.select(col("src").as("doc_id")).distinct()
      .join(nodes.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .localCheckpoint(false)
    var labels = active.select(col("doc_id"), col("doc_id").as("comp"))
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"connectedComponents: no fixpoint after $maxRounds rounds — a " +
            "component's diameter exceeds the guard (adversarial chain?); " +
            "use connectedComponentsStar (O(log n) rounds) or raise maxRounds")
      val viaNbr = sym
        .join(labels.select(col("doc_id").as("dst"), col("comp")), Seq("dst"))
        .select(col("src").as("doc_id"), col("comp"))
      val upd = labels.unionAll(viaNbr)
        .groupBy("doc_id").agg(min("comp").as("newcomp"))
      // LAZY checkpoint + count as the materializing action: one job per
      // round (the fixpoint probe and the checkpoint write share the pass)
      // instead of an eager-materialize job followed by a count job
      val merged = labels.join(upd, Seq("doc_id")).localCheckpoint(false)
      changed = merged.filter(col("newcomp") < col("comp")).count()
      labels = merged.select(col("doc_id"), col("newcomp").as("comp"))
      rounds += 1
    }
    labels.unionAll(
      nodes.join(active, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("comp")))
  }

  /** Connected components by alternating large-star/small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the adversarial-input path: round count is O(log n) in the
    * component size regardless of diameter, where [[connectedComponents]]'s
    * label propagation needs diameter rounds (a 10^6-node path graph: ~20
    * star rounds vs 10^6 propagation rounds). Per round: two
    * group-by-node aggregations + two joins, all keyed on node id, plus an
    * exact set-difference fixpoint probe. Same output contract as
    * [[connectedComponents]]; edges incident to ids absent from `nodes` are
    * dropped (an absent endpoint neither appears in the output nor donates
    * its id — also the label-prop behavior, where an unlabeled endpoint
    * cannot relay).
    *
    * @return (doc_id, comp) where comp = min doc_id of the component
    */
  def connectedComponentsStar(edges: DataFrame, nodes: DataFrame,
                              maxRounds: Int = 64): DataFrame = {
    val nodeIds = nodes.select(col("doc_id")).localCheckpoint(false)
    // canonical (hi, lo) pairs, both endpoints known to `nodes`
    var e = edges
      .join(nodeIds.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
      .join(nodeIds.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
      .select(greatest(col("doc_a"), col("doc_b")).as("hi"),
        least(col("doc_a"), col("doc_b")).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct()
      .localCheckpoint(false)
    var rounds = 0
    var eCount = e.count()
    var done = eCount == 0L
    while (!done) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"connectedComponentsStar: no fixpoint after $maxRounds rounds " +
            "(O(log n) expected — raise maxRounds only for astronomically " +
            "large components)")
      // large-star: every node u links its LARGER neighbors to
      // m(u) = min(u, neighbors(u)) — long chains fold toward small ids
      // without ever attaching a smaller node upward
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .unionAll(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = sym.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo")).distinct()
      // small-star: every larger endpoint u links its (all-smaller)
      // neighborhood AND itself to the neighborhood min — stars flatten
      val smins = ls.groupBy("hi").agg(min(col("lo")).as("m"))
      val ss = ls.join(smins, Seq("hi"))
        .select(col("lo").as("a"), col("m"))
        .unionAll(smins.select(col("hi").as("a"), col("m")))
      val next = ss
        .select(greatest(col("a"), col("m")).as("hi"), least(col("a"), col("m")).as("lo"))
        .filter(col("hi") =!= col("lo")).distinct()
        .localCheckpoint(false)
      // exact fixpoint: both sides are DISTINCT sets, so |next| == |e| plus
      // next \ e == ∅ implies set equality — one count + one anti-join
      // probe instead of the two exceptAll scans it replaces
      val nextCount = next.count()
      done = nextCount == eCount &&
        next.join(e, Seq("hi", "lo"), "left_anti").isEmpty
      e = next
      eCount = nextCount
      rounds += 1
    }
    // fixpoint edges form stars: (member, component-min) once per non-root
    val comp = e.select(col("hi").as("doc_id"), col("lo").as("comp"))
    nodeIds
      .join(comp, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"))
  }

  /** Winnowing fingerprint selection (Schleimer–Wilkerson–Aiken 2003,
    * public — the MOSS document-fingerprint scheme): over each document's
    * 3-gram hash sequence, every length-`window` window contributes the
    * position of its minimum hash (RIGHTMOST on ties, the standard rule);
    * the distinct selected (position, hash) set is the fingerprint, which
    * guarantees any shared substring ≥ window+shingle−1 grams yields a
    * shared fingerprint. Rolled up per document (count/sum/min/max of the
    * selected hashes) — the set-size/collision diagnostic of a
    * winnowing-based dedup index.
    *
    * Exactness: argmin-with-rightmost-tie rides a single integer min —
    * key = h·2²⁰ + (2²⁰−1 − pos) (h < P < 2²⁰ and positions < 2²⁰), so
    * both engines compute one windowed MIN. Documents shorter than
    * `window` grams have no full window and are omitted (both engines).
    *
    * 100 TB shape: one doc-keyed window frame over the gram sequence +
    * one doc-keyed rollup — key-bounded by document length, the
    * feature_reassembly bound.
    *
    * @return (doc_id, n_grams, n_fp, fp_sum, fp_min, fp_max)
    */
  def winnow(docs: DataFrame, shingleN: Int = 3, window: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 1, s"window must be >= 1: $window")
    val hv = docs.select(col("doc_id"),
      posexplode(shingleHashes(col("text"), shingleN)).as(Seq("pos", "h")))
    val frame = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, window - 1)
    val keyed = hv
      .withColumn("key",
        col("h") * lit(1048576L) + (lit(1048575L) - col("pos")))
      .withColumn("m", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("wmin", min("key").over(frame))
      .filter(col("pos") <= col("m") - window)
    keyed.select(col("doc_id"), col("m"),
        expr("wmin DIV 1048576").as("h"),
        expr("1048575 - wmin % 1048576").as("sel_pos"))
      .distinct()
      .groupBy("doc_id")
      .agg(max("m").as("n_grams"), count(lit(1)).as("n_fp"),
        sum("h").as("fp_sum"), min("h").as("fp_min"), max("h").as("fp_max"))
  }

  /** Word-hash array for simhash — materialize once (see shingleHashes). */
  def wordHashes(text: Column): Column = transform(words(text), w => h60(w))

  /** SimHash over pre-hashed words: bit b set iff the sum over words of
    * ±1 (sign of bit b) is >= 0. `bits` <= 60 (h60 carries 60 hash bits).
    */
  def simhashFromHashes(hw: Column, bits: Int): Column =
    (0 until bits).map { b =>
      val vote = aggregate(hw, lit(0L),
        (acc, x) => acc + when(shiftright(x, b) % 2 === 1, 1L).otherwise(-1L))
      when(vote >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduceLeft(_ + _)

  /** SimHash of the word multiset (single-column convenience; prefer a
    * two-step select through [[wordHashes]] so the hashing runs once, not
    * `bits` times).
    */
  def simhash(text: Column, bits: Int): Column =
    simhashFromHashes(wordHashes(text), bits)

  /** SimHash near-duplicate pairs via multi-index Hamming bands (Manku et
    * al. 2007, public — the text twin of the image path
    * [[ImageOps.phashNearDup]]): the `bits`-bit simhash splits into `bands`
    * contiguous slices; two fingerprints within Hamming distance
    * `bands − 1` must agree EXACTLY on at least one slice (pigeonhole), so
    * candidate pairs come from `bands` bucketed equi-joins — ONE shuffle
    * keyed by (band, slice value), never an all-pairs plan — and the exact
    * `bit_count(xor)` distance refines. Perfect recall for
    * radius ≤ bands − 1, enforced.
    *
    * @return (id_a, id_b, hamming) for distinct pairs with
    *         hamming ≤ radius, id_a < id_b
    */
  def simhashNearDup(docs: DataFrame, bits: Int = 48, bands: Int = 4,
                     radius: Int = 3): DataFrame = {
    require(bits % bands == 0, s"bands must divide bits ($bits % $bands)")
    require(radius <= bands - 1,
      s"$bands bands guarantee recall only for radius <= ${bands - 1}, got $radius")
    val w = bits / bands
    val mask = (1L << w) - 1
    val sh = docs
      .select(col("doc_id").cast("long"), wordHashes(col("text")).as("hw"))
      .select(col("doc_id"), simhashFromHashes(col("hw"), bits).as("sh"))
    // lazy localCheckpoint: both sides of the self-join read the
    // materialized banded fingerprints — without the cut the 48-bit
    // aggregate-fold simhash pipeline executes twice (same fix as
    // minhashPairs; measured ~2x on the neardup gate)
    val banded = sh.select(col("doc_id"), col("sh"),
        posexplode(array((0 until bands).map(i =>
          shiftright(col("sh"), w * i).bitwiseAND(lit(mask))): _*)))
      .toDF("doc_id", "sh", "band_i", "band_key")
      .localCheckpoint(false)
    val a = banded.toDF("id_a", "sa", "band_i", "band_key")
    val b = banded.toDF("id_b", "sb", "band_i2", "band_key2")
    a.join(b, a("band_i") === b("band_i2") && a("band_key") === b("band_key2") &&
        a("id_a") < b("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("CAST(bit_count(sa ^ sb) AS INT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= radius)
  }

  /** Exact Jaccard similarity of distinct word-n-gram shingle sets. */
  def jaccard(textA: Column, textB: Column, n: Int): Column = {
    val sa = array_distinct(shingles(textA, n))
    val sb = array_distinct(shingles(textB, n))
    size(array_intersect(sa, sb)) / size(array_union(sa, sb))
  }

  /** Rolling (polynomial) document fingerprint:
    * fold over words of `acc*31 + (h60(w) mod P) mod (2^31-1)`.
    */
  def fingerprint(text: Column): Column =
    aggregate(words(text), lit(0L),
      (acc, w) => (acc * 31L + h60(w) % lit(P)) % lit(2147483647L))

  /** Exact duplicate-SPAN analysis + removal (the corpus-internal substring
    * dedup of Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better", public — the suffix-array pass re-expressed as a
    * shuffle-bounded n-gram pipeline): a word n-gram occurring at ≥ 2 sites
    * anywhere in the corpus (across docs OR repeated within one doc) is a
    * duplicate span; every occurrence except the CANONICAL one (the
    * lexicographically first (doc_id, pos) site) marks its n covered token
    * positions redundant, and the cleaned text drops exactly those tokens.
    *
    * Scale shape: sites shuffle ONCE keyed on the 60-bit gram hash (the
    * count + canonical window — key-bounded, partial-friendly); only
    * NON-canonical duplicate sites fan out ×n into (doc, token) rows, which
    * aggregate back into one bounded per-doc index array (≤ doc length);
    * the rebuild joins that narrow array to the doc row and filters the
    * token array IN PLACE — the text column itself never shuffles. Gram
    * identity is the 60-bit [[h60]] (hash-based, as published; collisions
    * are harmless for dedup and the oracle replays the identical hash).
    *
    * @param n span length in tokens (docs shorter than n emit no sites)
    * @return (doc_id, n_tokens, n_dup_sites, n_redundant, dup_frac,
    *         cleaned_md5) — n_dup_sites counts this doc's sites whose gram
    *         is corpus-duplicated (canonical included); n_redundant counts
    *         distinct token positions removed; cleaned_md5 = md5 of the
    *         space-rejoined surviving tokens
    */
  def duplicateSpanStats(docs: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id").cast("long"), col("text"))
      .withColumn("ws", words(col("text")))
      .withColumn("m", size(col("ws")))
    val sites = base.filter(col("m") >= n)
      .select(col("doc_id"), posexplode(shingles(col("text"), n)).as(Seq("p0", "gs")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), h60(col("gs")).as("g"))
    val wG = Window.partitionBy("g")
    val marked = sites
      .withColumn("cnt", count(lit(1)).over(wG))
      .withColumn("rn", row_number().over(wG.orderBy("doc_id", "pos")))
      .filter(col("cnt") >= 2)
    val red = marked.filter(col("rn") > 1)
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("t"))
      .distinct()
    val redPerDoc = red.groupBy("doc_id")
      .agg(collect_list(col("t")).as("red_arr"), count(lit(1)).as("n_red"))
    val dupPerDoc = marked.groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    base.join(dupPerDoc, Seq("doc_id"), "left_outer")
      .join(redPerDoc, Seq("doc_id"), "left_outer")
      .withColumn("red", coalesce(col("red_arr"), typedLit(Seq.empty[Int])))
      .select(col("doc_id"), col("m").cast("long").as("n_tokens"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_sites"),
        coalesce(col("n_red"), lit(0L)).as("n_redundant"),
        (coalesce(col("n_red"), lit(0L)) / col("m")).as("dup_frac"),
        md5(concat_ws(" ",
          filter(col("ws"), (w, i) => !array_contains(col("red"), i + 1))))
          .as("cleaned_md5"))
  }

  /** Composite quality score in [0,1]: length saturation (0.4), stopword
    * ratio (0.3), word-length saturation (0.3). Pure rational arithmetic —
    * no transcendental functions and deliberately NO rounding: the raw
    * double is oracle-identical, while round(x, 6) is not (Spark rounds the
    * exact binary expansion via BigDecimal HALF_UP, DuckDB half-away —
    * they disagree on ~1 in 5k values; caught at sf0.1).
    */
  def qualityScore(text: Column): Column =
    // let-bound words array (one split per row; see [[shingles]])
    element_at(transform(array(words(text)), w => {
      val nWords = size(w).cast("double")
      val stopRatio = size(filter(w, x => x === "the" || x === "a" || x === "of" ||
        x === "and" || x === "to")).cast("double") / nWords
      val avgWlen = length(regexp_replace(text, " ", "")).cast("double") / nWords
      least(nWords / lit(100.0), lit(1.0)) * 0.4 +
        stopRatio * 0.3 +
        least(avgWlen / lit(10.0), lit(1.0)) * 0.3
    }), 1)

  /** Containment near-dup detection — the asymmetric companion to Jaccard:
    * `|A∩B| / min(|A|,|B|)` over word-shingle sets is ≈1 when one document
    * CONTAINS the other (quote inclusion, boilerplate wrapping, truncated
    * re-crawls), cases a symmetric Jaccard threshold misses because the
    * union is dominated by the longer side.
    *
    * Candidate generation is an inverted-index self-join on the shingle,
    * bounded by a document-frequency cap: shingles appearing in more than
    * `maxDf` documents are dropped BEFORE the pair join (the standard
    * posting-list cut — a boilerplate shingle shared by 10⁶ documents
    * would otherwise emit 10¹² pairs). The intersection this computes is
    * therefore over shingles with 2 ≤ df ≤ maxDf — exact for genuinely
    * contained pairs (whose shared shingles are rare by construction once
    * boilerplate is capped) and a documented lower bound otherwise. Per
    * shingle the join emits ≤ maxDf² pairs, so the whole plan is
    * key-bounded: two shuffles on the shingle, one on the pair.
    *
    * Determinism: containment is quantized to ppm by integer division
    * (`inter·10⁶ div min(na,nb)`) — no float ratios in the output.
    *
    * @param shingleWords words per shingle
    * @param maxDf        posting-list cut: max documents per shingle
    * @param minPpm       emit pairs with containment_ppm ≥ this
    * @return (id_a, id_b, na, nb, inter, containment_ppm), id_a < id_b
    */
  def containmentPairs(docs: DataFrame, shingleWords: Int, maxDf: Int,
                       minPpm: Long): DataFrame = {
    require(shingleWords > 0 && maxDf >= 2, s"bad params: $shingleWords, $maxDf")
    val sh = docs.select(col("doc_id").cast("long"),
      array_distinct(shingles(col("text"), shingleWords)).as("shs"))
    val sizes = sh.select(col("doc_id"), size(col("shs")).cast("long").as("n"))
    // postings carry a 60-bit md5 key, not the shingle text: the two
    // posting shuffles and the pair join move 8-byte longs instead of
    // ~40-byte strings (measured 30.6 s → ~6 s at sf0.1). md5 is the
    // oracle-replicable hash; 60 bits over ~10⁷ distinct shingles keeps
    // the collision expectation ≪ 1 (and a collision only inflates one
    // pair's intersection by 1).
    // lazy localCheckpoint: the shingle+md5 subtree feeds the df count AND
    // both sides of the self-join — without the cut it re-tokenizes the
    // corpus once per consumer (~4×; the dominant cost at sf0.1)
    val posting = sh.select(col("doc_id"), explode(col("shs")).as("sht"))
      .select(col("doc_id"), h60(col("sht")).as("sh"))
      .localCheckpoint(false)
    val kept = posting.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("sh")
    val p = posting.join(kept, "sh")
    val pairs = p.as("a").join(p.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).cast("long").as("inter"))
    pairs
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
      .withColumn("containment_ppm",
        expr("inter * 1000000L div least(na, nb)"))
      .filter(col("containment_ppm") >= minPpm)
      .select("id_a", "id_b", "na", "nb", "inter", "containment_ppm")
  }

  /** EXACT Jaccard-threshold self-join via prefix filtering (AllPairs /
    * PPJoin candidate scheme) — the lossless complement of
    * [[minhashPairs]]: MinHash banding trades recall for candidate count;
    * the prefix filter is exact (zero false negatives, provably) while
    * still never enumerating all pairs.
    *
    * Scheme: order the token universe rarest-first — (document frequency,
    * token), a total order both sides share — and keep each document's
    * PREFIX of its sorted distinct-token set, of length
    * `n − ⌈t·n⌉ + 1` (integer ppm arithmetic, no IEEE rounding in the
    * bound). Soundness: J(x,y) ≥ t ⟹ |x∩y| ≥ t·max(|x|,|y|) ≥ ⌈t·|x|⌉;
    * if no common token sat in x's prefix, all common tokens would fit in
    * x's suffix of ⌈t·|x|⌉ − 1 slots — contradiction. So every qualifying
    * pair shares a prefix token ON BOTH SIDES and one equi-join on the
    * prefix token finds a candidate superset; an exact intersection/union
    * verify (integer cross-multiplication, `inter·10⁶ ≥ tPpm·union`)
    * finishes.
    *
    * 100 TB shape: rarest-first prefixes make posting lists short exactly
    * where the join would explode (stopwords land at the END of every
    * prefix order and rarely enter one); candidate pairs ≤ Σ_w df_prefix(w)²
    * with df over PREFIX occurrences only. Two token-keyed shuffles + one
    * pair-keyed verify join, all key-bounded; nothing collects.
    *
    * @param thresholdPpm Jaccard threshold in parts-per-million
    * @return (doc_a, doc_b, j) with doc_a < doc_b, j = round(i/u, 6)
    */
  def prefixJaccardJoin(docs: DataFrame, thresholdPpm: Long): DataFrame = {
    require(thresholdPpm > 0 && thresholdPpm <= 1000000L,
      s"thresholdPpm out of (0, 1e6]: $thresholdPpm")
    // one tokenize feeding document frequencies AND prefixes (the verify
    // re-reads texts candidate-bounded, as in decontam_fuzzy)
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
        explode(array_distinct(words(col("text")))).as("w"))
      .localCheckpoint(false)
    val dfreq = toks.groupBy("w").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("doc_id").orderBy(col("df").asc, col("w").asc)
    val prefix = toks.join(dfreq, "w")
      .withColumn("pos", row_number().over(wDoc))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      // minOverlap = ⌈t·n⌉ in exact ppm integers
      .withColumn("min_ov",
        expr(s"(n * ${thresholdPpm}L + 999999L) div 1000000L"))
      .filter(col("pos") <= col("n") - col("min_ov") + 1)
      .select("doc_id", "w")
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sets = docs.select(col("doc_id").cast("long").as("doc_id"),
      array_distinct(words(col("text"))).as("s"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("s").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("s").as("sb")), "doc_b")
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("u", size(array_union(col("sa"), col("sb"))).cast("long"))
      .filter(col("i") * lit(1000000L) >= lit(thresholdPpm) * col("u"))
      .withColumn("j", round(col("i") / col("u"), 6))
      .select("doc_a", "doc_b", "j")
  }

  /** Edit-distance verification layer over a candidate pair table — the
    * character-exact final arbiter of a dedup cascade: candidates come
    * from a BANDED generator ([[prefixJaccardJoin]], [[minhashPairs]],
    * simhash bands), this op re-reads the two texts and keeps pairs whose
    * Levenshtein distance is ≤ `maxDist`, emitting the exact distance.
    * Token-set measures (Jaccard) are blind to word-internal edits and
    * ordering; edit distance is the boilerplate-suffix / typo-variant
    * ruler, but is O(len²) per pair — which is why it NEVER runs all-pairs
    * and only verifies the banded candidates.
    *
    * Plan shape: two hash equi-joins key the (small) candidate table to
    * the docs table by id — texts travel only for candidate rows, the
    * corpus never self-joins. The distance itself is Spark's codegen'd
    * `levenshtein(l, r, threshold)` — the threshold variant runs the
    * BANDED O(maxDist·len) DP and returns −1 past the bound, so a far
    * pair costs O(maxDist·len), not O(len²); the oracle's full DP agrees
    * exactly on every kept row (the banded algorithm is exact within the
    * bound).
    *
    * @param cands   (doc_a, doc_b) candidate pairs from a banded generator
    * @param docs    (doc_id, text) corpus
    * @param maxDist inclusive edit-distance acceptance bound
    * @return (doc_a, doc_b, edit_dist) for pairs with distance ≤ maxDist
    */
  def editVerify(cands: DataFrame, docs: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val d = docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
    cands
      .select(col("doc_a").cast("long").as("doc_a"),
        col("doc_b").cast("long").as("doc_b"))
      .join(d.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .withColumn("edit_dist",
        levenshtein(col("ta"), col("tb"), maxDist).cast("long"))
      .filter(col("edit_dist") >= 0L)
      .select("doc_a", "doc_b", "edit_dist")
  }

  /** LINE-LEVEL boilerplate removal (CCNet-style): chunk each document
    * into consecutive `lineWords`-word lines (ragged tail = last line),
    * count each line's DOCUMENT frequency corpus-wide, and drop lines
    * appearing in more than `maxDf` documents — the navigation / footer /
    * legal-notice stripper that runs BEFORE document-level dedup in a web
    * curation pipeline (a boilerplate line inflates document similarity
    * and survives document-level dedup because its carriers differ
    * elsewhere). Emits per-document accounting rather than re-assembled
    * text so the gate pins every count; the text-rebuilding variant is the
    * same plan with a `sort_array(collect_list((li, line)))` reassembly.
    *
    * Scale shape: one explode (doc → lines), one line-keyed distinct-doc
    * count (map-side partial), one line-keyed join back, one doc-keyed
    * aggregation — all key-bounded; the df table is the only global state
    * and it is |distinct lines|, the thing boilerplate makes SMALL.
    *
    * @return (doc_id, n_lines, n_kept_lines, n_kept_words)
    */
  def lineDedup(docs: DataFrame, lineWords: Int, maxDf: Long): DataFrame = {
    require(lineWords > 0, s"lineWords must be > 0: $lineWords")
    require(maxDf > 0, s"maxDf must be > 0: $maxDf")
    val lines = docs
      .select(col("doc_id").cast("long").as("doc_id"), words(col("text")).as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, (size(w) + ${lineWords - 1}) div $lineWords - 1),
            i -> array_join(slice(w, i * $lineWords + 1, $lineWords), ' '))"""))
        .as("line"))
    val dfreq = lines.groupBy("line")
      .agg(count_distinct(col("doc_id")).as("df"))
    lines.join(dfreq, "line")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("df") <= maxDf, 1L).otherwise(0L)).as("n_kept_lines"),
        sum(when(col("df") <= maxDf, size(split(col("line"), " ")).cast("long"))
          .otherwise(0L)).as("n_kept_words"))
  }

  /** BPE merge statistics — the counting step of byte-pair-encoding
    * tokenizer training: corpus-wide frequencies of ADJACENT character
    * pairs inside words, ranked `(count desc, pair asc)`; the top entry is
    * the merge a BPE trainer would perform next. This is the data-parallel
    * heart of tokenizer training at 100 TB (each merge round re-runs the
    * same count over re-segmented symbols) and the vocabulary-design
    * diagnostic beside [[graft.ops.Curation]]'s token counting.
    *
    * Plan shape: tokenize → per-word pair explode (a codegen'd
    * `transform(sequence(...))`, no UDF) → ONE pair-keyed count with
    * map-side partials. The final ranking windows over the AGGREGATED pair
    * vocabulary — at most |alphabet|² rows by construction, so the single
    * ranking partition is bounded by the alphabet, not the corpus (the
    * same bounded-global-sort argument as the trained-quantizer codebooks).
    *
    * @return (pair, n, rk) the `topK` most frequent pairs, rk 1-based
    */
  def bpePairStats(docs: DataFrame, topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    docs.select(explode(words(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(
        expr("transform(sequence(1, length(w)-1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      // top-K via distributed TakeOrdered; the rank window then runs
      // over a provably-topK-row frame, never the full pair vocabulary
      .orderBy(col("n").desc, col("pair").asc).limit(topK)
      .withColumn("rk", row_number()
        .over(Window.partitionBy(GlobalRank.boundedPartitionKey(col("n"))).orderBy(col("n").desc, col("pair").asc)).cast("int"))
  }
}
