package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A STANDING on-disk graph layout: the canonical (src, dst) edge list,
  * the out-degree frame, and the node set, each stored as a bucketed +
  * sorted parquet table so a scan re-enters every query ALREADY carrying
  * the hash partitioning and sort order the iterative operators need —
  * no per-query rebuild, no per-query exchange of the edge list.
  *
  * Why this exists: [[Graph.edgeLayout]] pays the edge derivation +
  * distinct + repartition/sort/checkpoint on EVERY query — measured at
  * ~10.5 s of a ~12.5 s PageRank on the ~4M-edge sf1 corpus, while an
  * iteration costs 0.4–1.3 s (NOTES.md round-12 staging). At deployment
  * the layout is an artifact amortized across queries and days, exactly
  * like the persisted IVF index ([[Similarity.buildIvfIndex]]) and the
  * LSM band index ([[Dedup.writeLshIndexBands]]); queries built on
  * [[Graph.loadGraphIndex]] pay iteration cost only.
  */
final case class GraphIndex(edges: DataFrame, deg: DataFrame,
                            nodes: DataFrame, buckets: Int,
                            edgeCount: Option[Long] = None,
                            nodeCount: Option[Long] = None)

/** Iterative graph analytics over edge DataFrames.
  *
  * PageRank here runs in 64-bit FIXED-POINT arithmetic: ranks are
  * integers in units of 1/`scale`. Why fixed point: distributed
  * floating-point summation is order-dependent — the same query on the
  * same data differs in the last bits between runs, partitionings, and
  * engines, which makes results non-reproducible and unverifiable
  * against an oracle. Integer sums are associative and integer division
  * truncates identically everywhere, so iteration k's rank vector is
  * BIT-EXACT regardless of parallelism — the same trick the exact-decimal
  * aggregates use ([[Profile.regression]]).
  *
  * Scale story: each iteration is one join of the rank vector with the
  * edge list (co-locatable by pre-partitioning both on the source key)
  * plus one shuffle grouping contributions by destination — k·O(|E|)
  * total, the standard distributed PageRank shape. The rank vector is
  * |V| rows, never collected; the only driver-side scalar is |V| itself.
  * For large k, checkpoint every few rounds to bound plan depth (the
  * label-propagation loop in [[Dedup.nearDupClusters]] does the same).
  *
  * Reference scope: the reference engine ships no graph operator; this
  * extends the analytics surface with the PageRank-style quality prior
  * common in web-corpus curation (rank-weighted sampling, spam demotion).
  */
object Graph {

  /** `iterations` rounds of damped PageRank over directed `edges`
    * (`srcCol` → `dstCol`; parallel edges collapse to one). Damping is
    * the rational `dampNum/dampDen` (default 85/100). Nodes are the
    * union of edge endpoints. Dangling nodes (no out-edges) leak their
    * mass — the standard simplification; feed symmetric edges when mass
    * conservation matters.
    *
    * Update rule, all in BIGINT (init = scale div |V|):
    * {{{
    *   teleport = ((dampDen − dampNum) · init) div dampDen
    *   r₀(v)    = init
    *   rₜ₊₁(v)  = teleport + (dampNum · Σ_{u→v} (rₜ(u) div deg(u))) div dampDen
    * }}}
    * Output: (node, rank_fp) with rank_fp in 1/scale units,
    * Σ rank_fp ≤ scale. Deterministic to the bit at any parallelism.
    *
    * `symmetricEdges = true` is a caller PROMISE that every edge appears
    * in both orientations (undirected graphs fed as a both-directions
    * list): the node set then equals the distinct source set and is read
    * off the degree aggregate for free instead of a second union+distinct
    * pass over the edge list. Results are identical when the promise
    * holds; a violated promise silently drops sink-only nodes — leave it
    * false for genuinely directed input. `validatePromise = true` turns
    * that silent hazard into a loud failure: a bounded edge sample (1024
    * rows) is checked for reverse presence with one broadcast semi-join
    * over the edge list — one extra edge scan, the debug-mode price; a
    * missing reverse edge throws before any iteration runs. Sampling
    * can miss a violation (it is a tripwire, not a proof) but catches
    * the realistic failure — a caller passing a one-orientation edge
    * list — with certainty, since then NO sampled edge has its reverse.
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 3,
               dampNum: Long = 85, dampDen: Long = 100,
               scale: Long = 1000000000000L,
               checkpointEvery: Int = 5,
               maxDriverEdges: Long = 200000L,
               symmetricEdges: Boolean = false,
               validatePromise: Boolean = false): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(dampNum >= 0 && dampNum <= dampDen && dampDen > 0,
      "damping must be a rational in [0, 1]")
    // materialize the canonical edge list ONCE: every iteration references
    // it (contribution join) and so do nodes/deg — without this the whole
    // upstream plan (source joins + distinct) re-executes per iteration.
    // HASH-PARTITIONED BY src AND SORTED before the checkpoint (LogicalRDD
    // carries both through): every iteration's contribution join then
    // consumes the edge side exchange-free and sort-free — the textbook
    // iterative layout where the big immutable side is laid out once and
    // ONLY the rank vector moves per round. Without this the k joins
    // re-shuffle the full edge list k times.
    val e = edgeLayout(edges, srcCol, dstCol)
    if (symmetricEdges && validatePromise) {
      // bounded sample (driver-side metadata, ≤1024 narrow rows), then
      // ONE broadcast semi-join scan of e counting which reversed pairs
      // exist; e is distinct so each reversed pair matches ≤1 row —
      // found < sampled ⇔ some sampled edge lacks its reverse
      val sampled = e.limit(1024).collect().map(r => (r.getLong(1), r.getLong(0)))
      if (sampled.nonEmpty) {
        import edges.sparkSession.implicits._
        val rev = sampled.toSeq.toDF("src", "dst")
        val found = e.join(broadcast(rev), Seq("src", "dst"), "left_semi").count()
        // drop the edge pin BEFORE throwing — a caller that catches the
        // violation must not inherit a leaked checkpoint
        if (found != sampled.length) CacheControl.release(e)
        require(found == sampled.length,
          s"symmetricEdges promise violated: ${sampled.length - found} of " +
            s"${sampled.length} sampled edges lack their reverse orientation " +
            "— sink-only nodes would be silently dropped; pass " +
            "symmetricEdges = false for directed input")
      }
    }
    // Small-graph fast path (same bounded-metadata gate as
    // Dedup.connectedComponents): the distributed loop costs ~2 Spark
    // jobs per iteration regardless of size, and the fixed-point update
    // is exact INTEGER math — trivially and bit-identically replayable on
    // the driver for graphs up to `maxDriverEdges` edges (~16 MB of
    // longs). `0` forces the distributed loop (the equivalence spec runs
    // both). Every `div` below is on non-negative longs, where Java `/`
    // and SQL `div` agree.
    DriverLocal.boundedCollect(e, maxDriverEdges).foreach { rows =>
      val es = rows.map(r => (r.getLong(0), r.getLong(1)))
      CacheControl.release(e)
      return driverRanks(edges.sparkSession, es, iterations,
        dampNum, dampDen, scale)
    }
    // deg inherits e's hash(src) layout through the aggregation; sorting
    // it once here makes the per-iteration 3-way src join fully
    // exchange-and-sort-free on both immutable sides
    val deg = CacheControl.checkpointWithLayout(edges.sparkSession) {
      e.groupBy("src").agg(count(lit(1)).as("deg"))
        .sortWithinPartitions("src")
    }
    // nodes sorted on the key for the same reason: the per-iteration
    // `nodes ⋈ sums` left join reuses this layout (distinct already
    // leaves hash(node) partitioning; sums is hash(node) straight out of
    // its aggregation). When the CALLER guarantees every edge appears in
    // both orientations (`symmetricEdges` — e.g. an undirected co-purchase
    // graph emitted via a both-directions explode), the node set IS the
    // distinct source set, which `deg` just computed: nodes becomes a
    // zero-cost projection of deg (alias-preserved hash(src) layout, same
    // sort) and the union+distinct pass over 2·|E| rows — a full extra
    // scan + shuffle + checkpoint of the edge list — is skipped entirely.
    // Same node set either way, so results are bit-identical.
    val nodes =
      if (symmetricEdges) deg.select(col("src").as("node"))
      else CacheControl.checkpointWithLayout(edges.sparkSession) {
        e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node"))).distinct()
          .sortWithinPartitions("node")
      }
    val out = rankLoop(edges.sparkSession, e, deg, nodes,
      iterations, dampNum, dampDen, scale, checkpointEvery)
    // symmetric path: nodes is a projection OVER deg's checkpoint (no pin
    // of its own) — releasing it would walk into deg's LogicalRDD, which
    // the deg release below already handles
    CacheControl.release(e)
    if (!symmetricEdges) CacheControl.release(nodes)
    CacheControl.release(deg)
    out
  }

  /** The distributed PageRank iteration loop over an already-laid-out
    * (e, deg, nodes) triple — shared verbatim by [[pagerank]] (per-query
    * [[edgeLayout]] + checkpointed deg/nodes) and [[pagerankOnIndex]]
    * (standing bucketed scans), so the two paths are the SAME integer
    * update rule on the same frames and hash-match by construction.
    * Releases only its own loop-support pins; the (e, deg, nodes) inputs
    * belong to the caller.
    */
  private def rankLoop(spark: SparkSession, e: DataFrame, deg: DataFrame,
                       nodes: DataFrame, iterations: Int,
                       dampNum: Long, dampDen: Long, scale: Long,
                       checkpointEvery: Int,
                       nodeCount: Option[Long] = None): DataFrame =
    rankLoopMulti(spark, Seq(e), deg, nodes, iterations,
      dampNum, dampDen, scale, checkpointEvery, nodeCount)

  /** [[rankLoop]] over a SEQUENCE of edge frames whose union is the edge
    * set — the delta-union form ([[pagerankOnIndexDelta]]): each frame
    * joins the per-source contributions independently (the standing
    * bucketed scan stays exchange-free, only the small delta frame pays
    * its own layout) and the streams union BEFORE the per-destination
    * aggregation. Integer addition is associative and commutative, so
    * the summed contributions — and therefore every iteration's rank
    * vector — are BIT-IDENTICAL to a single-frame loop over the union.
    * With one frame the plan degenerates to exactly the single-frame
    * loop, which is how [[pagerank]]/[[pagerankOnIndex]] still share it.
    */
  private def rankLoopMulti(spark: SparkSession, es: Seq[DataFrame],
                            deg: DataFrame, nodes: DataFrame, iterations: Int,
                            dampNum: Long, dampDen: Long, scale: Long,
                            checkpointEvery: Int,
                            nodeCount: Option[Long] = None): DataFrame = {
    // the one driver-side scalar: |V| — taken from the caller's build-time
    // metadata when it has it (standing index sidecar), counted otherwise
    val nNodes = nodeCount.getOrElse(nodes.count())
    require(nNodes > 0, "graph has no nodes")
    val init = scale / nNodes
    val teleport = ((dampDen - dampNum) * init) / dampDen
    var ranks = nodes.withColumn("rank_fp", lit(init))
    var prevCkpt: Option[DataFrame] = None
    // MULTI-frame loops must checkpoint EVERY iteration: each frame's
    // join consumes perSrc (= ranks⋈deg) independently, and Spark does
    // not share non-exchange subtrees — without a materialization
    // between iterations, iteration i re-executes iteration i-1's whole
    // subtree once per frame, i.e. frames^(i-1) times (measured as the
    // delta loop costing 2.2× the indexed loop at 3 iterations; at 10
    // it would be 512×). A checkpoint per iteration bounds the
    // re-execution at one |V|-sized materialized frame and changes no
    // results. Single-frame loops keep the caller's cadence — perSrc is
    // consumed once there, so the plan is linear without it.
    val ckptEvery = if (es.size > 1) 1 else checkpointEvery
    for (i <- 1 to iterations) {
      val sums = contribSumsMulti(es, ranks, deg)
      ranks = nodes.join(sums, Seq("node"), "left")
        .select(col("node"), expr(
          s"$teleport + ($dampNum * coalesce(s, CAST(0 AS BIGINT))) div $dampDen")
          .as("rank_fp"))
      // bound lineage/plan depth on long runs without changing results;
      // the previous pin is dead the moment the new one materializes
      if (i % ckptEvery == 0 && i < iterations) {
        // layout-preserving: ranks leaves the nodes⋈sums join hash(node)
        // partitioned — captured, the next round's ranks⋈deg join (key
        // src = renamed node) consumes it exchange-free
        ranks = CacheControl.checkpointWithLayout(spark)(ranks)
        prevCkpt.foreach(CacheControl.release)
        prevCkpt = Some(ranks)
      }
    }
    // materialize the result, then release every loop-support pin —
    // the returned frame is the one persistent entry (cache policy)
    val out = ranks.localCheckpoint()
    prevCkpt.foreach(CacheControl.release)
    out
  }

  /** The driver-side fixed-point PageRank over a collected edge list —
    * the small-graph fast path's math, shared by [[pagerank]] and
    * [[pagerankOnIndex]]. Exact integer arithmetic: Java `/` and SQL
    * `div` agree on the non-negative longs used here, so the result is
    * bit-identical to the distributed loop at any size.
    */
  private def driverRanks(spark: SparkSession, es: Array[(Long, Long)],
                          iterations: Int, dampNum: Long, dampDen: Long,
                          scale: Long): DataFrame = {
    val nodeIds = (es.iterator.map(_._1) ++ es.iterator.map(_._2)).toSet.toSeq
    require(nodeIds.nonEmpty, "graph has no nodes")
    val init = scale / nodeIds.size
    val teleport = ((dampDen - dampNum) * init) / dampDen
    val deg = es.groupBy(_._1).map { case (s, g) => s -> g.length.toLong }
    var rank = nodeIds.map(_ -> init).toMap
    for (_ <- 1 to iterations) {
      val contrib = scala.collection.mutable.HashMap.empty[Long, Long]
        .withDefaultValue(0L)
      es.foreach { case (s, d) => contrib(d) += rank(s) / deg(s) }
      rank = nodeIds.map(v =>
        v -> (teleport + (dampNum * contrib(v)) / dampDen)).toMap
    }
    DriverLocal.twoColDF(spark,
      nodeIds.map(v => org.apache.spark.sql.Row(v, rank(v))),
      "node", org.apache.spark.sql.types.LongType,
      "rank_fp", org.apache.spark.sql.types.LongType)
  }

  // ---- standing on-disk graph index -----------------------------------

  /** Build the persisted graph layout at `path` (see [[GraphIndex]]):
    * three bucketed + sorted parquet tables — edges by src, out-degrees
    * by src, nodes by node — plus a tiny JSON sidecar recording the
    * bucket count. Each table is written with EXACTLY one file per
    * bucket (the data is pre-repartitioned onto the writer's own bucket
    * hash, so each task owns one bucket), which is the condition under
    * which Spark's bucketed scan reports the sort order back to the
    * planner and a loaded table enters downstream joins with neither an
    * Exchange nor a Sort above the scan.
    *
    * `buckets` defaults to the session's shuffle-partition setting so
    * the per-iteration rank-vector exchanges land on the same partition
    * count as the standing edge layout. At deployment, size it like any
    * bucketed fact table: |E| / buckets ≈ a comfortable task's rows.
    *
    * The canonical edge set is derived ONCE (cast → repartition →
    * distinct, the [[edgeLayout]] shape) and checkpointed before fanning
    * out to the three writes — without the pin the upstream edge plan
    * would re-execute three times (the [[triangleCounts]] lesson,
    * ADVICE r10).
    *
    * The artifact is IMMUTABLE: refresh = rebuild (contrast
    * [[Similarity.appendIvfIndex]]). Appending edge files would put a
    * second file into each bucket, and the scan then stops reporting
    * its sort order — every downstream join quietly regrows a per-query
    * Sort. Rebuild cost is one derivation pass, amortized across the
    * query volume the index serves; for high-churn graphs keep a small
    * unindexed delta edge list and union it at query time, rebuilding on
    * a maintenance cadence (the LSM band index's delta/organized split,
    * one level simpler).
    */
  def buildGraphIndex(edges: DataFrame, srcCol: String, dstCol: String,
                      path: String, buckets: Int = 0): Unit = {
    val spark = edges.sparkSession
    val b = if (buckets > 0) buckets
      else spark.sessionState.conf.numShufflePartitions
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(b, col("src")).distinct()
      .localCheckpoint()
    // alreadyArranged: the checkpoint above EXECUTED the hash(src, b)
    // repartition, so each of e's partitions physically holds exactly
    // one bucket's rows (same Murmur3 both sides) — re-repartitioning
    // inside writeBucketed would pay a second full |E| exchange per
    // build for a layout the rows already have (ADVICE r12). deg and
    // nodes change key cardinality/columns and keep the pre-write
    // repartition.
    writeBucketed(e, "src", path, "edges", b, alreadyArranged = true)
    writeBucketed(e.groupBy("src").agg(count(lit(1)).as("deg")),
      "src", path, "deg", b)
    writeBucketed(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct(),
      "node", path, "nodes", b)
    // edge count: one cheap count on the materialized checkpoint, paid
    // at build time so query-time strategy gates (deltaNewEdges' hash-
    // vs sort-merge anti-join) can size the per-partition build side
    // without re-counting |E| per query
    val n = e.count()
    CacheControl.release(e)
    // node count: |V| is the one driver-side scalar every rank loop
    // needs (rankLoopMulti) — counting it at build time turns a per-query
    // O(|V|) count job into an O(1) metadata read. Counting the WRITTEN
    // table is a parquet statistics-only scan (no row reads).
    val nv = spark.table(indexTableName(path, "nodes")).count()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(path, "_graph_index.json"), true)
    try out.write(s"""{"buckets":$b,"edges":$n,"nodes":$nv}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Load a [[buildGraphIndex]] artifact. Registers each table in the
    * session catalog (CREATE TABLE … CLUSTERED BY … SORTED BY … LOCATION,
    * idempotent per session) so the scans carry the bucketed hash
    * partitioning, and enables
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` for the SESSION
    * (left set — the flag is monotone and only lets one-file-per-bucket
    * sorted scans report their order, which can only REMOVE Sorts from
    * plans; without it Spark ignores the on-disk order and every
    * sort-merge join above the index re-sorts the edge list per query).
    */
  def loadGraphIndex(spark: SparkSession, path: String): GraphIndex = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // stream-to-EOF via the shared pointer-file reader: a manual
    // single read() may legally return a PREFIX of the file, and a
    // bucket count truncated mid-number would register the table with
    // a spec disagreeing with the on-disk layout — co-partitioned
    // joins over it would silently return wrong rows (ADVICE r12)
    val meta = AtomicPointer.readSmallFile(fs, new Path(path, "_graph_index.json"))
    val b = """"buckets":(\d+)""".r.findFirstMatchIn(meta)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(
        s"$path/_graph_index.json: no bucket count — not a graph index?"))
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    def tbl(sub: String, ddl: String, key: String): DataFrame = {
      val t = indexTableName(path, sub)
      if (!spark.catalog.tableExists(t))
        spark.sql(s"CREATE TABLE $t ($ddl) USING parquet CLUSTERED BY ($key) " +
          s"SORTED BY ($key) INTO $b BUCKETS LOCATION '$path/$sub'")
      spark.table(t)
    }
    GraphIndex(
      tbl("edges", "src BIGINT, dst BIGINT", "src"),
      tbl("deg", "src BIGINT, deg BIGINT", "src"),
      tbl("nodes", "node BIGINT", "node"), b,
      // optional: indexes written before the fields default to None and
      // query-time consumers fall back to their conservative branch
      // (counting per query)
      """"edges":(\d+)""".r.findFirstMatchIn(meta).map(_.group(1).toLong),
      """"nodes":(\d+)""".r.findFirstMatchIn(meta).map(_.group(1).toLong))
  }

  /** Refresh a standing graph index UNDER LIVE READERS: build the new
    * layout into an immutable generation directory (`root/gen-<n+1>`),
    * atomically repoint `root/index.current` ([[AtomicPointer]] — the
    * LSM band index's pointer-commit discipline), and defer GC by one
    * cycle: the previous generation survives until the NEXT rebuild, so
    * a reader that resolved the old pointer keeps scanning intact
    * files; generations older than that are deleted. This is how the
    * immutable artifact (see [[buildGraphIndex]]'s append note) gets a
    * refresh cadence without ever rebuilding in place — readers see the
    * old index or the new one, never a torn mix. Returns the published
    * generation number.
    *
    * Single WRITER at a time (the scheduled-job cadence,
    * [[graft.jobs.GraphIndexMaintenanceJob]]): two concurrent rebuilds
    * would both resolve the same next-generation name and contend on
    * its table registrations — readers are always safe, writers must
    * not overlap, the same discipline the LSM compaction job runs
    * under.
    */
  def rebuildGraphIndex(edges: DataFrame, srcCol: String, dstCol: String,
                        root: String, buckets: Int = 0): Long = {
    val spark = edges.sparkSession
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new Path(root, "index.current")
    val cur = AtomicPointer.read(fs, ptr, _.trim.toLong).getOrElse(0L)
    val next = cur + 1L
    buildGraphIndex(edges, srcCol, dstCol, s"$root/gen-$next", buckets)
    AtomicPointer.publish(spark, root, ptr, next.toString)
    // deferred GC: gen-(next-1) stays for in-flight readers; older go.
    // Their catalog registrations (per-path table names) die with the
    // session; a stale handle into a GC'd generation fails loudly.
    if (fs.exists(new Path(root))) fs.listStatus(new Path(root))
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("gen-") &&
          p.getName.stripPrefix("gen-").toLongOption.exists(_ < next - 1)
      }
      .foreach(p => fs.delete(p, true): Unit)
    next
  }

  /** Resolve `root/index.current` and load that generation — the reader
    * half of [[rebuildGraphIndex]]'s pointer commit.
    */
  def loadGraphIndexCurrent(spark: SparkSession, root: String): GraphIndex = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val g = AtomicPointer.read(fs, new Path(root, "index.current"), _.trim.toLong)
      .getOrElse(throw new IllegalStateException(
        s"no graph index published at $root — run rebuildGraphIndex first"))
    loadGraphIndex(spark, s"$root/gen-$g")
  }

  /** [[pagerank]] over a standing [[GraphIndex]]: the same fixed-point
    * update rule on the same canonical frames ([[rankLoop]] is shared
    * code), so results hash-match [[pagerank]] over the same edge set —
    * but the per-query cost is the ITERATIONS only: edges, degrees, and
    * nodes enter each round straight off their bucketed scans with no
    * derivation, no distinct, no repartition/sort/checkpoint, and no
    * Exchange or Sort above the edge scan (plan-pinned in GraphSpec).
    */
  def pagerankOnIndex(idx: GraphIndex, iterations: Int = 3,
                      dampNum: Long = 85, dampDen: Long = 100,
                      scale: Long = 1000000000000L,
                      checkpointEvery: Int = 5,
                      maxDriverEdges: Long = 200000L): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(dampNum >= 0 && dampNum <= dampDen && dampDen > 0,
      "damping must be a rational in [0, 1]")
    val spark = idx.edges.sparkSession
    // same bounded-metadata gate as pagerank; index frames are plain
    // scans, nothing to release on either path
    DriverLocal.boundedCollect(idx.edges, maxDriverEdges).foreach { rows =>
      return driverRanks(spark, rows.map(r => (r.getLong(0), r.getLong(1))),
        iterations, dampNum, dampDen, scale)
    }
    rankLoop(spark, idx.edges, idx.deg, idx.nodes,
      iterations, dampNum, dampDen, scale, checkpointEvery, idx.nodeCount)
  }

  /** [[pagerank]] over a standing [[GraphIndex]] UNION a small unindexed
    * DELTA edge list — the high-churn query-time pattern the index
    * build's scaladoc describes (keep fresh edges unindexed, union at
    * query time, fold them in on the maintenance cadence), promoted to
    * API with the cost model it deserves (VERDICT r12 #3): the big side
    * never re-lays out. Hash-matches a full [[pagerank]] over
    * `idx.edges ∪ delta` by construction — re-crawled (overlapping)
    * delta edges are ABSORBED by the dedup below, exactly like
    * edgeLayout's distinct would absorb them in a rebuild.
    *
    * Cost shape, per query:
    *  - the delta alone pays exchanges: its canonicalization
    *    (cast/distinct onto the index's bucket hash) and its endpoint
    *    set are delta-sized shuffles;
    *  - the INDEX side is touched by exactly one exchange-free pass at
    *    setup — a broadcast semi-join of the bucketed edge scan against
    *    the delta's source set (to find already-indexed duplicates),
    *    plus merge joins that consume deg/nodes straight off their
    *    sorted bucketed scans — and by the same exchange-free bucketed
    *    scans inside each iteration ([[rankLoopMulti]]);
    *  - merged deg and nodes are |V|-sized one-time checkpoints (nodes
    *    pays the one |V| exchange for its layout).
    *
    * `maxDeltaRows` gates the smallness assumption with a BOUNDED scan
    * (the delta's source set is broadcast during dedup — an unguarded
    * caller-sized broadcast is the classic OOM): an oversized delta
    * falls back to the full re-layout `pagerank` over the union — the
    * honest plan once "delta" stops being small.
    *
    * Hand this a STAGED (materialized) delta — the deployment shape for
    * a fresh-edge batch anyway: the gate and the canonicalization each
    * execute `deltaEdges` once, which is two cheap scans on a staged
    * table but two full executions of a derived plan (a join+distinct
    * delta derivation dominated the measured delta-path cost before the
    * bench fixture was staged, round-13 log).
    */
  def pagerankOnIndexDelta(idx: GraphIndex, deltaEdges: DataFrame,
                           srcCol: String, dstCol: String,
                           iterations: Int = 3,
                           dampNum: Long = 85, dampDen: Long = 100,
                           scale: Long = 1000000000000L,
                           checkpointEvery: Int = 5,
                           maxDriverEdges: Long = 200000L,
                           maxDeltaRows: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val spark = idx.edges.sparkSession
    val rawDelta = deltaEdges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val capped = rawDelta
      .limit(math.min(maxDeltaRows + 1, Int.MaxValue.toLong).toInt).count()
    if (capped > maxDeltaRows)
      return pagerank(idx.edges.unionByName(rawDelta), "src", "dst",
        iterations, dampNum, dampDen, scale, checkpointEvery, maxDriverEdges)
    val deltaNew = deltaNewEdges(idx, rawDelta)
    // a fully re-crawled delta dedups to NOTHING new: the union is the
    // index, so the plain indexed path answers — skipping both |V|-sized
    // merge checkpoints (the probe is a limit(1) on a checkpointed frame)
    if (deltaNew.limit(1).count() == 0L) {
      CacheControl.release(deltaNew)
      return pagerankOnIndex(idx, iterations, dampNum, dampDen, scale,
        checkpointEvery, maxDriverEdges)
    }
    // driver fast path (same bounded-metadata gate as pagerank): the
    // union is disjoint by construction, so concatenation IS the union
    val small = for {
      eRows <- DriverLocal.boundedCollect(idx.edges, maxDriverEdges)
      dRows <- DriverLocal.boundedCollect(deltaNew, maxDriverEdges)
    } yield (eRows, dRows)
    small.foreach { case (eRows, dRows) =>
      CacheControl.release(deltaNew)
      return driverRanks(spark,
        (eRows ++ dRows).map(r => (r.getLong(0), r.getLong(1))),
        iterations, dampNum, dampDen, scale)
    }
    // merged out-degrees: deg(union) = deg(index) + deg(deltaNew) — the
    // full-outer merge consumes idx.deg straight off its sorted bucketed
    // scan (join key = the bucket key, no exchange/sort on the index
    // side); degDelta inherits deltaNew's captured hash(src) layout
    val degDelta = deltaNew.groupBy("src").agg(count(lit(1)).as("deg"))
    def buildDegMerged(): DataFrame = CacheControl.checkpointWithLayout(spark) {
      idx.deg.withColumnRenamed("deg", "__d1")
        .join(degDelta.withColumnRenamed("deg", "__d2"), Seq("src"), "full_outer")
        .select(col("src"),
          (coalesce(col("__d1"), lit(0L)) + coalesce(col("__d2"), lit(0L)))
            .as("deg"))
        .sortWithinPartitions("src")
    }
    // merged node set: only the delta's genuinely-new endpoints join the
    // index's node scan (anti-join consumes idx.nodes sorted/bucketed —
    // no exchange/sort on the index side). The re-crawl delta of a
    // standing graph — the deployment's common shape, and the bench
    // fixture's — adds new EDGES but no new ENDPOINTS: probe that with a
    // delta-sized checkpoint first and keep `idx.nodes` untouched when
    // it holds (it already carries the loop's hash(node) bucketed+sorted
    // layout), skipping the |V|-sized union exchange AND the |V|
    // checkpoint write that used to run unconditionally (round-13 delta
    // cost decomposition). Only a delta that genuinely grows the node
    // set pays the |V| merge.
    def buildNodesMerged(): (DataFrame, Option[Long]) = {
      val deltaNodes = deltaNew.select(col("src").as("node"))
        .union(deltaNew.select(col("dst").as("node"))).distinct()
      val newNodes = CacheControl.checkpointWithLayout(spark) {
        deltaNodes.join(idx.nodes, Seq("node"), "left_anti")
      }
      // FULL count instead of the old limit(1) emptiness probe: same
      // delta-sized job on the just-checkpointed frame, and when the
      // index sidecar carries |V| the sum hands the rank loop its
      // |V_union| for free — the anti join makes newNodes disjoint from
      // idx.nodes, so the counts add exactly
      val nNew = newNodes.count()
      if (nNew == 0L) { CacheControl.release(newNodes); (idx.nodes, idx.nodeCount) }
      else {
        val merged = CacheControl.checkpointWithLayout(spark) {
          idx.nodes.union(newNodes)
            .repartition(idx.buckets, col("node"))
            .sortWithinPartitions("node")
        }
        CacheControl.release(newNodes)
        (merged, idx.nodeCount.map(_ + nNew))
      }
    }
    // the deg and node merges are INDEPENDENT checkpoint jobs (each
    // consumes the already-checkpointed deltaNew plus its own bucketed
    // index-side scan): submit them from two threads so their stages
    // overlap on the cluster instead of running back-to-back — the
    // round-13 decomposition's "merge the merges into fewer jobs",
    // without inventing a combined frame the loop would have to unpick
    val (degMerged, (nodesMerged, mergedCount)) = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val degF = scala.concurrent.Future(buildDegMerged())
        val nodesF = scala.concurrent.Future(buildNodesMerged())
        (scala.concurrent.Await.result(degF, scala.concurrent.duration.Duration.Inf),
          scala.concurrent.Await.result(nodesF, scala.concurrent.duration.Duration.Inf))
      } finally pool.shutdown()
    }
    val out = rankLoopMulti(spark, Seq(idx.edges, deltaNew), degMerged,
      nodesMerged, iterations, dampNum, dampDen, scale, checkpointEvery,
      mergedCount)
    CacheControl.release(deltaNew)
    CacheControl.release(degMerged)
    if (nodesMerged ne idx.nodes) CacheControl.release(nodesMerged)
    out
  }

  /** The delta side of [[pagerankOnIndexDelta]]: canonicalize the raw
    * (src, dst) delta onto the index's bucket hash (repartition BEFORE
    * distinct — one delta-sized exchange, the edgeLayout lesson) and
    * dedup it against the index WITHOUT re-laying the index out: one
    * broadcast semi-join pass over the bucketed edge scan narrows it to
    * the delta's sources (a SMALL, caller-gated broadcast), and the
    * anti-join against that narrowed set runs co-partitioned on the
    * delta's captured hash(src) layout. Returns the checkpointed
    * genuinely-new edges (hash(src, buckets), sorted) — disjoint from
    * `idx.edges` by construction. Package-visible so the plan-shape
    * spec can pin what the layout buys.
    */
  private[ops] def deltaNewEdges(idx: GraphIndex, rawDelta: DataFrame,
                                 maxHashBuildRows: Long = 2000000L): DataFrame = {
    val spark = idx.edges.sparkSession
    val deltaCanon = CacheControl.checkpointWithLayout(spark) {
      rawDelta.repartition(idx.buckets, col("src")).distinct()
        .sortWithinPartitions("src", "dst")
    }
    // Dedup against the index without re-laying it out. Both sides are
    // hash(src, buckets)-partitioned (deltaCanon's captured layout; the
    // bucketed edge scan — src is a subset of the (src, dst) join keys,
    // so the layouts satisfy the join's distribution with NO exchange).
    // Strategy is gated on the per-bucket index size, known at load
    // time from the build's edge count:
    //  - within `maxHashBuildRows`/bucket: per-partition HASH anti-join
    //    building on the index side — zero exchange, ZERO SORT. This is
    //    the common case; the alternative sorted the index side on
    //    (src, dst) per query, and on re-crawl deltas (sources touch
    //    most of the graph — the bench fixture's shape) the broadcast
    //    semi-join "narrowing" below kept nearly all of |E|, making the
    //    per-query sort the dominant delta-path cost (round-13 log).
    //  - above it (or unknown edge count): broadcast-semi narrow by the
    //    delta's sources, then sort-merge — SMJ spills gracefully where
    //    a huge hash build would not, and the semi-join bounds what
    //    gets sorted by the delta's actual source neighborhood.
    val hashOk = idx.edgeCount.exists(_ / math.max(idx.buckets, 1)
      <= maxHashBuildRows)
    val deltaNew = CacheControl.checkpointWithLayout(spark) {
      val deduped =
        if (hashOk)
          deltaCanon.join(idx.edges.hint("shuffle_hash"),
            Seq("src", "dst"), "left_anti")
        else {
          val srcs = deltaCanon.select("src").distinct()
          val relevant = idx.edges.join(broadcast(srcs), Seq("src"), "left_semi")
          deltaCanon.join(relevant, Seq("src", "dst"), "left_anti")
        }
      deduped.sortWithinPartitions("src")
    }
    CacheControl.release(deltaCanon)
    deltaNew
  }

  /** [[bfsLevels]] over a standing [[GraphIndex]] — frontier expansion
    * against the bucketed edge scan, per-query cost = the hops.
    */
  def bfsLevelsOnIndex(idx: GraphIndex, seeds: DataFrame, seedCol: String,
                       maxHops: Int = 4,
                       maxDriverEdges: Long = 200000L): DataFrame =
    bfsLoop(idx.edges, seeds, seedCol, maxHops, maxDriverEdges,
      releaseEdges = false)

  /** [[bfsLevelsOnIndex]] UNION a small unindexed delta edge list — the
    * BFS side of the query-time churn pattern ([[pagerankOnIndexDelta]]).
    * Simpler than PageRank's: the min-label collapse absorbs DUPLICATE
    * edges (an edge present in both the index and a re-crawled delta
    * contributes the same frontier row twice, collapsed by the per-hop
    * `min(level)` aggregation), so the delta needs only canonicalization
    * — cast + delta-sized distinct onto the index's bucket hash — and no
    * dedup pass against the index at all. Per hop the standing bucketed
    * scan stays exchange-free; only the frontier and the delta move.
    * Results are bit-identical to [[bfsLevels]] over the union.
    */
  def bfsLevelsOnIndexDelta(idx: GraphIndex, deltaEdges: DataFrame,
                            srcCol: String, dstCol: String,
                            seeds: DataFrame, seedCol: String,
                            maxHops: Int = 4,
                            maxDriverEdges: Long = 200000L): DataFrame = {
    val spark = idx.edges.sparkSession
    val deltaCanon = CacheControl.checkpointWithLayout(spark) {
      deltaEdges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .repartition(idx.buckets, col("src")).distinct()
        .sortWithinPartitions("src")
    }
    bfsLoopMulti(Seq(idx.edges, deltaCanon), seeds, seedCol, maxHops,
      maxDriverEdges, releaseFrames = Seq(deltaCanon))
  }

  /** [[triangleCounts]] over a standing [[GraphIndex]]: the directed
    * index stores both orientations of an undirected graph's edges (or
    * whatever the caller built it from), and triangleCounts canonicalizes
    * to a < b itself — what the index saves is the upstream edge
    * DERIVATION (the source joins + distinct), which dominates per-query
    * cost; the degree-oriented enumeration still runs per query because
    * its one-shot joins deliberately stay adaptive (see the plain
    * checkpoint note inside [[triangleCounts]]).
    */
  def triangleCountsOnIndex(idx: GraphIndex): DataFrame =
    triangleCounts(idx.edges, "src", "dst")

  /** [[triangleCountsOnIndex]] UNION a fresh-edge delta — the triangle
    * side of the query-time churn pattern ([[pagerankOnIndexDelta]] /
    * [[bfsLevelsOnIndexDelta]]). The simplest of the three: triangle
    * counting canonicalizes and dedups its whole input anyway
    * (least/greatest + distinct inside [[triangleCounts]]), so
    * re-crawled delta edges absorb with no extra pass, and — unlike the
    * iterative operators — there is no per-frame optimization to claim:
    * the DEGREE ORIENTATION must be recomputed over the union (a delta
    * edge can change any endpoint's degree, which can flip the
    * orientation of index edges far from the delta). What the index
    * still amortizes is the upstream edge derivation. Bit-identical to
    * [[triangleCounts]] over the union by construction.
    */
  def triangleCountsOnIndexDelta(idx: GraphIndex, deltaEdges: DataFrame,
                                 aCol: String, bCol: String): DataFrame =
    triangleCounts(idx.edges.unionByName(
      deltaEdges.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))), "src", "dst")

  /** Deterministic per-path catalog name, so the same artifact loaded
    * twice (or by concurrent queries) resolves to one table and two
    * different artifacts can never collide.
    */
  private def indexTableName(path: String, sub: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"graft_gidx_${h}_$sub"
  }

  /** One bucketed+sorted external table with exactly one file per bucket:
    * pre-repartitioning onto `buckets` by the bucket column makes each
    * write task hold exactly one bucket's rows (same Murmur3 hash both
    * sides), which is what lets the scan report its sort order (see
    * [[buildGraphIndex]]).
    */
  private def writeBucketed(df: DataFrame, keyCol: String, root: String,
                            sub: String, buckets: Int,
                            alreadyArranged: Boolean = false): Unit = {
    val t = indexTableName(root, sub)
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $t")
    // `alreadyArranged` = caller promises the rows are PHYSICALLY
    // hash(keyCol, buckets)-partitioned already (an executed repartition
    // behind a checkpoint counts even though the planner no longer knows
    // it) — the one-file-per-bucket property then holds without a second
    // exchange, since each task's rows map to exactly one bucket id
    val arranged = if (alreadyArranged) df else df.repartition(buckets, col(keyCol))
    arranged
      .write.bucketBy(buckets, keyCol).sortBy(keyCol)
      .option("path", s"$root/$sub").mode("overwrite").saveAsTable(t)
  }

  /** The iterative layout: canonical (src, dst) long edges, deduplicated,
    * HASH-PARTITIONED and SORTED by src, materialized once (LogicalRDD
    * carries partitioning + ordering through the checkpoint). Shared by
    * [[pagerank]] and [[bfsLevels]]; package-visible so the plan-shape
    * spec can pin what the layout buys ([[contribSums]]).
    */
  private[ops] def edgeLayout(edges: DataFrame, srcCol: String,
                              dstCol: String): DataFrame =
    // repartition BEFORE distinct: HashPartitioning(src) satisfies the
    // dedup aggregation's ClusteredDistribution(src, dst) — equal (src,
    // dst) rows are already co-located — so the layout costs ONE edge
    // exchange total, not distinct-then-repartition's two.
    // checkpointWithLayout (not a plain localCheckpoint): under AQE the
    // capture would record UnknownPartitioning and every iteration's
    // contribution join would re-exchange + re-sort this edge list —
    // the exact cost the layout exists to pay once (the plan-shape spec
    // pins this under adaptive execution, the production config)
    CacheControl.checkpointWithLayout(edges.sparkSession) {
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
        .repartition(col("src")).distinct()
        .sortWithinPartitions("src")
    }

  /** One PageRank iteration's contribution aggregation — the loop body,
    * factored out so the plan-shape spec can pin the iterative layout:
    * with `e` and `deg` hash-partitioned and sorted on src (see
    * [[pagerank]]'s checkpoints), the 3-way src join plans with NO
    * exchange and NO sort on either immutable side; the only per-round
    * shuffles move the rank vector (join key src, then the dst
    * aggregation) — |V|-sized, never |E|.
    */
  private[ops] def contribSums(e: DataFrame, ranks: DataFrame,
                               deg: DataFrame): DataFrame =
    contribSumsMulti(Seq(e), ranks, deg)

  /** [[contribSums]] over several edge frames: per-source contributions
    * computed ONCE, each frame joins them independently, streams union
    * before the destination aggregation (map-side partials collapse the
    * union to ≤ |V| rows per partition before the one exchange). With a
    * single frame the plan is identical to the historical single-frame
    * form — the plan-shape spec pins that path unchanged.
    */
  private[ops] def contribSumsMulti(es: Seq[DataFrame], ranks: DataFrame,
                                    deg: DataFrame): DataFrame = {
    // ranks⋈deg first: both are |V|-sized, so the per-source contribution
    // rank div deg computes on |V| rows (not once per edge) and the edge
    // list is touched by exactly ONE join per iteration — one broadcast
    // build instead of two on the small-side plan, one shuffle-free probe
    // on the co-partitioned plan. Integer ops unchanged → bit-identical.
    val perSrc = ranks.withColumnRenamed("node", "src")
      .join(deg, Seq("src"))
      .select(col("src"), expr("rank_fp div deg").as("__c"))
    es.map(e => e.join(perSrc, Seq("src"))
        .select(col("dst").as("node"), col("__c").as("c")))
      .reduce(_ union _)
      .groupBy("node").agg(sum(col("c")).as("s"))
  }

  /** Breadth-first levels from `seeds` over directed `edges`: (node,
    * level) with level = length of the shortest path from any seed
    * (≤ `maxHops`; unreachable nodes are absent). Frontier expansion, the
    * distributed BFS shape: each hop is one join of the CURRENT frontier
    * (nodes first reached last hop — usually ≪ |V|) with the edge list
    * plus a min-label collapse, so hop h costs O(out-edges of frontier h),
    * not O(|E|). Exact integer labels — deterministic at any parallelism.
    */
  def bfsLevels(edges: DataFrame, srcCol: String, dstCol: String,
                seeds: DataFrame, seedCol: String,
                maxHops: Int = 4,
                maxDriverEdges: Long = 200000L): DataFrame = {
    // materialized once — every hop joins against it, partitioned+sorted
    // on the join key so no hop re-shuffles the edge list (see pagerank)
    val e = edgeLayout(edges, srcCol, dstCol)
    bfsLoop(e, seeds, seedCol, maxHops, maxDriverEdges, releaseEdges = true)
  }

  /** The BFS frontier-expansion body over an already-laid-out edge frame
    * — shared by [[bfsLevels]] (per-query [[edgeLayout]], released at the
    * end) and [[bfsLevelsOnIndex]] (standing bucketed scan, nothing to
    * release). Includes the small-graph driver fast path ([[pagerank]]):
    * exact integer BFS labels are engine-agnostic, so a driver BFS over
    * ≤ `maxDriverEdges` edges (and as many seeds) returns identical rows
    * without the per-hop checkpoint jobs; `0` forces the distributed
    * loop.
    */
  private def bfsLoop(e: DataFrame, seeds: DataFrame, seedCol: String,
                      maxHops: Int, maxDriverEdges: Long,
                      releaseEdges: Boolean): DataFrame =
    bfsLoopMulti(Seq(e), seeds, seedCol, maxHops, maxDriverEdges,
      releaseFrames = if (releaseEdges) Seq(e) else Nil)

  /** [[bfsLoop]] over a SEQUENCE of edge frames whose union is the edge
    * set ([[bfsLevelsOnIndexDelta]]): each hop joins the frontier with
    * every frame independently and unions the expansions before the
    * min-label collapse — duplicate edges across frames are absorbed by
    * the aggregation, so labels are bit-identical to a single-frame BFS
    * over the (deduplicated) union. With one frame the plan degenerates
    * to the historical single-frame loop. `releaseFrames` lists the
    * caller-owned pins to drop on exit (the per-query layout, never a
    * standing scan).
    */
  private def bfsLoopMulti(es: Seq[DataFrame], seeds: DataFrame, seedCol: String,
                           maxHops: Int, maxDriverEdges: Long,
                           releaseFrames: Seq[DataFrame]): DataFrame = {
    require(maxHops >= 0, "maxHops must be ≥ 0")
    val spark = es.head.sparkSession
    val seedFrame = seeds.select(col(seedCol).cast("long").as("node")).distinct()
    def collectAll(frames: Seq[DataFrame]): Option[Array[org.apache.spark.sql.Row]] =
      frames.foldLeft(Option(Array.empty[org.apache.spark.sql.Row])) {
        case (acc, f) => for {
          a <- acc
          r <- DriverLocal.boundedCollect(f, maxDriverEdges)
        } yield a ++ r
      }
    val smallGraph = for {
      eRows <- collectAll(es)
      sRows <- DriverLocal.boundedCollect(seedFrame, maxDriverEdges)
    } yield (eRows, sRows)
    smallGraph.foreach { case (eRows, sRows) =>
      // duplicate (src, dst) pairs across frames are harmless: the
      // adjacency fan-out is de-duplicated per hop below
      val pairs = eRows.map(r => (r.getLong(0), r.getLong(1)))
      releaseFrames.foreach(CacheControl.release)
      val adj: Map[Long, Seq[Long]] =
        pairs.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).toSeq }
      val lvl = scala.collection.mutable.HashMap.empty[Long, Int]
      var frontier = sRows.map(_.getLong(0)).toSeq
      frontier.foreach(lvl(_) = 0)
      for (h <- 1 to maxHops) {
        frontier = frontier.flatMap(n => adj.getOrElse(n, Seq.empty))
          .distinct.filterNot(n => lvl.contains(n))
        frontier.foreach(lvl(_) = h)
      }
      return DriverLocal.twoColDF(spark,
        lvl.toSeq.map { case (n, l) => org.apache.spark.sql.Row(n, l) },
        "node", org.apache.spark.sql.types.LongType,
        "level", org.apache.spark.sql.types.IntegerType)
    }
    var levels = seedFrame.withColumn("level", lit(0))
    var prevCkpt: Option[DataFrame] = None
    for (h <- 1 to maxHops) {
      val frontier = levels.filter(col("level") === h - 1)
      val next = es.map(e => frontier.join(e, col("node") === col("src"))
          .select(col("dst").as("node"), lit(h).as("level")))
        .reduce(_ union _)
      // checkpoint EVERY hop: `levels` is referenced twice per round
      // (frontier + union), so an unbroken lineage would re-execute the
      // whole prefix 2^h times; the label set is |V|-bounded — cheap to
      // pin, and the previous hop's pin is released as soon as the new
      // one materializes
      // layout-preserving: the hop aggregation leaves levels hash(node)
      // partitioned — captured, the NEXT hop's frontier⋈e join needs no
      // exchange on the frontier side (key node) either
      levels = CacheControl.checkpointWithLayout(spark) {
        levels.union(next)
          .groupBy("node").agg(min(col("level")).as("level"))
      }
      prevCkpt.foreach(CacheControl.release)
      prevCkpt = Some(levels)
    }
    // maxHops = 0: no loop ran, nothing is pinned yet — materialize so
    // the edge pins can still be dropped uniformly
    val out = if (prevCkpt.isEmpty) levels.localCheckpoint() else levels
    releaseFrames.foreach(CacheControl.release)
    out
  }

  /** Per-node triangle counts over an UNDIRECTED graph (`aCol`—`bCol` in
    * either orientation; parallel edges and self-loops collapse away).
    * Exact integers — hash-stable against any engine, and independent of
    * the enumeration order, so the algorithm below is free to pick the
    * orientation that bounds the join.
    *
    * DEGREE-ORIENTED enumeration (Schank–Wagner / Cohen): edges orient
    * from the endpoint that is SMALLER under the total order
    * ≺ = (degree, id) toward the larger, wedges form only between a
    * node's OUT-neighbors, and the closing edge is probed in the same
    * orientation. Every triangle {x ≺ y ≺ z} appears exactly once — as
    * the wedge (x→y, x→z) closed by y→z. Why this is the 100 TB shape:
    * out-degree under ≺ is O(√|E|) even on power-law graphs (a hub's
    * edges orient INTO it from its lower-degree neighbors — credited,
    * never fanned out), so wedge count is Σ out-deg² ≤ O(|E|^1.5)
    * instead of the id-ordered join's Σ deg²/4, which a single
    * million-degree hub turns into 10¹² wedges on one key.
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // PLAIN localCheckpoint before fanning out: the canonical edge set is
    // consumed THREE times during the build (the degree union reads it
    // twice, the orientation join once) — unmaterialized, the upstream
    // edges plan would re-execute ~3× (ADVICE r10). Released after the
    // oriented edges materialize below.
    val und = edges.select(
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("a"),
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("b"))
      .filter(col("a") < col("b")).distinct()
      .localCheckpoint()
    // undirected degree per node — |V|-sized, two joins attach it to the
    // edge list's endpoints (shuffles on a then b, each |E|-sized, paid
    // once at build; the enumeration joins below are what must not blow up)
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val aLtB = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    // oriented edge u→v with u ≺ v; dv (v's degree) rides along so the
    // wedge join can compare two heads under ≺ without re-joining deg.
    // PLAIN checkpoint, deliberately NOT the layout-capturing kind
    // (contrast pagerank's edgeLayout): this operator runs its joins
    // ONCE, so a pre-captured hash(u) layout saves two edge exchanges
    // at the price of planning the whole build AQE-off (measured 2–3×
    // slower: the deg joins lose broadcast/adaptive planning) and of
    // freezing the wedge self-join's strategy — the one join here that
    // WANTS adaptivity, since AQE's skew splitting on the wedge key is
    // worth more than a saved shuffle when a residual hot key slips
    // through the orientation. Iterative operators amortize a captured
    // layout across rounds; a one-shot enumeration does not.
    val o = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(aLtB, col("a")).otherwise(col("b")).as("u"),
        when(aLtB, col("b")).otherwise(col("a")).as("v"),
        when(aLtB, col("db")).otherwise(col("da")).as("dv"))
      .localCheckpoint()
    CacheControl.release(und) // oriented edges are materialized; the
    // canonical set has no further consumer
    val headLt = col("e1.dv") < col("e2.dv") ||
      (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))
    // wedge (x→y, x→z) with y ≺ z: the ≺-ordered pair of x's out-neighbors
    val wedges = o.as("e1")
      .join(o.as("e2"), col("e1.u") === col("e2.u") && headLt)
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    // closing edge y—z is stored oriented y→z precisely because y ≺ z
    val tris = wedges.as("w")
      .join(o.as("e3"), col("w.y") === col("e3.u") && col("w.z") === col("e3.v"))
      .select(col("w.x").as("x"), col("w.y").as("y"), col("w.z").as("z"))
    val out = tris.select(col("x").as("node"))
      .union(tris.select(col("y").as("node")))
      .union(tris.select(col("z").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .localCheckpoint() // per-node counts materialize; the edge pin drops
    CacheControl.release(o)
    out
  }
}
