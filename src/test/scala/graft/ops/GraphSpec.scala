package graft.ops

import graft.SparkSpec

/** Fixed-point PageRank: the distributed result must equal a sequential
  * in-memory model BIT-FOR-BIT (that is the whole point of integer
  * arithmetic — no float drift), at any partitioning.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank matches the sequential fixed-point model at any parallelism") {
    val rnd = new scala.util.Random(42)
    val edges = (1 to 400)
      .map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)).distinct
    // sequential model of the exact update rule
    val scale = 1000000000000L
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val init = scale / nodes.size
    val teleport = (15L * init) / 100L
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> init).toMap
    for (_ <- 1 to 4) {
      val sums = scala.collection.mutable.HashMap.empty[Long, Long]
        .withDefaultValue(0L)
      edges.foreach { case (u, v) => sums(v) += r(u) / deg(u) }
      r = nodes.map(n => n -> (teleport + (85L * sums(n)) / 100L)).toMap
    }
    val got = Graph.pagerank(edges.toDF("s", "d").repartition(7),
        "s", "d", iterations = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == r)
    // bit-identical under a different partitioning
    val got2 = Graph.pagerank(edges.toDF("s", "d").repartition(2),
        "s", "d", iterations = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got2 == got)
    // mass never exceeds the fixed-point budget (truncation only loses)
    assert(got.values.sum <= scale && got.values.sum > scale / 2)
  }

  test("bfsLevels finds shortest hop counts; unreachable nodes absent") {
    // 0→1→2→3→4 chain plus a shortcut 0→3 and an island 9→10
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L), (9L, 10L))
      .toDF("s", "d")
    val seeds = Seq(0L).toDF("n")
    val got = Graph.bfsLevels(e, "s", "d", seeds, "n", maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 1, 4L -> 2))
    // hop budget truncates: maxHops=1 reaches only direct neighbors
    val one = Graph.bfsLevels(e, "s", "d", seeds, "n", maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(one == Map(0L -> 0, 1L -> 1, 3L -> 1))
  }

  test("triangleCounts credits each corner once per triangle") {
    // K4 on {1,2,3,4} (some edges reversed + a duplicate + a self-loop),
    // plus a pendant 4—5: K4 has 4 triangles, each node in exactly 3
    val e = Seq((1L, 2L), (3L, 1L), (1L, 4L), (2L, 3L), (4L, 2L), (3L, 4L),
      (2L, 1L), (5L, 4L), (3L, 3L)).toDF("x", "y")
    val got = Graph.triangleCounts(e, "x", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts on a hub-heavy graph matches brute force") {
    // hub 0 adjacent to everyone (the power-law hazard the degree
    // orientation exists for) + a random graph among the spokes; verify
    // against an in-memory brute-force count over the same edge set
    val rnd = new scala.util.Random(7)
    val hub = (1 to 19).map(i => (0L, i.toLong))
    val spokes = (1 to 120)
      .map(_ => (1 + rnd.nextInt(19).toLong, 1 + rnd.nextInt(19).toLong))
      .filter { case (a, b) => a != b }
    val all = (hub ++ spokes)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val adj = (all ++ all.map(_.swap)).groupBy(_._1)
      .map { case (n, g) => n -> g.map(_._2).toSet }
    val expected = scala.collection.mutable.HashMap.empty[Long, Long]
      .withDefaultValue(0L)
    for {
      (a, b) <- all
      c <- adj(a) if c > b && adj(b).contains(c)
    } { expected(a) += 1; expected(b) += 1; expected(c) += 1 }
    val got = Graph.triangleCounts(all.toDF("x", "y"), "x", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected.toMap)
  }

  test("validatePromise fails loudly on a one-orientation edge list") {
    val pairs = (1 to 50).map(i => (i.toLong, (i % 25 + 30).toLong)).distinct
    val directed = pairs.toDF("s", "d")
    val ex = intercept[IllegalArgumentException] {
      Graph.pagerank(directed, "s", "d", iterations = 2,
        maxDriverEdges = 0, symmetricEdges = true, validatePromise = true)
    }
    assert(ex.getMessage.contains("symmetricEdges promise violated"))
    // a kept promise validates clean and changes nothing
    val sym = (pairs ++ pairs.map(_.swap)).toDF("s", "d")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val checked = rows(Graph.pagerank(sym, "s", "d", iterations = 3,
      maxDriverEdges = 0, symmetricEdges = true, validatePromise = true))
    val unchecked = rows(Graph.pagerank(sym, "s", "d", iterations = 3,
      maxDriverEdges = 0, symmetricEdges = true))
    assert(checked == unchecked)
  }

  test("dangling nodes leak mass but stay ranked; long runs checkpoint") {
    // 1 -> 2 -> 3, 3 dangling
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val out = Graph.pagerank(e, "s", "d", iterations = 12, checkpointEvery = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // node 1 has no in-edges: teleport mass only
    val scale = 1000000000000L
    val init = scale / 3
    assert(out(1L) == (15L * init) / 100L)
    assert(out(3L) > out(1L)) // sink accumulates more than the source
  }

  test("pagerank iterations re-shuffle only the rank vector, never the edges") {
    // the iterative-layout contract: edges + degrees are partitioned and
    // sorted on src ONCE (edgeLayout, via checkpointWithLayout so the
    // capture survives AQE); every iteration's 3-way join must then plan
    // with no Exchange and no Sort above either immutable side — only
    // the rank vector (and the dst aggregation) moves per round.
    // Asserted UNDER AQE: that is the bench/driver config, and it is
    // exactly the config where a plain localCheckpoint loses the layout
    // (the adaptive root reports UnknownPartitioning at capture time) —
    // an AQE-off assertion would pin a plan production never runs
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val rnd = new scala.util.Random(7)
    val es = (1 to 500)
      .map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .toDF("s", "d")
    val e = Graph.edgeLayout(es, "s", "d")
    val deg = CacheControl.checkpointWithLayout(spark) {
      e.groupBy("src")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("deg"))
        .sortWithinPartitions("src")
    }
    // rank vector from an UNRELATED source so its subtree can't be
    // mistaken for the edge scan
    val ranks = spark.range(40)
      .select(org.apache.spark.sql.functions.col("id").as("node"),
        org.apache.spark.sql.functions.lit(1000L).as("rank_fp"))
    val sums = Graph.contribSums(e, ranks, deg)
    sums.count() // drive AQE to its final plan before inspecting it
    val plan = sums.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // "directly over the edge scan" = reaches the (src, dst) leaf
    // without passing a join or an aggregate — a shuffle/sort there
    // means the per-iteration plan re-laid-out the edge list; the
    // post-join aggregation exchange (which also has the scan somewhere
    // below it) is the legitimate per-round rank movement. AQE wraps
    // stages in QueryStageExec nodes whose children are empty — recurse
    // through their `plan` instead
    def walk(p: org.apache.spark.sql.execution.SparkPlan)(
        f: org.apache.spark.sql.execution.SparkPlan => Boolean): Boolean =
      p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(qs.plan)(f)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          walk(r.child)(f)
        case other => f(other)
      }
    def directlyOverEdgeScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      walk(p) {
        case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => false
        case leaf if leaf.children.isEmpty =>
          leaf.output.map(_.name) == Seq("src", "dst")
        case other => other.children.exists(directlyOverEdgeScan)
      }
    def collectAll(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          qs +: collectAll(qs.plan)
        case other => other +: other.children.flatMap(collectAll)
      }
    val all = collectAll(plan)
    assert(all.exists(n => n.children.isEmpty &&
        n.output.map(_.name) == Seq("src", "dst")),
      s"edge scan not found in plan:\n$plan")
    val badShuffle = all.collect {
      case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if directlyOverEdgeScan(x.child) => x }
    val badSort = all.collect {
      case s: org.apache.spark.sql.execution.SortExec
        if directlyOverEdgeScan(s.child) => s }
    assert(badShuffle.isEmpty,
      s"edge list re-shuffled inside the iteration plan:\n$plan")
    assert(badSort.isEmpty,
      s"edge list re-sorted inside the iteration plan:\n$plan")
    CacheControl.release(e); CacheControl.release(deg)
  }

  test("symmetricEdges skips the node-set pass without changing results") {
    val rnd = new scala.util.Random(11)
    val pairs = (1 to 300)
      .map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
    // both orientations of every pair — the promise the flag encodes
    val sym = (pairs ++ pairs.map(_.swap)).toDF("s", "d")
    // distributed loops on both paths (maxDriverEdges = 0): the flag must
    // be a pure plan change, bit-identical output
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val general = rows(Graph.pagerank(sym, "s", "d", iterations = 4,
      maxDriverEdges = 0))
    val fast = rows(Graph.pagerank(sym, "s", "d", iterations = 4,
      maxDriverEdges = 0, symmetricEdges = true))
    assert(fast == general)
    // driver fast path is orthogonal to the flag
    val drv = rows(Graph.pagerank(sym, "s", "d", iterations = 4,
      symmetricEdges = true))
    assert(drv == general)
  }

  test("driver fast paths match the distributed loops exactly") {
    import spark.implicits._
    // a messy graph: cycle, chain, dangling sink, disconnected pair,
    // duplicate edge
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (7L, 8L), (1L, 2L)).toDF("src", "dst")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.get(1))).toSet
    val prFast = rows(Graph.pagerank(es, "src", "dst", iterations = 7,
      checkpointEvery = 2))
    val prDist = rows(Graph.pagerank(es, "src", "dst", iterations = 7,
      checkpointEvery = 2, maxDriverEdges = 0))
    assert(prFast == prDist, s"pagerank fast=$prFast dist=$prDist")
    val seeds = Seq(1L, 7L).toDF("seed")
    val bfFast = rows(Graph.bfsLevels(es, "src", "dst", seeds, "seed", maxHops = 3))
    val bfDist = rows(Graph.bfsLevels(es, "src", "dst", seeds, "seed",
      maxHops = 3, maxDriverEdges = 0))
    assert(bfFast == bfDist, s"bfs fast=$bfFast dist=$bfDist")
  }

  test("graph index: build/load round-trip, bit-identical operators, one file per bucket") {
    val rnd = new scala.util.Random(23)
    val pairs = (1 to 600)
      .map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = pairs.toDF("a", "b")
    val root = java.nio.file.Files.createTempDirectory("gidx").toString + "/g"
    Graph.buildGraphIndex(edges, "a", "b", root)
    // exactly one data file per bucket in each table — the condition the
    // sorted-scan ordering report depends on
    for (sub <- Seq("edges", "deg", "nodes")) {
      val files = new java.io.File(s"$root/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == spark.sessionState.conf.numShufflePartitions,
        s"$sub: ${files.length} files")
    }
    val idx = Graph.loadGraphIndex(spark, root)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.get(1))).toSet
    // distributed loops both sides: the index must be a pure access-path
    // change, bit-identical output
    val direct = rows(Graph.pagerank(edges, "a", "b", iterations = 4,
      checkpointEvery = 2, maxDriverEdges = 0))
    val viaIdx = rows(Graph.pagerankOnIndex(idx, iterations = 4,
      checkpointEvery = 2, maxDriverEdges = 0))
    assert(viaIdx == direct)
    // driver fast path rides the same gate
    assert(rows(Graph.pagerankOnIndex(idx, iterations = 4,
      checkpointEvery = 2)) == direct)
    val seeds = Seq(3L, 11L).toDF("seed")
    val bfsDirect = rows(Graph.bfsLevels(edges, "a", "b", seeds, "seed",
      maxHops = 3, maxDriverEdges = 0))
    assert(rows(Graph.bfsLevelsOnIndex(idx, seeds, "seed", maxHops = 3,
      maxDriverEdges = 0)) == bfsDirect)
    assert(rows(Graph.bfsLevelsOnIndex(idx, seeds, "seed", maxHops = 3))
      == bfsDirect)
    // triangleCounts canonicalizes orientation itself, so counting over
    // the directed index equals counting over the raw pair list
    assert(rows(Graph.triangleCountsOnIndex(idx))
      == rows(Graph.triangleCounts(edges, "a", "b")))
    // cross-session load path: drop the catalog registrations (files
    // stay) and re-load — the DDL re-registration must serve the same
    // frames a fresh session would get
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    for (sub <- Seq("edges", "deg", "nodes"))
      spark.sql(s"DROP TABLE IF EXISTS graft_gidx_${h}_$sub")
    val idx2 = Graph.loadGraphIndex(spark, root)
    assert(rows(Graph.pagerankOnIndex(idx2, iterations = 4,
      checkpointEvery = 2, maxDriverEdges = 0)) == direct)
  }

  test("rebuildGraphIndex: pointer-committed generations, one-cycle GC, stale readers keep working") {
    def edgesDF(n: Int) = (1 to n)
      .map(i => (i.toLong % 20, (i * 7).toLong % 20))
      .filter { case (a, b) => a != b }.distinct.toDF("a", "b")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.get(1))).toSet
    val root = java.nio.file.Files.createTempDirectory("gidxgen").toString + "/g"
    // generation 1 publishes and serves
    assert(Graph.rebuildGraphIndex(edgesDF(200), "a", "b", root) == 1L)
    val idx1 = Graph.loadGraphIndexCurrent(spark, root)
    val r1 = rows(Graph.pagerankOnIndex(idx1, iterations = 3, maxDriverEdges = 0))
    assert(r1 == rows(Graph.pagerank(edgesDF(200), "a", "b", iterations = 3,
      maxDriverEdges = 0)))
    // generation 2: the pointer moves, gen-1 SURVIVES one cycle — a
    // reader holding idx1 keeps scanning intact files
    assert(Graph.rebuildGraphIndex(edgesDF(300), "a", "b", root) == 2L)
    assert(new java.io.File(s"$root/gen-1").exists)
    assert(rows(Graph.pagerankOnIndex(idx1, iterations = 3,
      maxDriverEdges = 0)) == r1, "stale reader broke under a rebuild")
    val idx2 = Graph.loadGraphIndexCurrent(spark, root)
    assert(rows(Graph.pagerankOnIndex(idx2, iterations = 3, maxDriverEdges = 0))
      == rows(Graph.pagerank(edgesDF(300), "a", "b", iterations = 3,
        maxDriverEdges = 0)))
    // generation 3 GCs gen-1 (two cycles old), keeps gen-2
    assert(Graph.rebuildGraphIndex(edgesDF(400), "a", "b", root) == 3L)
    assert(!new java.io.File(s"$root/gen-1").exists, "gen-1 should be GC'd")
    assert(new java.io.File(s"$root/gen-2").exists, "gen-2 has one-cycle grace")
    assert(rows(Graph.pagerankOnIndex(Graph.loadGraphIndexCurrent(spark, root),
      iterations = 3, maxDriverEdges = 0))
      == rows(Graph.pagerank(edgesDF(400), "a", "b", iterations = 3,
        maxDriverEdges = 0)))
  }

  test("triangleCountsOnIndexDelta: overlap absorbs, mixed triangles count, equals from-scratch") {
    val rnd = new scala.util.Random(61)
    val all = (1 to 300)
      .map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }.distinct
    val (baseE, freshE) = all.splitAt(all.size - 40)
    // re-crawled overlap + genuinely new edges, like the oracle row
    val delta = (freshE ++ baseE.take(15)).toDF("a", "b")
    val root = java.nio.file.Files.createTempDirectory("gidxt").toString + "/g"
    Graph.buildGraphIndex(baseE.toDF("a", "b"), "a", "b", root)
    val idx = Graph.loadGraphIndex(spark, root)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(Graph.triangleCountsOnIndexDelta(idx, delta, "a", "b"))
      == rows(Graph.triangleCounts(all.toDF("a", "b"), "a", "b")))
  }

  test("delta pattern: pagerank over index ∪ fresh edges equals a full rebuild") {
    // the churn story buildGraphIndex's scaladoc documents: between
    // index rebuilds, new edges ride as a small unindexed delta UNIONed
    // at query time — pagerank's own edgeLayout dedups the overlap, so
    // the result must be bit-identical to rebuilding over the full set
    val rnd = new scala.util.Random(47)
    val all = (1 to 500)
      .map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val (baseE, freshE) = all.splitAt(all.size - 60)
    // delta OVERLAPS the indexed set (re-crawled edges) — the dedup is
    // the point
    val delta = (freshE ++ baseE.take(20)).toDF("a", "b")
    val root = java.nio.file.Files.createTempDirectory("gidxd").toString + "/g"
    Graph.buildGraphIndex(baseE.toDF("a", "b"), "a", "b", root)
    val idx = Graph.loadGraphIndex(spark, root)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.get(1))).toSet
    val merged = idx.edges.union(delta.selectExpr(
      "CAST(a AS BIGINT) AS src", "CAST(b AS BIGINT) AS dst"))
    val got = rows(Graph.pagerank(merged, "src", "dst", iterations = 3,
      maxDriverEdges = 0))
    val full = rows(Graph.pagerank(all.toDF("a", "b"), "a", "b",
      iterations = 3, maxDriverEdges = 0))
    assert(got == full)
  }

  test("pagerankOnIndexDelta: absorbs overlap, adds new nodes, hash-matches a rebuild") {
    val rnd = new scala.util.Random(53)
    val baseE = (1 to 400)
      .map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    // delta = re-crawled edges (overlap — must be absorbed) + edges into
    // a genuinely NEW node id space (41..60: new nodes AND new edges)
    val fresh = (1 to 40)
      .map(_ => (rnd.nextInt(40).toLong, (41 + rnd.nextInt(20)).toLong)).distinct
    val delta = (baseE.take(30) ++ fresh).toDF("a", "b")
    val all = (baseE ++ fresh).distinct
    val root = java.nio.file.Files.createTempDirectory("gidxda").toString + "/g"
    Graph.buildGraphIndex(baseE.toDF("a", "b"), "a", "b", root)
    val idx = Graph.loadGraphIndex(spark, root)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.get(1))).toSet
    val full = rows(Graph.pagerank(all.toDF("a", "b"), "a", "b",
      iterations = 4, checkpointEvery = 2, maxDriverEdges = 0))
    // distributed delta path
    assert(rows(Graph.pagerankOnIndexDelta(idx, delta, "a", "b",
      iterations = 4, checkpointEvery = 2, maxDriverEdges = 0)) == full)
    // driver fast path rides the same gate
    assert(rows(Graph.pagerankOnIndexDelta(idx, delta, "a", "b",
      iterations = 4, checkpointEvery = 2)) == full)
    // oversized delta: the bounded gate falls back to the full
    // re-layout pagerank over the union — same rows, honest plan
    assert(rows(Graph.pagerankOnIndexDelta(idx, delta, "a", "b",
      iterations = 4, checkpointEvery = 2, maxDriverEdges = 0,
      maxDeltaRows = 5)) == full)
    // a fully-overlapping delta degenerates to the plain indexed result
    assert(rows(Graph.pagerankOnIndexDelta(idx, baseE.take(25).toDF("a", "b"),
      "a", "b", iterations = 4, checkpointEvery = 2, maxDriverEdges = 0))
      == rows(Graph.pagerankOnIndex(idx, iterations = 4, checkpointEvery = 2,
        maxDriverEdges = 0)))
    // BFS over index ∪ delta: min-label collapse absorbs the overlap
    // without any dedup pass; distributed and driver paths both match
    // a from-scratch BFS over the union
    val seeds = Seq(1L, 5L).toDF("seed")
    val bfsFull = rows(Graph.bfsLevels(all.toDF("a", "b"), "a", "b",
      seeds, "seed", maxHops = 3, maxDriverEdges = 0))
    assert(rows(Graph.bfsLevelsOnIndexDelta(idx, delta, "a", "b",
      seeds, "seed", maxHops = 3, maxDriverEdges = 0)) == bfsFull)
    assert(rows(Graph.bfsLevelsOnIndexDelta(idx, delta, "a", "b",
      seeds, "seed", maxHops = 3)) == bfsFull)
  }

  test("delta iterations: the index scan stays exchange- and sort-free; only the delta paid layout") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val rnd = new scala.util.Random(59)
    val edges = (1 to 500)
      .map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct.toDF("a", "b")
    val root = java.nio.file.Files.createTempDirectory("gidxdp").toString + "/g"
    Graph.buildGraphIndex(edges, "a", "b", root)
    val idx = Graph.loadGraphIndex(spark, root)
    val delta = Seq((1L, 41L), (41L, 1L), (2L, 42L)).toDF("src", "dst")
      .selectExpr("CAST(src AS BIGINT) AS src", "CAST(dst AS BIGINT) AS dst")
    val deltaNew = Graph.deltaNewEdges(idx, delta)
    val ranks = spark.range(43)
      .select(org.apache.spark.sql.functions.col("id").as("node"),
        org.apache.spark.sql.functions.lit(1000L).as("rank_fp"))
    val sums = Graph.contribSumsMulti(Seq(idx.edges, deltaNew), ranks, idx.deg)
    sums.count() // drive AQE to its final plan
    val plan = sums.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    def walk(p: org.apache.spark.sql.execution.SparkPlan)(
        f: org.apache.spark.sql.execution.SparkPlan => Boolean): Boolean =
      p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(qs.plan)(f)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          walk(r.child)(f)
        case other => f(other)
      }
    // the INDEX leaf is the parquet file scan; the delta checkpoint is a
    // LogicalRDD scan with the same column names — distinguish by node
    // type so the assertion can't silently pass by matching the delta
    def isIndexScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.children.isEmpty &&
        p.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec] &&
        p.output.map(_.name) == Seq("src", "dst")
    def directlyOverEdgeScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      walk(p) {
        case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => false
        case leaf if leaf.children.isEmpty => isIndexScan(leaf)
        case other => other.children.exists(directlyOverEdgeScan)
      }
    def collectAll(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          qs +: collectAll(qs.plan)
        case other => other +: other.children.flatMap(collectAll)
      }
    val all = collectAll(plan)
    assert(all.exists(isIndexScan), s"edge index scan not found in plan:\n$plan")
    val badShuffle = all.collect {
      case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if directlyOverEdgeScan(x.child) => x }
    val badSort = all.collect {
      case s: org.apache.spark.sql.execution.SortExec
        if directlyOverEdgeScan(s.child) => s }
    assert(badShuffle.isEmpty,
      s"delta union re-shuffled the standing edge index:\n$plan")
    assert(badSort.isEmpty,
      s"delta union re-sorted the standing edge index:\n$plan")
    CacheControl.release(deltaNew)
  }

  test("indexed pagerank iterations plan with no Exchange/Sort above the loaded edge scan") {
    // the standing-index contract: the bucketed+sorted scans re-enter the
    // per-iteration 3-way join carrying their layout from table METADATA
    // — no per-query exchange, no per-query sort on either immutable
    // side. Asserted UNDER AQE like the edgeLayout test above, on the
    // LOADED index (scan leaves, not LogicalRDD checkpoints).
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val rnd = new scala.util.Random(31)
    val edges = (1 to 500)
      .map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct.toDF("a", "b")
    val root = java.nio.file.Files.createTempDirectory("gidxp").toString + "/g"
    Graph.buildGraphIndex(edges, "a", "b", root)
    val idx = Graph.loadGraphIndex(spark, root)
    // rank vector from an UNRELATED source so its subtree can't be
    // mistaken for the edge scan
    val ranks = spark.range(40)
      .select(org.apache.spark.sql.functions.col("id").as("node"),
        org.apache.spark.sql.functions.lit(1000L).as("rank_fp"))
    val sums = Graph.contribSums(idx.edges, ranks, idx.deg)
    sums.count() // drive AQE to its final plan before inspecting it
    val plan = sums.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    def walk(p: org.apache.spark.sql.execution.SparkPlan)(
        f: org.apache.spark.sql.execution.SparkPlan => Boolean): Boolean =
      p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(qs.plan)(f)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          walk(r.child)(f)
        case other => f(other)
      }
    def directlyOverEdgeScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      walk(p) {
        case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => false
        case leaf if leaf.children.isEmpty =>
          leaf.output.map(_.name) == Seq("src", "dst")
        case other => other.children.exists(directlyOverEdgeScan)
      }
    def collectAll(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          qs +: collectAll(qs.plan)
        case other => other +: other.children.flatMap(collectAll)
      }
    val all = collectAll(plan)
    assert(all.exists(n => n.children.isEmpty &&
        n.output.map(_.name) == Seq("src", "dst")),
      s"edge scan not found in plan:\n$plan")
    val badShuffle = all.collect {
      case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if directlyOverEdgeScan(x.child) => x }
    val badSort = all.collect {
      case s: org.apache.spark.sql.execution.SortExec
        if directlyOverEdgeScan(s.child) => s }
    assert(badShuffle.isEmpty,
      s"loaded edge index re-shuffled inside the iteration plan:\n$plan")
    assert(badSort.isEmpty,
      s"loaded edge index re-sorted inside the iteration plan:\n$plan")
  }
}
