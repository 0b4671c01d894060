package graft.catalog

import graft.Ckpt.StableCheckpoint
import org.apache.spark.sql.functions._

/** Graph tier: link-analysis operators over a deterministic synthetic
  * web graph on the documents table. At 100 TB this is the page-quality
  * prior of a web-crawl pipeline (rank-weighted sampling, spam
  * down-weighting) — the classic companion to the d-tier's content
  * filters.
  */
object Graph {

  /** PageRank iterations; the SQL oracle unrolls one CTE per step. */
  val Iters = 5

  /** BFS relaxation rounds for g3; sentinel distance for "unreached". */
  val BfsIters = 6
  val Unreached = 999L

  /** Label-propagation rounds for g4. */
  val LpIters = 4

  /** Weighted-SSSP relaxation rounds for g5 (more than BfsIters: a
    * shortest WEIGHTED path may take more hops than the BFS radius);
    * sentinel for "unreached". */
  val SsspIters = 8
  val SsspUnreached = 999999L

  /** k-core threshold and peel rounds for g6 (fixpoint reached at both
    * tested scales; one extra peel is a no-op, CatalogSpec-pinned). */
  val KCoreK = 6
  val KCoreRounds = 8

  /** The synthetic link graph: every doc links to (7d+1), (13d+5),
    * (31d+11) mod N, self-loops removed, duplicates collapsed — a
    * deterministic expander-ish multigraph whose edge list both engines
    * derive independently from the same table.
    */
  private val EdgeFormulas: Seq[(Long, Long)] = Seq((7L, 1L), (13L, 5L), (31L, 11L))

  /** Unrolled exact-integer PageRank oracle: r0..r{Iters} as chained
    * CTEs, each the literal SQL transcription of PageRank.run's step
    * (truncating integer division on both engines: DuckDB `//`, Spark
    * `div`). All-integer math keeps every step order-free and exact.
    */
  private def pagerankSql: String = {
    val edgeUnion = EdgeFormulas.map { case (a, b) =>
      s"SELECT doc_id AS src, ($a*doc_id+$b) % (SELECT COUNT(*) FROM documents) AS dst FROM documents"
    }.mkString("\n          UNION ALL ")
    val steps = (1 to Iters).map { k =>
      s"""r$k AS (
          SELECT n.node,
            CAST(150000 + (85 * COALESCE(i.inflow, 0)) // 100 AS BIGINT) AS r
          FROM nodes n LEFT JOIN (
            SELECT e.dst, CAST(SUM(r.r // d.deg) AS BIGINT) AS inflow
            FROM r${k - 1} r
            JOIN edges e ON r.node = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst) i ON n.node = i.dst)"""
    }.mkString(",\n        ")
    s"""WITH nodes AS (SELECT doc_id AS node FROM documents),
        edges AS (
          SELECT DISTINCT src, dst FROM (
          $edgeUnion) WHERE src <> dst),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        r0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS r FROM documents),
        $steps
        SELECT node, r AS rank_units FROM r$Iters ORDER BY node"""
  }

  val queries: Seq[QueryDef] = Seq(

    QueryDef(
      "g1_pagerank",
      (s, dir) => {
        import Tables.t
        val docs = t(s, dir, "documents").select(col("doc_id"))
        // N is one driver-side count (table metadata scale, same class
        // as q54's per-partition counts) baked in as a literal so both
        // engines mod by the identical constant.
        val n = docs.count()
        val nodes = docs.select(col("doc_id").as("node"))
        val edges = EdgeFormulas.map { case (a, b) =>
          docs.select(col("doc_id").as("src"),
            ((col("doc_id") * a + b) % n).as("dst"))
        }.reduce(_ unionAll _)
          .filter(col("src") =!= col("dst"))
          .distinct()
        graft.operators.PageRank.run(edges, nodes, Iters)
          .orderBy("node")
      },
      Some(pagerankSql),
      "distributed PageRank over a deterministic link graph: exact " +
        "integer fixed-point ranks (order-free sums -> bit-identical at " +
        "any parallelism), one edge-join + one dst-groupBy per " +
        "iteration, edge set checkpointed once — oracle is the same " +
        "recurrence unrolled as SQL CTEs"),

    QueryDef(
      "g2_triangles",
      (s, dir) => {
        // Exact per-node triangle counting by the compact-forward
        // algorithm: orient each undirected edge low-id -> high-id, so
        // every triangle {x<y<z} is generated exactly once as the wedge
        // (x,y)+(y,z) closed by the edge (x,z). Two equi-joins on node
        // ids, zero cross products; each triangle is then exploded to
        // its three corners and counted per node. At web scale the
        // orientation is by DEGREE (low-degree -> high-degree), which
        // bounds wedge fan-out on skewed graphs — same plan shape, one
        // extra degree join; id-orientation suffices on this bounded-
        // degree synthetic graph. Triangle counts drive cluster/spam
        // signals in web-corpus curation (a page whose link
        // neighborhood closes no triangles is a link-farm smell).
        import Tables.t
        val docs = t(s, dir, "documents").select(col("doc_id"))
        val n = docs.count()
        val directed = EdgeFormulas.map { case (a, b) =>
          docs.select(col("doc_id").as("src"),
            ((col("doc_id") * a + b) % n).as("dst"))
        }.reduce(_ unionAll _)
          .filter(col("src") =!= col("dst"))
        val und = directed
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
          .stableCheckpoint() // derived once, read by all three join legs
        val wedges = und
          .join(und.select(col("a").as("b2"), col("b").as("c")),
            col("b") === col("b2"))
          .select(col("a"), col("b"), col("c"))
        val tri = wedges
          .join(und.select(col("a").as("a3"), col("b").as("c3")),
            col("a") === col("a3") && col("c") === col("c3"))
          .select(col("a"), col("b"), col("c"))
        val corners = tri.select(col("a").as("node"))
          .unionAll(tri.select(col("b").as("node")))
          .unionAll(tri.select(col("c").as("node")))
          .groupBy("node").agg(count(lit(1)).as("cnt"))
        docs.select(col("doc_id").as("node"))
          .join(corners, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("cnt"), lit(0L)).as("n_triangles"))
          .orderBy("node")
      },
      Some(s"""WITH e0 AS (
          ${EdgeFormulas.map { case (a, b) =>
            s"SELECT doc_id AS src, ($a*doc_id+$b) % (SELECT COUNT(*) FROM documents) AS dst FROM documents"
          }.mkString("\n          UNION ALL ")}),
        und AS (
          SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM e0 WHERE src <> dst),
        tri AS (
          SELECT e1.a, e1.b, e2.c
          FROM und e1
          JOIN (SELECT a AS b, b AS c FROM und) e2 ON e1.b = e2.b
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.c),
        corners AS (
          SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
        SELECT n.node, COALESCE(c.cnt, CAST(0 AS BIGINT)) AS n_triangles
        FROM (SELECT doc_id AS node FROM documents) n
        LEFT JOIN (SELECT node, CAST(COUNT(*) AS BIGINT) AS cnt
                   FROM corners GROUP BY node) c ON n.node = c.node
        ORDER BY n.node"""),
      "exact triangle counting, compact-forward: low-id->high-id edge " +
        "orientation generates each triangle once as an id-ordered " +
        "wedge closed by one more equi-join; corners exploded and " +
        "counted per node (degree-orientation is the skew variant at " +
        "web scale)"),

    QueryDef(
      "g3_bfs_levels",
      (s, dir) => {
        // Single-source BFS levels by frontier relaxation (unit-weight
        // Bellman-Ford): dist'(v) = min(dist(v), min over edges u->v
        // of dist(u)+1), BfsIters rounds from source node 0, sentinel
        // 999 for not-yet-reached. All-integer min-merges are
        // order-free, so the result is exact at any parallelism and
        // the oracle is the same recurrence unrolled as SQL CTEs —
        // traversal completes the graph tier next to ranking (g1) and
        // counting (g2). Each round is ONE equi-join (dist ⋈ edges on
        // node=src) + ONE min-groupBy(dst) + ONE left join back — the
        // same constant-depth, checkpointed loop as PageRank; at
        // web scale this is hop-distance labeling from a seed set
        // (crawl-frontier depth, link-spam distance-from-trust).
        import Tables.t
        val docs = t(s, dir, "documents").select(col("doc_id"))
        val n = docs.count()
        val edges = EdgeFormulas.map { case (a, b) =>
          docs.select(col("doc_id").as("src"),
            ((col("doc_id") * a + b) % n).as("dst"))
        }.reduce(_ unionAll _)
          .filter(col("src") =!= col("dst"))
          .distinct()
          .repartition(col("src"))
          .stableCheckpoint()
        var dist = docs
          .select(col("doc_id").as("node"),
            when(col("doc_id") === 0, 0L).otherwise(Unreached).as("dist"))
          .stableCheckpoint()
        for (_ <- 1 to BfsIters) {
          val relaxed = edges
            .join(dist, edges("src") === dist("node"))
            .select(col("dst"), (col("dist") + 1L).as("cand"))
            .groupBy("dst").agg(min(col("cand")).as("mind"))
          dist = dist
            .join(relaxed, dist("node") === relaxed("dst"), "left")
            .select(dist("node"),
              least(col("dist"), coalesce(col("mind"), lit(Unreached)))
                .as("dist"))
            .stableCheckpoint()
        }
        dist.orderBy("node")
      },
      Some {
        val edgeUnion = EdgeFormulas.map { case (a, b) =>
          s"SELECT doc_id AS src, ($a*doc_id+$b) % (SELECT COUNT(*) FROM documents) AS dst FROM documents"
        }.mkString("\n          UNION ALL ")
        val steps = (1 to BfsIters).map { k =>
          s"""d$k AS (
          SELECT p.node,
            LEAST(p.dist, COALESCE(i.mind, $Unreached)) AS dist
          FROM d${k - 1} p LEFT JOIN (
            SELECT e.dst, CAST(MIN(p2.dist + 1) AS BIGINT) AS mind
            FROM d${k - 1} p2 JOIN edges e ON p2.node = e.src
            GROUP BY e.dst) i ON p.node = i.dst)"""
        }.mkString(",\n        ")
        s"""WITH edges AS (
          SELECT DISTINCT src, dst FROM (
          $edgeUnion) WHERE src <> dst),
        d0 AS (SELECT doc_id AS node,
          CAST(CASE WHEN doc_id = 0 THEN 0 ELSE $Unreached END AS BIGINT)
            AS dist FROM documents),
        $steps
        SELECT node, dist FROM d$BfsIters ORDER BY node"""
      },
      "single-source BFS levels (unit-weight Bellman-Ford relaxation): " +
        "exact integer min-merges, one edge-join + one min-groupBy per " +
        "round off the checkpointed edge set — traversal alongside g1 " +
        "ranking and g2 counting; oracle is the unrolled recurrence"),

    QueryDef(
      "g4_label_prop",
      (s, dir) => {
        // Community detection by synchronous label propagation (Raghavan
        // et al. 2007): each round every node adopts the MOST FREQUENT
        // label among its neighbors — mode-based update, genuinely
        // different math from the min-merges of BFS/CC — with the
        // deterministic tie-break (count desc, label asc) that makes
        // synchronous LPA reproducible (classic LPA breaks ties
        // randomly; a data engine must not). Argmax is min(struct(-cnt,
        // lab)) — one struct-min, no row_number over the corpus. Each
        // round: one equi-join of the checkpointed adjacency against
        // the label table + two bounded aggregates; constant plan depth
        // via localCheckpoint, same discipline as g1/g3. At web scale
        // LPA is the cheap community pass over a link graph (boilerplate
        // site clusters, spam farms) — near-linear per round, no
        // modularity matrix.
        import Tables.t
        val docs = t(s, dir, "documents").select(col("doc_id"))
        val n = docs.count()
        val directed = EdgeFormulas.map { case (a, b) =>
          docs.select(col("doc_id").as("src"),
            ((col("doc_id") * a + b) % n).as("dst"))
        }.reduce(_ unionAll _)
          .filter(col("src") =!= col("dst"))
        val und = directed
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
        val adj = und.select(col("a").as("node"), col("b").as("nbr"))
          .unionAll(und.select(col("b").as("node"), col("a").as("nbr")))
          .repartition(col("nbr"))
          .stableCheckpoint() // derived once, read every round
        var lab = docs
          .select(col("doc_id").as("node"), col("doc_id").as("lab"))
          .stableCheckpoint()
        for (_ <- 1 to LpIters) {
          val cnt = adj
            .join(lab.select(col("node").as("nbr"), col("lab")), "nbr")
            .groupBy(col("node"), col("lab"))
            .agg(count(lit(1)).as("cnt"))
          val pick = cnt.groupBy("node")
            .agg(min(struct((-col("cnt")).as("negcnt"), col("lab"))).as("best"))
            .select(col("node"), col("best").getField("lab").as("newlab"))
          lab = lab.join(pick, Seq("node"), "left")
            .select(col("node"),
              coalesce(col("newlab"), col("lab")).as("lab"))
            .stableCheckpoint()
        }
        lab.orderBy("node")
      },
      Some {
        val edgeUnion = EdgeFormulas.map { case (a, b) =>
          s"SELECT doc_id AS src, ($a*doc_id+$b) % (SELECT COUNT(*) FROM documents) AS dst FROM documents"
        }.mkString("\n          UNION ALL ")
        val steps = (1 to LpIters).map { k =>
          s"""n$k AS (SELECT a.node, l.lab, COUNT(*) AS cnt
          FROM adj a JOIN l${k - 1} l ON a.nbr = l.node GROUP BY 1, 2),
        p$k AS (SELECT node, lab AS newlab FROM n$k
          QUALIFY ROW_NUMBER() OVER (PARTITION BY node
            ORDER BY cnt DESC, lab ASC) = 1),
        l$k AS (SELECT l.node, COALESCE(p.newlab, l.lab) AS lab
          FROM l${k - 1} l LEFT JOIN p$k p USING (node))"""
        }.mkString(",\n        ")
        s"""WITH e0 AS (
          $edgeUnion),
        und AS (
          SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM e0 WHERE src <> dst),
        adj AS (SELECT a AS node, b AS nbr FROM und
          UNION ALL SELECT b AS node, a AS nbr FROM und),
        l0 AS (SELECT doc_id AS node, doc_id AS lab FROM documents),
        $steps
        SELECT node, lab FROM l$LpIters ORDER BY node"""
      },
      "synchronous label propagation (4 rounds, deterministic " +
        "count-desc/label-asc tie-break): mode-based community update " +
        "— one adjacency equi-join + two aggregates per round off the " +
        "checkpointed edge set; oracle is the unrolled recurrence")
  ,

    QueryDef(
      "g5_sssp",
      (s, dir) => {
        // WEIGHTED single-source shortest paths (Bellman-Ford
        // relaxation), generalizing g3's unit-weight BFS: dist'(v) =
        // min(dist(v), min over edges u->v of dist(u) + w(u,v)), with
        // deterministic integer weights w = (3·src + 5·dst) % 9 + 1
        // both engines derive from the edge itself. The interesting
        // semantics BFS can't show: a 3-hop path of light edges beats
        // a 1-hop heavy edge, so the argmin route and the hop count
        // genuinely decouple (CatalogSpec pins that extra rounds keep
        // improving distances after the BFS frontier has stabilized).
        // All-integer min-merges stay order-free — exact at any
        // parallelism — and the recurrence unrolls into the SQL
        // oracle. Same constant-depth checkpointed loop as g1/g3/g4:
        // one edge equi-join + one min-groupBy + one left-join-back
        // per round. At 100 TB: weighted hop labeling = crawl cost /
        // latency / trust propagation over a link graph.
        import Tables.t
        val docs = t(s, dir, "documents").select(col("doc_id"))
        val n = docs.count()
        val edges = EdgeFormulas.map { case (a, b) =>
          docs.select(col("doc_id").as("src"),
            ((col("doc_id") * a + b) % n).as("dst"))
        }.reduce(_ unionAll _)
          .filter(col("src") =!= col("dst"))
          .distinct()
          .withColumn("w", (col("src") * 3 + col("dst") * 5) % 9 + 1)
          .repartition(col("src"))
          .stableCheckpoint()
        var dist = docs
          .select(col("doc_id").as("node"),
            when(col("doc_id") === 0, 0L).otherwise(SsspUnreached)
              .as("dist"))
          .stableCheckpoint()
        for (_ <- 1 to SsspIters) {
          val relaxed = edges
            .join(dist, edges("src") === dist("node"))
            .filter(col("dist") < SsspUnreached) // don't relax from unreached
            .select(col("dst"), (col("dist") + col("w")).as("cand"))
            .groupBy("dst").agg(min(col("cand")).as("mind"))
          dist = dist
            .join(relaxed, dist("node") === relaxed("dst"), "left")
            .select(dist("node"),
              least(col("dist"), coalesce(col("mind"), lit(SsspUnreached)))
                .as("dist"))
            .stableCheckpoint()
        }
        dist.orderBy("node")
      },
      Some {
        val edgeUnion = EdgeFormulas.map { case (a, b) =>
          s"SELECT doc_id AS src, ($a*doc_id+$b) % (SELECT COUNT(*) FROM documents) AS dst FROM documents"
        }.mkString("\n          UNION ALL ")
        val steps = (1 to SsspIters).map { k =>
          s"""d$k AS (
          SELECT p.node,
            LEAST(p.dist, COALESCE(i.mind, $SsspUnreached)) AS dist
          FROM d${k - 1} p LEFT JOIN (
            SELECT e.dst, CAST(MIN(p2.dist + e.w) AS BIGINT) AS mind
            FROM d${k - 1} p2 JOIN edges e ON p2.node = e.src
            WHERE p2.dist < $SsspUnreached
            GROUP BY e.dst) i ON p.node = i.dst)"""
        }.mkString(",\n        ")
        s"""WITH e0 AS (
          SELECT DISTINCT src, dst FROM (
          $edgeUnion) WHERE src <> dst),
        edges AS (SELECT src, dst,
          (3*src + 5*dst) % 9 + 1 AS w FROM e0),
        d0 AS (SELECT doc_id AS node,
          CAST(CASE WHEN doc_id = 0 THEN 0 ELSE $SsspUnreached END
            AS BIGINT) AS dist FROM documents),
        $steps
        SELECT node, dist FROM d$SsspIters ORDER BY node"""
      },
      "weighted SSSP (Bellman-Ford, 8 rounds): deterministic integer " +
        "edge weights, exact min-merges, one edge-join + one " +
        "min-groupBy per round off the checkpointed edge set — the " +
        "route/hop decoupling BFS can't express; oracle is the " +
        "unrolled recurrence")
  ,

    QueryDef(
      "g6_kcore",
      (s, dir) => {
        // k-CORE decomposition (iterative peeling): repeatedly drop
        // every node with degree < k until a fixpoint — the dense-
        // subgraph extractor of web-graph curation (link farms and
        // tight communities survive; the sparse periphery cascades
        // away). The base expander is near-6-regular, so a planted
        // 20-node clique (doc_id % 25 == 0, < 500 — FIXED at any
        // corpus size) makes k=6 load-bearing: the periphery dies in
        // a genuine multi-round cascade (484 -> 430 -> 250 -> 38 ->
        // 20 at sf0.01; 7 rounds at 50x), the clique keeps intra-
        // degree 19 and survives. Each peel is one adjacency join
        // against the alive set + one count + one filter — node-sized
        // state, constant plan depth via localCheckpoint; 8 rounds
        // reach the fixpoint at both tested scales (CatalogSpec pins
        // one extra peel changes nothing).
        import Tables.t
        val docs = t(s, dir, "documents").select(col("doc_id"))
        val n = docs.count()
        val base = EdgeFormulas.map { case (a, b) =>
          docs.select(col("doc_id").as("src"),
            ((col("doc_id") * a + b) % n).as("dst"))
        }.reduce(_ unionAll _)
          .filter(col("src") =!= col("dst"))
        val cliqueIds = docs
          .filter(col("doc_id") % 25 === 0 && col("doc_id") < 500)
          .select(col("doc_id"))
        val clique = cliqueIds.select(col("doc_id").as("src"))
          .join(cliqueIds.select(col("doc_id").as("dst")),
            col("src") < col("dst"))
        val und = base.unionByName(clique)
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
        val adj = und.select(col("a").as("node"), col("b").as("nbr"))
          .unionAll(und.select(col("b").as("node"), col("a").as("nbr")))
          .stableCheckpoint()
        def restrictedDeg(alive: org.apache.spark.sql.DataFrame) = adj
          .join(alive.select(col("node").as("xn")), col("node") === col("xn"))
          .join(alive.select(col("node").as("yn")), col("nbr") === col("yn"))
          .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        var alive = docs.select(col("doc_id").as("node")).stableCheckpoint()
        for (_ <- 1 to KCoreRounds) {
          alive = restrictedDeg(alive)
            .filter(col("deg") >= KCoreK)
            .select(col("node"))
            .stableCheckpoint()
        }
        val fd = restrictedDeg(alive)
        docs
          .join(alive.withColumn("in_core", lit(1L)),
            docs("doc_id") === alive("node"), "left")
          .join(fd.select(col("node").as("fn"), col("deg")),
            docs("doc_id") === col("fn"), "left")
          .select(docs("doc_id").as("node"),
            coalesce(col("in_core"), lit(0L)).as("in_core"),
            coalesce(col("deg"), lit(0L)).as("core_deg"))
          .orderBy("node")
      },
      Some {
        val edgeUnion = EdgeFormulas.map { case (a, b) =>
          s"SELECT doc_id AS src, ($a*doc_id+$b) % (SELECT COUNT(*) FROM documents) AS dst FROM documents"
        }.mkString("\n          UNION ALL ")
        val steps = (1 to KCoreRounds).map { k =>
          s"""dg$k AS (
          SELECT adj.node, COUNT(*) AS deg FROM adj
          JOIN a${k - 1} x ON adj.node = x.node
          JOIN a${k - 1} y ON adj.nbr = y.node
          GROUP BY adj.node),
        a$k AS (SELECT node FROM dg$k WHERE deg >= $KCoreK)"""
        }.mkString(",\n        ")
        s"""WITH cl AS (
          SELECT a.doc_id AS src, b.doc_id AS dst
          FROM documents a, documents b
          WHERE a.doc_id % 25 = 0 AND a.doc_id < 500
            AND b.doc_id % 25 = 0 AND b.doc_id < 500
            AND a.doc_id < b.doc_id),
        e0 AS (
          $edgeUnion),
        und AS (
          SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM (SELECT src, dst FROM e0 WHERE src <> dst
                UNION ALL SELECT src, dst FROM cl)),
        adj AS (SELECT a AS node, b AS nbr FROM und
          UNION ALL SELECT b AS node, a AS nbr FROM und),
        a0 AS (SELECT doc_id AS node FROM documents),
        $steps,
        fd AS (
          SELECT adj.node, COUNT(*) AS deg FROM adj
          JOIN a$KCoreRounds x ON adj.node = x.node
          JOIN a$KCoreRounds y ON adj.nbr = y.node
          GROUP BY adj.node)
        SELECT d.doc_id AS node,
          CAST(CASE WHEN a.node IS NULL THEN 0 ELSE 1 END AS BIGINT)
            AS in_core,
          CAST(COALESCE(fd.deg, 0) AS BIGINT) AS core_deg
        FROM documents d
        LEFT JOIN a$KCoreRounds a ON d.doc_id = a.node
        LEFT JOIN fd ON d.doc_id = fd.node
        ORDER BY node"""
      },
      s"k-core decomposition (k=$KCoreK, $KCoreRounds peels to " +
        "fixpoint): iterative degree-filter cascade over the " +
        "checkpointed adjacency — the planted 20-clique survives, the " +
        "near-regular periphery cascades away over 5-7 rounds; oracle " +
        "is the unrolled peeling recurrence")
  )
}
