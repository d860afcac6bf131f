package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gelly-style graph on two DataFrames (reference flink-gelly/.../
  * Graph.java, 2346 LoC; iteration models pregel/ spargel/ gsa/).
  *
  * vertices: (id: Long, ...attrs) — edges: (src: Long, dst: Long).
  * Algorithms are driver-side iterative DataFrame loops (the Spark-
  * idiomatic Pregel): each superstep is one distributed join+agg, and
  * lineage is truncated with localCheckpoint every few supersteps so
  * plans stay bounded at scale. Messages shuffle on vertex id — the
  * same key every superstep, so AQE reuses the partitioning.
  */
final class Graph(val vertices: DataFrame, val edges: DataFrame)
    extends PregelSupport {

  private def spark: SparkSession = vertices.sparkSession

  /** Both directions of the edge set (undirected view). */
  def undirected: DataFrame =
    edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()

  def degrees: DataFrame =
    undirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))

  def subgraph(vPred: Column): Graph = {
    val keep = vertices.filter(vPred).select(col("id"))
    val e2 = edges
      .join(keep.withColumnRenamed("id", "src"), "src")
      .join(keep.withColumnRenamed("id", "dst"), "dst")
      .select(col("src"), col("dst"))
    new Graph(vertices.filter(vPred), e2)
  }

  def mapVertices(f: Column, name: String): Graph =
    new Graph(vertices.withColumn(name, f), edges)

  /** mapEdges (Graph.java mapEdges): derive/replace an edge attr. */
  def mapEdges(f: Column, name: String): Graph =
    new Graph(vertices, edges.withColumn(name, f))

  /** subgraph with BOTH predicates (Graph.java subgraph(vFilter,
    * eFilter)); edges must also keep both endpoints. */
  def subgraph(vPred: Column, ePred: Column): Graph = {
    val g = subgraph(vPred)
    new Graph(g.vertices, g.edges.filter(ePred))
  }

  /** filterOnEdges (vertices untouched). */
  def filterOnEdges(ePred: Column): Graph =
    new Graph(vertices, edges.filter(ePred))

  def inDegrees: DataFrame =
    edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("inDegree"))

  def outDegrees: DataFrame =
    edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("outDegree"))

  /** joinWithVertices (Graph.java joinWithVertices): left join an
    * (id, ...) input onto the vertex set. */
  def joinWithVertices(other: DataFrame): Graph =
    new Graph(vertices.join(other, Seq("id"), "left_outer"), edges)

  /** Graph union (Graph.java union): vertex ids deduplicate, edge
    * BAG union (the reference keeps duplicate edges). */
  def union(other: Graph): Graph =
    new Graph(
      vertices.select(col("id")).unionByName(other.vertices.select(col("id")))
        .distinct(),
      edges.select(col("src"), col("dst"))
        .unionByName(other.edges.select(col("src"), col("dst"))))

  /** Graph difference (Graph.java difference): remove the other
    * graph's vertices and every edge touching them. */
  def difference(other: Graph): Graph = {
    val keep = vertices.select(col("id"))
      .except(other.vertices.select(col("id")))
    val e2 = edges
      .join(keep.withColumnRenamed("id", "src"), "src")
      .join(keep.withColumnRenamed("id", "dst"), "dst")
      .select(col("src"), col("dst"))
    new Graph(keep, e2)
  }

  /** Edge intersection (Graph.java intersect distinct mode): edges
    * present in both; vertices are the edges' endpoints. */
  def intersect(other: Graph): Graph = {
    val e2 = edges.select(col("src"), col("dst")).distinct()
      .intersect(other.edges.select(col("src"), col("dst")).distinct())
    new Graph(
      e2.select(col("src").as("id"))
        .union(e2.select(col("dst").as("id"))).distinct(),
      e2)
  }

  def reverse: Graph =
    new Graph(vertices, edges.select(col("dst").as("src"), col("src").as("dst")))

  /** Connected components by min-label propagation (reference
    * library/ConnectedComponents.java, which runs it as a
    * scatter-gather iteration): label(v) starts at v, each superstep
    * takes the min over neighbors, until fixpoint — expressed on the
    * generic [[pregel]] iteration. */
  def connectedComponents(maxIter: Int = 30): DataFrame =
    new Graph(vertices.select(col("id")), undirected).pregel(
      stateCols = Seq("comp" -> col("id")),
      sendMsg = Seq(Pregel.toDst(Pregel.src("comp"))),
      mergeMsg = min(Pregel.msg),
      vprog = Seq("comp" -> least(col("comp"), coalesce(Pregel.msg, col("comp")))),
      maxIter = maxIter,
      haltOnNoChange = true)

  /** PageRank, fixed iterations, damping 0.85 (library/linkanalysis/
    * PageRank.java). Out-degree-normalized contributions; dangling
    * mass redistributed uniformly. */
  def pageRank(iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val n = vertices.count().toDouble
    val outDeg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("out"))
    val withDeg = edges.join(outDeg, edges("src") === outDeg("id"))
      .select(col("src"), col("dst"), col("out")).localCheckpoint()
    var ranks = vertices.select(col("id"), lit(1.0 / n).as("rank"))
    for (i <- 1 to iters) {
      val contribs = withDeg.join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") / col("out")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("recv"))
      val next = vertices.select(col("id"))
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1 - damping) / n) + lit(damping) * coalesce(col("recv"), lit(0.0))).as("rank"))
      ranks = if (i % 5 == 0) next.localCheckpoint() else next
    }
    ranks
  }

  /** Fixed-point PageRank: ranks are scaled integers (1.0 ≡ 10^12)
    * and every step is exact BIGINT arithmetic — contribution =
    * rank div out, damping = recv * pct div 100 — so results are
    * bit-identical under any partitioning, executor count, or replay
    * (the reproducibility guarantee the double-summing variant cannot
    * give; reference PageRank.java is double-based and inherits
    * per-run jitter). Dangling vertices contribute no mass, matching
    * the reference's behavior. */
  def pageRankFixedPoint(iters: Int, dampingPct: Int = 85): DataFrame = {
    val SCALE = 1000000000000L
    val n = vertices.count()
    val base = (SCALE / 100 * (100 - dampingPct)) / n
    // out-degree rides as a vertex attribute; contribution and damping
    // are exact BIGINT div/mul inside the pregel superstep
    val outDeg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("out"))
    new Graph(vertices.select(col("id")).join(outDeg, Seq("id"), "left"), edges)
      .pregel(
        stateCols = Seq("rank" -> lit(SCALE / n)),
        sendMsg = Seq(Pregel.toDst(expr("src.rank div src.out"))),
        mergeMsg = sum(Pregel.msg),
        vprog = Seq("rank" -> (lit(base) +
          expr(s"coalesce(_pregel_msg, CAST(0 AS BIGINT)) * $dampingPct div 100"))),
        maxIter = iters)
      .select(col("id"), col("rank").as("rank_scaled"))
  }

  /** HITS hubs & authorities (library/linkanalysis/HITS.java),
    * fixed-point variant: scores are scaled integers (start 10^6);
    * each half-iteration sums exactly in BIGINT and renormalizes by
    * integer division with the max score (the reference normalizes by
    * L2 norm — same per-iteration ordering, but this variant is
    * bit-reproducible under any partitioning). Directed: authority
    * sums over in-edges, hub over out-edges. */
  def hits(iters: Int): DataFrame = {
    val SCALE = 1000000L
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    var hub = vertices.select(col("id"), lit(SCALE).as("h"))
    var auth = vertices.select(col("id"), lit(0L).as("a"))
    for (_ <- 1 to iters) {
      // raw sums are consumed twice (max action + rescale join):
      // checkpoint so the max() action doesn't re-run the lineage
      val aRaw = e.join(hub.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("h")).as("raw"))
        .localCheckpoint()
      val aMax = math.max(1L, aRaw.agg(max(col("raw"))).first().getLong(0))
      auth = vertices.select(col("id"))
        .join(aRaw, Seq("id"), "left")
        .select(col("id"), expr(s"coalesce(raw, CAST(0 AS BIGINT)) * $SCALE div $aMax").as("a"))
      val hRaw = e.join(auth.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(sum(col("a")).as("raw"))
        .localCheckpoint()
      val hMax = math.max(1L, hRaw.agg(max(col("raw"))).first().getLong(0))
      hub = vertices.select(col("id"))
        .join(hRaw, Seq("id"), "left")
        .select(col("id"), expr(s"coalesce(raw, CAST(0 AS BIGINT)) * $SCALE div $hMax").as("h"))
    }
    hub.join(auth, "id").select(col("id"), col("h").as("hub_scaled"), col("a").as("auth_scaled"))
  }

  /** Undirected triadic census (library/clustering/TriadicCensus):
    * counts of the four triad classes over all vertex triples, derived
    * exactly from (n, m, wedges, triangles) — no triple enumeration:
    * t3 = triangles; t2 = wedges − 3·t3; Σ edges over triads gives
    * t1 = m(n−2) − 2·t2 − 3·t3; t0 = C(n,3) − t1 − t2 − t3. */
  def triadicCensus(): DataFrame = {
    val n = vertices.count()
    val m = undirected.count() / 2
    val wedges = degrees
      .agg(sum(expr("degree * (degree - 1) div 2"))).first().getLong(0)
    val t3 = triangleCount().agg(sum(col("triangles"))).first().getLong(0) / 3
    val t2 = wedges - 3 * t3
    val t1 = m * (n - 2) - 2 * t2 - 3 * t3
    val t0 = n * (n - 1) * (n - 2) / 6 - t1 - t2 - t3
    spark.createDataFrame(Seq((t0, t1, t2, t3)))
      .toDF("t0_empty", "t1_one_edge", "t2_wedge", "t3_triangle")
  }

  /** Single-source shortest paths, unit weights (library/
    * SingleSourceShortestPaths.java) — BFS frontier relaxation. */
  def sssp(source: Long, maxIter: Int = 30): DataFrame = {
    val INF = Long.MaxValue
    // unreached vertices (dist = INF) send a null message, which
    // pregel drops — the BFS frontier relaxation
    new Graph(vertices.select(col("id")), undirected).pregel(
      stateCols = Seq("dist" ->
        when(col("id") === source, 0L).otherwise(INF)),
      sendMsg = Seq(Pregel.toDst(
        when(Pregel.src("dist") =!= INF, Pregel.src("dist") + lit(1L)))),
      mergeMsg = min(Pregel.msg),
      vprog = Seq("dist" -> least(col("dist"), coalesce(Pregel.msg, col("dist")))),
      maxIter = maxIter,
      haltOnNoChange = true)
      .select(col("id"),
        when(col("dist") === INF, lit(null)).otherwise(col("dist")).as("dist"))
  }

  /** Synchronous label propagation (library/LabelPropagation.java):
    * each superstep every vertex adopts its neighborhood's most
    * frequent label, ties broken by the smallest label — deterministic
    * under synchronous updates. */
  def labelPropagation(iters: Int): DataFrame = {
    val und = undirected.localCheckpoint()
    var labels = vertices.select(col("id"), col("id").as("label"))
    for (i <- 1 to iters) {
      val freq = und.join(labels, und("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
        .groupBy(col("id"), col("label")).agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("n").desc, col("label"))
      val next = freq.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("id"), col("label"))
      labels = (if (i % 5 == 0) next.localCheckpoint() else next)
    }
    labels
  }

  /** Community detection (library/CommunityDetection.java — the
    * Leung et al. hop-attenuation variant, arXiv:0808.2633): each
    * vertex starts as its own community with score 1.0; per superstep
    * every vertex sends (label, score) to its neighbors, adopts the
    * label with the highest SUMMED received score (ties → smallest
    * label, matching the reference's ascending TreeMap + strict
    * comparison), re-scores to the max single received score of that
    * label, and subtracts delta/superstep when the label changed.
    * Score sums are rounded to 9 dp so the argmax is partition-order
    * free. One join+agg per superstep, shuffling on vertex id. */
  def communityDetection(maxIter: Int, delta: Double = 0.5): DataFrame = {
    val und = undirected.localCheckpoint()
    var state = vertices.select(col("id"), col("id").as("label"),
      lit(1.0).as("score"))
    for (step <- 1 to maxIter) {
      val msgs = und
        .join(state.select(col("id").as("mid"), col("label"), col("score")),
          col("src") === col("mid"))
        .select(col("dst").as("id"), col("label"), col("score"))
      // argmax(total, tie → smallest label) as one map-side-combinable
      // max_by — no per-superstep window sort
      val picked = msgs.groupBy(col("id"), col("label"))
        .agg(round(sum(col("score")), 9).as("total"), max(col("score")).as("best"))
        .groupBy(col("id"))
        .agg(max_by(struct(col("label"), col("best")),
          struct(col("total"), -col("label"))).as("pick"))
        .select(col("id"), col("pick.label").as("label"), col("pick.best").as("best"))
      val next = picked
        .join(state.select(col("id"), col("label").as("prev"),
          col("score").as("prev_score")), Seq("id"), "right")
        .select(col("id"),
          coalesce(col("label"), col("prev")).as("label"),
          when(col("label").isNull, col("prev_score"))        // no messages
            .when(col("label") === col("prev"), col("best"))  // kept label
            .otherwise(col("best") - lit(delta) / step)       // changed
            .as("score"))
      // state is read twice next superstep (messages + prev-label
      // join): checkpoint every step or the lineage re-executes the
      // whole prefix 2^steps times
      state = next.localCheckpoint()
    }
    state.select(col("id"), col("label"))
  }

  /** Summarization (library/Summarization.java): collapse vertices by
    * a grouping column into a super-graph of (group) vertices and
    * aggregated (srcGroup, dstGroup, edgeCount) edges. */
  def summarize(groupCol: String): (DataFrame, DataFrame) = {
    val v2g = vertices.select(col("id"), col(groupCol).as("grp"))
    val superV = v2g.groupBy(col("grp")).agg(count(lit(1)).as("n_vertices"))
    val superE = edges
      .join(v2g.withColumnRenamed("id", "src").withColumnRenamed("grp", "src_grp"), "src")
      .join(v2g.withColumnRenamed("id", "dst").withColumnRenamed("grp", "dst_grp"), "dst")
      .groupBy(col("src_grp"), col("dst_grp")).agg(count(lit(1)).as("n_edges"))
    (superV, superE)
  }

  /** Jaccard similarity of neighbor sets for every connected vertex
    * pair (library/similarity/JaccardIndex.java): |N(a)∩N(b)| via the
    * shared-neighbor wedge join, |N(a)∪N(b)| = deg(a)+deg(b)-common —
    * one equi-join on the wedge centre, linear in Σ deg². */
  def jaccardIndex(): DataFrame = {
    val und = undirected.localCheckpoint()
    val deg = degrees
    // wedges: a-c-b with a<b → one row per shared neighbor
    val common = und.as("e1").join(und.as("e2"),
        col("e1.dst") === col("e2.dst") && col("e1.src") < col("e2.src"))
      .select(col("e1.src").as("a"), col("e2.src").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
    common
      .join(deg.select(col("id").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("degree").as("db")), "b")
      .select(col("a"), col("b"),
        (col("common").cast("double") / (col("da") + col("db") - col("common")))
          .as("jaccard"))
  }

  /** Adamic-Adar similarity (library/similarity/AdamicAdar.java):
    * Σ over shared neighbors c of 1/ln(deg(c)) — the wedge join again,
    * with the centre's degree attached before aggregation. */
  def adamicAdar(): DataFrame = {
    val und = undirected.localCheckpoint()
    val deg = degrees
    und.as("e1").join(und.as("e2"),
        col("e1.dst") === col("e2.dst") && col("e1.src") < col("e2.src"))
      .select(col("e1.src").as("a"), col("e2.src").as("b"), col("e1.dst").as("c"))
      .join(deg.select(col("id").as("c"), col("degree").as("dc")), "c")
      .filter(col("dc") > 1) // ln(1) = 0 would divide by zero
      .groupBy(col("a"), col("b"))
      .agg(sum(lit(1.0) / log(col("dc").cast("double"))).as("adamic_adar"))
  }

  /** Local clustering coefficient (library/clustering/
    * LocalClusteringCoefficient.java): triangles(v) / C(deg(v), 2). */
  def clusteringCoefficient(): DataFrame = {
    val deg = degrees
    val tri = triangleCount()
    deg.join(tri, Seq("id"), "left")
      .select(col("id"), col("degree"),
        when(col("degree") < 2, 0.0)
          .otherwise(coalesce(col("triangles"), lit(0L)).cast("double") * 2 /
            (col("degree") * (col("degree") - 1))).as("coefficient"))
  }

  /** Triangle count per vertex (library/TriangleEnumerator.java):
    * canonical-direction edge join, counted once per corner. */
  def triangleCount(): DataFrame = {
    val canon = undirected.filter(col("src") < col("dst")).localCheckpoint()
    val tri = canon.as("ab")
      .join(canon.as("bc"), col("ab.dst") === col("bc.src"))
      .join(canon.as("ac"),
        col("ac.src") === col("ab.src") && col("ac.dst") === col("bc.dst"))
      .select(col("ab.src").as("a"), col("ab.dst").as("b"), col("bc.dst").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
  }
}

object Graph {
  def apply(vertices: DataFrame, edges: DataFrame): Graph =
    new Graph(vertices, edges)

  /** Build from an edge list alone (vertex set inferred). */
  def fromEdges(edges: DataFrame): Graph = {
    val v = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    new Graph(v, edges)
  }
}
