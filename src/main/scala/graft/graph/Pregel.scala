package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A message declaration for [[Graph.pregel]]: an expression over the
  * superstep triplet (fields `src.*`, `dst.*`, `edge.*`) sent to the
  * edge's destination (`toDst`) or source (`toSrc`) vertex. A message
  * evaluating to null is not delivered (nulls are dropped before the
  * merge aggregate), which is how a vertex stays silent — e.g. SSSP
  * vertices that have not been reached yet.
  */
final case class PregelMsg(toDst: Boolean, expr: Column)

/** Vertex-centric iteration vocabulary (reference flink-gelly
  * pregel/Pregel.java + Graph.java runVertexCentricIteration:
  * ComputeFunction receives the vertex value and an MessageIterator,
  * sends messages along edges, and MessageCombiner pre-reduces).
  *
  * The Spark-first re-expression keeps every superstep inside
  * Catalyst: compute/send/combine are Column expressions, a superstep
  * is one join + one map-side-combinable aggregation shuffled on
  * vertex id (the same key every superstep), and the driver loop only
  * sequences supersteps — it never touches row data.
  */
object Pregel {
  /** The merged message inside `vprog` update expressions; null when
    * the vertex received no messages this superstep (the reference's
    * compute() simply isn't called then — express "keep state" as
    * `coalesce(Pregel.msg, col("state"))`). */
  def msg: Column = col("_pregel_msg")

  /** Source-vertex attribute inside a message expression. */
  def src(attr: String): Column = col(s"src.$attr")

  /** Destination-vertex attribute inside a message expression. */
  def dst(attr: String): Column = col(s"dst.$attr")

  /** Edge attribute inside a message expression. */
  def edge(attr: String): Column = col(s"edge.$attr")

  def toDst(e: Column): PregelMsg = PregelMsg(toDst = true, e)
  def toSrc(e: Column): PregelMsg = PregelMsg(toDst = false, e)
}

private[graph] trait PregelSupport { self: Graph =>

  /** Generic vertex-centric iteration (Pregel). Runs `maxIter`
    * supersteps of: evaluate `sendMsg` over every edge triplet, merge
    * per-receiver with `mergeMsg`, and rewrite each state column with
    * its `vprog` expression (which sees the old state columns and
    * [[Pregel.msg]]).
    *
    * @param stateCols (name, initial) state columns added to the
    *                  vertex set; initial expressions see the vertex
    *                  attributes.
    * @param sendMsg   messages per triplet ([[Pregel.toDst]] /
    *                  [[Pregel.toSrc]] of an expression over
    *                  `src.*` / `dst.*` / `edge.*`). Null messages
    *                  are dropped.
    * @param mergeMsg  aggregate over [[Pregel.msg]] combining all
    *                  messages delivered to one vertex, e.g.
    *                  `min(Pregel.msg)` — must be an associative agg
    *                  so Spark can pre-combine map-side (the
    *                  reference's MessageCombiner, pregel/Pregel.java).
    * @param vprog     (name, update) one entry per state column.
    * @param haltOnNoChange stop early once no state column changed
    *                  anywhere (costs one join+count per superstep).
    *
    * Scale shape: per superstep one broadcast-or-shuffle join of the
    * (checkpointed) edge triplet view with the vertex state, one
    * hash aggregation shuffled on vertex id — the same partitioning
    * every superstep — and lineage truncated with localCheckpoint
    * every `checkpointEvery` steps so plan depth stays bounded.
    */
  def pregel(
      stateCols: Seq[(String, Column)],
      sendMsg: Seq[PregelMsg],
      mergeMsg: Column,
      vprog: Seq[(String, Column)],
      maxIter: Int,
      haltOnNoChange: Boolean = false,
      checkpointEvery: Int = 5): DataFrame = {
    require(stateCols.nonEmpty && sendMsg.nonEmpty && vprog.nonEmpty)
    require(vprog.map(_._1).toSet == stateCols.map(_._1).toSet,
      "vprog must update exactly the declared state columns")

    val stateNames = stateCols.map(_._1)
    val attrNames = vertices.columns.toSeq.filterNot(stateNames.contains)

    // Which triplet sides the message expressions actually read — an
    // unused side is never joined (CC/SSSP/PageRank read only src.*,
    // so their supersteps are a single join, not two).
    val msgText = sendMsg.map(_.expr.toString()).mkString(" ")
    val needSrc = msgText.contains("src.")
    val needDst = msgText.contains("dst.")

    val edgeSt = edges.select(struct(edges.columns.map(col).toSeq: _*).as("edge"))
      .localCheckpoint()

    // materialize the initial state ONCE: the vertex set's lineage can
    // be arbitrarily expensive (e.g. an LSH pair pipeline feeding CC),
    // and without this it re-evaluates in superstep 1's join AND in
    // the first halt-check comparison
    var verts = vertices.select(
      attrNames.map(col) ++ stateCols.map { case (n, c) => c.as(n) }: _*)
      .localCheckpoint()

    var converged = false
    var step = 0
    while (step < maxIter && !converged) {
      step += 1
      val vSt = verts.select(struct(verts.columns.map(col).toSeq: _*).as("v"))
      var t = edgeSt
      if (needSrc) t = t.join(vSt.withColumnRenamed("v", "src"),
        col("edge.src") === col("src.id"))
      if (needDst) t = t.join(vSt.withColumnRenamed("v", "dst"),
        col("edge.dst") === col("dst.id"))
      val msgs = sendMsg.map { m =>
        val to = if (m.toDst) col("edge.dst") else col("edge.src")
        t.select(to.as("id"), m.expr.as("_pregel_msg"))
      }.reduce(_ unionByName _).filter(col("_pregel_msg").isNotNull)
      val merged = msgs.groupBy(col("id")).agg(mergeMsg.as("_pregel_msg"))

      if (haltOnNoChange) {
        // r17 OPT (guide §2.4): the change flag rides the vprog
        // projection itself — the old state is still in scope on the
        // joined row, so `new =!= old` evaluates in place and the
        // halt check is a filter + isEmpty over the checkpointed
        // result. The pre-r17 form joined the new state back to the
        // old vertex set on id: one extra vertex-sized exchange per
        // superstep, now gone. Null semantics are identical (a
        // null↔value transition filtered out by =!= on both forms).
        val chk = verts.join(merged, Seq("id"), "left")
          .select(attrNames.map(col) ++
            vprog.map { case (n, c) => c.as(n) } :+
            vprog.map { case (n, c) => c =!= col(n) }
              .reduce(_ || _).as("_pregel_changed"): _*)
          .localCheckpoint()
        converged = chk.filter(col("_pregel_changed")).isEmpty
        verts = chk.drop("_pregel_changed")
      } else {
        val next = verts.join(merged, Seq("id"), "left")
          .select(attrNames.map(col) ++
            vprog.map { case (n, c) => c.as(n) }: _*)
        verts = if (step % checkpointEvery == 0) next.localCheckpoint() else next
      }
    }
    verts
  }

  /** Scatter-gather iteration facade (reference flink-gelly
    * spargel/ScatterGatherIteration.java, Graph.java
    * runScatterGatherIteration): `scatter` produces the messages each
    * vertex sends along its edges (the ScatterFunction), `gather`
    * rewrites the vertex value from the combined inbox (the
    * GatherFunction). The reference iterates the MessageIterator
    * inside gather; here the combiner is the explicit `combine`
    * aggregate — same fixpoints, and the map-side pre-combine the
    * reference only gets from a separate MessageCombiner is free.
    * Executes on [[pregel]]: identical superstep plan. */
  def scatterGather(
      stateCols: Seq[(String, Column)],
      scatter: Seq[PregelMsg],
      combine: Column,
      gather: Seq[(String, Column)],
      maxIter: Int,
      haltOnNoChange: Boolean = false): DataFrame =
    pregel(stateCols, scatter, combine, gather, maxIter, haltOnNoChange)

  /** Gather-sum-apply iteration facade (reference flink-gelly
    * gsa/GatherSumApplyIteration.java, Graph.java
    * runGatherSumApplyIteration): `gather` evaluates one partial value
    * per in-neighbor (expression over `src.*` / `edge.*` — the
    * reference's GatherFunction over a Neighbor), `sum` reduces the
    * partials (SumFunction — an associative aggregate over
    * [[Pregel.msg]]), `apply` rewrites the vertex state from the sum
    * (ApplyFunction). Executes on [[pregel]] with a single toDst
    * message per edge: identical superstep plan. */
  def gatherSumApply(
      stateCols: Seq[(String, Column)],
      gather: Column,
      sum: Column,
      apply: Seq[(String, Column)],
      maxIter: Int,
      haltOnNoChange: Boolean = false): DataFrame =
    pregel(stateCols, Seq(Pregel.toDst(gather)), sum, apply, maxIter, haltOnNoChange)
}
