package graft.pipeline

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the embeddings table.
  *
  * Baseline: brute-force cosine top-k (query side broadcast — the
  * classic "small probe set × huge corpus" shape; the corpus scan is
  * embarrassingly parallel and never shuffles). Scale path: bucketed
  * search (coarse partition → local top-k), which is the IVF shape —
  * here the stored `label` plays the coarse-centroid-assignment role;
  * swapping in k-means assignments changes only the bucket column.
  *
  * All arithmetic is forced to double (float inputs upcast inside the
  * lambdas) and scores rounded to 6 dp BEFORE ranking so Spark and the
  * DuckDB oracle rank identically.
  */
object Similarity extends QueryModule {

  /** cosine(a, b) in pure Catalyst higher-order functions. */
  private val cosExpr =
    """aggregate(zip_with(qv, ev, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
      |          CAST(0 AS DOUBLE), (acc, v) -> acc + v)
      | / (sqrt(aggregate(qv, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
      |    * sqrt(aggregate(ev, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"""
      .stripMargin

  /** DuckDB oracle fragment: exact-double cosine via zipped unnests. */
  private def duckCos(qFilter: String, joinCond: String): String =
    s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
       |flat AS (SELECT vec_id, unnest(embedding)::DOUBLE AS x,
       |                unnest(range(len(embedding))) AS i FROM e),
       |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY vec_id),
       |dots AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS vec_id, sum(fa.x * fb.x) AS dot
       |  FROM e a JOIN e b ON $joinCond
       |  JOIN flat fa ON fa.vec_id = a.vec_id
       |  JOIN flat fb ON fb.vec_id = b.vec_id AND fb.i = fa.i
       |  WHERE $qFilter
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT query_id, dots.vec_id AS vec_id,
       |    round(dot / (na.nrm * nb.nrm), 6) AS score
       |  FROM dots JOIN norms na ON na.vec_id = query_id
       |            JOIN norms nb ON nb.vec_id = dots.vec_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, vec_id) AS rn FROM scored)
       |SELECT query_id, vec_id, score, CAST(rn AS INTEGER) AS rn
       |FROM ranked WHERE rn <= 3
       |ORDER BY query_id, rn""".stripMargin

  private def topk(s: SparkSession, dir: String, sameLabel: Boolean): DataFrame = {
    val e = Tables.t(s, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("embedding").as("qv"))
    val corpus = e.select(col("vec_id"), col("label"), col("embedding").as("ev"))
    val joined =
      if (sameLabel) corpus.join(broadcast(queries),
        col("q_label") === col("label") && col("query_id") =!= col("vec_id"))
      else corpus.join(broadcast(queries), col("query_id") =!= col("vec_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    joined
      .withColumn("score", round(expr(cosExpr), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("vec_id"), col("score"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }

  override def queries: Seq[QueryDef] = Seq(

    q("q56_ann_bruteforce",
      duckCos("a.vec_id < 10", "a.vec_id <> b.vec_id")) { (s, dir) =>
      topk(s, dir, sameLabel = false)
    },

    q("q57_ann_bucketed",
      duckCos("a.vec_id < 10", "a.label = b.label AND a.vec_id <> b.vec_id")) { (s, dir) =>
      topk(s, dir, sameLabel = true)
    }
  )
}
