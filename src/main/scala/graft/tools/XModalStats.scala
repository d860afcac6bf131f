package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r17): pre-probe cardinality check for the cross-modal
  * x1000 rows — the r15 lesson (measure key diversity BEFORE a timed
  * pair-join probe) applied to q239/q245's clone routes. Reports, for
  * a documents corpus:
  *   - payload dup ratio (docs / distinct payload hashes) — fires
  *     textPairsClone;
  *   - signature dup ratio (docs / distinct dHash signatures) — fires
  *     phashNearDup's expansion route;
  *   - the DISTINCT-signature block join's candidate volume
  *     (Σ over (j, bkt) of df²) — the route's join cost;
  *   - the expansion's OUTPUT cardinality: within-signature pairs
  *     Σ C(g, 2) — a lower bound on the true all-docs pair list the
  *     verdict semantics require (cross-sig pairs add the rest).
  * All aggregates; no pair list materializes.
  *
  * Usage: XModalStats <sfDir>
  */
object XModalStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val ph = docs.select(col("doc_id"),
      graft.functions.MediaSig.dhash_sig(
        encode(col("text"), "UTF-8")).as("phash"),
      xxhash64(col("text")).as("th")).localCheckpoint()
    val st = ph.agg(count(lit(1)).as("n"),
      count_distinct(col("phash")).as("ds"),
      count_distinct(col("th")).as("dt")).head
    val (n, ds, dt) = (st.getLong(0), st.getLong(1), st.getLong(2))
    println(s"docs=$n distinct_sigs=$ds distinct_payloads=$dt " +
      f"sig_ratio=${n.toDouble / ds}%.2f payload_ratio=${n.toDouble / dt}%.2f")
    val groups = ph.groupBy(col("phash")).agg(count(lit(1)).as("g"))
      .localCheckpoint()
    val within = groups.agg(sum(expr("g * (g - 1) div 2"))).head.getLong(0)
    println(s"within_sig_pairs=$within (expansion output lower bound)")
    val bl = groups.select(col("phash"),
        explode(sequence(lit(0), lit(3))).as("j"))
      .withColumn("bkt", expr("shiftright(phash, 7*j) & 127"))
    val cand = bl.groupBy(col("j"), col("bkt"))
      .agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * col("df"))).head.getLong(0)
    println(s"distinct_sig_block_candidates=$cand (route join volume)")
    // cross-sig expansion volume: Σ over hamming<=3 sig pairs of
    // |A|·|B| — computed at the SIG level (bounded by cand above)
    val a = bl.select(col("phash").as("ha"), col("j"), col("bkt"))
    val b = bl.select(col("phash").as("hb"), col("j"), col("bkt"))
    val sigPairs = a.join(b, Seq("j", "bkt"))
      .filter(col("ha") < col("hb"))
      .select(col("ha"), col("hb")).distinct()
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 3)
    val cross = sigPairs
      .join(groups.select(col("phash").as("ha"), col("g").as("ga")), "ha")
      .join(groups.select(col("phash").as("hb"), col("g").as("gb")), "hb")
      .agg(coalesce(sum(col("ga") * col("gb")), lit(0L))).head.getLong(0)
    println(s"cross_sig_pairs=$cross total_media_pairs=${within + cross}")
    spark.stop()
  }
}
