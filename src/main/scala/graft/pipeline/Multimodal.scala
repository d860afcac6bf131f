package graft.pipeline

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** One row per document after binary featurization. */
final case class BinFeature(doc_id: Long, n_bytes: Int, hist: String)

/** One row per SAMPLED frame of a framed binary payload. */
final case class FrameFeature(doc_id: Long, frame_idx: Int, frame_len: Int,
    checksum: Int)

/** Multimodal-column plumbing: media payloads are opaque `binary`
  * columns with typed metadata; decode / feature-extract runs as a
  * partition-batched function over the binary bytes (the Scala analog
  * of a Pandas-UDF batch). The "decoder" here is a deterministic fake
  * (byte-bucket histogram — the real image/audio libs are not in this
  * container, SURVEY §7 stance); the Spark-side plumbing — binary
  * schema, partition batching, fixed-width feature output — is real
  * and oracle-checked.
  */
object Multimodal extends QueryModule {

  override def queries: Seq[QueryDef] = Seq(

    q("q59_multimodal_bytes",
      """WITH bytes AS (
        |  SELECT doc_id, ascii(substr(text, i.i, 1)) % 16 AS b
        |  FROM documents, unnest(range(1, length(text)+1)) AS i(i)),
        |counts AS (
        |  SELECT d.doc_id, r.b, count(bytes.b) AS c
        |  FROM (SELECT DISTINCT doc_id FROM documents) d
        |  CROSS JOIN (SELECT unnest(range(16)) AS b) r
        |  LEFT JOIN bytes ON bytes.doc_id = d.doc_id AND bytes.b = r.b
        |  GROUP BY d.doc_id, r.b)
        |SELECT doc_id,
        |  CAST((SELECT length(text) FROM documents x WHERE x.doc_id = counts.doc_id) AS INTEGER) AS n_bytes,
        |  string_agg(CAST(c AS VARCHAR), ',' ORDER BY b) AS hist
        |FROM counts GROUP BY doc_id
        |ORDER BY doc_id""") { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          // partition-batched "decode": one pass per partition, no
          // per-row task overhead — the shape a real media decoder
          // (or mapInPandas batch) would use
          rows.map { case (id, payload) =>
            val hist = new Array[Long](16)
            var k = 0
            while (k < payload.length) {
              hist((payload(k) & 0xff) % 16) += 1
              k += 1
            }
            BinFeature(id, payload.length, hist.mkString(","))
          }
        }
        .toDF()
        .orderBy(col("doc_id"))
    },

    // ----- frame sampling: the video/audio shape — a framed binary
    // payload expands 1→N typed frame rows, sampling every 4th frame;
    // per-frame feature is a deterministic fake checksum (the decode
    // stub), the partition-batched expansion and typed output schema
    // are the real pipeline plumbing -----
    q("q124_frame_sample",
      """WITH f AS (
        |  SELECT doc_id, (i.i - 1) // 64 AS frame_idx,
        |    ascii(substr(text, i.i, 1)) AS b
        |  FROM documents, unnest(range(1, length(text)+1)) AS i(i))
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(count(*) AS INTEGER) AS frame_len,
        |  CAST(sum(b) % 997 AS INTEGER) AS checksum
        |FROM f WHERE frame_idx % 4 = 0
        |GROUP BY doc_id, frame_idx
        |ORDER BY doc_id, frame_idx""") { (s, dir) =>
      import s.implicits._
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          rows.flatMap { case (id, payload) =>
            val nFrames = (payload.length + 63) / 64
            Iterator.range(0, nFrames, step = 4).map { fi =>
              val from = fi * 64
              val until = math.min(from + 64, payload.length)
              var sum = 0L
              var k = from
              while (k < until) { sum += (payload(k) & 0xff); k += 1 }
              FrameFeature(id, fi, until - from, (sum % 997).toInt)
            }
          }
        }
        .toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    }
  )
}
