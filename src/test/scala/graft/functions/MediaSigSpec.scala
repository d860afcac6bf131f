package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kernel pins for the fused multimodal signature expressions —
  * the invariants the relational forms guaranteed structurally and
  * the expressions must now guarantee by code: grid binning, integer
  * pooling, densify-to-zero for missing cells, and the empty-payload
  * contract (the r14 ADVICE divergence: the exploded form fabricated
  * phantom rows from sequence(1,0); the expressions yield hash 0 /
  * zero frames, exactly what the oracles' grid CTEs compute).
  */
class MediaSigSpec extends SparkSpec {

  test("dhashCompute: empty payload densifies to hash 0") {
    assert(MediaSig.dhashCompute(Array.emptyByteArray) == 0L)
  }

  test("frameSigsCompute/frameEnergiesCompute: empty payload yields zero frames") {
    assert(MediaSig.frameSigsCompute(Array.emptyByteArray).numElements() == 0)
    assert(MediaSig.frameEnergiesCompute(Array.emptyByteArray).numElements() == 0)
  }

  test("dhashCompute: constant payload has no gradients; a ramp sets every bit") {
    assert(MediaSig.dhashCompute(Array.fill(64)('a'.toByte)) == 0L)
    // strictly increasing bytes: every adjacent-cell mean increases,
    // so all 28 gradient bits set
    val ramp = Array.tabulate(64)(i => (i + 32).toByte)
    assert(MediaSig.dhashCompute(ramp) == (1L << 28) - 1)
  }

  test("dhashCompute: payload shorter than the grid leaves trailing cells at 0") {
    // 2 bytes land in cells 0 and 16 ((pos*32) div 2); all other
    // cells are empty -> 0. Cell 0 = 100 > 0 = cell 1 (no bit);
    // cell 16 = 100 > 0 = cell 17 (no bit); everything else 0=0.
    assert(MediaSig.dhashCompute(Array[Byte](100, 100)) == 0L)
    // descending pair: cell 0 = 50, cell 16 = 100; within row 0 the
    // gradient 50 -> 0 sets nothing, row 2's 100 -> 0 sets nothing,
    // but cell 15 (0) < nothing... no adjacent pair rises -> 0
    assert(MediaSig.dhashCompute(Array[Byte](50, 100)) == 0L)
  }

  test("frameSigsCompute: one sig per 64-byte frame, tail frame included") {
    val sigs = MediaSig.frameSigsCompute(Array.fill(130)('x'.toByte))
    assert(sigs.numElements() == 3) // 64 + 64 + 2
    // constant payload: no gradient anywhere
    (0 until 3).foreach(i => assert(sigs.getLong(i) == 0L))
  }

  test("frameEnergiesCompute: mean-square over present bytes only") {
    // frame 0: 64 bytes of 'z' (122^2); frame 1: 2 bytes of ' ' (32^2)
    val bytes = Array.fill(64)('z'.toByte) ++ Array.fill(2)(' '.toByte)
    val en = MediaSig.frameEnergiesCompute(bytes)
    assert(en.numElements() == 2)
    assert(en.getLong(0) == 122L * 122)
    assert(en.getLong(1) == 32L * 32)
  }

  test("expressions match the kernels through codegen over a DataFrame") {
    import spark.implicits._
    val df = Seq((1L, "hello world this is a reasonably long payload string"),
        (2L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        MediaSig.dhash_sig(encode(col("text"), "UTF-8")).as("h"),
        MediaSig.frame_sigs(encode(col("text"), "UTF-8")).as("fs"),
        MediaSig.frame_energies(encode(col("text"), "UTF-8")).as("fe"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("h"), r.getSeq[Long](2).toList, r.getSeq[Long](3).toList))
      .toMap
    val payload = "hello world this is a reasonably long payload string"
      .getBytes("UTF-8")
    val sigs = MediaSig.frameSigsCompute(payload)
    assert(df(1L)._1 == MediaSig.dhashCompute(payload))
    assert(df(1L)._2 ==
      (0 until sigs.numElements()).map(sigs.getLong).toList)
    assert(df(2L)._1 == 0L && df(2L)._2.isEmpty && df(2L)._3.isEmpty)
  }

  test("non-binary input fails analysis cleanly") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq((1L, "abc")).toDF("doc_id", "text")
        .select(MediaSig.dhash_sig(col("text"))).collect()
    }
    assert(ex.getMessage.contains("binary") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
