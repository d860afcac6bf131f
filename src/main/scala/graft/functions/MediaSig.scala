package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Fused perceptual-signature kernels for the multimodal family
  * (q224/q225/q226/q229/q230) — the VecMath treatment applied to the
  * binary-payload column. The first-cut plans computed the dHash /
  * per-frame signatures RELATIONALLY: explode one row per payload
  * byte (1.5e9 rows at the 1000× tier — PLANS.md r14 names this the
  * family's shared wall), average-pool cells in a pivoted conditional
  * aggregate, pack gradient bits in a projection. These expressions
  * compute the identical all-integer signature in one generated-code
  * pass over the payload bytes, so the plan is scan → project —
  * the per-byte Generate, the 32/8-way conditional aggregate, and
  * their shuffle all disappear; only signature-sized rows ever leave
  * the scan stage.
  *
  * Semantics are bit-identical to the relational form (same
  * nearest-rank binning `(pos·cells) div len`, same integer-mean
  * pooling `sum div count`, same `px < pxr` gradient bits), so every
  * existing DuckDB oracle is unchanged. Cells with no bytes densify
  * to 0 exactly as the oracles' grid CTE does — which also closes the
  * r14 ADVICE latent divergence: an EMPTY payload now yields dHash 0
  * / zero frames (matching the oracle), where the exploded
  * `sequence(1, length(text))` form fabricated phantom rows from
  * Spark's descending `sequence(1, 0)`.
  *
  * Input is the opaque `binary` payload (the q59 multimodal stance:
  * bytes stand in for pixels; a real decoder swaps in upstream
  * without touching this plan shape).
  *
  * ENCODING CONTRACT (r15 ADVICE): "bit-identical to the relational
  * form" holds for SINGLE-BYTE text. These kernels consume the UTF-8
  * BYTES of `encode(text, 'UTF-8')` while the DuckDB oracles (and the
  * replaced relational Spark forms) index CHARACTERS via
  * `ascii(substr(text, i, 1))` / `length(text)` — on the driver's
  * ASCII testdata the two are the same sequence, but any multi-byte
  * character changes both the payload length and per-position values.
  * That is deliberate, not an oversight: a real media payload IS
  * bytes, so the byte-indexed kernel is the production semantics and
  * the character-indexed oracle is the ASCII-corpus replay of it. Do
  * not rely on oracle equality for non-ASCII payloads.
  */
object MediaSig {

  /** The 28-bit document dHash (4×8 grid, 7 gradient bits per row):
    * cell(pos) = (pos·32) div len; px = mean byte per cell (empty → 0);
    * bit r·7+c set iff px(r,c) < px(r,c+1). All-integer. */
  def dhashCompute(bytes: Array[Byte]): Long = {
    val len = bytes.length
    val sums = new Array[Long](32)
    val cnts = new Array[Long](32)
    var p = 0
    while (p < len) {
      val c = ((p.toLong * 32L) / len).toInt
      sums(c) += (bytes(p) & 0xff)
      cnts(c) += 1
      p += 1
    }
    var h = 0L
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 7) {
        val k = r * 8 + c
        val pxa = if (cnts(k) == 0) 0L else sums(k) / cnts(k)
        val pxb = if (cnts(k + 1) == 0) 0L else sums(k + 1) / cnts(k + 1)
        if (pxa < pxb) h |= 1L << (r * 7 + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** Per-frame 7-bit signatures over the q124 framing (64-byte
    * frames, 8 cells of 8 bytes): one dHash row per frame, partial
    * tail cells densify to 0. Returns ceil(len/64) longs. */
  def frameSigsCompute(bytes: Array[Byte]): GenericArrayData = {
    val len = bytes.length
    val nFrames = (len + 63) / 64
    val out = new Array[Long](nFrames)
    val sums = new Array[Long](8)
    val cnts = new Array[Long](8)
    var f = 0
    while (f < nFrames) {
      java.util.Arrays.fill(sums, 0L)
      java.util.Arrays.fill(cnts, 0L)
      val from = f * 64
      val until = math.min(from + 64, len)
      var p = from
      while (p < until) {
        val c = (p - from) / 8
        sums(c) += (bytes(p) & 0xff)
        cnts(c) += 1
        p += 1
      }
      var sig = 0L
      var j = 0
      while (j < 7) {
        val a = if (cnts(j) == 0) 0L else sums(j) / cnts(j)
        val b = if (cnts(j + 1) == 0) 0L else sums(j + 1) / cnts(j + 1)
        if (a < b) sig |= 1L << j
        j += 1
      }
      out(f) = sig
      f += 1
    }
    new GenericArrayData(out)
  }

  /** Per-frame integer energy over the q124 framing (64-byte
    * frames): energy = mean square byte value, `sum(b²) div count` —
    * the audio-shape analog of [[frameSigsCompute]] (q230). Returns
    * ceil(len/64) longs; all-integer, oracle-replayable. */
  def frameEnergiesCompute(bytes: Array[Byte]): GenericArrayData = {
    val len = bytes.length
    val nFrames = (len + 63) / 64
    val out = new Array[Long](nFrames)
    var f = 0
    while (f < nFrames) {
      val from = f * 64
      val until = math.min(from + 64, len)
      var sum = 0L
      var p = from
      while (p < until) {
        val b = (bytes(p) & 0xff).toLong
        sum += b * b
        p += 1
      }
      out(f) = sum / (until - from)
      f += 1
    }
    new GenericArrayData(out)
  }

  private[functions] def checkBinaryInput(fname: String,
      child: Expression): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fname requires a binary payload column, got ${child.dataType.catalogString}")

  /** 28-bit integer dHash of a binary payload, one codegen'd pass. */
  def dhash_sig(payload: Column): Column =
    Bridge.column(DHashSig(Bridge.expression(payload)))

  /** Array of per-64-byte-frame 7-bit signatures, one codegen'd pass. */
  def frame_sigs(payload: Column): Column =
    Bridge.column(FrameSigs(Bridge.expression(payload)))

  /** Array of per-64-byte-frame mean-square energies, one codegen'd pass. */
  def frame_energies(payload: Column): Column =
    Bridge.column(FrameEnergies(Bridge.expression(payload)))
}

case class DHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    MediaSig.checkBinaryInput(prettyName, child)

  override protected def nullSafeEval(payload: Any): Any =
    MediaSig.dhashCompute(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.MediaSig.dhashCompute($p)")

  override protected def withNewChildInternal(newChild: Expression): DHashSig =
    copy(child = newChild)

  override def prettyName: String = "dhash_sig"
}

case class FrameSigs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    MediaSig.checkBinaryInput(prettyName, child)

  override protected def nullSafeEval(payload: Any): Any =
    MediaSig.frameSigsCompute(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.MediaSig.frameSigsCompute($p)")

  override protected def withNewChildInternal(newChild: Expression): FrameSigs =
    copy(child = newChild)

  override def prettyName: String = "frame_sigs"
}

case class FrameEnergies(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    MediaSig.checkBinaryInput(prettyName, child)

  override protected def nullSafeEval(payload: Any): Any =
    MediaSig.frameEnergiesCompute(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.functions.MediaSig.frameEnergiesCompute($p)")

  override protected def withNewChildInternal(newChild: Expression): FrameEnergies =
    copy(child = newChild)

  override def prettyName: String = "frame_energies"
}
