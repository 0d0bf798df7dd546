package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-family) tokenizer kernels — the Viterbi
  * segmenter behind `TextOps.unigramTrain` / `txt_unigram_corpus`.
  *
  * House integer stance: piece costs are MILLI-LOG2 fixed-point
  * integers derived from exact counts via [[UnigramKernel.log2Milli]]
  * (floor-log2 from the bit length + a linear interpolation of the
  * fractional octave — both exactly computable in DuckDB as
  * `1000*(length(bin(n))-1) + ((n*1000) >> (length(bin(n))-1)) - 1000`),
  * so segmentation decisions are bit-identical across engines: no
  * libm log, no float summation order, ever.
  *
  * Viterbi tie-break (pinned in UnigramSpec against a brute-force
  * list-walk over ALL segmentations): minimal total cost; on ties the
  * LONGEST last piece wins at every DP position (SQL:
  * `ROW_NUMBER() OVER (... ORDER BY cost ASC, plen DESC)`).
  * Words longer than `maxWordLen` fall back to per-character pieces —
  * the same deterministic rule on both engines, keeping the oracle's
  * position-unrolled DP bounded. */
object UnigramKernel {

  /** Exact-integer milli-log2: 1000·⌊log2 n⌋ + linear fractional part.
    * Monotone non-decreasing in n; log2Milli(1) == 0. */
  def log2Milli(n: Long): Long = {
    require(n >= 1, s"log2Milli needs n >= 1, got $n")
    val b = 63 - java.lang.Long.numberOfLeadingZeros(n)
    1000L * b + ((n * 1000L) >> b) - 1000L
  }

  /** Viterbi segmentation of one word under additive piece costs.
    * dp(j) = best cost of word(0,j); candidates are pieces of length
    * 1..maxPieceLen present in `cost`. Iterating piece length
    * DESCENDING with strict `<` keeps the longest piece on cost ties —
    * the (cost ASC, plen DESC) order the SQL replay uses. Returns null
    * if no segmentation exists (a character missing from the piece
    * table — impossible when single chars are always retained). */
  def viterbi(word: String, cost: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): Array[String] = {
    val L = word.length
    if (L == 0) return Array.empty
    val Inf = Long.MaxValue / 4
    val dp = Array.fill(L + 1)(Inf)
    val back = new Array[Int](L + 1)
    dp(0) = 0L
    var j = 1
    while (j <= L) {
      var plen = math.min(maxPieceLen, j)
      while (plen >= 1) {
        val i = j - plen
        if (dp(i) < Inf) {
          val c = cost.get(word.substring(i, j))
          if (c != null && dp(i) + c < dp(j)) { dp(j) = dp(i) + c; back(j) = plen }
        }
        plen -= 1
      }
      j += 1
    }
    if (dp(L) >= Inf) return null
    var out = List.empty[String]
    var p = L
    while (p > 0) { out = word.substring(p - back(p), p) :: out; p -= back(p) }
    out.toArray
  }
}

/** Shared piece-table plumbing for the two expressions. `pieces` is
  * the trained (piece → cost_milli) table as an ordered Seq (literal,
  * driver-collected — the perceptron/kmeans train-then-apply shape);
  * `defCost` is the defensive cost for a character absent from the
  * table (= log2Milli(total), i.e. a count-1 piece) used only by the
  * long-word fallback. */
trait UnigramPieceTable {
  def pieces: Seq[(String, Long)]
  def maxWordLen: Int
  def maxPieceLen: Int
  @transient protected lazy val costMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
    pieces.foreach { case (p, c) => m.put(p, c) }
    m
  }
}

/** unigram_encode(text) → array<string>: Viterbi pieces of every
  * token of the text, concatenated in order; tokens longer than
  * maxWordLen split to characters. */
case class UnigramEncode(child: Expression, pieces: Seq[(String, Long)],
    maxWordLen: Int, maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback with UnigramPieceTable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val out =
      if (v == null) Array.empty[String]
      else TextKernel.tokens(v.asInstanceOf[UTF8String]).flatMap { w =>
        if (w.length > maxWordLen) w.map(_.toString)
        else {
          val seg = UnigramKernel.viterbi(w, costMap, maxPieceLen)
          if (seg == null) w.map(_.toString) else seg.toSeq
        }
      }
    new GenericArrayData(out.map(UTF8String.fromString): Array[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** unigram_stats(text) → struct(n_tokens, n_pieces, cost_milli):
  * one-pass corpus-encode accounting (token count, total Viterbi
  * pieces, total piece cost) — the narrow-projection form the
  * `txt_unigram_corpus` driver query aggregates, so the corpus is
  * scanned once with zero shuffle before the per-doc rollup. */
case class UnigramStats(child: Expression, pieces: Seq[(String, Long)],
    defCost: Long, maxWordLen: Int, maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback with UnigramPieceTable {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("cost_milli", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    var nTok = 0L; var nPieces = 0L; var cost = 0L
    val v = child.eval(input)
    if (v != null) {
      TextKernel.tokens(v.asInstanceOf[UTF8String]).foreach { w =>
        nTok += 1
        val seg0 =
          if (w.length > maxWordLen) null
          else UnigramKernel.viterbi(w, costMap, maxPieceLen)
        if (seg0 == null) {
          // char fallback: chars missing from the table cost defCost
          nPieces += w.length
          w.foreach { ch =>
            val c = costMap.get(ch.toString)
            cost += (if (c == null) defCost else c.longValue())
          }
        } else {
          nPieces += seg0.length
          seg0.foreach(p => cost += costMap.get(p).longValue())
        }
      }
    }
    InternalRow(nTok, nPieces, cost)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramNative {
  import org.apache.spark.sql.graft.Bridge.{column => toCol, expression => toExpr}

  def unigram_encode(text: Column, pieces: Seq[(String, Long)],
      maxWordLen: Int, maxPieceLen: Int): Column =
    toCol(UnigramEncode(toExpr(text), pieces, maxWordLen, maxPieceLen))
  def unigram_stats(text: Column, pieces: Seq[(String, Long)], defCost: Long,
      maxWordLen: Int, maxPieceLen: Int): Column =
    toCol(UnigramStats(toExpr(text), pieces, defCost, maxWordLen, maxPieceLen))
}
