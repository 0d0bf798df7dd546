package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenizer ENCODE kernel — the greedy
  * longest-match-first segmenter (the BERT inference algorithm,
  * Schuster & Nakajima 2012) behind `TextOps.wordpieceCorpusStats` /
  * `txt_wordpiece_corpus`. The vocabulary is the trained merge-product
  * inventory (driver-collected, the perceptron/kmeans/unigram
  * train-then-apply shape); single characters match IMPLICITLY (the
  * character-coverage floor — a char absent from the table is still a
  * 1-char piece), so segmentation is total and the matcher's only
  * lookups are multi-char candidates.
  *
  * Deterministic-replay contract (the house stance): greedy
  * longest-match is pure string comparison — no scores, no floats —
  * so the DuckDB oracle replays it exactly with a position-unrolled
  * greedy walk (`ROW_NUMBER() OVER (... ORDER BY l DESC)` per step).
  * Words longer than `maxWordLen` fall back to per-character pieces on
  * both engines, bounding the SQL unroll (the
  * [[UnigramKernel.viterbi]] long-word rule). */
object WordpieceKernel {

  /** Greedy piece count of one word: at each position take the
    * LONGEST vocab piece (length ≤ maxPieceLen) starting there;
    * single chars always match. Returns the number of pieces. */
  def greedyPieces(word: String, vocab: java.util.HashSet[String],
      maxPieceLen: Int): Int = {
    val L = word.length
    var pos = 0
    var n = 0
    while (pos < L) {
      var l = math.min(maxPieceLen, L - pos)
      var step = 1
      var found = false
      while (l >= 2 && !found) {
        if (vocab.contains(word.substring(pos, pos + l))) {
          step = l; found = true
        }
        l -= 1
      }
      n += 1
      pos += step
    }
    n
  }
}

/** wordpiece_stats(text) → struct(n_tokens, n_pieces, n_chars):
  * one-pass corpus-encode accounting — token count, total greedy
  * pieces (long words fall back to chars), total token characters —
  * a narrow projection so the corpus is scanned once with zero
  * shuffle before the per-doc rollup. */
case class WordpieceStats(child: Expression, vocab: Seq[String],
    maxWordLen: Int, maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    var nTok = 0L; var nPieces = 0L; var nChars = 0L
    val v = child.eval(input)
    if (v != null) {
      TextKernel.tokens(v.asInstanceOf[UTF8String]).foreach { w =>
        nTok += 1
        nChars += w.length
        if (w.length > maxWordLen) nPieces += w.length
        else nPieces += WordpieceKernel.greedyPieces(w, vocabSet, maxPieceLen)
      }
    }
    InternalRow(nTok, nPieces, nChars)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordpieceNative {
  import org.apache.spark.sql.graft.Bridge.{column => toCol, expression => toExpr}

  def wordpiece_stats(text: Column, vocab: Seq[String], maxWordLen: Int,
      maxPieceLen: Int): Column =
    toCol(WordpieceStats(toExpr(text), vocab, maxWordLen, maxPieceLen))
}
