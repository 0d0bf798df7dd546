package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-dedup kernels. These replace higher-order-function
  * chains (`transform`/`aggregate`/`array_distinct` over md5'd word
  * 3-grams) that are interpreted and — worse — get duplicated once per
  * referencing column (4× for the four minhash lanes), because HOFs
  * never participate in subexpression elimination.
  *
  * Semantics are kept bit-identical to the HOF/oracle formulation
  * (see [[graft.ops.DedupOps]] and its DuckDB SQL):
  * tokens = regex `\s+` split of the space-trimmed lowercase text,
  * empties dropped; shingles = word 3-grams joined by a single space;
  * hash = first 15 hex digits of md5 (top 60 bits) mod 1e9+7;
  * minhash lane i = min over distinct hashes of (A(i)*h+B(i)) mod p,
  * or the sentinel p for an empty shingle set.
  */
object TextKernel {
  val HashMod = 1000000007L
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def tokens(s: UTF8String): Array[String] = {
    // trim() removes only 0x20 like SQL trim; toLowerCase matches lower()
    val str = s.toLowerCase.trim().toString
    if (str.isEmpty) Array.empty
    else ws.split(str, -1).filter(_.nonEmpty)
  }

  /** First 15 hex digits of md5 → long in [0, HashMod). */
  def md5Mod(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    // top 60 bits = 7.5 bytes: 7 full bytes + high nibble of the 8th
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(7) & 0xf0L) >> 4)
    v % HashMod
  }

  /** Top 60 bits of md5 (first 15 hex digits) — the widest md5 prefix
    * that parses as a non-negative signed int64 on both Spark and
    * DuckDB (`('0x' || substr(md5(s),1,15))::BIGINT`), so 60-bit
    * simhash stays portable without unsigned/overflow games. */
  def md5Top60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** 60-bit SimHash over the token MULTISET (duplicates weigh): bit j
    * is set when strictly more tokens have bit j of their 60-bit hash
    * set than clear. Zero tokens → simhash 0. One pass, no explode. */
  def simhash60(s: UTF8String): Long = {
    val w = tokens(s)
    val counts = new Array[Int](60)
    var i = 0
    while (i < w.length) {
      val h = md5Top60(w(i))
      var j = 0
      while (j < 60) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Distinct word-3-gram hashes, ASCENDING order. Sortedness is free
    * here and lets the pairwise intersection count be a merge scan
    * (see [[SortedInterCount]]); no consumer is order-sensitive
    * (minhash takes a min, the explode paths feed groupBy). */
  def shingleHashes(s: UTF8String): Array[Long] = {
    val w = tokens(s)
    if (w.length < 3) return Array.empty
    val seen = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i <= w.length - 3) {
      seen.add(md5Mod(w(i) + " " + w(i + 1) + " " + w(i + 2)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }
}

/** cdc_chunks(text) → array<struct<n_toks, chunk_md5>> of
  * CONTENT-DEFINED chunks (the LBFS/FastCDC idea at token
  * granularity): a chunk closes after any token whose
  * [[TextKernel.md5Mod]] hash ≡ 0 (mod `mod`) — boundaries are a
  * function of LOCAL content, so inserting or deleting a token
  * re-synchronizes the chunking after one boundary instead of
  * shifting every downstream chunk the way fixed-width chunking
  * does. That re-synchronization is why storage/transfer dedup
  * (backup systems, crawl snapshot stores) chunk this way: repeated
  * chunks across near-identical documents hash identically and
  * dedup at rest. Expected chunk length = `mod` tokens. One pass,
  * no explode; zero-token docs chunk to an empty array. */
case class CdcChunks(child: Expression, mod: Int)
    extends UnaryExpression with CodegenFallback {
  require(mod > 0)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n_toks", IntegerType, nullable = false),
    StructField("chunk_md5", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  private def md5Hex(s: String): UTF8String = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    val w = TextKernel.tokens(v.asInstanceOf[UTF8String])
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    val cur = new java.lang.StringBuilder
    var n = 0
    def close(): Unit = if (n > 0) {
      chunks += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](n, md5Hex(cur.toString)))
      cur.setLength(0); n = 0
    }
    var i = 0
    while (i < w.length) {
      if (n > 0) cur.append(' ')
      cur.append(w(i)); n += 1
      if (TextKernel.md5Mod(w(i)) % mod == 0) close()
      i += 1
    }
    close()
    new GenericArrayData(chunks.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** shingle_hashes(text) → array<long> of distinct word-3-gram hashes. */
case class ShingleHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    // null text behaves like the HOF chain: empty shingle set, not null
    if (v == null) new GenericArrayData(Array.empty[Long])
    else new GenericArrayData(TextKernel.shingleHashes(v.asInstanceOf[UTF8String]))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** minhash_sig(text) → array<long> of the four minhash lanes. */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long])
    extends UnaryExpression with CodegenFallback {
  require(a.length == b.length)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = input match { case _ => child.eval(input) }
    val hs =
      if (v == null) Array.empty[Long]
      else TextKernel.shingleHashes(v.asInstanceOf[UTF8String])
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) {
      if (hs.isEmpty) out(i) = TextKernel.HashMod
      else {
        var m = Long.MaxValue
        var j = 0
        while (j < hs.length) {
          val x = (a(i) * hs(j) + b(i)) % TextKernel.HashMod
          if (x < m) m = x
          j += 1
        }
        out(i) = m
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** minhash_sig_hashes(hashes) → array<long> of the four minhash lanes,
  * computed from an ALREADY-HASHED shingle array (the `t_shs` column
  * the attribution artifact stores) instead of raw text — the same
  * min over (a·h + b) mod HashMod per lane, the same empty-set
  * sentinel, so it is bit-identical to [[MinHashSig]] over the text
  * the hashes came from (min over a set is order/multiplicity
  * independent). Lets an index build that has just written the
  * shingle table derive the band table from it — ONE raw-text kernel
  * pass instead of two (r16 optimization, guide §1.2). */
case class MinHashSigFromHashes(child: Expression, a: Seq[Long], b: Seq[Long])
    extends UnaryExpression with CodegenFallback {
  require(a.length == b.length)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val out = new Array[Long](a.length)
    val hs = if (v == null) null
      else v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = if (hs == null) 0 else hs.numElements()
    var i = 0
    while (i < a.length) {
      if (n == 0) out(i) = TextKernel.HashMod
      else {
        var m = Long.MaxValue
        var j = 0
        while (j < n) {
          val x = (a(i) * hs.getLong(j) + b(i)) % TextKernel.HashMod
          if (x < m) m = x
          j += 1
        }
        out(i) = m
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** sorted_inter_count(a, b) → |a ∩ b| for two ASCENDING long arrays —
  * a merge scan: O(n+m), no per-row allocation. Replaces
  * `size(array_intersect(...))`, which builds a hash set and an output
  * array per row (the hot loop of n-gram Jaccard verification). */
case class SortedInterCount(left: Expression, right: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input); if (a == null) return null
    val b = right.eval(input); if (b == null) return null
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(left = c(0), right = c(1))
}

/** simhash60(text) → long: 60-bit SimHash of the token multiset in one
  * scan (replaces explode + 60 SUM(CASE…) aggregate columns — no
  * per-token shuffle, the whole operator is a narrow projection). */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else TextKernel.simhash60(v.asInstanceOf[UTF8String])
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** trigram_scores(text) → array<long>: per-profile |trigrams(text) ∩
  * profile| in one pass. The HOF formulation recomputes the trigram
  * array once per referencing column (9× for 4 scores + argmax). */
case class TrigramScores(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val profileSets = profiles.map(_.toSet)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val out = new Array[Long](profiles.length)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toLowerCase.toString
      if (s.length >= 3) {
        val tris = new java.util.HashSet[String]()
        var i = 0
        while (i <= s.length - 3) { tris.add(s.substring(i, i + 3)); i += 1 }
        var p = 0
        while (p < profileSets.length) {
          var c = 0L
          profileSets(p).foreach(t => if (tris.contains(t)) c += 1)
          out(p) = c
          p += 1
        }
      }
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** stopword_scores(text, lists) → array<long>: per-list count of
  * tokens (multiset — duplicates weigh, matching
  * `size(filter(tokens, _.isin(list)))`) that appear in each word
  * list, in ONE tokenize pass. The HOF formulation re-instantiates
  * the split/filter chain once per referencing column (~8× for 4
  * scores + the argmax `when` chain) because HOFs never participate
  * in subexpression elimination — the [[TrigramScores]] rationale
  * applied to the stopword-vote language ID. */
case class StopwordScores(child: Expression, lists: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val listSets = lists.map(_.toSet)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // NULL text → NULL scores, matching the HOF chain it replaced
  // (`size(filter(split(NULL)))` is NULL), so the argmax falls through
  // to "und" and the committed oracle hashes are unchanged.
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val out = new Array[Long](lists.length)
    val tks = TextKernel.tokens(v.asInstanceOf[UTF8String])
    var i = 0
    while (i < tks.length) {
      val t = tks(i)
      var p = 0
      while (p < listSets.length) {
        if (listSets(p).contains(t)) out(p) += 1L
        p += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** winnow_fps(text, k, w) → array<long>: distinct winnowing
  * fingerprints — the minimum 60-bit md5 prefix of each w-window over
  * the k-char grams of lower(text), ascending. Bit-identical to the
  * HOF formulation (`array_distinct(transform(... array_min(slice(
  * hashes, i, w))))` over `conv(substring(md5(substring(lower(text),
  * i, k)), 1, 15), 16, 10)`) and to the DuckDB window-function oracle,
  * but one pass with a reused digest instead of an interpreted
  * per-gram expression tree (the [[ShingleHashes]] rationale; measured
  * ~3× on the corpus bench). Docs shorter than k+w-1 chars → empty. */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Long])
    val str = v.asInstanceOf[UTF8String].toLowerCase.toString
    val n = str.length - k + 1
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val md = MessageDigest.getInstance("MD5")
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(str.substring(i, i + k).getBytes("UTF-8"))
      var acc = 0L
      var j = 0
      while (j < 7) { acc = (acc << 8) | (d(j) & 0xffL); j += 1 }
      hs(i) = (acc << 4) | ((d(7) & 0xf0L) >> 4)
      i += 1
    }
    val seen = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i <= n - w) {
      var m = hs(i)
      var j = i + 1
      while (j < i + w) { if (hs(j) < m) m = hs(j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Byte-pair-encoding tokenizer with a COMMITTED merge table — the
  * production shape: the vocabulary is an offline-trained artifact the
  * engine applies, not something a query derives. This table was
  * trained with the textbook BPE procedure (64 most-frequent adjacent
  * symbol merges, ties broken lexicographically) over the sf0.01
  * `documents` word stream; encoding replays merges by RANK (lowest
  * rank first), the standard BPE encode.
  *
  * Pretokenizer = [[TextKernel.tokens]] (lowercase, `\s+` split), so
  * BPE token counts compose with every other text operator's token
  * semantics. Unseen characters pass through as single-char tokens —
  * no OOV. */
object BpeKernel {
  val Merges: Vector[(String, String)] = Vector(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("p", "a"), ("pa", "r"),
    ("o", "in"), ("j", "oin"), ("s", "h"), ("h", "a"), ("ha", "sh"),
    ("r", "ow"), ("c", "h"), ("b", "at"), ("bat", "ch"), ("s", "c"),
    ("sc", "a"), ("sca", "n"), ("u", "st"), ("ust", "o"),
    ("usto", "mer"), ("o", "lu"), ("olu", "m"), ("olum", "n"),
    ("c", "ustomer"), ("c", "olumn"), ("t", "er"), ("l", "ter"),
    ("i", "lter"), ("f", "ilter"), ("s", "m"), ("sm", "a"),
    ("sma", "l"), ("smal", "l"), ("s", "l"), ("sl", "ow"),
    ("mer", "g"), ("merg", "e"), ("v", "e"), ("ve", "c"),
    ("vec", "t"), ("vect", "or"), ("or", "d"), ("ord", "er"),
    ("l", "in"), ("lin", "e"), ("t", "a"), ("ta", "b"), ("tab", "l"),
    ("tabl", "e"), ("d", "at"), ("dat", "a"), ("u", "p"), ("g", "g"),
    ("a", "gg"), ("v", "a"), ("va", "lu"), ("valu", "e"), ("k", "e"),
    ("ke", "y"))

  private val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    Merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + "\u0000" + b, i) }
    m
  }

  /** Standard BPE encode of one pretoken: start from characters,
    * repeatedly merge the adjacent pair with the lowest merge rank
    * (leftmost on rank ties — ranks are unique here) until no adjacent
    * pair is in the table. */
  def encodeWord(word: String): Array[String] = {
    if (word.length <= 1) return if (word.isEmpty) Array.empty else Array(word)
    val parts = new java.util.ArrayList[String](word.length)
    word.foreach(c => parts.add(c.toString))
    var done = false
    while (!done && parts.size > 1) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < parts.size - 1) {
        val r = rank.get(parts.get(i) + "\u0000" + parts.get(i + 1))
        if (r != null && r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        parts.set(bi, parts.get(bi) + parts.get(bi + 1))
        parts.remove(bi + 1)
      }
    }
    val out = new Array[String](parts.size)
    parts.toArray(out)
    out
  }

  def encode(s: UTF8String): Array[String] =
    TextKernel.tokens(s).flatMap(encodeWord)
}

/** bpe_encode(text) → array<string> of BPE tokens ([[BpeKernel]]). */
case class BpeEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val toks =
      if (v == null) Array.empty[String]
      else BpeKernel.encode(v.asInstanceOf[UTF8String])
    new GenericArrayData(toks.map(UTF8String.fromString): Array[Any])
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** feature_counts(text, F) → array<long> of length F+1: dense
  * hashed-unigram count buckets (token md5-hash mod F — identical to
  * `strHash(tok) % F`, TextKernel.md5Mod IS the 60-bit md5 prefix the
  * SQL `conv(substring(md5(x),1,15),16,10) % HashMod` computes) plus a
  * constant bias slot at index F. One pass over the text — replaces
  * the explode → groupBy(doc,f) → groupBy(doc) map-build → densify
  * chain (two shuffles over the token stream) with a ZERO-shuffle
  * narrow projection; measured 2.6 s → sub-second featurization of the
  * sf0.1 corpus. Null text behaves like the token-less doc: zero
  * counts, bias 1. */
case class FeatureCounts(child: Expression, nFeatures: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val out = new Array[Long](nFeatures + 1)
    out(nFeatures) = 1L
    val v = child.eval(input)
    if (v != null) {
      val tks = TextKernel.tokens(v.asInstanceOf[UTF8String])
      var i = 0
      while (i < tks.length) {
        out((TextKernel.md5Mod(tks(i)) % nFeatures).toInt) += 1L
        i += 1
      }
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** entropy_stats(text) → array<long> [n_tokens, n_distinct, ent_mbits]:
  * single-pass per-doc token-distribution entropy in exact milli-bits.
  * The keyed formulation ((doc, token) count + per-doc agg) shuffles
  * one row PER TOKEN — corpus-volume — where this kernel's per-row
  * hashmap shuffles nothing at all (the stopword_scores rationale
  * lifted from CPU to the SHUFFLE level). Bit-identical to the keyed
  * form: same milli-log2 ([[graft.functions.UnigramKernel.log2Milli]]),
  * same H·N = N·L(N) − Σn·L(n) identity, same truncating division —
  * parity pinned row-exhaustively in TextEntropySpec. Empty-token or
  * NULL docs → null (the keyed form drops them; the caller filters). */
case class EntropyStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val tks = TextKernel.tokens(v.asInstanceOf[UTF8String])
    if (tks.isEmpty) return null
    val counts = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < tks.length) {
      val t = tks(i)
      counts.put(t, counts.getOrDefault(t, 0L) + 1L)
      i += 1
    }
    val n = tks.length.toLong
    var sNl = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      sNl += c * UnigramKernel.log2Milli(c)
    }
    new GenericArrayData(Array(n, counts.size.toLong,
      (n * UnigramKernel.log2Milli(n) - sNl) / n))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNative {
  import org.apache.spark.sql.graft.Bridge.{column => toCol, expression => toExpr}

  def shingle_hashes(text: Column): Column = toCol(ShingleHashes(toExpr(text)))
  def minhash_sig(text: Column, a: Seq[Long], b: Seq[Long]): Column =
    toCol(MinHashSig(toExpr(text), a, b))
  def minhash_sig_hashes(hashes: Column, a: Seq[Long], b: Seq[Long]): Column =
    toCol(MinHashSigFromHashes(toExpr(hashes), a, b))
  def sorted_inter_count(a: Column, b: Column): Column =
    toCol(SortedInterCount(toExpr(a), toExpr(b)))
  def simhash60(text: Column): Column = toCol(SimHash60(toExpr(text)))
  def bpe_encode(text: Column): Column = toCol(BpeEncode(toExpr(text)))
  def winnow_fps(text: Column, k: Int, w: Int): Column =
    toCol(WinnowFps(toExpr(text), k, w))
  def trigram_scores(text: Column, profiles: Seq[Seq[String]]): Column =
    toCol(TrigramScores(toExpr(text), profiles))
  def stopword_scores(text: Column, lists: Seq[Seq[String]]): Column =
    toCol(StopwordScores(toExpr(text), lists))
  def feature_counts(text: Column, nFeatures: Int): Column =
    toCol(FeatureCounts(toExpr(text), nFeatures))
  def entropy_stats(text: Column): Column = toCol(EntropyStats(toExpr(text)))
  def cdc_chunks(text: Column, mod: Int): Column =
    toCol(CdcChunks(toExpr(text), mod))
}
