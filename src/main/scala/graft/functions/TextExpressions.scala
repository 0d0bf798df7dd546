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

object TextNative {
  import org.apache.spark.sql.graft.Bridge.{column => toCol, expression => toExpr}

  def shingle_hashes(text: Column): Column = toCol(ShingleHashes(toExpr(text)))
  def minhash_sig(text: Column, a: Seq[Long], b: Seq[Long]): Column =
    toCol(MinHashSig(toExpr(text), a, b))
  def sorted_inter_count(a: Column, b: Column): Column =
    toCol(SortedInterCount(toExpr(a), toExpr(b)))
  def simhash60(text: Column): Column = toCol(SimHash60(toExpr(text)))
  def trigram_scores(text: Column, profiles: Seq[Seq[String]]): Column =
    toCol(TrigramScores(toExpr(text), profiles))
}
