package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string join: all pairs within Levenshtein distance 1, WITHOUT
  * the cross join a naive `levenshtein(a, b) <= 1` theta-join plans to
  * (BroadcastNestedLoop — O(n·m) distance evaluations, the scale
  * killer for entity-resolution joins over name/alias columns).
  *
  * SymSpell-style deletion neighborhood: two strings are within one
  * edit iff they share a key in {s} ∪ deletions1(s) —
  *   - equal strings share s itself;
  *   - one insertion/deletion apart: the longer one's deletion set
  *     contains the shorter string;
  *   - one substitution apart: deleting the differing position from
  *     both yields the same string.
  * So each side explodes to at most len+1 keys (deduped — repeated
  * characters collapse), the candidate set is a plain shuffled
  * equi-join on the key, and the exact `levenshtein` runs only on
  * candidates. Keys per row grow with string length, not corpus size;
  * candidate volume is bounded by true near-matches plus hash-bucket
  * collisions of the deletion keys — never |L|×|R|.
  *
  * No analogue in the reference (single spatial join,
  * /root/reference/src/pipeline_calculator_v3.py:320-383); this is
  * north-star surface for training-data curation (merging near-equal
  * source/domain/entity names before per-domain caps or joins).
  */
object FuzzyJoin {

  /** {s} ∪ all single-character deletions of s, deduplicated.
    * Empty strings get just {s}: `sequence(1, 0)` counts DOWN in
    * Spark, which would fabricate bogus i=0 deletion keys. */
  def deletionKeys(c: Column): Column =
    when(length(c) === 0, array(c)).otherwise(
      array_union(
        array(c),
        transform(sequence(lit(1), length(c)), i =>
          concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c) - i)))))

  /** All (left, right) pairs with `levenshtein(left, right) <= 1`.
    * Inputs must be single-column DataFrames of distinct strings; the
    * output carries both columns plus `dist`. Plans as
    * explode → shuffled equi-join on the deletion key → residual
    * exact-distance filter → pair dedup (a pair can share several
    * keys, e.g. equal strings of length n share n+1).
    */
  def editDistance1Join(left: DataFrame, leftCol: String,
                        right: DataFrame, rightCol: String): DataFrame = {
    val lk = left.select(col(leftCol), explode(deletionKeys(col(leftCol))).as("_k"))
    val rk = right.select(col(rightCol), explode(deletionKeys(col(rightCol))).as("_k"))
    lk.join(rk, "_k")
      .filter(levenshtein(col(leftCol), col(rightCol)) <= 1)
      .select(col(leftCol), col(rightCol))
      .distinct()
      .withColumn("dist", levenshtein(col(leftCol), col(rightCol)).cast("long"))
  }
}
