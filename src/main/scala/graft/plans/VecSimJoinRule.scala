package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import graft.functions.{VecCosSim, VecSqdist}

/** Optimizer rule: rewrites vector-similarity theta-joins
  *
  * {{{ a JOIN b ON vec_sqdist(a.emb, b.emb) <= t        // distance
  *     a JOIN b ON vec_cos_sim(a.emb, b.emb) >= tau }}} // cosine
  *
  * — which Spark can only execute as a nested-loop cartesian, O(n·m)
  * kernel evaluations — into a grid-cell EQUI-join (the
  * [[GeodesicJoinRule]] shape lifted to embedding space): each side
  * quantizes its first two (distance) or first two UNIT-NORMALIZED
  * (cosine) coordinates into cells of the threshold radius, the left
  * side explodes its 3×3 neighbor cells, and the exact original
  * predicate stays as the authoritative residual filter. Catalyst then
  * plans a shuffled hash/sort-merge join — shuffle-partitionable,
  * AQE-skew-handled — instead of a cartesian.
  *
  * EXACTNESS (why this is a legal rewrite and banded LSH is not): an
  * optimizer rule must preserve results bit-for-bit. The ops layer's
  * banded-LSH candidate join ([[graft.ops.SimilarityOps.nearDupPairs]])
  * is recall-tuned — pairs that collide in no band are LOST, which an
  * API with documented semantics may choose but a silent plan rewrite
  * may not. The grid is a pure PRUNE with no false negatives:
  *  - distance: vec_sqdist ≤ t ⟹ |a_i − b_i| ≤ √t per coordinate, so
  *    the pair's cells on any coordinate differ by at most one — the
  *    3×3 neighborhood always contains the match. Missing dims
  *    coalesce to 0.0, the same zero-padding [[VecSqdist]] computes.
  *  - cosine: cos(a,b) ≥ τ ⟺ ‖â−b̂‖² ≤ 2−2τ on the unit sphere, so the
  *    grid on normalized coordinates with radius √(2−2τ) prunes
  *    exactly as the distance case. Zero/NaN-norm rows get NaN
  *    coordinates (cell 0 after the floor/cast) and a NaN residual
  *    (never ≥ τ) — rejected exactly as the naive plan rejects them.
  * Thresholds that make the radius undefined (t < 0, τ > 1 — an empty
  * result either way) leave the plan untouched.
  *
  * Pruning power scales with threshold tightness: at production
  * near-dup radii (cos ≥ 0.9+) the first two normalized coordinates
  * split the sphere into many cells; at loose thresholds the cells
  * widen toward one bucket and the plan degrades gracefully to the
  * shuffled equi-join evaluating the residual everywhere — never worse
  * than the cartesian it replaces by more than the 9× key explode.
  *
  * Registered via [[graft.GraftExtensions]], so a pure-SQL user writing
  * the naive theta-join gets the scalable plan automatically.
  */
object VecSimJoinRule extends Rule[LogicalPlan] {

  private val JxName = "__graft_vcell_jx"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !alreadyRewritten(j) =>
      findSimPredicate(cond, left, right) match {
        case Some((embL, embR, radius, normalize)) =>
          rewrite(j, left, right, cond, hint, embL, embR, radius, normalize)
        case None => j
      }
  }

  private def alreadyRewritten(j: Join): Boolean =
    j.left.output.exists(_.name.startsWith(JxName)) ||
      j.right.output.exists(_.name.startsWith(JxName))

  /** Returns (leftEmb, rightEmb, cellRadius, normalize?) for the first
    * conjunct matching a supported similarity predicate with the two
    * embedding expressions split across the join sides. */
  private def findSimPredicate(
      cond: Expression, left: LogicalPlan, right: LogicalPlan):
      Option[(Expression, Expression, Double, Boolean)] = {
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (fromSide(a, left) && fromSide(b, right)) Some((a, b))
      else if (fromSide(a, right) && fromSide(b, left)) Some((b, a))
      else None
    splitConjuncts(cond).iterator.map {
      // vec_sqdist(a, b) <= t   (and the flipped literal form)
      case LessThanOrEqual(VecSqdist(a, b), Literal(t, dt)) if isNumeric(dt) =>
        sides(a, b).filter(_ => toDouble(t) >= 0.0)
          .map { case (l, r) => (l, r, math.sqrt(toDouble(t)), false) }
      case GreaterThanOrEqual(Literal(t, dt), VecSqdist(a, b)) if isNumeric(dt) =>
        sides(a, b).filter(_ => toDouble(t) >= 0.0)
          .map { case (l, r) => (l, r, math.sqrt(toDouble(t)), false) }
      // vec_cos_sim(a, b) >= tau   (and the flipped literal form)
      case GreaterThanOrEqual(VecCosSim(a, b), Literal(t, dt)) if isNumeric(dt) =>
        sides(a, b).filter(_ => toDouble(t) <= 1.0)
          .map { case (l, r) =>
            (l, r, math.sqrt(math.max(2.0 - 2.0 * toDouble(t), 0.0)), true) }
      case LessThanOrEqual(Literal(t, dt), VecCosSim(a, b)) if isNumeric(dt) =>
        sides(a, b).filter(_ => toDouble(t) <= 1.0)
          .map { case (l, r) =>
            (l, r, math.sqrt(math.max(2.0 - 2.0 * toDouble(t), 0.0)), true) }
      case _ => None
    }.collectFirst { case Some(m) if m._3 > 0.0 => m }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def isNumeric(t: DataType): Boolean = t.isInstanceOf[NumericType]

  private def toDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
  }

  private def fromSide(e: Expression, side: LogicalPlan): Boolean = {
    val refs = e.references.toSeq
    refs.nonEmpty && refs.forall(a => side.outputSet.contains(a))
  }

  /** Quantized coordinate i of `emb`: missing dims are 0.0 (the
    * [[VecSqdist]] zero-pad convention); for cosine the coordinate is
    * divided by the vector's own norm first — zero/NaN norms propagate
    * NaN (cell 0 after floor/cast); such rows survive to the residual,
    * which rejects them — same as the naive plan. */
  private def cellOf(emb: Expression, dim: Int, radius: Double,
      normalize: Boolean): Expression = {
    val item = Cast(GetArrayItem(emb, Literal(dim)), DoubleType)
    val coord =
      if (!normalize) Coalesce(Seq(item, Literal(0.0)))
      else Coalesce(Seq(
        Divide(item, Sqrt(graft.functions.VecDot(emb, emb))),
        Literal(0.0)))
    Cast(Floor(Divide(coord, Literal(radius))), LongType)
  }

  private def rewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan, cond: Expression,
      hint: JoinHint, embL: Expression, embR: Expression,
      radius: Double, normalize: Boolean): LogicalPlan = {

    // left: explode the 3x3 neighborhood of the base cell
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield CreateStruct(Seq(Literal(dx.toLong), Literal(dy.toLong)))
    val offAttr = AttributeReference(s"${JxName}_off",
      StructType(Seq(StructField("col1", LongType, nullable = false),
        StructField("col2", LongType, nullable = false))), nullable = false)()
    val gen = Generate(Explode(CreateArray(offsets)), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(offAttr), child = left)
    val jx = Alias(Add(cellOf(embL, 0, radius, normalize),
      GetStructField(offAttr, 0)), s"${JxName}_x")()
    val jy = Alias(Add(cellOf(embL, 1, radius, normalize),
      GetStructField(offAttr, 1)), s"${JxName}_y")()
    val leftCells = Project(left.output ++ Seq(jx, jy), gen)

    // right: base cell only
    val kx = Alias(cellOf(embR, 0, radius, normalize), s"${JxName}_kx")()
    val ky = Alias(cellOf(embR, 1, radius, normalize), s"${JxName}_ky")()
    val rightCells = Project(right.output ++ Seq(kx, ky), right)

    val eqCond = And(
      EqualTo(jx.toAttribute, kx.toAttribute),
      EqualTo(jy.toAttribute, ky.toAttribute))
    val newJoin = Join(leftCells, rightCells, Inner, Some(And(eqCond, cond)), hint)
    Project(j.output, newJoin)
  }
}
