package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import graft.functions.GeodesicDistance

/** Optimizer rule: rewrites a geodesic distance theta-join
  *
  * {{{ a JOIN b ON st_geodesic_distance(a.lon, a.lat, b.lon, b.lat) <= R }}}
  *
  * (which Spark can only execute as a nested-loop cartesian — O(n·m)
  * distance evaluations) into the grid-cell equi-join the engine uses
  * for its own spatial join (SURVEY O8): one side explodes its 3×3
  * neighbor cells, the join becomes an equi-join on the cell id, and
  * the exact geodesic predicate stays as the residual filter. Catalyst
  * then plans a shuffled hash/sort-merge join — shuffle-partitionable,
  * skew-handled by AQE — instead of a cartesian.
  *
  * Cell sizing: lat cells = R in degrees; lon cells widened ×3.25
  * (valid to ~72° latitude — 1/cos(72°) ≈ 3.24) so no in-range pair
  * can escape the 3×3 neighborhood. The residual predicate is
  * authoritative; the grid only prunes.
  *
  * Registered via [[graft.GraftExtensions]], so a pure-SQL user writing
  * the naive theta-join gets the scalable plan automatically.
  */
object GeodesicJoinRule extends Rule[LogicalPlan] {

  private val JxName = "__graft_cell_jx"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !alreadyRewritten(j) =>
      findGeoPredicate(cond, left, right) match {
        case Some((lonL, latL, lonR, latR, rangeM)) =>
          rewrite(j, left, right, cond, hint, lonL, latL, lonR, latR, rangeM)
        case None => j
      }
  }

  private def alreadyRewritten(j: Join): Boolean =
    j.left.output.exists(_.name.startsWith(JxName)) ||
      j.right.output.exists(_.name.startsWith(JxName))

  /** st_geodesic_distance(l.lon, l.lat, r.lon, r.lat) <= lit(R) with the
    * four args split two-and-two across the join sides (either order). */
  private def findGeoPredicate(
      cond: Expression, left: LogicalPlan, right: LogicalPlan):
      Option[(Expression, Expression, Expression, Expression, Double)] = {
    val conjuncts = splitConjuncts(cond)
    conjuncts.collectFirst {
      case LessThanOrEqual(GeodesicDistance(Seq(a, b, c, d)), Literal(r, t))
          if isNumeric(t) && fromSide(Seq(a, b), left) && fromSide(Seq(c, d), right) =>
        (a, b, c, d, toDouble(r))
      case LessThanOrEqual(GeodesicDistance(Seq(a, b, c, d)), Literal(r, t))
          if isNumeric(t) && fromSide(Seq(a, b), right) && fromSide(Seq(c, d), left) =>
        (c, d, a, b, toDouble(r))
      case GreaterThanOrEqual(Literal(r, t), GeodesicDistance(Seq(a, b, c, d)))
          if isNumeric(t) && fromSide(Seq(a, b), left) && fromSide(Seq(c, d), right) =>
        (a, b, c, d, toDouble(r))
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def isNumeric(t: DataType): Boolean =
    t.isInstanceOf[NumericType]

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

  private def fromSide(exprs: Seq[Expression], side: LogicalPlan): Boolean = {
    val refs = exprs.flatMap(_.references.toSeq)
    refs.nonEmpty && refs.forall(a => side.outputSet.contains(a))
  }

  private def rewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan, cond: Expression,
      hint: JoinHint,
      lonL: Expression, latL: Expression,
      lonR: Expression, latR: Expression, rangeM: Double): LogicalPlan = {

    val rDeg = rangeM / 111000.0
    val cellLat = Literal(rDeg)
    val cellLon = Literal(rDeg * 3.25)

    def cellOf(e: Expression, size: Literal): Expression =
      Cast(Floor(Divide(Cast(e, DoubleType), size)), LongType)

    // left: compute base cells, explode the 3x3 neighborhood
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield CreateStruct(Seq(Literal(dx.toLong), Literal(dy.toLong)))
    val offArr = CreateArray(offsets)
    val offAttr = AttributeReference(s"${JxName}_off",
      StructType(Seq(StructField("col1", LongType, nullable = false),
        StructField("col2", LongType, nullable = false))), nullable = false)()
    val gen = Generate(Explode(offArr), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(offAttr), child = left)
    val jx = Alias(Add(cellOf(lonL, cellLon), GetStructField(offAttr, 0)), s"${JxName}_x")()
    val jy = Alias(Add(cellOf(latL, cellLat), GetStructField(offAttr, 1)), s"${JxName}_y")()
    val leftCells = Project(left.output ++ Seq(jx, jy), gen)

    // right: base cell only
    val kx = Alias(cellOf(lonR, cellLon), s"${JxName}_kx")()
    val ky = Alias(cellOf(latR, cellLat), s"${JxName}_ky")()
    val rightCells = Project(right.output ++ Seq(kx, ky), right)

    val eqCond = And(
      EqualTo(jx.toAttribute, kx.toAttribute),
      EqualTo(jy.toAttribute, ky.toAttribute))
    val newJoin = Join(leftCells, rightCells, Inner, Some(And(eqCond, cond)), hint)

    // restore the original output (drop helper columns)
    Project(j.output, newJoin)
  }
}
