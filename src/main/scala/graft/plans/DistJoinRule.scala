package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a pure planar DISTANCE join — an inner join
  * whose only cross-side predicate is the squared-distance form
  * `(ax−bx)² + (ay−by)² <= r²` with literal radius-squared — into a
  * 3×3 grid-cell equi-join: the 2-D counterpart of [[BandJoinRule]],
  * and the automated form of the hand-written grid trick in the WNV
  * erase (`graft.ops.Wnv`) and `events_range_join`.
  *
  * Without an equi key Catalyst plans CartesianProduct /
  * BroadcastNestedLoopJoin — O(n·m) distance evaluations, the classic
  * spatial-join trap. The rewrite snaps both sides to a square grid of
  * cell size s = nextUp(√r²) (one ulp above the true radius, so IEEE
  * sqrt rounding can never shrink the cell below the radius), explodes
  * the LEFT side to its 3×3 covering cells (two chained Generates, 9×
  * fan-out), projects the single cell on the right, and equi-joins on
  * the (cellX, cellY) pair with the exact distance predicate kept as a
  * residual. Any pair within distance r has per-axis deltas <= r <= s,
  * so their cell indices differ by at most 1 per axis and meet in a
  * covering cell — lossless; the residual removes same-cell pairs
  * outside the radius. Cost drops to O(pairs within one cell
  * neighborhood), shuffled as an ordinary hash join on the cell key —
  * at 100 TB the win between a single-task nested loop and a keyed
  * shuffle whose fan-out is bounded by spatial density.
  *
  * Scope guards (mirroring [[BandJoinRule]]):
  *   - inner joins only; double-typed coordinates; literal r² > 0;
  *   - fires only when NO cross-side equality conjunct exists;
  *   - idempotent via the reserved cell-attribute name prefix.
  */
object DistJoinRule extends Rule[LogicalPlan] {

  private val CellPrefix = "__graft_dist_cell"

  /** Register on a session's `experimental.extraOptimizations` if absent —
    * covers driver-supplied sessions built without [[graft.GraftExtensions]].
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraOptimizations.contains(DistJoinRule))
      exp.extraOptimizations = exp.extraOptimizations :+ DistJoinRule
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner, Some(cond), _) if eligible(j, cond) =>
      rewrite(j).getOrElse(j)
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** `(x1−x2)·(x1−x2) + (y1−y2)·(y1−y2) <= r2` (both multiply operands
    * semantically the same subtraction) with literal double `r2`.
    * Returns (ax, bx, ay, by, r2).
    */
  private object DistPredicate {
    def unapply(e: Expression)
        : Option[(Expression, Expression, Expression, Expression, Double)] = {
      def sq(m: Expression): Option[(Expression, Expression)] = m match {
        case Multiply(s1 @ Subtract(a, b, _), s2, _)
            if s1.semanticEquals(s2) && a.dataType == DoubleType &&
              b.dataType == DoubleType => Some((a, b))
        case _ => None
      }
      def fromSum(sum: Expression, lim: Expression)
          : Option[(Expression, Expression, Expression, Expression, Double)] =
        (sum, lim) match {
          case (Add(m1, m2, _), Literal(r2, DoubleType)) =>
            for {
              (ax, bx) <- sq(m1)
              (ay, by) <- sq(m2)
              r2d = r2.asInstanceOf[Double]
              if r2d > 0.0
            } yield (ax, bx, ay, by, r2d)
          case _ => None
        }
      e match {
        case LessThanOrEqual(s, l) => fromSum(s, l)
        case LessThan(s, l) => fromSum(s, l)
        case GreaterThanOrEqual(l, s) => fromSum(s, l)
        case GreaterThan(l, s) => fromSum(s, l)
        case _ => None
      }
    }
  }

  private def sameSide(j: Join, a: Expression, b: Expression): Boolean =
    (a.references.subsetOf(j.left.outputSet) &&
      b.references.subsetOf(j.left.outputSet)) ||
    (a.references.subsetOf(j.right.outputSet) &&
      b.references.subsetOf(j.right.outputSet))

  /** Both coordinates of one point on one side, both of the other on the
    * other side — the cross-side 2-D shape the grid rewrite needs.
    */
  private def crossPair(j: Join, ax: Expression, bx: Expression,
      ay: Expression, by: Expression): Boolean =
    sameSide(j, ax, ay) && sameSide(j, bx, by) &&
      ((ax.references.subsetOf(j.left.outputSet) &&
        bx.references.subsetOf(j.right.outputSet)) ||
       (ax.references.subsetOf(j.right.outputSet) &&
        bx.references.subsetOf(j.left.outputSet)))

  private def eligible(j: Join, cond: Expression): Boolean = {
    if (cond.references.exists(_.name.startsWith(CellPrefix))) return false
    val conjuncts = splitAnd(cond)
    def crossSide(l: Expression, r: Expression): Boolean =
      (l.references.subsetOf(j.left.outputSet) &&
        r.references.subsetOf(j.right.outputSet)) ||
      (l.references.subsetOf(j.right.outputSet) &&
        r.references.subsetOf(j.left.outputSet))
    val hasEqui = conjuncts.exists {
      case EqualTo(l, r) => crossSide(l, r)
      case EqualNullSafe(l, r) => crossSide(l, r)
      case _ => false
    }
    !hasEqui && conjuncts.exists {
      case DistPredicate(ax, bx, ay, by, _) => crossPair(j, ax, bx, ay, by)
      case _ => false
    }
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val conjuncts = splitAnd(j.condition.get)
    val dist = conjuncts.collectFirst {
      case p @ DistPredicate(ax, bx, ay, by, r2)
          if crossPair(j, ax, bx, ay, by) => (p, ax, bx, ay, by, r2)
    }
    dist.map { case (pred, ax, bx, ay, by, r2) =>
      // orient: (lx, ly) from the left child, (rx, ry) from the right
      val leftHasA = ax.references.subsetOf(j.left.outputSet)
      val (lx, ly, rx, ry) =
        if (leftHasA) (ax, ay, bx, by) else (bx, by, ax, ay)
      // cell size one ulp ABOVE the radius: sqrt's rounding may round
      // down, and a cell smaller than the radius breaks the 3×3 cover
      val s = Literal(Math.nextUp(math.sqrt(r2)), DoubleType)
      def cell(e: Expression): Expression =
        Cast(Floor(Divide(e, s)), LongType)
      val one = Literal(1L, LongType)
      def covering(c: Expression): Expression =
        CreateArray(Seq(Subtract(c, one), c, Add(c, one)))

      // left: two chained generates → the 3×3 covering cells
      val cxAttr = AttributeReference(s"${CellPrefix}_lx", LongType)()
      val cyAttr = AttributeReference(s"${CellPrefix}_ly", LongType)()
      val genX = Generate(Explode(covering(cell(lx))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(cxAttr), child = j.left)
      val genY = Generate(Explode(covering(cell(ly))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(cyAttr), child = genX)

      // right: project the single cell per axis
      val rxAlias = Alias(cell(rx), s"${CellPrefix}_rx")()
      val ryAlias = Alias(cell(ry), s"${CellPrefix}_ry")()
      val proj = Project(j.right.output :+ rxAlias :+ ryAlias, j.right)

      val others = conjuncts.filterNot(_ eq pred)
      val newCond = (others :+
        EqualTo(cxAttr, rxAlias.toAttribute) :+
        EqualTo(cyAttr, ryAlias.toAttribute) :+ pred).reduce(And)
      Project(j.output, Join(genY, proj, Inner, Some(newCond), j.hint))
    }
  }
}
