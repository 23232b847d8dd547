package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrites a pure point-in-interval non-equi inner
  * join
  *
  *   points JOIN intervals ON p >= lo AND p <= hi      -- no equi key
  *
  * into the binned equi-join [[graft.ops.RangeJoin]] implements at the
  * DataFrame level — so SQL users and ad-hoc BETWEEN joins get the
  * scale-safe plan automatically. Without the rewrite Spark has no
  * equi key to hash on and plans BroadcastNestedLoopJoin: O(|points| ×
  * |intervals|) comparisons and a full broadcast of one side — the
  * canonical 100 TB scale-killer.
  *
  * Rewrite (bin width W):
  *   - interval side gains `explode(sequence(floor(lo/W), floor(hi/W)))`
  *     (a Generate node — one row per covered bin);
  *   - point side gains `floor(p/W)` (a Project);
  *   - the join becomes `ptBin = ivBin AND <original condition>` — an
  *     equi-join Spark plans as shuffle hash / sort-merge, with the
  *     original range predicate kept as the exact residual filter.
  *
  * A point lies in exactly one bin, so each qualifying pair meets in
  * exactly one bin — no duplicates, no post-join dedup. Null keys:
  * `sequence(null, …)` explodes to zero rows and a null point bin
  * never equi-matches, exactly like the original condition evaluating
  * to NULL.
  *
  * Bin width (`spark.graft.rangeJoin.binWidth`):
  *   - unset or `auto` (the default): derived per join from the DATA —
  *     the median interval span `hi - lo + 1` over a bounded prefix
  *     sample of the interval side, executed as a tiny planning-time
  *     job ([[sampledWidth]]). Width ≈ median span keeps the
  *     replication factor (bins per interval) at ~2 while a bin's
  *     point population stays proportional to the span scale, and —
  *     unlike any fixed constant — it is unit-correct whether the
  *     keys are epoch days, micros, or ids.
  *   - a positive long: fixed width in key units (the hand-tuned
  *     escape hatch; also what the spec suite pins plan shapes with).
  *   - `0`, negative, or unparsable: rule disabled.
  *
  * Fires only when airtight:
  *   - inner join whose condition's conjuncts contain a lower and an
  *     upper bound on the SAME point expression from one side against
  *     expressions from the other side (>=/> and <=/< in either
  *     written order), all deterministic, all integral (int/long);
  *   - NO equi conjunct between the sides exists (if one does, Spark
  *     already has a hash key and binning would only add work);
  *   - the interval side's estimated size clears the small-side
  *     guard (below) — tiny band tables keep their one-pass
  *     broadcast loop.
  *
  * Strict bounds are accepted: the bin range of [lo, hi] is a superset
  * of (lo, hi)'s, and the residual predicate re-applies exactness.
  */
object RangeJoinRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.binWidth"

  /** Interval sides at or below this estimated size keep Spark's
    * broadcast nested loop: against a literal band table (j9's 3-row
    * quantity bands) the nested loop is one map-only pass and binning
    * would only add an explode + shuffle. This is a COMPUTE bound,
    * not a broadcastability bound — a merely broadcast-ABLE (≤10MB,
    * ~100k-row) interval side still costs |points|·|intervals|
    * compares under BNLJ, so the default stays small. */
  val SmallSideConf = "spark.graft.rangeJoin.smallSideBytes"

  /** Rows fetched by the planning-time span probe. A prefix sample
    * (executeTake walks partitions until satisfied), so it reads at
    * most a few input splits regardless of table size; width is a
    * robustness heuristic, not an exactness requirement, so prefix
    * bias is acceptable. */
  private val SampleRows = 4096

  private sealed trait Mode
  private case object Off extends Mode
  private case object Auto extends Mode
  private final case class Fixed(w: Long) extends Mode

  private def mode: Mode = {
    val raw = conf.getConfString(WidthConf, "auto").trim.toLowerCase
    if (raw.isEmpty || raw == "auto") Auto
    else
      try { val n = raw.toLong; if (n > 0) Fixed(n) else Off }
      catch { case _: NumberFormatException => Off }
  }

  private def smallSideBytes: Long =
    try conf.getConfString(SmallSideConf, "8192").toLong catch {
      case _: NumberFormatException => 8192L
    }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType => true
    case _ => false
  }

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** floor(e / w) on longs: integral divide truncates toward zero, so
    * shift negative non-exact quotients down one. */
  private def binOf(e: Expression, w: Long): Expression = {
    val el = asLong(e)
    val wl = Literal(w, LongType)
    val q = IntegralDivide(el, wl)
    If(And(LessThan(el, Literal(0L)), Not(EqualTo(Pmod(el, wl), Literal(0L)))),
      Subtract(q, Literal(1L)), q)
  }

  /** Probe results memoized by (canonicalized interval subplan, bound
    * exprs rendered by name). Planning the same join twice — explain()
    * then execute, AQE re-optimization, a query re-run, or the same
    * dimension subplan appearing under several joins — must not re-run
    * the probe job. Width is a robustness heuristic, so serving a
    * cached value to a structurally identical subplan over changed
    * data is acceptable. Keyed by a plan FINGERPRINT (canonicalized
    * semanticHash + bound-expr SQL), not the plan tree itself, so the
    * JVM-global map never pins LogicalPlan trees (and their relation
    * metadata) in memory; a fingerprint collision at worst serves a
    * suboptimal bin width — plan shape only, never results. Bounded:
    * wholesale-cleared past 128 shapes. */
  private val widthCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), Option[Long]]()

  /** Median interval span (`hi - lo + 1`) over a bounded prefix of
    * the interval side, run as its own planning-time job (memoized —
    * see [[widthCache]]). The probe is a bare Project over the
    * (already resolved) interval subplan, so it carries the subplan's
    * own filters/aggregates; it contains no join, so this rule cannot
    * re-fire on it. COST: executeTake is a prefix sample — over a leaf
    * scan it reads a few input splits, but when the interval side is
    * itself an aggregate/join subplan its upstream stages execute once
    * to produce that prefix (then the result is cached per shape; set
    * a fixed `spark.graft.rangeJoin.binWidth` to avoid the probe
    * entirely). Returns None (no rewrite) when the side is empty or
    * spans are degenerate. */
  private def sampledWidth(iv: LogicalPlan, lo: Expression,
      hi: Expression): Option[Long] = {
    import org.apache.spark.sql.classic.SparkSession
    val session = SparkSession.getActiveSession.getOrElse(return None)
    val key = (iv.canonicalized.semanticHash(), s"${lo.sql}|${hi.sql}")
    val hit = widthCache.get(key)
    if (hit != null) return hit
    val span = Alias(
      Add(Subtract(asLong(hi), asLong(lo)), Literal(1L)), "__graft_span")()
    try {
      val rows = session.sessionState.executePlan(Project(Seq(span), iv))
        .executedPlan.executeTake(SampleRows)
      val spans = rows.iterator
        .filterNot(_.isNullAt(0)).map(_.getLong(0)).filter(_ > 0).toArray
      val computed =
        if (spans.isEmpty) None
        else {
          java.util.Arrays.sort(spans)
          Some(spans(spans.length / 2))
        }
      if (widthCache.size >= 128) widthCache.clear()
      widthCache.put(key, computed)
      computed
    } catch {
      // a failed probe must never fail the query — fall back to no
      // rewrite (Spark's own nested-loop plan). NOT cached: a
      // transient failure should not pin the fallback plan forever.
      case scala.util.control.NonFatal(e) =>
        logWarning(s"range-join width probe failed, skipping rewrite: $e")
        None
    }
  }

  /** The (point, lo, hi, pointOnLeft) decomposition, if the condition
    * is a rewritable pure range join. */
  private def rangeKeys(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def fromLeft(e: Expression) = e.references.subsetOf(left.outputSet)
    def fromRight(e: Expression) = e.references.subsetOf(right.outputSet)
    def crossPair(a: Expression, b: Expression): Boolean =
      (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))
    // an existing cross-side equi conjunct means Spark already has a
    // hash key; binning would be pure overhead
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossPair(a, b)
      case EqualNullSafe(a, b) => crossPair(a, b)
      case _ => false
    }
    if (hasEqui) return None
    // normalize each conjunct to (point, bound, isLower) candidates
    // keyed by which side the point expression comes from
    sealed case class B(p: Expression, bound: Expression, lower: Boolean,
      pLeft: Boolean)
    def norm(c: Expression): Seq[B] = {
      def mk(p: Expression, bnd: Expression, lower: Boolean): Seq[B] =
        if (fromLeft(p) && fromRight(bnd)) Seq(B(p, bnd, lower, pLeft = true))
        else if (fromRight(p) && fromLeft(bnd)) Seq(B(p, bnd, lower, pLeft = false))
        else Nil
      c match {
        case GreaterThanOrEqual(a, b) => mk(a, b, lower = true) ++ mk(b, a, lower = false)
        case GreaterThan(a, b)        => mk(a, b, lower = true) ++ mk(b, a, lower = false)
        case LessThanOrEqual(a, b)    => mk(a, b, lower = false) ++ mk(b, a, lower = true)
        case LessThan(a, b)           => mk(a, b, lower = false) ++ mk(b, a, lower = true)
        case _ => Nil
      }
    }
    val bounds = conjuncts.flatMap(norm)
      .filter(b => b.p.deterministic && b.bound.deterministic &&
        integral(b.p) && integral(b.bound))
    // pair a lower and an upper bound on the same point expression
    val pair = for {
      loB <- bounds if loB.lower
      hiB <- bounds if !hiB.lower && hiB.pLeft == loB.pLeft &&
        hiB.p.semanticEquals(loB.p)
    } yield (loB.p, loB.bound, hiB.bound, loB.pLeft)
    pair.headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val m = mode
    if (m == Off) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rangeKeys(cond, left, right) match {
          case Some((p, lo, hi, pLeft))
              if (if (pLeft) right else left).stats.sizeInBytes >
                smallSideBytes =>
            val ptChild = if (pLeft) left else right
            val ivChild = if (pLeft) right else left
            val wOpt = m match {
              case Fixed(w) => Some(w)
              case Auto => sampledWidth(ivChild, lo, hi)
              case Off => None // unreachable
            }
            wOpt match {
              case Some(w) =>
                val ptAlias = Alias(binOf(p, w), "__pt_bin")()
                val ptProj = Project(ptChild.output :+ ptAlias, ptChild)
                val ivBin = AttributeReference("__iv_bin", LongType,
                  nullable = false)()
                // Sequence is TimeZoneAwareExpression: it only resolves
                // with a timezone bound, and ResolveTimeZone ran before us
                val ivGen = Generate(
                  Explode(Sequence(binOf(lo, w), binOf(hi, w), None,
                    Some(conf.sessionLocalTimeZone))),
                  unrequiredChildIndex = Nil, outer = false, qualifier = None,
                  generatorOutput = Seq(ivBin), child = ivChild)
                val equi = EqualTo(ptAlias.toAttribute, ivBin)
                val newJoin =
                  if (pLeft) Join(ptProj, ivGen, Inner, Some(And(equi, cond)), hint)
                  else Join(ivGen, ptProj, Inner, Some(And(equi, cond)), hint)
                Project(j.output, newJoin)
              case None => j // probe found nothing usable
            }
          case _ => j // not a pure range join, or tiny interval side
        }
    }
  }
}
