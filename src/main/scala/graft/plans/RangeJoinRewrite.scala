package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite a naive interval join into the banded
  * equi-join shape of [[graft.operators.RangeJoin]] — automatically, at the
  * LOGICAL PLAN level, so any user query written as
  *
  *   `a.join(b, keyEq && bv > av + lo && bv <= av + hi)`
  *
  * (long-typed values; `keyEq` optional) stops executing as a
  * BroadcastNestedLoopJoin (keyless) or a per-key-quadratic hash join
  * (hot keys) and becomes a shuffled equi-join on a quantized bin key,
  * with the ORIGINAL predicate kept as a residual — the rewrite can never
  * change results, only the join's physical shape.
  *
  * Scope (deliberately narrow, correctness first):
  *  - inner joins only;
  *  - both bounds present, anchored on the same pair of long-typed,
  *    deterministic, single-side expressions (timestamps participate via
  *    `unix_micros(ts)`, which is how this library writes time columns);
  *  - bound offsets must be foldable literals (post-constant-folding they
  *    are, for any `+ 300000000L` / `+ INTERVAL`-derived constant);
  *  - either orientation (the interval may anchor on the left or the
  *    right child — the anchor side gets the two-bin explode);
  *  - RUNTIME anchor values are guarded, not assumed (round 8): bin
  *    endpoints compute anchor ± offset in long arithmetic, which wraps
  *    for |anchor| ≥ 2^61 — so anchors outside (−2^61, 2^61) are routed
  *    to a residual union leg that joins with the ORIGINAL predicate
  *    instead of the bin equi-key. Literal offsets are capped at 2^61 by
  *    `widthOk`; µs-epoch timestamps sit near 2^50, so on real data the
  *    residual leg keeps no rows — its out-of-range filter is PUSHED
  *    to the scan, so parquet row-group stats prune the read and the
  *    leg streams zero rows (no exchange exists in the keyless leg, so
  *    this scan-level pruning, not AQE, is what makes it free).
  *
  * OFF by default; enable with `spark.graft.rangeJoin.rewrite=true`. The
  * declared `join_range` query calls the operator directly — this rule is
  * the transparent path for queries that don't know the operator exists,
  * and the §4 demonstration that the operator tier (c) — a real
  * `Rule[LogicalPlan]` via `SparkSessionExtensions.injectOptimizerRule` —
  * composes with everything else in the engine.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val Flag = "spark.graft.rangeJoin.rewrite"
  private val BinL = "__graft_bin_l"
  private val BinR = "__graft_bin_r"

  private sealed trait Kind
  private case object Lower extends Kind // value > anchor + off
  private case object Upper extends Kind // value <= anchor + off

  /** One reading of an inequality conjunct, normalized to the canonical
    * strict-lower / non-strict-upper forms above.
    */
  private case class Bound(kind: Kind, anchor: Expression, offset: Long,
      value: Expression, src: Expression)

  /** `e` as (base, additive literal): `x + 5L` → (x, 5); `5L + x` → (x, 5);
    * `x − 5L` → (x, −5) (lookback windows are naturally written with a
    * subtraction, and Catalyst does not canonicalize it to an Add);
    * anything else → (e, 0). Int literals were widened+folded to long by
    * the time user rules run. Long.MinValue is unsplittable (−c would
    * overflow) and falls through to the (e, 0) case.
    */
  private def splitAdd(e: Expression): (Expression, Long) = e match {
    case Add(b, Literal(c: Long, LongType), _) => (b, c)
    case Add(Literal(c: Long, LongType), b, _) => (b, c)
    case Subtract(b, Literal(c: Long, LongType), _) if c != Long.MinValue => (b, -c)
    case other => (other, 0L)
  }

  /** Both readings of a comparison conjunct — either side may be the
    * interval's anchor. `x > y` read with anchor y is the lower bound
    * `x > y + c`; read with anchor x it is the upper bound `y <= x + (c−1)`.
    * Offsets convert ≥/< into the canonical strict-lower / non-strict-upper.
    */
  private def bounds(c: Expression): Seq[Bound] = {
    // the strict/non-strict canonicalizations subtract 1 from the parsed
    // offset — at Long.MinValue that wraps to MaxValue and would flip the
    // bound's direction, so the reading is dropped instead (same policy as
    // splitAdd's MinValue fallthrough)
    def m1(off: Long): Option[Long] =
      if (off == Long.MinValue) None else Some(off - 1)
    def two(big: Expression, small: Expression, strict: Boolean): Seq[Bound] = {
      val (aS, cS) = splitAdd(small)
      val (aB, cB) = splitAdd(big)
      // big > small: anchor = small side → lower bound on `big`
      val lower = (if (strict) Some(cS) else m1(cS)).map(Bound(Lower, aS, _, big, c))
      // big > small ⇔ small < big: anchor = big side → upper bound on
      // `small`: small <= big + (cB − 1) (strict) / + cB (non-strict)
      val upper = (if (strict) m1(cB) else Some(cB)).map(Bound(Upper, aB, _, small, c))
      lower.toSeq ++ upper.toSeq
    }
    c match {
      case GreaterThan(x, y) => two(x, y, strict = true)
      case LessThan(x, y) => two(y, x, strict = true)
      case GreaterThanOrEqual(x, y) => two(x, y, strict = false)
      case LessThanOrEqual(x, y) => two(y, x, strict = false)
      case _ => Nil
    }
  }

  private def longDet(e: Expression): Boolean =
    e.dataType == LongType && e.deterministic

  /** Exact floor division for values whose magnitude survives the double
    * round-trip is NOT needed here: x − pmod(x, w) is always an exact
    * multiple of w, so integral (truncating) division of it is exact floor
    * division for any sign — pure long arithmetic, no doubles.
    */
  private def fdiv(x: Expression, w: Long): Expression =
    IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))

  /** Defensive fixed-point backstop (round 9). The residual leg's primary
    * terminal marker is its Cross join type: this rule matches Inner only,
    * and no current Spark optimizer rule normalizes one InnerLike subtype
    * to the other inside the operator-optimization batch — but that is
    * cross-version BEHAVIOR, not an API contract. If a future Spark
    * release ever canonicalized Cross-with-condition back to Inner, the
    * residual leg would re-match this rule every fixed-point iteration
    * (its subtree carries no banded Generate, so the MaxNestedGenerates
    * budget never trips) and the batch would only stop at its iteration
    * cap, with the plan growing a redundant leg per iteration. This check
    * recognizes the rule's OWN residual leg structurally — the anchor-side
    * child is the guard Filter planted below, whose top-level conjunct is
    * `IsNull(anchor) OR NOT (anchor > −2^61 AND anchor < 2^61)` for the
    * same anchor expression — and declines the rewrite. Top-node check
    * only, on purpose: the round-8 deep-subtree marker search made an
    * outer band join above a rewritten child decline its own rewrite
    * (anchors can be the same attribute across chained joins), so this
    * backstop inspects just the shape this rule itself emits. Keep
    * RangeJoinSpec's convergence case running against each Spark upgrade.
    */
  private def isOwnResidualLeg(anchorChild: LogicalPlan,
      anchor: Expression): Boolean = anchorChild match {
    // one optional interposed Project: in the hypothetical future this
    // backstop guards against, ColumnPruning routinely inserts Project
    // between the residual join and its guard Filter — still not a deep
    // search (one fixed level, so the round-8 outer-join regression
    // cannot recur)
    case Project(_, f: Filter) => isOwnResidualLeg(f, anchor)
    case Filter(fc, _) =>
      val cap = 1L << 61
      // the guard as planted, and as BooleanSimplification (same batch)
      // progressively normalizes it: NOT(a > −cap AND a < cap)
      // → De Morgan (NOT a > −cap OR NOT a < cap)
      // → negated comparisons (a ≤ −cap OR a ≥ cap)
      def lowCap(e: Expression): Boolean = e match {
        case Not(GreaterThan(b, Literal(lo: Long, LongType))) =>
          lo == -cap && b.semanticEquals(anchor)
        case LessThanOrEqual(b, Literal(lo: Long, LongType)) =>
          lo == -cap && b.semanticEquals(anchor)
        case _ => false
      }
      def highCap(e: Expression): Boolean = e match {
        case Not(LessThan(c, Literal(hi: Long, LongType))) =>
          hi == cap && c.semanticEquals(anchor)
        case GreaterThanOrEqual(c, Literal(hi: Long, LongType)) =>
          hi == cap && c.semanticEquals(anchor)
        case _ => false
      }
      def outOfRange(e: Expression): Boolean = e match {
        case Not(And(a, b)) => lowCap(Not(a)) && highCap(Not(b))
        case Or(a, b) => lowCap(a) && highCap(b)
        case _ => false
      }
      splitConjunctivePredicates(fc).exists {
        case Or(IsNull(a), rest) => a.semanticEquals(anchor) && outOfRange(rest)
        case Or(rest, IsNull(a)) => a.semanticEquals(anchor) && outOfRange(rest)
        case _ => false
      }
    case _ => false
  }

  /** Plan-size budget for NESTED rewrites: a chained band join's rewrite
    * duplicates its already-rewritten child subtree into the banded +
    * residual union legs, so k nested rewrites cost 2^k plan legs —
    * runtime-cheap (the duplicates carry out-of-range anchor filters
    * pushed to their scans, so row-group stats prune the read and the
    * legs stream zero rows) but
    * compile-time real: an unbounded 20-join chain would hand the
    * optimizer and codegen a ~2^20-leg plan. A child subtree already
    * carrying ≥ 15 banded Generates (= 4 nested rewrites, 16 legs)
    * declines further rewriting and the outer join runs as written —
    * graceful degradation to pre-lift behavior, never an exponential
    * plan. Parallel (non-nested) band joins see only their own subtree's
    * count, so any number of them rewrite independently.
    */
  private val MaxNestedGenerates = 15

  private def binGenerates(p: LogicalPlan): Int = p.collect {
    case g: Generate if g.generatorOutput.exists(_.name == BinL) => g
  }.size

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.getConfString(Flag, "false").toBoolean) return plan
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint)
          // Fixed-point guard: the rewrite keeps the original conjuncts as
          // residual predicates, so both produced joins still contain the
          // band pattern — each leg carries its own terminal marker.
          // Banded leg: the bin attributes in its children's output
          // (referenced by the join condition, so ColumnPruning keeps
          // them). Residual leg: its join TYPE is Cross — semantically
          // identical to Inner under the same condition (physical
          // planning, predicate pushdown, and empty-relation propagation
          // all treat InnerLike uniformly), but this rule matches Inner
          // only, so the leg can never re-enter the rewrite. The type
          // marker lives on the node itself, which every optimizer rule
          // preserves when reconstructing joins — unlike the round-8
          // planted-filter marker, whose deep subtree search made an
          // outer band join above an already-rewritten join decline its
          // own rewrite. Multi-join queries now rewrite every eligible
          // band join (RangeJoinSpec pins the chained shape), bounded by
          // the nested-rewrite budget (see MaxNestedGenerates).
          if !j.children.exists(c =>
            c.output.exists(_.name.startsWith("__graft_bin"))) &&
            j.children.iterator.map(binGenerates).sum < MaxNestedGenerates =>
        // a lower bound `value > anchor + lo` paired with an upper bound
        // `value <= anchor + hi` over the SAME (anchor, value) expressions,
        // anchor and value each sided entirely on one (opposite) child
        val sided = splitConjunctivePredicates(cond).flatMap(bounds).filter { b =>
          longDet(b.anchor) && longDet(b.value) &&
            ((b.anchor.references.subsetOf(l.outputSet) && b.anchor.references.nonEmpty &&
              b.value.references.subsetOf(r.outputSet) && b.value.references.nonEmpty) ||
             (b.anchor.references.subsetOf(r.outputSet) && b.anchor.references.nonEmpty &&
              b.value.references.subsetOf(l.outputSet) && b.value.references.nonEmpty))
        }
        // width via subtractExact: extreme opposite-sign offsets would wrap
        // hi − lo negative and rewrite into a corrupt plan — skip instead.
        // The |offset| ≤ 2^61 cap keeps the derived endpoints
        // (anchor + lo + 1, anchor + hi) overflow-free for any |anchor| ≤
        // 2^61 (unix_micros ≈ 2^51); past that, Add could wrap, making
        // Sequence(start > stop) default to step −1 — a huge descending
        // bin list — so the rewrite declines and the join runs as written.
        def widthOk(lo: Long, hi: Long): Boolean = {
          val cap = 1L << 61
          lo > -cap && hi < cap &&
            (try Math.subtractExact(hi, lo) > 0
             catch { case _: ArithmeticException => false })
        }
        val rewritten = sided.filter(_.kind == Lower).flatMap { low0 =>
          sided.find { b =>
            b.kind == Upper && (b.src ne low0.src) && widthOk(low0.offset, b.offset) &&
              b.anchor.semanticEquals(low0.anchor) && b.value.semanticEquals(low0.value)
          }.map(low0 -> _)
        }.headOption.filterNot { case (low0, _) =>
          // decline re-rewriting our own residual leg even if its Cross
          // marker were ever normalized away (see isOwnResidualLeg)
          val aChild = if (low0.anchor.references.subsetOf(l.outputSet)) l else r
          isOwnResidualLeg(aChild, low0.anchor)
        }.map { case (low0, high0) =>
          val lo = low0.offset
          val hi = high0.offset
          val w = hi - lo
          val anchorOnLeft = low0.anchor.references.subsetOf(l.outputSet)
          val (anchorChild, valueChild) = if (anchorOnLeft) (l, r) else (r, l)
          // RUNTIME anchor guard (round 8): bin endpoints compute
          // anchor ± offset in long arithmetic, which wraps for
          // |anchor| ≥ 2^61 — the scaladoc previously documented this as
          // an assumption on the data; now it is enforced. Anchor rows
          // inside the safe range take the banded equi-join; rows outside
          // it (or with a NULL anchor, which can never satisfy the
          // original predicate anyway) take a RESIDUAL leg that joins
          // with the original, un-rewritten condition. The two legs are
          // unioned, so the rewrite is total: no anchor value can be
          // silently dropped. On real data (µs-epoch ≈ 2^51) the residual
          // leg's filter keeps nothing: pushed to the scan, it prunes
          // every row group, and the leg streams zero rows (scan-level
          // pruning — the keyless leg has no exchange for AQE to act on).
          val cap = 1L << 61
          val inRange = And(GreaterThan(low0.anchor, Literal(-cap)),
            LessThan(low0.anchor, Literal(cap)))
          // anchor side: explode to the (at most two) candidate bins
          val binL = AttributeReference(BinL, LongType, nullable = false)()
          val gen = Generate(
            // Sequence is TimeZoneAware even over longs: without an explicit
            // timeZoneId the node is unresolved and the optimizer's plan
            // validation rejects the rewrite
            Explode(Sequence(
              fdiv(Add(low0.anchor, Literal(lo + 1)), w),
              fdiv(Add(low0.anchor, Literal(hi)), w), None,
              Some(SQLConf.get.sessionLocalTimeZone))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(binL), child = Filter(inRange, anchorChild))
          // value side: its single bin
          val binR = Alias(fdiv(low0.value, w), BinR)()
          val proj = Project(valueChild.output :+ binR, valueChild)
          val (nl, nr) = if (anchorOnLeft) (gen: LogicalPlan, proj: LogicalPlan)
            else (proj: LogicalPlan, gen: LogicalPlan)
          val newCond = And(EqualTo(binL, binR.toAttribute), cond)
          val mainLeg = Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
          // residual leg: out-of-range/null anchors, original predicate —
          // UNCHANGED long arithmetic, so flag-on reproduces flag-off
          // exactly even where anchor+offset wraps (non-ANSI) or throws
          // (ANSI). Joined as Cross: same semantics as Inner with this
          // condition, but terminal for this rule (see the match guard).
          // Sharing subtrees (and output exprIds) across union legs is
          // the df.union(df) shape — legs are independent scopes, no
          // cross-references.
          val resChild = Filter(Or(IsNull(low0.anchor), Not(inRange)), anchorChild)
          val (rl, rr) = if (anchorOnLeft) (resChild: LogicalPlan, valueChild)
            else (valueChild, resChild: LogicalPlan)
          val resLeg = Project(j.output, Join(rl, rr, Cross, Some(cond), hint))
          Union(Seq(mainLeg, resLeg))
        }
        rewritten.getOrElse(j)
    }
  }
}
