package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Marker for this library's per-row EXPENSIVE Catalyst kernels — the
  * expressions PlanLint's `inlined-expensive-*` rules treat as "must
  * never be computed twice per row". A marker trait, not a
  * package-name match, because (a) [[ComputeOnce]] lives in this
  * package but is a BARRIER, not a cost — matching it flagged two
  * canonically-equal barriered copies as a hazard — and (b) a future
  * kernel defined outside `graft.functions` would silently escape a
  * string-prefix lint. Mix this into every new kernel expression;
  * cheap wrappers and optimizer barriers stay unmarked. */
trait CostlyKernel { self: Expression => }
