package graft.graph

import org.apache.spark.sql.DataFrame

/** The one plan-instability probe shared by every algorithm that
  * lazily re-evaluates its input plan (KCore's lazy edge pin,
  * Louvain's per-sweep edge re-evaluation) — single-sourced
  * (round-15 review) so the next unstable node type is added ONCE,
  * not per algorithm.
  *
  * Catches the instability Catalyst can NAME: Sample nodes (the seed
  * is a constructor arg, not a nondeterministic Expression — plan
  * level is the only place to see it), LocalLimit/GlobalLimit (an
  * un-ordered limit may legally return different rows per
  * evaluation; a sorted limit pinned anyway costs one redundant
  * checkpoint), and nondeterministic expressions anywhere in the
  * tree. What it CANNOT see is a leaf whose re-scan is inherently
  * unstable (an RDD recomputed from nondeterministic upstream, an
  * external source mutating between scans) — leaf determinism on
  * re-scan is the callers' documented contract. */
object PlanStability {
  def isUnstable(df: DataFrame): Boolean =
    df.queryExecution.analyzed.find {
      case _: org.apache.spark.sql.catalyst.plans.logical.Sample => true
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalLimit => true
      case _: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => true
      // Offset is the same un-ordered-row-selection class as limit
      // (round-15 review, second pass)
      case _: org.apache.spark.sql.catalyst.plans.logical.Offset => true
      case p => p.expressions.exists(e => !e.deterministic)
    }.isDefined
}
