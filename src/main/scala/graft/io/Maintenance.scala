package graft.io

/** One recommended maintenance action from an index's
  * `maintenancePlan()` — the telemetry-driven answer to "WHEN do I run
  * compactIndex / rebucket / compactDeletes / recover*", which is
  * otherwise the operator's guesswork. Every signal is computed from
  * the index's OWN sidecars and listings (markers, per-bucket file
  * counts, corpus scalars, tombstone sidecars, manifest segment
  * counts) — no data scan, so a fleet scheduler can poll plans across
  * thousands of indexes for the cost of a directory listing each.
  *
  * `value` is the observed metric, `threshold` the policy bound it
  * crossed, `suggestion` an action parameter when the action takes one
  * (rebucket's proposed new bucket count; 0 = none). An empty plan
  * means the index needs nothing. Recovery actions (interrupted
  * swap/reorg, torn generations) PREEMPT everything else: when one is
  * present it is the only row, because no other maintenance can run —
  * or even be sized — over a torn layout. */
final case class MaintenanceAction(
    action: String,
    metric: String,
    value: Long,
    threshold: Long,
    suggestion: Long,
    detail: String)
