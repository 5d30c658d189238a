"""The from-scratch URL frontier (north rule): canonicalized+hashed
URLs, partitioned bloom seen-filter, per-host politeness priority
queue with skew lanes, batched synthetic fetch + clean + validate,
snapshot-committed state with checkpoint resume."""
