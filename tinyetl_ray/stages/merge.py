"""Vectorized last-writer-wins (LWW) merge.

The heart of the engine. Replaces TinyETL's "truncate-and-rewrite or blind
append" target semantics (/root/reference/src/transfer.rs:92-118) and its
declared-but-unimplemented ``--skip-existing`` dedup
(/root/reference/src/cli.rs:45-47) with real idempotent upsert semantics:

    winner of key (conv_id, turn_idx) = event with max (ts, lsn)
    winner.op == 'delete'  → key absent from merged table
    winner.op == 'upsert'  → winner's payload row

Because (ts, lsn) is a total order per key, LWW is associative and
commutative: reducing any sub-batch first and re-reducing later yields the
same winner. Two consequences we exploit:

1. **Combiner**: ``lww_reduce(keep_deletes=True)`` runs per input batch
   BEFORE the shuffle, collapsing same-key churn locally and cutting
   all-to-all volume (the Ray-native analog of pre-aggregation —
   ray_guide "Aggregation at scale"). Deletes must be KEPT here: a local
   delete winner still has to beat older upserts from other batches.
2. **Idempotent replay**: applying the same change batch twice is a no-op,
   which is what makes task retries + exactly-once commits safe.

Everything is Arrow-kernel vectorized — one multi-key sort + one adjacent-
equality scan per batch; no Python loop over rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import KEY_COLS


def _last_per_key_mask(t: pa.Table) -> pa.Array:
    """Boolean mask selecting the LAST row of each consecutive key run.

    ``t`` must already be sorted by KEY_COLS (ts/lsn order within key does
    not matter for the mask). Vectorized: adjacent-row equality via sliced
    Arrow compare kernels.
    """
    n = len(t)
    if n == 0:
        return pa.array([], pa.bool_())
    same = None
    for k in KEY_COLS:
        col = t.column(k).combine_chunks()
        eq = pc.equal(col.slice(0, n - 1), col.slice(1, n - 1))
        eq = pc.fill_null(eq, False)
        same = eq if same is None else pc.and_(same, eq)
    # row i is last of its run iff NOT same(i, i+1); row n-1 always last
    is_last = pc.invert(same)
    return pa.concat_arrays([is_last, pa.array([True])])


def lww_reduce(t: pa.Table, keep_deletes: bool) -> pa.Table:
    """Reduce a change table to one winner row per (conv_id, turn_idx).

    keep_deletes=True  → combiner mode: winning delete events survive as rows
                         (op == 'delete') so they can beat remote upserts.
    keep_deletes=False → final mode: winning deletes remove the key; output
                         still carries op/lsn columns (caller projects).
    """
    if len(t) == 0:
        return t
    idx = pc.sort_indices(
        t,
        sort_keys=[(k, "ascending") for k in KEY_COLS]
        + [("ts", "ascending"), ("lsn", "ascending")],
    )
    t = t.take(idx)
    t = t.filter(_last_per_key_mask(t))
    if not keep_deletes:
        t = t.filter(pc.equal(t.column("op"), "upsert"))
    return t


def finalize_payload(t: pa.Table, drop_cols: tuple[str, ...] = ("lsn", "op")) -> pa.Table:
    """Project merged winners to the transcript payload, sorted by key for
    deterministic reads (SURVEY.md §7.3 'stable turn ordering')."""
    keep = [c for c in t.column_names if c not in drop_cols]
    t = t.select(keep)
    if len(t):
        t = t.take(pc.sort_indices(t, sort_keys=[(k, "ascending") for k in KEY_COLS]))
    return t


class PreReduce:
    """``map_batches`` combiner stage: collapse same-key churn inside each
    batch before the shuffle. Stateless, zero-copy Arrow in/out."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return lww_reduce(batch, keep_deletes=True)
