"""Change-batch decode / validate stage.

The Ray-native analog of TinyETL's per-row schema validation loop
(/root/reference/src/transfer.rs:154-159, src/schema.rs:148-244), rebuilt as
a vectorized ``map_batches`` stage over zero-copy Arrow:

- cast every batch to the evolved (union) change schema, backfilling columns
  that an older epoch lacked with nulls (additive schema evolution);
- validate op ∈ {upsert, delete}, non-null lsn / key columns;
- invalid rows are either dropped (``on_error="drop"``, dead-letter counted
  in a ``_invalid`` column consumed by metrics) or fail the job
  (``on_error="raise"`` — the reference's abort-on-error behavior,
  /root/reference/src/main.rs:260-264).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import CHANGE_SCHEMA, align_to


class DecodeValidate:
    """Callable for ``ds.map_batches(DecodeValidate(schema), batch_format="pyarrow")``.

    Stateless by design (plain function semantics) but written as a class so
    the evolved schema is captured once; cheap to ship to tasks.
    """

    def __init__(
        self,
        change_schema: pa.Schema | None = None,
        on_error: str = "raise",
        quarantine_dir: str | None = None,
    ):
        self.schema = change_schema or CHANGE_SCHEMA
        if on_error not in ("raise", "drop", "quarantine"):
            raise ValueError(
                f"on_error must be raise|drop|quarantine, got {on_error!r}"
            )
        if on_error == "quarantine" and not quarantine_dir:
            raise ValueError("on_error='quarantine' requires quarantine_dir")
        self.on_error = on_error
        self.quarantine_dir = quarantine_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = align_to(batch, self.schema)
        ok = pc.and_kleene(
            pc.is_in(t.column("op"), value_set=pa.array(["upsert", "delete"])),
            pc.and_kleene(
                pc.and_kleene(
                    pc.is_valid(t.column("lsn")),
                    # ts is the LWW tiebreak and lww_reduce sorts it with
                    # nulls last — an unvalidated null-ts event would win
                    # every merge unconditionally
                    pc.is_valid(t.column("ts")),
                ),
                pc.and_kleene(
                    pc.is_valid(t.column("conv_id")),
                    # non-null AND non-negative: turn_idx routes to a
                    # floor-division turn block, and read_conversation
                    # enumerates candidate blocks from 0 — a negative index
                    # would commit fine but be invisible to the pruned read
                    pc.greater_equal(t.column("turn_idx"), 0),
                ),
            ),
        )
        ok = pc.fill_null(ok, False)
        n_bad = len(t) - pc.sum(pc.cast(ok, pa.int64())).as_py()
        if n_bad:
            if self.on_error == "raise":
                bad = t.filter(pc.invert(ok)).slice(0, 3)
                raise ValueError(
                    f"{n_bad} malformed change events; first: {bad.to_pylist()}"
                )
            if self.on_error == "quarantine":
                # dead-letter: bad rows land in the quarantine dir for later
                # inspection/repair instead of vanishing (the reference just
                # aborts; silent drops hide producer bugs at 10^10 events)
                import os
                import uuid

                import pyarrow.parquet as pq

                bad = t.filter(pc.invert(ok))
                os.makedirs(self.quarantine_dir, exist_ok=True)
                name = os.path.join(
                    self.quarantine_dir, f"bad-{uuid.uuid4().hex[:12]}.parquet"
                )
                pq.write_table(bad, name + ".tmp")
                os.replace(name + ".tmp", name)
            t = t.filter(ok)
        return t
