"""Hash partitioner with turn-range salting for hot conversations.

THE shuffle key of the whole engine (SURVEY.md §7.2 milestone 2). The
reference has no partitioning at all (sequential loop,
/root/reference/src/transfer.rs:148-179); at 10^10 events we hash-partition by
conversation so per-partition merge state stays bounded and merges parallelize.

Skew handling (SURVEY.md §7.3, the subtle point): a single hot conversation
with millions of turns must not pin one partition. Salting by a random number
would break correctness (all events of a given (conv_id, turn_idx) key must
meet in exactly ONE partition for LWW). So we salt by **turn range**:

    partition_id = hash64(conv_id, turn_idx // turn_block) % num_partitions

Every (conv_id, turn_idx) still maps to exactly one partition, but a hot
conversation's turn space fans out across ~n_turns/turn_block partitions.
Deterministic across processes (FNV/murmur finalize — see hashing.py), never
Python's salted ``hash``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import hash_combine, hash_strings

PARTITION_COL = "partition_id"
DEFAULT_TURN_BLOCK = 64


def partition_ids(
    conv_id: pa.ChunkedArray | pa.Array,
    turn_idx: pa.ChunkedArray | pa.Array,
    num_partitions: int,
    turn_block: int = DEFAULT_TURN_BLOCK,
) -> np.ndarray:
    h = hash_strings(conv_id)
    turn = (
        turn_idx.combine_chunks() if isinstance(turn_idx, pa.ChunkedArray) else turn_idx
    ).to_numpy()
    h = hash_combine(h, turn.astype(np.int64) // turn_block)
    return (h % np.uint64(num_partitions)).astype(np.int32)


class AddPartitionId:
    """``map_batches`` callable: append the routing column. Stateless."""

    def __init__(self, num_partitions: int, turn_block: int = DEFAULT_TURN_BLOCK):
        if num_partitions <= 0:
            raise ValueError("num_partitions must be positive")
        self.num_partitions = num_partitions
        self.turn_block = turn_block

    def __call__(self, batch: pa.Table) -> pa.Table:
        pid = partition_ids(
            batch.column("conv_id"),
            batch.column("turn_idx"),
            self.num_partitions,
            self.turn_block,
        )
        return batch.append_column(PARTITION_COL, pa.array(pid, pa.int32()))
