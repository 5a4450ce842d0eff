"""CDC lake engine: change-event synthesis, exactly-once replay, oracle."""

from .engine import CDCLakeEngine, key_hash_partition_cols, lww_winner_indices
from .oracle import naive_replay, sha256_of_state, sha256_of_table
from .synth import synth_change_events

__all__ = [
    "CDCLakeEngine", "key_hash_partition_cols", "lww_winner_indices",
    "naive_replay", "sha256_of_state", "sha256_of_table",
    "synth_change_events",
]
