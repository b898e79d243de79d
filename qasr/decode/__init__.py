from qasr.ops.ctc import ctc_greedy_decode
from qasr.decode.scoring import batch_per, edit_distance, per_counts

__all__ = [
    "ctc_greedy_decode",
    "batch_per",
    "edit_distance",
    "per_counts",
]
