from qasr.ops.ctc import ctc_greedy_decode
from qasr.decode.beam import ctc_beam_search_decode
from qasr.decode.scoring import batch_per, edit_distance, per_counts

__all__ = [
    "ctc_greedy_decode",
    "ctc_beam_search_decode",
    "batch_per",
    "edit_distance",
    "per_counts",
]
