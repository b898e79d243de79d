from qasr.ops.ctc import ctc_greedy_decode
from qasr.decode.beam import ctc_beam_search_decode
from qasr.decode.scoring import batch_per, edit_distance, per_counts


def ctc_beam_search_decode_host(logits, lengths, **kw):
    """Host-side (C++ threads) prefix beam search; falls back to the
    on-device JAX beam if the native toolchain is unavailable."""
    try:
        from qasr.native import ctc_beam_decode_native
    except Exception:  # pragma: no cover - native toolchain unavailable
        return ctc_beam_search_decode(logits, lengths, **kw)
    import numpy as np

    return ctc_beam_decode_native(np.asarray(logits), np.asarray(lengths), **kw)


__all__ = [
    "ctc_greedy_decode",
    "ctc_beam_search_decode",
    "ctc_beam_search_decode_host",
    "batch_per",
    "edit_distance",
    "per_counts",
]
