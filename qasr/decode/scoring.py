"""Edit-distance scoring: PER with the 61->39 TIMIT protocol.

Reference capability: decode -> collapse -> map 61->39 -> edit distance ->
PER on dev/test (SURVEY.md §2a C9, §3.4). A native C++ batch scorer
(qasr/native) accelerates large eval sweeps; this module is the always-
available numpy fallback and the public API.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from qasr.data.timit import fold_ids_to_39

try:
    from qasr.native import edit_distance_native as _native_ed
except Exception:  # native lib not built
    _native_ed = None


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance (substitution/insertion/deletion cost 1)."""
    if _native_ed is not None and all(isinstance(x, (int, np.integer)) for x in ref):
        return _native_ed(list(map(int, ref)), list(map(int, hyp)))
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = np.arange(m + 1)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        for j in range(1, m + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return int(prev[m])


def per_counts(ref_ids: Sequence[int], hyp_ids: Sequence[int], *, fold: bool = True):
    """-> (errors, ref_len) after optional 61->39 folding.

    PER = sum(errors)/sum(ref_len) over the eval set; numerator/denominator
    are kept separate so multi-host DP decode can psum them (SURVEY.md §3.4).
    """
    if fold:
        ref = fold_ids_to_39(list(map(int, ref_ids)))
        hyp = fold_ids_to_39(list(map(int, hyp_ids)))
    else:
        ref = list(map(int, ref_ids))
        hyp = list(map(int, hyp_ids))
    return edit_distance(ref, hyp), len(ref)


def batch_per(
    refs: np.ndarray,
    ref_lens: np.ndarray,
    hyps: np.ndarray,
    hyp_lens: np.ndarray,
    *,
    fold: bool = True,
) -> tuple[int, int]:
    """Accumulate (errors, ref_tokens) over a padded batch of id sequences."""
    errs = total = 0
    for i in range(len(ref_lens)):
        r = refs[i, : int(ref_lens[i])]
        h = hyps[i, : int(hyp_lens[i])]
        e, n = per_counts(r, h, fold=fold)
        errs += e
        total += n
    return errs, total
