"""Edit-distance scoring: PER with the 61->39 TIMIT protocol.

Reference capability: decode -> collapse -> map 61->39 -> edit distance ->
PER on dev/test (SURVEY.md §2a C9, §3.4). The inner loop is the native C++
batch scorer (qasr/native/edit_distance.cpp) when it builds; a pure-numpy
fallback keeps the module dependency-free.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from qasr.data.timit import FOLD_61_TO_39, ID_TO_PHONE

try:
    from qasr.native import batch_per_native as _native_batch
    from qasr.native import edit_distance_native as _native_ed
    # force the build now so failures fall back immediately
    _native_ed([1], [1])
except Exception:  # pragma: no cover - native toolchain unavailable
    _native_batch = None
    _native_ed = None

# Stable index over the folded 39-phone inventory (plus a catch-all).
FOLDED_39 = sorted({p for p in FOLD_61_TO_39.values() if p is not None})
_FOLD39_INDEX = {p: i + 1 for i, p in enumerate(FOLDED_39)}


def fold_ids_to_39_ids(ids: Sequence[int]) -> list[int]:
    """61-phone ids -> folded 39-phone ids ('q' deleted)."""
    out = []
    for i in ids:
        p = ID_TO_PHONE.get(int(i))
        if p is None:
            continue
        f = FOLD_61_TO_39.get(p, p)
        if f is not None:
            out.append(_FOLD39_INDEX[f])
    return out


def _edit_distance_py(ref, hyp) -> int:
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


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance (substitution/insertion/deletion cost 1)."""
    if _native_ed is not None:
        try:
            r = [int(x) for x in ref]
            h = [int(x) for x in hyp]
            return _native_ed(r, h)
        except (TypeError, ValueError):
            pass  # non-integer sequences (e.g. strings) -> python path
    return _edit_distance_py(list(ref), list(hyp))


def per_counts(ref_ids: Sequence[int], hyp_ids: Sequence[int], *, fold: bool = True):
    """-> (errors, ref_len) after optional 61->39 folding.

    PER = sum(errors)/sum(ref_len) over the eval set; numerator/denominator
    are kept separate so multi-host DP decode can psum them (SURVEY.md §3.4).
    """
    if fold:
        ref = fold_ids_to_39_ids(ref_ids)
        hyp = fold_ids_to_39_ids(hyp_ids)
    else:
        ref = [int(x) for x in ref_ids]
        hyp = [int(x) for x in hyp_ids]
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
    if fold:
        # fold each row, re-pad, then score natively
        b = len(ref_lens)
        f_refs, f_hyps = [], []
        for i in range(b):
            f_refs.append(fold_ids_to_39_ids(refs[i, : int(ref_lens[i])]))
            f_hyps.append(fold_ids_to_39_ids(hyps[i, : int(hyp_lens[i])]))
        max_r = max((len(r) for r in f_refs), default=1) or 1
        max_h = max((len(h) for h in f_hyps), default=1) or 1
        r_arr = np.zeros((b, max_r), np.int32)
        h_arr = np.zeros((b, max_h), np.int32)
        r_lens = np.array([len(r) for r in f_refs], np.int32)
        h_lens = np.array([len(h) for h in f_hyps], np.int32)
        for i in range(b):
            r_arr[i, : r_lens[i]] = f_refs[i]
            h_arr[i, : h_lens[i]] = f_hyps[i]
        refs, ref_lens, hyps, hyp_lens = r_arr, r_lens, h_arr, h_lens

    if _native_batch is not None:
        return _native_batch(refs, ref_lens, hyps, hyp_lens)

    errs = total = 0
    for i in range(len(ref_lens)):
        r = refs[i, : int(ref_lens[i])]
        h = hyps[i, : int(hyp_lens[i])]
        errs += _edit_distance_py(list(r), list(h))
        total += int(ref_lens[i])
    return errs, total
