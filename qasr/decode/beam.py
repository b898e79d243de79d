"""Native CTC prefix beam search — jittable, fixed-shape (SURVEY.md §2b R4).

Capability parity: the reference decodes with the backend's beam search
(`K.ctc_decode(greedy=False, beam_width=W)`, a TF CPU op; SURVEY.md §2a C9,
§3.4). Here the search is a TPU-native `lax.scan` over time with static
shapes throughout, so it jits, vmaps over the batch, and runs on device:

* beam state: prefixes ``[W, L]``, (p_blank, p_nonblank) log-prob pairs;
* each frame expands W stay-candidates + W*V extend-candidates;
* duplicate prefixes (the classic prefix-merge problem, SURVEY.md §7 hard
  part (c)) are merged by sorting candidates on a rolling hash of the prefix
  and segment-logsumexp-ing equal runs — O(N log N) per frame, N = W(V+1);
* `lax.top_k` keeps the W best by total probability.

Multi-host DP decode shards utterances over hosts; PER numerators/denominators
combine via qasr.parallel.collectives.aggregate_per (SURVEY.md §3.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30
_HASH_MULT = jnp.uint32(1000003)


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.where(m <= NEG_INF / 2, 0.0, m)
    s = jnp.exp(a - m_safe) + jnp.exp(b - m_safe)
    s = jnp.where(m <= NEG_INF / 2, 1.0, s)
    return jnp.where(m <= NEG_INF / 2, NEG_INF, m_safe + jnp.log(s))


def _segment_logsumexp(vals, seg_ids, num_segments):
    """Log-space segment reduction with -inf support."""
    seg_max = jax.ops.segment_max(vals, seg_ids, num_segments=num_segments)
    seg_max = jnp.where(seg_max <= NEG_INF / 2, 0.0, seg_max)
    shifted = jnp.exp(vals - seg_max[seg_ids])
    shifted = jnp.where(vals <= NEG_INF / 2, 0.0, shifted)
    seg_sum = jax.ops.segment_sum(shifted, seg_ids, num_segments=num_segments)
    out = jnp.where(seg_sum > 0, jnp.log(jnp.maximum(seg_sum, 1e-38)) + seg_max, NEG_INF)
    return out


def _beam_search_single(
    logp: jnp.ndarray,          # [T, V] log-softmax
    length: jnp.ndarray,        # scalar frame count
    *,
    beam_width: int,
    blank_id: int,
    max_len: int,
):
    t_total, v = logp.shape
    w = beam_width
    n_cand = w + w * v

    # initial beam: slot 0 = empty prefix; others dead with distinct hashes
    prefixes0 = jnp.full((w, max_len), -1, jnp.int32)
    lens0 = jnp.zeros((w,), jnp.int32)
    hashes0 = jnp.uint32(1) + jnp.arange(w, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)
    p_b0 = jnp.full((w,), NEG_INF).at[0].set(0.0)
    p_nb0 = jnp.full((w,), NEG_INF)

    tokens = jnp.arange(v, dtype=jnp.int32)

    def step(carry, inp):
        prefixes, lens, hashes, p_b, p_nb = carry
        logp_t, t_idx = inp

        last = jnp.where(
            lens > 0,
            prefixes[jnp.arange(w), jnp.maximum(lens - 1, 0)],
            -1,
        )  # [W]
        p_tot = _logaddexp(p_b, p_nb)  # [W]

        # --- stay candidates (prefix unchanged) ---
        stay_pb = p_tot + logp_t[blank_id]
        # repeat emission keeps the collapsed prefix
        stay_pnb = jnp.where(
            lens > 0, p_nb + logp_t[jnp.maximum(last, 0)], NEG_INF
        )

        # --- extend candidates: prefix + v for every non-blank v ---
        # p_nb'' = logp[v] + (v == last ? p_b : p_tot)
        base = jnp.where(
            tokens[None, :] == last[:, None], p_b[:, None], p_tot[:, None]
        )  # [W, V]
        ext_pnb = base + logp_t[None, :]
        ext_pnb = jnp.where(tokens[None, :] == blank_id, NEG_INF, ext_pnb)
        # can't extend past max_len
        ext_pnb = jnp.where(lens[:, None] >= max_len, NEG_INF, ext_pnb)
        ext_hash = hashes[:, None] * _HASH_MULT + (tokens[None, :].astype(jnp.uint32) + 2)

        # --- assemble candidate arrays [N] ---
        cand_hash = jnp.concatenate([hashes, ext_hash.reshape(-1)])
        cand_pb = jnp.concatenate([stay_pb, jnp.full((w * v,), NEG_INF)])
        cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(-1)])
        cand_parent = jnp.concatenate(
            [jnp.arange(w, dtype=jnp.int32), jnp.repeat(jnp.arange(w, dtype=jnp.int32), v)]
        )
        cand_tok = jnp.concatenate(
            [jnp.full((w,), -1, jnp.int32), jnp.tile(tokens, w)]
        )

        # --- merge duplicates: sort by hash, segment-logsumexp ---
        order = jnp.argsort(cand_hash)
        s_hash = cand_hash[order]
        s_pb = cand_pb[order]
        s_pnb = cand_pnb[order]
        new_group = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), (s_hash[1:] != s_hash[:-1]).astype(jnp.int32)]
        )
        seg = jnp.cumsum(new_group) - 1  # [N]
        pb_m = _segment_logsumexp(s_pb, seg, n_cand)
        pnb_m = _segment_logsumexp(s_pnb, seg, n_cand)
        is_rep = new_group == 1
        pb_rep = jnp.where(is_rep, pb_m[seg], NEG_INF)
        pnb_rep = jnp.where(is_rep, pnb_m[seg], NEG_INF)
        total = _logaddexp(pb_rep, pnb_rep)

        # --- top-W and state rebuild ---
        top_total, top_idx = lax.top_k(total, w)
        sel = order[top_idx]  # indices into candidate arrays
        parent = cand_parent[sel]
        tok = cand_tok[sel]
        new_hash = cand_hash[sel]
        new_pb = jnp.where(is_rep[top_idx], pb_m[seg[top_idx]], NEG_INF)
        new_pnb = jnp.where(is_rep[top_idx], pnb_m[seg[top_idx]], NEG_INF)

        new_prefixes = prefixes[parent]
        new_lens = lens[parent]
        extend = tok >= 0
        new_prefixes = new_prefixes.at[
            jnp.arange(w), jnp.minimum(new_lens, max_len - 1)
        ].set(jnp.where(extend, tok, new_prefixes[jnp.arange(w), jnp.minimum(new_lens, max_len - 1)]))
        new_lens = new_lens + extend.astype(jnp.int32)

        # freeze past the utterance's last frame
        active = t_idx < length
        out = (
            jnp.where(active, new_prefixes, prefixes),
            jnp.where(active, new_lens, lens),
            jnp.where(active, new_hash, hashes),
            jnp.where(active, new_pb, p_b),
            jnp.where(active, new_pnb, p_nb),
        )
        return out, None

    carry0 = (prefixes0, lens0, hashes0, p_b0, p_nb0)
    (prefixes, lens, _, p_b, p_nb), _ = lax.scan(
        step, carry0, (logp, jnp.arange(t_total))
    )
    scores = _logaddexp(p_b, p_nb)
    best = jnp.argmax(scores)
    return prefixes[best], lens[best], scores[best], prefixes, lens, scores


@functools.partial(
    jax.jit, static_argnames=("beam_width", "blank_id", "max_len")
)
def ctc_beam_search_decode(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    *,
    beam_width: int = 16,
    blank_id: int = 0,
    max_len: int = 128,
):
    """Batched CTC prefix beam search.

    Args:
      logits: ``[B, T, V]`` unnormalized scores.
      logit_lengths: ``[B]`` valid frame counts.

    Returns:
      (sequences ``[B, max_len]`` padded with -1, lengths ``[B]``,
       log-score ``[B]`` of the best prefix).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    fn = functools.partial(
        _beam_search_single,
        beam_width=beam_width,
        blank_id=blank_id,
        max_len=max_len,
    )
    seq, lens, score, _, _, _ = jax.vmap(fn)(logp, logit_lengths)
    return seq, lens, score
