"""Batched beam search as a single fixed-shape ``lax.while_loop``.

Capability parity with the reference's Tensor2Tensor-port
(multimodal/beam_search.py:232-701): alive/finished frontiers, 2x-beam
candidate expansion, GNMT length penalty ((5 + len)/6)^alpha, and the early
stopping bound — but shape-static and jittable end to end, where the
reference drives a Python ``while`` loop from the host (beam_search.py:
669-680). Decode length bounds the loop; state reindexing is a gather
instead of ``gather_nd``/``map_structure`` tricks.

``symbols_to_logits_fn(ids, states) -> (logits, states)`` operates on a
flattened [B*W] beam batch; states is any pytree with leading dim B*W.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e7


def _length_penalty(length: jax.Array, alpha: float) -> jax.Array:
    return jnp.power((5.0 + length.astype(jnp.float32)) / 6.0, alpha)


def _gather_beams(t: jax.Array, indices: jax.Array) -> jax.Array:
    """t: [B, W_in, ...]; indices: [B, W_out] -> [B, W_out, ...]."""
    return jnp.take_along_axis(
        t, indices.reshape(indices.shape + (1,) * (t.ndim - 2)), axis=1)


def beam_search(
    symbols_to_logits_fn: Callable[[jax.Array, Any], Tuple[jax.Array, Any]],
    initial_ids: jax.Array,   # [B] int32 (e.g. SOS)
    beam_size: int,
    decode_length: int,
    vocab_size: int,
    alpha: float = 0.0,
    states: Any = None,
    eos_id: int = 3,
    stop_early: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (seq [B, W, decode_length + 1], scores [B, W]) sorted
    best-first; scores are length-penalized log probabilities."""
    B, W = initial_ids.shape[0], beam_size
    T = decode_length + 1

    # replicate everything over the beam dim; only beam 0 is live initially
    alive_seq = jnp.zeros((B, W, T), jnp.int32)
    alive_seq = alive_seq.at[:, :, 0].set(initial_ids[:, None])
    alive_log_probs = jnp.tile(
        jnp.array([[0.0] + [NEG_INF] * (W - 1)]), (B, 1))

    def expand_to_beam(x):
        return jnp.broadcast_to(
            x[:, None], (B, W) + x.shape[1:]).reshape((B * W,) + x.shape[1:])

    states = jax.tree_util.tree_map(expand_to_beam, states) \
        if states is not None else None

    finished_seq = jnp.zeros((B, W, T), jnp.int32)
    finished_scores = jnp.full((B, W), NEG_INF)
    finished_flags = jnp.zeros((B, W), bool)

    def cond(loop):
        i, alive_seq, alive_log_probs, states, f_seq, f_scores, f_flags = loop
        max_pen = _length_penalty(jnp.asarray(decode_length), alpha) \
            if alpha > 0.0 else 1.0
        # best possible score any alive beam could still reach
        alive_bound = alive_log_probs[:, 0] / max_pen
        if stop_early:
            # top-1 guarantee only: stop once the best finished hypothesis
            # can no longer be beaten (reference default,
            # beam_search.py:647-657)
            finished_bound = f_scores.max(axis=1)
        else:
            # full-beam guarantee: keep going while any of the W finished
            # slots could still be displaced (beam_search.py:638-646)
            finished_bound = jnp.full(
                (f_scores.shape[0],), f_scores.min())
        improvement_possible = jnp.logical_not(
            jnp.all(finished_bound > alive_bound))
        return jnp.logical_and(i < decode_length, improvement_possible)

    def body(loop):
        i, alive_seq, alive_log_probs, states, f_seq, f_scores, f_flags = loop

        ids = alive_seq[:, :, i].reshape(B * W)
        logits, new_states = symbols_to_logits_fn(ids, states)
        log_probs = jax.nn.log_softmax(
            logits.astype(jnp.float32)).reshape(B, W, vocab_size)

        cand = alive_log_probs[:, :, None] + log_probs  # [B, W, V]
        flat = cand.reshape(B, W * vocab_size)
        topk_lp, topk_idx = jax.lax.top_k(flat, 2 * W)
        topk_beam = topk_idx // vocab_size            # [B, 2W]
        topk_id = topk_idx % vocab_size

        seq = _gather_beams(alive_seq, topk_beam)      # [B, 2W, T]
        seq = seq.at[:, :, i + 1].set(topk_id)
        is_eos = topk_id == eos_id

        # ---- new alive: best W non-EOS candidates
        alive_cand_lp = jnp.where(is_eos, NEG_INF, topk_lp)
        new_alive_lp, alive_sel = jax.lax.top_k(alive_cand_lp, W)
        new_alive_seq = _gather_beams(seq, alive_sel)
        alive_orig_beam = jnp.take_along_axis(topk_beam, alive_sel, axis=1)

        def reindex(s):
            flat_s = s.reshape((B, W) + s.shape[1:])
            return _gather_beams(flat_s, alive_orig_beam).reshape(s.shape)

        new_states = jax.tree_util.tree_map(reindex, new_states) \
            if new_states is not None else None

        # ---- new finished: EOS candidates, length-penalized with the
        # number of generated tokens (reference: beam_search.py:478)
        pen = _length_penalty(jnp.asarray(i + 1), alpha)
        fin_cand_scores = jnp.where(is_eos, topk_lp / pen, NEG_INF)
        all_scores = jnp.concatenate([f_scores, fin_cand_scores], axis=1)
        all_seq = jnp.concatenate([f_seq, seq], axis=1)
        all_flags = jnp.concatenate(
            [f_flags, is_eos & (fin_cand_scores > NEG_INF / 2)], axis=1)
        new_f_scores, f_sel = jax.lax.top_k(all_scores, W)
        new_f_seq = _gather_beams(all_seq, f_sel)
        new_f_flags = jnp.take_along_axis(all_flags, f_sel, axis=1)

        return (i + 1, new_alive_seq, new_alive_lp, new_states,
                new_f_seq, new_f_scores, new_f_flags)

    loop = (jnp.asarray(0), alive_seq, alive_log_probs, states,
            finished_seq, finished_scores, finished_flags)
    (_, alive_seq, alive_log_probs, _, f_seq, f_scores, f_flags) = \
        jax.lax.while_loop(cond, body, loop)

    # batches with no finished hypothesis fall back to alive beams
    # (reference: beam_search.py:683-697)
    any_finished = f_flags.any(axis=1)
    seq = jnp.where(any_finished[:, None, None], f_seq, alive_seq)
    # unfinished batches return raw alive log probs (beam_search.py:689-696)
    scores = jnp.where(any_finished[:, None], f_scores, alive_log_probs)
    # drop the initial SOS position? the reference returns sequences
    # including the start token; keep it for parity.
    return seq, scores
