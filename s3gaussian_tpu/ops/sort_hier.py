"""Hierarchical (chunked bitonic-merge) sort for the pair streams.

Why: ``jax.lax.sort`` on TPU lowers to a bitonic comparator network that
re-traverses its operands O(log^2 M) times **through HBM** — at the
200k-gaussian bench (M = 3.3M pairs) the forward (key, slot) sort alone
moves ~13 GB/step, 16 ms of the 121 ms step, and the backward payload
sort another ~16 ms (BASELINE.md round-3 per-op table).  The comparator
passes, not the logical bytes, are the single biggest gap between the
measured step and its bytes-roofline.

Design: split the stream into C-element chunks that fit VMEM, sort each
chunk with ONE batched ``lax.sort`` over ``[n, C]`` (XLA keeps the
network VMEM-resident when C·rowbytes is a few MB), then merge pairs of
ascending runs with Batcher's bitonic merger expressed as elementwise
jnp passes:

  * crossover — ``concat(a, reverse(b))`` is bitonic, so comparing
    ``a[i]`` with ``b[L-1-i]`` splits the pair into two bitonic halves
    with ``max(lo half) <= min(hi half)``;
  * inter-chunk cleanup — compare-exchange at spans L/2 … C, each one
    fused XLA pass (reshape + lexicographic min/max);
  * intra-chunk cleanup — each chunk is now bitonic; re-sorting chunks
    with the batched ``lax.sort`` equals the remaining spans C/2 … 1.

HBM passes: 1 + sum_j (j+1) = O(log^2 (M/C)) instead of O(log^2 M) —
with C = 2^19 and M = 2^22 that is ~10 passes instead of ~253.

Exactness: callers must make the ``num_cmp`` leading rows a total order
(the rasterizer's forward sorts (key, slot) with slot unique; the
backward sorts by the slot permutation itself).  Under a total order the
result is bit-identical to stable ``lax.sort`` — every comparison is
strict, so network shape cannot matter.  ``tests/test_sort_hier.py``
checks byte-equality against ``lax.sort`` across shapes/dtypes.

Reference analog: the CUDA pipeline's ``cub::DeviceRadixSort`` over
64-bit [tile|depth] keys (rasterizer_impl.cu:290-309) — same role, TPU
idiom (no scatter primitive => comparison merge instead of radix
passes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _less_lex(a_rows, b_rows):
    """Strict lexicographic a < b over row tuples (elementwise)."""
    less = a_rows[0] < b_rows[0]
    eq = a_rows[0] == b_rows[0]
    for ar, br in zip(a_rows[1:], b_rows[1:]):
        less = less | (eq & (ar < br))
        eq = eq & (ar == br)
    return less


def _cmp_exchange(rows, num_cmp, span):
    """Ascending compare-exchange of x[i] with x[i^span] for every i whose
    span-bit is 0 (one fused pass).  ``span`` divides rows[0].size/2."""
    m = rows[0].shape[0]
    shaped = [r.reshape(m // (2 * span), 2, span) for r in rows]
    a = [s[:, 0] for s in shaped]
    b = [s[:, 1] for s in shaped]
    less = _less_lex(a[:num_cmp], b[:num_cmp])
    out = []
    for ar, br in zip(a, b):
        lo = jnp.where(less, ar, br)
        hi = jnp.where(less, br, ar)
        out.append(jnp.stack([lo, hi], 1).reshape(m))
    return out


def _crossover(rows, num_cmp, run):
    """Bitonic crossover of adjacent ascending runs of length ``run``:
    a[i] vs b[run-1-i]; afterwards each half is bitonic and
    max(lo) <= min(hi)."""
    m = rows[0].shape[0]
    shaped = [r.reshape(m // (2 * run), 2, run) for r in rows]
    a = [s[:, 0] for s in shaped]
    b_rev = [s[:, 1, ::-1] for s in shaped]
    less = _less_lex(a[:num_cmp], b_rev[:num_cmp])
    out = []
    for ar, br in zip(a, b_rev):
        lo = jnp.where(less, ar, br)
        hi = jnp.where(less, br, ar)[:, ::-1]
        out.append(jnp.stack([lo, hi], 1).reshape(m))
    return out


def _chunk_sort(rows, num_cmp, chunk):
    """Batched ascending sort of every C-chunk (one lax.sort pass)."""
    m = rows[0].shape[0]
    shaped = tuple(r.reshape(m // chunk, chunk) for r in rows)
    out = jax.lax.sort(shaped, num_keys=num_cmp, dimension=1)
    return [r.reshape(m) for r in out]


def _pad_values(rows, num_cmp, pad):
    padded = []
    for i, r in enumerate(rows):
        if i < num_cmp:
            fill = jnp.array(jnp.iinfo(r.dtype).max, r.dtype) \
                if jnp.issubdtype(r.dtype, jnp.integer) \
                else jnp.array(jnp.inf, r.dtype)
        else:
            fill = jnp.zeros((), r.dtype)
        padded.append(jnp.concatenate([r, jnp.full((pad,), fill, r.dtype)]))
    return padded


def hier_sort(rows, num_cmp: int = 1, chunk_log2: int = 19):
    """Sort 1-D ``rows`` (a tuple of equal-length arrays) ascending by the
    lexicographic order of the first ``num_cmp`` rows, carrying the rest
    as payloads.  The cmp prefix must be a total order (unique) — then the
    result is bit-identical to stable ``jax.lax.sort(rows, num_keys=
    num_cmp)``.  Pads to a power-of-two multiple of the chunk internally;
    cmp values equal to the pad sentinel (dtype max / +inf) are safe —
    pads carry an explicit tiebreaker flag row.
    """
    rows = list(rows)
    m = rows[0].shape[0]
    c = 1 << chunk_log2
    if m <= c:
        # single chunk: plain sort (pad to the next power of two only if
        # that helps nothing — lax.sort handles any length)
        return tuple(jax.lax.sort(tuple(rows), num_keys=num_cmp))
    n_chunks = -(-m // c)
    n_pow2 = 1 << (n_chunks - 1).bit_length()
    m_pad = n_pow2 * c
    has_flag = m_pad != m
    if has_flag:
        rows = _pad_values(rows, num_cmp, m_pad - m)
        # Pad-tie guard: a REAL cmp prefix may legitimately equal the pad
        # sentinel (dtype max / +inf).  Bitonic merges are not stable, so
        # on such a tie a pad row could sort AHEAD of the real row and the
        # final [:m] truncation would replace the real payload with the
        # pad's zeros.  An extra final cmp row (0 = real, 1 = pad) breaks
        # every real-vs-pad tie in the real row's favor and is a no-op
        # between real rows; it only exists when padding does.
        flag = jnp.concatenate([jnp.zeros(m, jnp.int8),
                                jnp.ones(m_pad - m, jnp.int8)])
        rows.insert(num_cmp, flag)
        num_cmp += 1

    rows = _chunk_sort(rows, num_cmp, c)
    run = c
    while run < m_pad:
        rows = _crossover(rows, num_cmp, run)
        span = run // 2
        while span >= c:
            rows = _cmp_exchange(rows, num_cmp, span)
            span //= 2
        if c > 1:
            rows = _chunk_sort(rows, num_cmp, c)
        run *= 2
    if has_flag:
        rows.pop(num_cmp - 1)
        rows = [r[:m] for r in rows]
    return tuple(rows)
