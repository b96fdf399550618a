"""Exact sorted-into-sorted lookup via merge-path partitioning.

The rulebook build queries each kernel offset's shifted key array against the
level's sorted key table (``rulebook.build_subm_table``).  Because the
queries of one offset are the table keys plus a constant, they are
*themselves sorted* — finding their positions is a **merge** of two sorted
arrays, not a search.  ``jnp.searchsorted(method='sort')`` pays for a full
co-sort (O((M+Q) log²) compare rounds on TPU); this computes the same
positions with O(M+Q) work:

1. **diagonal partition** (classic GPU merge-path): binary-search ``D``-wide
   diagonals of the merge so chunk ``j`` consumes queries ``[a_j, a_{j+1})``
   and table rows ``[b_j, b_{j+1})`` with both widths ≤ ``D``;
2. **chunk count**: for each chunk, positions = ``b_j + #(table-slice ≤ q)``
   over a fixed ``D``-row table slice — a [D, D] compare+reduce on the VPU;
3. **scatter** per-chunk results to their query rows.

Ties (query == table key, i.e. a *hit*) break table-first: strict ``<`` in
the diagonal search, ``<=`` in the count.  Works for any integer dtype;
sentinel padding (e.g. ``hashgrid.PAD_KEY`` = int32 max) sorts last by
construction.  NOTE: like ``hashgrid.lookup`` misses, a query equal to the
sentinel "finds" the sentinel row — callers mask PAD queries out of
``found`` themselves.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

__all__ = ["merge_lookup"]

# Route every scatter's dropped/duplicate rows to DISTINCT overflow slots so
# the scatter can be declared unique_indices=True (XLA's serialized general
# scatter vs its vectorized unique path) — A/B gate, default on.
_UNIQ = os.environ.get("TPU3DWSIS_UNIQ_SCATTER", "1") != "0"


@functools.partial(jax.jit, static_argnames=("chunk",))
def merge_lookup(table: jax.Array, queries: jax.Array, chunk: int = 256):
    """Positions of sorted ``queries`` in sorted ``table``.

    Returns ``(pos, found)`` with :func:`tpu3dwsis.ops.hashgrid.lookup`
    semantics: ``pos[i]`` = ``searchsorted(table, q, side='left')`` clipped
    to ``M-1``; ``found[i]`` = exact hit.  Both inputs sorted ascending.

    Precondition: non-sentinel table keys must be UNIQUE (a PAD-sentinel
    tail is fine — queries can never equal it).  With duplicate keys the
    counting formulation below returns the LAST equal index, not the
    left-most one; voxel key tables satisfy uniqueness by construction.
    """
    m = table.shape[0]
    q = queries.shape[0]
    d = chunk
    n_chunks = -(-(m + q) // d)

    dt = table.dtype
    big = jnp.iinfo(dt).max
    small = jnp.iinfo(dt).min
    # sentinel-padded copies so fixed-size dynamic slices stay in bounds
    t_pad = jnp.concatenate([table, jnp.full((d,), big, dt)])
    q_pad = jnp.concatenate([queries.astype(dt), jnp.full((d,), big, dt)])

    # ---- merge-path diagonal search: for diagonal total j*d find a_j =
    # #queries consumed (moderngpu MergePath, bounds-lower: advance the
    # query side while q[mid] < t[diag - mid - 1]; ties consume table first)
    diag = jnp.arange(n_chunks + 1, dtype=jnp.int32) * d
    lo = jnp.maximum(diag - m, 0)
    hi = jnp.minimum(diag, q)

    def bs_body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        t_idx = jnp.clip(diag - mid - 1, 0, m + d - 1)
        q_val = q_pad[jnp.clip(mid, 0, q + d - 1)]
        t_val = jnp.where(diag - mid - 1 < 0, small, t_pad[t_idx])
        pred = q_val < t_val
        lo = jnp.where(pred, mid + 1, lo)
        hi = jnp.where(pred, hi, mid)
        return lo, hi

    n_iter = math.ceil(math.log2(max(m, q) + 2)) + 1
    lo, hi = jax.lax.fori_loop(0, n_iter, bs_body, (lo, hi))
    a = lo  # [n_chunks+1] query split per diagonal
    b = diag - a  # table split

    # ---- per-chunk count: pos = b_j + #(table_slice <= query) ----
    def chunk_count(a_j, b_j, a_next, base):
        qs = jax.lax.dynamic_slice(q_pad, (a_j,), (d,))
        ts = jax.lax.dynamic_slice(t_pad, (b_j,), (d,))
        cnt = jnp.sum(ts[None, :] <= qs[:, None], axis=1).astype(jnp.int32)
        lane = jnp.arange(d, dtype=jnp.int32)
        idx = a_j + lane
        valid = idx < a_next
        # invalid lanes go to DISTINCT slots past q (chunk-base + lane), so
        # every scatter index is unique: valid targets are the disjoint
        # ranges [a_j, a_next), invalid ones live in [q, q + n_chunks*d)
        fallback = q + base + lane if _UNIQ else jnp.int32(q)
        return jnp.where(valid, b_j + cnt, 0), jnp.where(valid, idx, fallback)

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * d
    counts, idxs = jax.vmap(chunk_count)(a[:-1], b[:-1], a[1:], bases)
    table_len = (q + n_chunks * d) if _UNIQ else (q + 1)
    cnt_of = (
        jnp.zeros((table_len,), jnp.int32)
        .at[idxs.reshape(-1)]
        .set(counts.reshape(-1), mode="drop", unique_indices=_UNIQ)[:q]
    )

    # cnt = #(t <= q); hit iff cnt>0 and table[cnt-1]==q
    pos_hit = jnp.maximum(cnt_of - 1, 0)
    found = (cnt_of > 0) & (table[pos_hit] == queries.astype(dt))
    # miss: searchsorted-left position is cnt itself (no equal element)
    pos = jnp.where(found, pos_hit, jnp.minimum(cnt_of, m - 1))
    return pos.astype(jnp.int32), found
