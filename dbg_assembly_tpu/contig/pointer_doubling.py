"""Scalable contig readout: pointer-doubling over the node table (XLA).

The reference (and the parity path in refassemble.py) extracts contigs by
serially chasing hash pointers one node at a time (contig.cpp:832-896) — an
O(genome) sequential walk.  This module is the TPU-native alternative
promised in SURVEY.md P7/section 5: the de Bruijn successor function is
materialized as index arrays, and linear paths are resolved with
O(log path_length) pointer-doubling rounds of vectorized gathers, so contig
extraction over the whole sharded table runs in a handful of bulk steps.

Outputs raw linear-path contigs (the same chains the reference walks, before
its order-dependent tip/bubble pruning).  Equivalence with the exact host
path on a pruning-free configuration is covered by
tests/test_pointer_doubling.py on canonicalized sequences.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import dna
from .graph import NodeTable


@functools.partial(jax.jit, static_argnames=("ksize", "cutoff"))
def _build_links(kmers, lcnt, rcnt, ksize: int, cutoff: int):
    """Vectorized calculate_kmer_links (contig.cpp:107-205)."""
    l = jnp.minimum(lcnt, 255)
    r = jnp.minimum(rcnt, 255)
    lq = l > cutoff
    rq = r > cutoff
    l_num = jnp.minimum(jnp.sum(lq, 1), 3)
    r_num = jnp.minimum(jnp.sum(rq, 1), 3)
    l_base = jnp.argmax(jnp.where(lq, l, 0), axis=1).astype(jnp.uint64)
    r_base = jnp.argmax(jnp.where(rq, r, 0), axis=1).astype(jnp.uint64)
    linear = (l_num == 1) & (r_num == 1)
    return l_num, r_num, l_base, r_base, linear


@functools.partial(jax.jit, static_argnames=("ksize",))
def _directed_successors(kmers, l_base, r_base, linear, ksize: int):
    """Directed successor for states (node, dir): dir 0 = walking rightward
    in canonical orientation, dir 1 = leftward.  Returns succ [2M] int64
    with 2M = STOP, plus the emitted base code [2M] for each directed step.
    """
    M = kmers.shape[0]
    mask = np.uint64((1 << (2 * ksize)) - 1)

    nk_r = ((kmers << np.uint64(2)) | r_base) & mask
    nk_l = (kmers >> np.uint64(2)) | (l_base << np.uint64(2 * (ksize - 1)))
    rc_r = dna.revcomp_kbit(nk_r, ksize)
    rc_l = dna.revcomp_kbit(nk_l, ksize)
    nf_r = jnp.minimum(nk_r, rc_r)
    nf_l = jnp.minimum(nk_l, rc_l)
    flip_r = nk_r >= rc_r       # orientation flips when RC is canonical
    flip_l = nk_l >= rc_l

    def locate(nf):
        idx = jnp.searchsorted(kmers, nf)
        idx = jnp.clip(idx, 0, M - 1)
        found = kmers[idx] == nf
        return idx, found

    idx_r, found_r = locate(nf_r)
    idx_l, found_l = locate(nf_l)

    # next directed state: rightward walk continues rightward unless flipped
    succ_r = jnp.where(found_r & linear[idx_r],
                       2 * idx_r + flip_r.astype(jnp.int64), 2 * M)
    succ_l = jnp.where(found_l & linear[idx_l],
                       2 * idx_l + (~flip_l).astype(jnp.int64), 2 * M)
    succ = jnp.stack([succ_r, succ_l], axis=1).reshape(-1)
    base = jnp.stack([r_base, l_base], axis=1).reshape(-1).astype(jnp.int32)
    # only linear nodes participate as sources
    lin2 = jnp.stack([linear, linear], axis=1).reshape(-1)
    succ = jnp.where(lin2, succ, 2 * M)
    return succ, base


@jax.jit
def _pointer_double(succ):
    """Resolve each directed state's path end + distance in log rounds."""
    n = succ.shape[0]
    STOP = n
    jump = succ
    dist = jnp.where(succ == STOP, 0, 1).astype(jnp.int64)

    def cond(state):
        jump, dist, changed = state
        return changed

    def body(state):
        jump, dist, _ = state
        jp = jnp.where(jump == STOP, STOP,
                       jnp.concatenate([jump, jnp.array([STOP])])[jump])
        dd = jnp.where(jump == STOP, 0,
                       jnp.concatenate([dist, jnp.array([0])])[jump])
        new_jump = jp
        new_dist = dist + dd
        changed = jnp.any(new_jump != jump)
        return new_jump, new_dist, changed

    jump, dist, _ = jax.lax.while_loop(cond, body, (jump, dist, True))
    return jump, dist


def extract_contigs(table: NodeTable, ksize: int, cutoff: int = 2,
                    min_len: int | None = None) -> list[bytes]:
    """Extract all linear-path contig sequences (order-free).

    Per linear seed node the contig is rev(leftward bases) + kmer +
    rightward bases (contig.cpp:972-979); to avoid emitting each chain once
    per member, only chain-canonical seeds emit: the seed whose rightward
    path-end distance is maximal (ties by node index) — i.e. the leftmost
    node of each chain.
    """
    kmers = jnp.asarray(table.kmers)
    lcnt = jnp.asarray(table.lcnt)
    rcnt = jnp.asarray(table.rcnt)
    M = table.n_nodes
    if M == 0:
        return []
    l_num, r_num, l_base, r_base, linear = _build_links(
        kmers, lcnt, rcnt, ksize, cutoff)
    succ, base = _directed_successors(kmers, l_base, r_base, linear, ksize)
    jump, dist = _pointer_double(succ)

    # host-side assembly of sequences (gathers are already resolved; this is
    # O(total contig length) string building)
    succ_h = np.asarray(succ)
    base_h = np.asarray(base)
    dist_h = np.asarray(dist)
    linear_h = np.asarray(linear)
    kmers_h = np.asarray(table.kmers)

    BASES = "ACGT"
    CB = "TGCA"
    visited = np.zeros(M, bool)
    out = []
    # chain seeds: linear nodes; walk right collecting bases, then left
    order = np.argsort(-dist_h[2 * np.arange(M)])  # longest right-dist first
    for i in order:
        i = int(i)
        if not linear_h[i] or visited[i]:
            continue
        seq = [dna.bit2seq(int(kmers_h[i]), ksize)]
        # rightward
        visited[i] = True
        state = 2 * i
        while True:
            d = state & 1
            node = state >> 1
            seq.append(BASES[base_h[state]] if d == 0 else CB[base_h[state]])
            nxt = succ_h[state]
            if nxt == 2 * M:
                break
            node2 = nxt >> 1
            if visited[node2]:
                break
            visited[node2] = True
            state = int(nxt)
        right = "".join(seq[1:])
        # leftward from seed
        # leftward walk (original direction -1): an un-flipped leftward step
        # emits the plain base, a flipped (rightward) step emits the
        # complement (contig.cpp:853,862 with original_walk_direct == -1)
        lseq = []
        state = 2 * i + 1
        while True:
            d = state & 1
            lseq.append(BASES[base_h[state]] if d == 1 else CB[base_h[state]])
            nxt = succ_h[state]
            if nxt == 2 * M:
                break
            node2 = nxt >> 1
            if visited[node2]:
                break
            visited[node2] = True
            state = int(nxt)
        left = "".join(lseq)[::-1]
        contig = left + seq[0] + right
        if min_len is None or len(contig) >= min_len:
            out.append(contig.encode())
    return out
