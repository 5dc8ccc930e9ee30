"""De Bruijn graph construction — TPU bulk path.

The reference ingests reads into a lock-free hash with per-node packed
edge counters (KmerNode{kmer, l_link, r_link} with four 8-bit saturating
counters per side — DBG_contig/kmerSet.h:70-75, DBGgraph.cpp:126-213).

TPU-first replacement (SURVEY.md P2/P5): per batch,
  1. rolling canonical k-mer chop with neighbor-base extraction
     (strand-swapped/complemented when the reverse complement is canonical,
     DBGgraph.cpp:80-89),
  2. stable sort by k-mer,
  3. segment-reduce one-hot left/right neighbor counters and segment-min of
     the global stream index (first-occurrence order, needed to reproduce
     the reference's hash-slot ordering downstream),
then a host-side streaming merge across batches.  No atomics, no CAS: the
k-mer species IS the reduction key.

Parity notes:
  * read length capped at max_read_len (DBGgraph.cpp:63);
  * N treated as A inside k-mers AND as a neighbor base (k-mer alphabet,
    DBG_contig/seqKmer.cpp:15-17);
  * neighbor base = 4 (none) at read boundaries (DBGgraph.cpp:76-89);
  * counter saturation at 255 per increment == min(total, 255);
  * poly-A/T (canonical k-mer == 0) participates like any node here; the
    readout emulator appends it last (DBGgraph.cpp:152-164,417-418).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .. import dna

SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


@functools.partial(jax.jit, static_argnames=("ksize",))
def _chop_with_edges(codes: jnp.ndarray, lengths: jnp.ndarray, ksize: int):
    """[N, L] codes -> per-position (canonical kmer, left, right, valid).

    left/right are 0..3 neighbor codes or 4 when at the read edge, already
    strand-adjusted for canonical orientation.
    """
    N, L = codes.shape
    P = L - ksize + 1
    kmers = dna.rolling_kmers(codes, ksize)                   # [N, P]
    rc = dna.revcomp_kbit(kmers, ksize)
    use_fwd = kmers <= rc                                     # DBGgraph.cpp:80
    can = jnp.where(use_fwd, kmers, rc)

    codes_i = codes.astype(jnp.int32)
    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    jlen = lengths.astype(jnp.int32)[:, None]
    has_left = pos > 0
    has_right = pos < (jlen - ksize)
    # left neighbor of window j is base j-1; right neighbor is base j+k
    lshift = jnp.concatenate(
        [jnp.zeros((N, 1), jnp.int32), codes_i[:, :P - 1]], axis=1)
    rshift = codes_i[:, ksize:ksize + P] if ksize + P <= L else \
        jnp.concatenate([codes_i[:, ksize:],
                         jnp.zeros((N, ksize + P - L), jnp.int32)], axis=1)
    left = jnp.where(use_fwd,
                     jnp.where(has_left, lshift, 4),
                     jnp.where(has_right, 3 - rshift, 4))
    right = jnp.where(use_fwd,
                      jnp.where(has_right, rshift, 4),
                      jnp.where(has_left, 3 - lshift, 4))
    valid = pos < (jlen - ksize + 1)
    can = jnp.where(valid, can, SENTINEL)
    return can, left.astype(jnp.int32), right.astype(jnp.int32), valid


@functools.partial(jax.jit, static_argnames=("ksize",))
def _aggregate_batch(codes, lengths, ksize, base_index):
    """Chop one batch and segment-reduce edge counters per unique k-mer.

    Returns (uniq [n], lcnt [n,4], rcnt [n,4], first_idx [n], n_unique,
    n_valid) — arrays padded to n = N*P with SENTINEL rows at the end.
    """
    can, left, right, valid = _chop_with_edges(codes, lengths, ksize)
    flat_k = can.reshape(-1)
    flat_l = left.reshape(-1)
    flat_r = right.reshape(-1)
    n = flat_k.shape[0]
    stream_idx = base_index + jnp.arange(n, dtype=jnp.int64)

    order = jnp.argsort(flat_k, stable=True)
    sk = flat_k[order]
    sl = flat_l[order]
    sr = flat_r[order]
    sidx = stream_idx[order]

    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    first = first & (sk != SENTINEL)
    seg_id = jnp.cumsum(first.astype(jnp.int64)) - 1        # [n], -1 for none
    n_unique = jnp.sum(first.astype(jnp.int64))

    lhot = (sl[:, None] == jnp.arange(4)[None, :]).astype(jnp.int32)
    rhot = (sr[:, None] == jnp.arange(4)[None, :]).astype(jnp.int32)
    is_valid = (sk != SENTINEL)
    lhot = jnp.where(is_valid[:, None], lhot, 0)
    rhot = jnp.where(is_valid[:, None], rhot, 0)
    seg = jnp.maximum(seg_id, 0).astype(jnp.int32)
    lcnt = jax.ops.segment_sum(lhot, seg, num_segments=n)
    rcnt = jax.ops.segment_sum(rhot, seg, num_segments=n)
    first_idx = jax.ops.segment_min(jnp.where(is_valid, sidx, jnp.int64(2**62)),
                                    seg, num_segments=n)
    uniq = jax.ops.segment_min(jnp.where(is_valid, sk, SENTINEL), seg,
                               num_segments=n)
    n_valid = jnp.sum(is_valid.astype(jnp.int64))
    return uniq, lcnt, rcnt, first_idx, n_unique, n_valid


@dataclass
class NodeTable:
    """Aggregated de Bruijn node table, sorted by k-mer value."""
    kmers: np.ndarray       # [M] uint64 canonical, sorted ascending
    lcnt: np.ndarray        # [M, 4] int32 (saturate to 255 at use site)
    rcnt: np.ndarray        # [M, 4] int32
    first_idx: np.ndarray   # [M] int64 first-occurrence stream position
    total_kmers: int = 0
    total_reads: int = 0

    @property
    def n_nodes(self) -> int:
        return len(self.kmers)


def _merge_parts(parts):
    ks = np.concatenate([p[0] for p in parts])
    ls = np.concatenate([p[1] for p in parts])
    rs = np.concatenate([p[2] for p in parts])
    fi = np.concatenate([p[3] for p in parts])
    order = np.argsort(ks, kind="stable")
    ks, ls, rs, fi = ks[order], ls[order], rs[order], fi[order]
    first = np.ones(len(ks), bool)
    first[1:] = ks[1:] != ks[:-1]
    starts = np.flatnonzero(first)
    uniq = ks[first]
    lcnt = np.add.reduceat(ls, starts, axis=0)
    rcnt = np.add.reduceat(rs, starts, axis=0)
    fmin = np.minimum.reduceat(fi, starts)
    return [(uniq, lcnt, rcnt, fmin)]


class GraphBuilder:
    """Streaming builder: feed read batches, finalize to a NodeTable."""

    def __init__(self, ksize: int, max_read_len: int = 250,
                 batch_reads: int = 100_000):
        self.ksize = ksize
        self.max_read_len = max_read_len
        self.batch_reads = batch_reads
        self.parts = []
        self.stream_pos = 0       # global k-mer position counter
        self.total_kmers = 0
        self.total_reads = 0

    def add(self, codes: np.ndarray, lengths: np.ndarray) -> None:
        if codes.shape[1] > self.max_read_len:
            codes = codes[:, :self.max_read_len]
            lengths = np.minimum(lengths, self.max_read_len)
        k = self.ksize
        for off in range(0, len(codes), self.batch_reads):
            cb = codes[off:off + self.batch_reads]
            lb = lengths[off:off + self.batch_reads]
            # skip reads shorter than k (DBGgraph.cpp:51-53)
            keep = lb >= k
            # stream index must advance PER VALID POSITION in read order;
            # padding positions between reads do not disturb relative order,
            # so a per-batch dense index block is order-correct as long as
            # batches are fed sequentially.
            cb = cb[keep]
            lb = lb[keep]
            if len(cb) == 0:
                continue
            uniq, lcnt, rcnt, fidx, n_uniq, n_valid = _aggregate_batch(
                jnp.asarray(cb), jnp.asarray(lb), k,
                jnp.int64(self.stream_pos))
            n_uniq = int(n_uniq)
            self.parts.append((np.asarray(uniq[:n_uniq]),
                               np.asarray(lcnt[:n_uniq]),
                               np.asarray(rcnt[:n_uniq]),
                               np.asarray(fidx[:n_uniq])))
            P = cb.shape[1] - k + 1
            self.stream_pos += len(cb) * P
            self.total_kmers += int(n_valid)
            self.total_reads += int(keep.sum())
            if len(self.parts) >= 8:
                self.parts = _merge_parts(self.parts)

    def finalize(self) -> NodeTable:
        if not self.parts:
            return NodeTable(np.zeros(0, np.uint64), np.zeros((0, 4), np.int32),
                             np.zeros((0, 4), np.int32), np.zeros(0, np.int64),
                             0, self.total_reads)
        self.parts = _merge_parts(self.parts)
        u, l_, r, f = self.parts[0]
        return NodeTable(u, l_, r, f, self.total_kmers, self.total_reads)


def build_from_files(files: list[str], ksize: int, fmt: str = "fq",
                     max_read_len: int = 250) -> NodeTable:
    from ..io import fastq
    gb = GraphBuilder(ksize, max_read_len)
    for path in files:
        batch = fastq.read_batch(path, fmt=fmt, strict_n=False,
                                 keep_heads=False)
        gb.add(batch.codes, batch.lengths)
    return gb.finalize()
