"""Reference-parity contig run log (cerr stream of debruijn_contig).

Reproduces the reference's progress/summary log line-for-line (modulo the
"Run time" values, which are CPU-time measurements): parameter echo
(DBG_contig/main.cpp:130-158), hash init + per-10k-block heartbeat +
per-file totals (DBGgraph.cpp:380-430, 217-290), hash-parameter block
(kmerSet.cpp:331-338), link/pruning/readout summaries (contig.cpp:58-100,
192-196, 353-354, 577-578, 771-772, 1036-1041) and the closing banners
(main.cpp:205-210).  tests/test_runlog.py diffs this against the actual
reference binary's stderr with timings normalized.
"""

from __future__ import annotations

import time

from ..io.stat import fmt_g6 as _g


class ContigRunLog:
    def __init__(self, stream, params, prefix: str, fmt: int,
                 max_read_len: int, threads: int = 10,
                 buffer_reads: int = 10_000, max_doublings: int = 10):
        self.f = stream
        self.p = params
        self.prefix = prefix
        self.fmt = fmt
        self.max_read_len = max_read_len
        self.threads = threads
        self.buffer_reads = buffer_reads
        self.max_doublings = max_doublings
        self._t0 = time.process_time()
        self.total_reads = 0
        self.total_kmers = 0

    def _w(self, s: str = ""):
        self.f.write(s + "\n")
        self.f.flush()

    def _runtime(self):
        self._w(f"Finished! Run time: {_g(time.process_time() - self._t0)}")

    # ------------------------------------------------------------- blocks
    def parameters(self):
        p = self.p
        self._w("\nProgram parameters setting:")
        self._w(f"   -k <int>   set kmer size, default={p.ksize}")
        self._w("   -r <int>   set maximum allowed read length, "
                f"default={self.max_read_len}")
        self._w("   -f <int>   set the input file format: 1: fq|gz"
                f"(one-line), 2: fa|gz(one-line), default={self.fmt}")
        self._w(f"   -o <str>   set the output prefix, default = "
                f"{self.prefix}")
        self._w("   -t <int>   run the program in multiple thread mode, "
                f"default={self.threads}")
        self._w("   -i <float>  set initialization size (uint:G) of "
                "kmer-hash, memory consumption(* 16 G bytes), "
                f"default={_g(p.init_hash_size)}G")
        self._w("   -l <float>  set loading factor of the hash, "
                f"default={_g(p.load_factor)}")
        self._w("   -e <int>  max doubling times of hash size allowed to "
                f"enlarge memory consumption, default={self.max_doublings}")
        self._w("   -b <int>  buff size: number of reads loading into the "
                f"buffer memory, default={self.buffer_reads}")
        self._w("   -D <int>   delete kmer-links with frequency no larger "
                f"than, default={p.kmer_freq_cutoff}")
        self._w("   -T <int>   wheter cut off tip branches, 1:yes; 0:no; "
                f"default={int(p.is_remove_tip)}")
        self._w("   -I <int>   set the max allowed tip length, "
                f"default={p.tip_len_cutoff}")
        self._w("   -P <float>  set the max allowed tip depth, "
                f"default={_g(p.tip_depth_cutoff)}")
        self._w("   -W <int>   wheter cut off low coverage edges between "
                "two branching nodes, 1:yes; 0:no; "
                f"default={int(p.is_remove_lowedge)}")
        self._w("   -C <int>    set the max allowed length for low "
                f"coverage edges, default={p.lowedge_len_cutoff}")
        self._w("   -G <float>  set the max allowed depth for low "
                f"coverage edges, default={_g(p.lowedge_depth_cutoff)}")
        self._w("   -B <int>   wheter cut off bubble branches, 1:yes; "
                f"0:no; default={int(p.is_remove_bubble)}")
        self._w("   -U <int>   set the max allowed bubble length, "
                f"default={p.bubble_len_cutoff}")
        self._w("   -L <float>   set the max allowed length difference "
                "rate between the two bubbles, "
                f"default={_g(p.bubble_len_diff_rate)}")
        self._w("   -E <float>  set the max allowed base difference rate "
                "between the two bubbles, "
                f"default={_g(p.bubble_base_diff_rate)}")
        self._w("   -M <int>    set the minimum length for contig to "
                f"output, default={p.contig_len_cutoff}")
        self._w()

    def hash_init(self):
        self._w("Start to initialize the kmerset hash")
        self._w(f"Hash initialization array size:  "
                f"{_g(self.p.init_hash_size)} G")
        self._w(f"The initialization memory used:  "
                f"{_g(self.p.init_hash_size * 16)} G")
        self._runtime()
        self._w("\nparse input reads files: ")

    def file_start(self, path: str):
        self._w(f"\nStart to parse reads file: {path}")

    def file_blocks(self, read_lengths, ksize: int, file_start: int = 0,
                    enlarges=None, alerts=None):
        """Emit the per-buffer heartbeat groups for one file, given the
        per-read lengths of the reads actually INGESTED (already truncated
        to max_read_len).  Mirrors parse_one_reads_file: every load attempt
        prints a group; the attempt that loads fewer than a full buffer
        (possibly zero) prints the end-of-file line.

        enlarges: {global read ordinal at a full-buffer boundary: new hash
        size} — the Enlarge lines of DBGgraph.cpp:343-344; alerts:
        {boundary ordinal: Total_reads_num} — the degrade Alert of
        DBGgraph.cpp:348, after which the file loop breaks (no further
        groups, no end-of-file line)."""
        n = len(read_lengths)
        b = self.buffer_reads
        off = 0
        while True:
            loaded = min(b, n - off)
            off += loaded
            self.total_reads += loaded
            self._w(f"\n{self.threads} children threads created!")
            self._w(f"Load reads block {self.total_reads}")
            if loaded < b:
                self._w("this block has reach the end of file ")
            self._w("chop reads to kmers done")
            self._w("add kmers to hash done")
            if loaded < b:
                break
            q = file_start + off
            if enlarges and q in enlarges:
                size = enlarges[q]
                self._w(f"Enlarge hash array size to be: {size}")
                self._w(f"The expanded memory used now:  "
                        f"{_g(size / 1000000000 * 16)} G")
            if alerts and q in alerts:
                self._w("\nAlert message: Memory reach the maximum "
                        f"allowed, program have loaded {alerts[q]} reads, "
                        "the left others are ignored\n")
                break
        for ln in read_lengths:
            if ln >= ksize:
                self.total_kmers += int(ln) - ksize + 1

    def file_end(self):
        self._w(f"\nTotal number of reads loaded into memory: "
                f"{self.total_reads}")
        self._w(f"Total number of kmers loaded into memory: "
                f"{self.total_kmers}")
        self._runtime()

    def hash_params(self, size: int, count: int, conflicts: int):
        self._w("\nKmerset hash parameters:")
        self._w("element_size:\t16")
        self._w(f"array_size:\t{size}")
        self._w(f"load_factor:\t{_g(self.p.load_factor)}")
        self._w(f"max_cutoff:\t{int(size * self.p.load_factor)}")
        self._w("iter_ptr:\t0")
        self._w(f"count:\t{count}")
        self._w(f"conflict:\t{conflicts}")
        self._w("\nLoad reads, chop kmer, build kmer graph finished !")

    def links(self, st):
        total = st.total_nodes
        self._w("\nStart to calulate kmer links information!")

        def ratio(x):
            return _g(x / total if total else 0.0)
        self._w(f"\nTotal kmer nodes number:    {total}")
        self._w(f"Deleted lowfreq kmer nodes: {st.deleted_lowfreq}\t"
                f"{ratio(st.deleted_lowfreq)}")
        self._w(f"Used linear kmer nodes:     {st.linear_nodes}\t"
                f"{ratio(st.linear_nodes)}")
        self._w(f"Used tip kmer nodes:        {st.tip_candidates}\t"
                f"{ratio(st.tip_candidates)}")
        self._w(f"Used branching kmer nodes:  {st.branch_candidates}\t"
                f"{ratio(st.branch_candidates)}")
        self._runtime()

    def pruning(self, st):
        p = self.p
        if p.is_remove_tip:
            self._w("\nStart to remove tips caused by sequencing error!")
            self._w(f"\nremove total tip number:  {st.tips_removed}")
            self._w(f"remove total tip length:  {st.tip_len_removed}")
            self._runtime()
        if p.is_remove_lowedge:
            self._w("\nStart to remove small low coverage edges between "
                    "two branching nodes!")
            self._w(f"\nremove total lowCovEdge number: "
                    f"{st.lowedges_removed}")
            self._w(f"remove total lowCovEdge length: "
                    f"{st.lowedge_len_removed}")
            # reference typo reproduced (contig.cpp:82)
            self._w(f"Finshed! Run time: "
                    f"{_g(time.process_time() - self._t0)}")
        if p.is_remove_bubble:
            self._w("\nStart to remove bubbles caused by repeats and "
                    "heterozygotes!")
            self._w(f"\nremove total bubble number: {st.bubbles_removed}")
            self._w(f"remove total bubble length: {st.bubble_len_removed}")
            self._runtime()

    def readout(self, st, break_points: int, branch_points: int):
        self._w("\nStart to read out contig sequence and the depth "
                "information!")
        self._w(f"\ncontig break-point number:     {break_points}")
        self._w(f"contig branch-point number:    {branch_points}")
        self._w(f"\nTotal contig number:   {st.contig_num}")
        self._w(f"Total contig length:   {st.contig_len}")
        self._w(f"\nTotal small edge number:   {st.small_num}")
        self._w(f"Total small edge length:   {st.small_len}")
        self._runtime()
        self._w("\nRemove tips, merge bubbles, output contig sequence "
                "finished !")
        self._w("\nAssembly completely finished!")


def count_end_marks(prefix: str) -> tuple[int, int]:
    """(break_points, branch_points) recovered from the emitted contig +
    small headers: two end marks per record, 'branch' vs break
    (contig.cpp:990-1000)."""
    brk = 0
    bra = 0
    for suffix in (".contig.seq.fa", ".contig.small.fa"):
        with open(prefix + suffix, "rb") as f:
            for line in f:
                if not line.startswith(b">"):
                    continue
                for key in (b"LeftEndKmer: ", b"RightEndKmer: "):
                    i = line.index(key) + len(key)
                    mark = line[i:].split(b"\t", 1)[0].split(b" ", 1)[1]
                    if mark.split(b"-", 1)[0] == b"branch":
                        bra += 1
                    else:
                        brk += 1
    return brk, bra
