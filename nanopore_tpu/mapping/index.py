"""Reference k-mer index: the seeding stage of the unified mapper.

Replaces the index structures of the four reference aligners (bwa's
FM-index, LAST/BLASR suffix arrays, lastz seed tables — reference
``nanopore/mappers/{bwa,last,lastz,blasr}.py``) with one sorted k-mer
table built host-side with vectorised NumPy: lookup is a batched
``searchsorted``, which keeps the hot path allocation-free and ready to
swap for the C++ runtime extension.

Coordinates are global over the concatenated contigs; contigs are
separated by k-1 N sentinels so no k-mer spans a boundary.
"""

from __future__ import annotations

import numpy as np
from dataclasses import dataclass

from nanopore_tpu.io.encoding import encode, BASE_N


def kmer_codes(codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(kmer integer codes, validity mask) over all length-k windows."""
    if len(codes) < k:
        return np.empty(0, np.int64), np.empty(0, bool)
    windows = np.lib.stride_tricks.sliding_window_view(codes, k)
    powers = (4 ** np.arange(k - 1, -1, -1)).astype(np.int64)
    kmers = windows.astype(np.int64) @ powers
    valid = (windows < 4).all(axis=1)
    return kmers, valid


@dataclass
class KmerIndex:
    k: int
    contig_names: list[str]
    contig_offsets: np.ndarray  # (C+1,) global start offsets
    ref_codes: np.ndarray  # (total,) int8 concatenated with sentinels
    sorted_kmers: np.ndarray  # (H,) int64 sorted kmer codes of kept positions
    sorted_positions: np.ndarray  # (H,) int32 global positions, kmer-sorted
    max_occ: int

    @staticmethod
    def build(
        ref_dict: dict[str, str], k: int = 13, max_occ: int = 256
    ) -> "KmerIndex":
        names = list(ref_dict.keys())
        sep = np.full(k - 1, BASE_N, np.int8)
        parts, offsets = [], [0]
        total = 0
        for i, name in enumerate(names):
            codes = encode(ref_dict[name])
            parts.append(codes)
            total += len(codes)
            offsets.append(total + (k - 1) * (i + 1))
            parts.append(sep)
        ref_codes = (
            np.concatenate(parts) if parts else np.empty(0, np.int8)
        )
        offsets = np.array(
            [0] + [offsets[i + 1] for i in range(len(names))], np.int64
        )

        from nanopore_tpu.runtime import native_index

        native = native_index.build_index(ref_codes, k)
        if native is not None:
            sorted_kmers, sorted_positions = native_index.mask_repeats(
                *native, max_occ
            )
        else:
            kmers, valid = kmer_codes(ref_codes, k)
            positions = np.nonzero(valid)[0].astype(np.int32)
            kmers = kmers[valid]
            order = np.argsort(kmers, kind="stable")
            sorted_kmers = kmers[order]
            sorted_positions = positions[order]

            # drop over-represented seeds (repeat masking, cf. lastz
            # --hspthresh / last -m occurrence limits)
            if len(sorted_kmers):
                uniq, starts, counts = np.unique(
                    sorted_kmers, return_index=True, return_counts=True
                )
                keep_runs = counts <= max_occ
                keep = np.zeros(len(sorted_kmers), bool)
                for s, c in zip(starts[keep_runs], counts[keep_runs]):
                    keep[s : s + c] = True
                sorted_kmers = sorted_kmers[keep]
                sorted_positions = sorted_positions[keep]

        return KmerIndex(
            k=k,
            contig_names=names,
            contig_offsets=offsets,
            ref_codes=ref_codes,
            sorted_kmers=sorted_kmers,
            sorted_positions=sorted_positions,
            max_occ=max_occ,
        )

    # ------------------------------------------------------------------ #
    def global_to_contig(self, gpos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Global positions -> (contig index, local position)."""
        cidx = (
            np.searchsorted(self.contig_offsets, gpos, side="right") - 1
        ).clip(0, len(self.contig_names) - 1)
        return cidx, gpos - self.contig_offsets[cidx]

    def contig_length(self, cidx: int) -> int:
        end = self.contig_offsets[cidx + 1] if cidx + 1 < len(
            self.contig_offsets
        ) else len(self.ref_codes) + self.k - 1
        return int(end - self.contig_offsets[cidx] - (self.k - 1))

    def contig_codes(self, cidx: int) -> np.ndarray:
        start = int(self.contig_offsets[cidx])
        return self.ref_codes[start : start + self.contig_length(cidx)]

    # ------------------------------------------------------------------ #
    def lookup(
        self, read_codes: np.ndarray, stride: int = 1
    ) -> tuple[np.ndarray, np.ndarray]:
        """All seed hits of a read: (global ref positions, read positions).

        ``stride > 1`` probes only every stride-th read k-mer (sparse
        seeding — the standard long-read mapper trade; the chainer
        absorbs the anchor-density loss on multi-kb reads).  Fully
        vectorised fallback: one batched searchsorted over the read's
        k-mers, then a cumsum-based group expansion.
        """
        from nanopore_tpu.runtime import native_index

        native = native_index.lookup(
            self.sorted_kmers, self.sorted_positions, read_codes, self.k,
            stride=stride,
        )
        if native is not None:
            return native

        kmers, valid = kmer_codes(read_codes, self.k)
        qpos_all = np.nonzero(valid)[0].astype(np.int32)
        kmers = kmers[valid]
        if stride > 1:
            keep = (qpos_all % stride) == 0
            qpos_all = qpos_all[keep]
            kmers = kmers[keep]
        if len(kmers) == 0 or len(self.sorted_kmers) == 0:
            return np.empty(0, np.int32), np.empty(0, np.int32)
        lo = np.searchsorted(self.sorted_kmers, kmers, side="left")
        hi = np.searchsorted(self.sorted_kmers, kmers, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, np.int32), np.empty(0, np.int32)
        # expand groups: index into sorted_positions for each hit
        group = np.repeat(np.arange(len(kmers)), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(total) - np.repeat(starts, counts)
        ref_pos = self.sorted_positions[np.repeat(lo, counts) + within]
        read_pos = qpos_all[group]
        return ref_pos, read_pos
