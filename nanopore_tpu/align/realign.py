"""Batched realignment: chain, then MEA-redecode every global alignment.

Replaces the reference's realignment fan-out
(/root/reference/nanopore/analyses/utils.py:540-609): where the reference
chains the SAM, then forks one OS process per record piping an exonerate
cigar through ``cactus_realign --diagonalExpansion=10
--splitMatrixBiggerThanThis=3000 --gapGamma --matchGamma`` (utils.py:587)
and splices the results back in order, we chain, batch all records
through the banded pair-HMM forward/backward + MEA decode on device, and
rewrite cigars in order — no process fan-out, no temp-file relay.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from nanopore_tpu.align.chain_sam import chain_sam_file
from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.io.encoding import encode
from nanopore_tpu.io.sam import SamReader, SamWriter, SamRecord
from nanopore_tpu.io.seqio import read_fasta_dict
from nanopore_tpu.ops.pairhmm import (
    make_kernel_params,
    prepare_banded_batch,
    forward_backward,
)
from nanopore_tpu.ops.mea import (
    mea_decode_batch,
    mea_traceback,
    rescore_by_posterior,
)
from nanopore_tpu.ops.dispatch import (
    PreparedRealign,
    local_dp_devices,
    preferred_realign_batch_size,
    prepared_from_pairs,
)


def _next_pow2(x: int) -> int:
    return 1 << max(6, (x - 1).bit_length())


def window_global_pair(
    ref_codes: np.ndarray,
    cigar: list[tuple[int, int]],
    pad: int = 128,
) -> tuple[np.ndarray, list[tuple[int, int]], int, int]:
    """Trim a GLOBAL guide cigar to the read's aligned ref window.

    Chained records are global (pos 0, cigar spans the whole
    reference), so their leading/trailing pure-deletion runs are as
    long as the flanking reference — against a megabase contig that
    costs a megabase of DP diagonals per read for zero aligned-pair
    information.  This is the banded analogue of the reference's
    ``--splitMatrixBiggerThanThis`` matrix decomposition
    (utils.py:587): realign only ``ref[j0:j1]`` around the aligned
    span (± ``pad`` ref bases of slack for the redecode to move into)
    and splice the flanking deletions back afterwards
    (:func:`splice_window_cigar`).

    Returns ``(ref_window, window_guide, j0, j1)``; the window guide
    consumes ``j1 - j0`` reference and the full read.  When the guide
    has no flanking deletions beyond ``pad`` this is the identity
    (j0 = 0, j1 = n).
    """
    from nanopore_tpu.io.sam import CIG as _C

    n = len(ref_codes)
    lead = 0
    i = 0
    while i < len(cigar) and cigar[i][0] in (_C.D, _C.N):
        lead += cigar[i][1]
        i += 1
    tail = 0
    j = len(cigar)
    while j > i and cigar[j - 1][0] in (_C.D, _C.N):
        tail += cigar[j - 1][1]
        j -= 1
    mid = list(cigar[i:j])
    if not mid:  # degenerate (no aligned read content): leave as-is
        return ref_codes, list(cigar), 0, n
    j0 = max(0, lead - pad)
    j1 = min(n, n - tail + pad)
    guide: list[tuple[int, int]] = []
    if lead - j0 > 0:
        guide.append((_C.D, lead - j0))
    guide += mid
    if j1 - (n - tail) > 0:
        guide.append((_C.D, j1 - (n - tail)))
    return ref_codes[j0:j1], guide, j0, j1


def splice_window_cigar(
    cigar: list[tuple[int, int]], j0: int, j1: int, n: int
) -> list[tuple[int, int]]:
    """Re-embed a window-global cigar into full-reference coordinates:
    prepend/append the trimmed flanking deletions, merging runs."""
    from nanopore_tpu.io.sam import CIG as _C

    out: list[tuple[int, int]] = []

    def push(op, length):
        if length <= 0:
            return
        if out and out[-1][0] == op:
            out[-1] = (op, out[-1][1] + length)
        else:
            out.append((op, length))

    push(_C.D, j0)
    for op, length in cigar:
        push(op, length)
    push(_C.D, n - j1)
    return out


def realign_records(
    records: list[SamRecord],
    ref_seqs: dict[str, str],
    model: PairHmmModel | None = None,
    gap_gamma: float = 0.5,
    match_gamma: float = 0.0,
    band_width: int = 64,
    batch_size: int | None = None,
    rescore: bool = False,
) -> list[float]:
    """Redecode the cigars of chained global records in place.

    Records must satisfy the global-alignment invariant (pos == 0, cigar
    spans the whole reference and read — utils.py:491-501).  Returns the
    per-record average posterior match probability of the NEW alignment
    when ``rescore`` (the --rescoreByPosteriorProbIgnoringGaps analogue),
    else an empty list.
    """
    from nanopore_tpu.ops.dispatch import (
        _PALLAS_BAND_WIDTHS,
        kernel_choice,
        require_gamma_safe_backend,
    )
    from nanopore_tpu.ops.posteriors import rescore_from_post

    params = make_kernel_params(model or PairHmmModel.default())
    scores: list[float] = [float("nan")] * len(records)
    batch_size = preferred_realign_batch_size(batch_size)
    # rescore on TPU: the fused kernel streams the gamma_match band
    # (emit_gamma), so redecode + rescore stay on device; elsewhere the
    # two-pass forward_backward path serves small test batches.  Band
    # widths the Pallas kernel does not serve would fall through to the
    # XLA forward_backward, whose gammas are known-wrong on TPU
    # (gamma_probe r3) — require_gamma_safe_backend below refuses that
    # combination instead of rescoring with corrupt posteriors.
    pallas_rescore = (
        rescore
        and kernel_choice() == "pallas"
        and band_width in _PALLAS_BAND_WIDTHS
    )
    if rescore and not pallas_rescore:
        require_gamma_safe_backend(band_width)

    # window each global record to its aligned ref span (the banded
    # --splitMatrixBiggerThanThis analogue: flanking pure-D runs cost a
    # diagonal per ref base for zero aligned-pair information), then
    # bucket by padded WINDOW shapes to bound recompiles
    ref_codes = {name: encode(seq) for name, seq in ref_seqs.items()}
    windows: list[tuple[int, int, list]] = []
    buckets: dict[tuple[int, int], list[int]] = {}
    for idx, rec in enumerate(records):
        assert rec.pos == 0, "realign requires chained global records"
        _, guide, j0, j1 = window_global_pair(
            ref_codes[rec.rname], rec.cigar
        )
        windows.append((j0, j1, guide))
        m = len(rec.seq)
        buckets.setdefault(
            (_next_pow2(j1 - j0), _next_pow2(m)), []
        ).append(idx)

    # single-process data parallelism: round-robin batches over the
    # local chips (each PreparedRealign is committed to its device and
    # its kernel runs there; async dispatch keeps all chips busy)
    devices = local_dp_devices()

    import itertools

    bi = itertools.count()

    def batch_descriptors():
        for (n_pad, m_pad), idxs in buckets.items():
            for s in range(0, len(idxs), batch_size):
                yield idxs[s : s + batch_size], (n_pad, m_pad)

    def build(desc):
        """Pack + launch, run on the prefetched_map worker pool: the
        host pack (fused direct pack on TPU,
        ops.dispatch.prepared_from_pairs) and the async kernel dispatch
        of several batches overlap each other and the consumer."""
        sub, (n_pad, m_pad) = desc
        pairs = []
        for idx in sub:
            rec = records[idx]
            j0, j1, guide = windows[idx]
            pairs.append(
                (ref_codes[rec.rname][j0:j1], encode(rec.seq), guide)
            )
        if rescore and not pallas_rescore:
            return sub, prepare_banded_batch(
                pairs,
                band_width=band_width,
                k_max=n_pad + m_pad,
                n_pad_to=n_pad,
                m_pad_to=m_pad,
            )
        return sub, prepared_from_pairs(
            {
                "gap_gamma": gap_gamma,
                "match_gamma": match_gamma,
                "emit_gamma": rescore,
                "device": devices[next(bi) % len(devices)],
                "emit_em": False,  # decode: no expectations
            },
            pairs,
            params,
            band_width=band_width,
            k_max=n_pad + m_pad,
            prepared_cls=PreparedRealign,
        ).launch()

    from nanopore_tpu.runtime.prefetch import prefetched_map

    for sub, prepared in prefetched_map(
        build, batch_descriptors(), depth=max(2, len(devices) + 1)
    ):
        batch = (
            prepared
            if rescore and not pallas_rescore
            else prepared.batch
        )
        if rescore and getattr(prepared, "has_gamma", False):
            # fused Pallas: dirs + gamma band in ONE kernel pass; the
            # traceback and the posterior rescore of the NEW cigars
            # both run on device (only op codes / scalars come back)
            _, cigars, fused = prepared.decode()
            res = rescore_from_post(
                fused, np.asarray(batch.offsets), cigars, band_width
            )
            for b, idx in enumerate(sub):
                j0, j1, _ = windows[idx]
                records[idx].cigar = splice_window_cigar(
                    cigars[b], j0, j1, len(ref_codes[records[idx].rname])
                )
                scores[idx] = res[b]
        elif rescore:
            offs_np = np.asarray(batch.offsets)
            # two-pass path: the rescore consumes the posterior band
            fb = forward_backward(batch, params)
            dirs, _ = mea_decode_batch(
                fb, batch.offsets, batch.m, batch.n, band_width,
                gap_gamma, match_gamma,
            )
            dirs_np = np.asarray(dirs)
            gm_np = np.asarray(fb["gamma_match"])
            for b, idx in enumerate(sub):
                rec = records[idx]
                j0, j1, _ = windows[idx]
                m = len(rec.seq)
                new_cigar = mea_traceback(
                    dirs_np[b], offs_np[b], m, j1 - j0
                )
                rec.cigar = splice_window_cigar(
                    new_cigar, j0, j1, len(ref_codes[rec.rname])
                )
                scores[idx] = rescore_by_posterior(
                    gm_np[b], offs_np[b], new_cigar
                )
        else:
            # fused rematerialised path: no stored lattice / gamma
            # bands, so realign batches scale; Pallas kernel on TPU,
            # XLA scan elsewhere (ops.dispatch).  Traceback runs ON
            # DEVICE (batched diagonal scan over the kernel's native
            # direction layout) — only the per-diagonal op matrix
            # crosses to the host, not the direction bands.
            _, cigars, _ = prepared.decode()
            for b, idx in enumerate(sub):
                j0, j1, _ = windows[idx]
                records[idx].cigar = splice_window_cigar(
                    cigars[b], j0, j1, len(ref_codes[records[idx].rname])
                )
    return scores if rescore else []


def realign_sam_file(
    sam_path: str,
    output_sam_path: str,
    read_fastq_path: str,
    reference_fasta_path: str,
    gap_gamma: float = 0.5,
    match_gamma: float = 0.0,
    hmm_model: PairHmmModel | None = None,
    band_width: int = 64,
    batch_size: int | None = None,
    shard: tuple[int, int] | None = None,
) -> None:
    """Chain then realign a SAM file (realignSamFileTargetFn semantics).

    ``shard=(i, n)``: chain deterministically (same result on every
    host), realign and write only every n-th chained record starting at
    i — the multi-host fan-out; host 0 reconstructs chained order with
    merge_sam_shards(order="interleave").
    """
    with tempfile.TemporaryDirectory() as tmp:
        chained = os.path.join(tmp, "chained.sam")
        chain_sam_file(sam_path, chained, read_fastq_path, reference_fasta_path)
        reader = SamReader(chained)
        records = list(reader.mapped())
        if shard is not None:
            records = records[shard[0] :: shard[1]]
        ref_seqs = read_fasta_dict(reference_fasta_path)
        realign_records(
            records, ref_seqs, hmm_model, gap_gamma, match_gamma,
            band_width, batch_size,
        )
        with SamWriter(output_sam_path, template=reader) as writer:
            for rec in records:
                writer.write(rec)
