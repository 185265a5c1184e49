"""2D-read rescue analysis: align template/complement reads to the
reference window their 2D read mapped to.

Reproduces /root/reference/scripts/muscle_compare_2d/muscle_compare_2d.py
WITHOUT the external MUSCLE binary: the pairwise global alignment of
each template/complement read against its 2D-aligned reference window
runs through the banded pair-HMM + MEA engine (the same kernel as the
realigner), and the metrics match the reference's gapped-column walk
(muscle_compare_2d.py:72-88).

Usage: python -m nanopore_tpu.scripts.rescue_2d \\
           <template.sam> <complement.sam> <twod.sam> \\
           --working-dir <dir with readFastqFiles/ referenceFastaFiles/> \\
           --output-dir <out>
"""

from __future__ import annotations

import argparse
import os
import sys

from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.io.encoding import encode
from nanopore_tpu.io.sam import SamReader, CIG
from nanopore_tpu.io.seqio import fasta_read, fastq_read
from nanopore_tpu.ops.dispatch import PreparedRealign, prepared_from_pairs
from nanopore_tpu.ops.pairhmm import make_kernel_params


def alignment_metrics(cigar, read_codes, ref_codes):
    """Matches/mismatches/indel lengths/identity/refCoverage per the
    reference's gapped-column metrics (muscle_compare_2d.py:72-88)."""
    i = j = matches = mismatches = 0
    read_del = read_ins = 0
    for op, length in cigar:
        if op == CIG.M:
            r = ref_codes[j : j + length]
            q = read_codes[i : i + length]
            matches += int((r == q).sum())
            mismatches += int((r != q).sum())
            i += length
            j += length
        elif op == CIG.I:
            read_ins += length
            i += length
        else:
            read_del += length
            j += length
    identity = matches / (matches + mismatches) if matches + mismatches else 0.0
    ref_cov = (
        (matches + mismatches) / (matches + mismatches + read_del)
        if matches + mismatches + read_del
        else 0.0
    )
    return [
        float(matches), float(mismatches), float(read_del), float(read_ins),
        identity, ref_cov,
    ]


def rescue(template_sam, complement_sam, twod_sam, working_dir, output_dir,
           band_width=64):
    os.makedirs(output_dir, exist_ok=True)
    template_mapped = {r.qname for r in SamReader(template_sam).mapped()}
    complement_mapped = {r.qname for r in SamReader(complement_sam).mapped()}
    twod = {r.qname: r for r in SamReader(twod_sam).mapped()}

    # 2D-mappable reads that neither template nor complement mapped
    # (muscle_compare_2d.py:113-118)
    to_analyze = {}
    for name, rec in twod.items():
        if name not in template_mapped and name not in complement_mapped:
            aln_len = rec.aend - rec.pos
            to_analyze[name] = (rec.rname, rec.aend - aln_len, rec.aend)
    if not to_analyze:
        raise RuntimeError(
            "none of the mappable 2D reads failed to map as "
            "template/complement"
        )

    references = {}
    ref_dir = os.path.join(working_dir, "referenceFastaFiles")
    for fname in os.listdir(ref_dir):
        if fname.endswith(".fa") or fname.endswith(".fasta"):
            for header, seq in fasta_read(os.path.join(ref_dir, fname)):
                references[header.split()[0]] = seq

    model = PairHmmModel.default()
    params = make_kernel_params(model)

    for read_type in ("template", "complement"):
        fq_dir = os.path.join(working_dir, "readFastqFiles", read_type)
        if not os.path.isdir(fq_dir):
            raise RuntimeError(
                "readFastqFiles does not contain a %s folder" % read_type
            )
        jobs = []
        for fname in os.listdir(fq_dir):
            if not (fname.endswith(".fq") or fname.endswith(".fastq")):
                continue
            for header, seq, _ in fastq_read(os.path.join(fq_dir, fname)):
                name = header.split()[0]
                if name in to_analyze:
                    ref_name, start, stop = to_analyze[name]
                    window = references[ref_name][start:stop]
                    jobs.append((name, ref_name, seq, window))

        out_path = os.path.join(output_dir, read_type + "_metrics.tsv")
        with open(out_path, "w") as fh:
            fh.write(
                "Read\tReference\tMatches\tMismatches\tReadDeletionLength\t"
                "ReadInsertionLength\tIdentity\tReferenceCoverage\n"
            )
            for s in range(0, len(jobs), 4):
                sub = jobs[s : s + 4]
                pairs = []
                for name, ref_name, seq, window in sub:
                    x = encode(window)
                    y = encode(seq)
                    d = min(len(y), len(x))
                    guide = [(CIG.M, d)]
                    if len(y) > d:
                        guide.append((CIG.I, len(y) - d))
                    if len(x) > d:
                        guide.append((CIG.D, len(x) - d))
                    pairs.append((x, y, guide))
                # backend-dispatched MEA redecode (Pallas kernel + on-
                # device traceback on TPU, XLA scans elsewhere) — this
                # path previously consumed XLA forward_backward bands,
                # which are gamma-unsafe on TPU (gamma_probe r3)
                prep = prepared_from_pairs(
                    {"emit_em": False},
                    pairs,
                    params,
                    band_width=band_width,
                    prepared_cls=PreparedRealign,
                )
                _, cigars, _ = prep.decode()
                for b, (name, ref_name, seq, window) in enumerate(sub):
                    cigar = cigars[b]
                    metrics = alignment_metrics(
                        cigar, encode(seq), encode(window)
                    )
                    fh.write(
                        "\t".join([name, ref_name] + [str(v) for v in metrics])
                        + "\n"
                    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("template_sam")
    parser.add_argument("complement_sam")
    parser.add_argument("twod_sam")
    parser.add_argument("--working-dir", default="..")
    parser.add_argument("--output-dir", default="muscle_compare_2d/output")
    args = parser.parse_args(argv)
    rescue(
        args.template_sam, args.complement_sam, args.twod_sam,
        args.working_dir, args.output_dir,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
