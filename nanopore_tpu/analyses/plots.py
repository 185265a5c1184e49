"""Plotting layer: matplotlib replacements for the reference's R scripts.

The reference shells out to 20 R scripts (1511 LoC) for all plots and the
only out-of-Python statistics (SURVEY.md section 2, Lx layer).  Each
function here replaces one ``Rscript`` invocation site and writes the
same output file; the k-mer significance test (kmer_analysis.R:16-52)
is reimplemented with a two-proportion z-test + Bonferroni correction.

All plotting is defensive: a plotting failure must never fail an
analysis (the data files are the contract; plots are a convenience).
"""

from __future__ import annotations

import logging
import math

import numpy as np

logger = logging.getLogger("nanopore_tpu")

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except Exception:  # pragma: no cover
    HAVE_MPL = False


def _safe(fn):
    def wrapper(*args, **kwargs):
        if not HAVE_MPL:
            return
        try:
            fn(*args, **kwargs)
        except Exception as exc:  # pragma: no cover
            logger.warning("plot %s failed: %s", fn.__name__, exc)

    wrapper.__name__ = fn.__name__
    return wrapper


@_safe
def substitution_plot(tsv_path: str, pdf_path: str, title: str) -> None:
    """Heatmap of the 4x4 substitution frequency matrix
    (substitution_plot.R)."""
    with open(tsv_path) as fh:
        header = fh.readline().split()
        rows, labels = [], []
        for line in fh:
            parts = line.split()
            labels.append(parts[0])
            rows.append([float(x) for x in parts[1:]])
    m = np.array(rows)
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(m, cmap="viridis", vmin=0, vmax=max(1e-9, m.max()))
    ax.set_xticks(range(len(header)), header)
    ax.set_yticks(range(len(labels)), labels)
    ax.set_xlabel("read base")
    ax.set_ylabel("reference base")
    ax.set_title(title)
    for i in range(m.shape[0]):
        for j in range(m.shape[1]):
            ax.text(j, i, "%.3f" % m[i, j], ha="center", va="center",
                    color="white" if m[i, j] < 0.5 * m.max() else "black",
                    fontsize=8)
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(pdf_path)
    plt.close(fig)


@_safe
def coverage_plot(txt_path: str, pdf_path: str) -> None:
    """Distributions + length-vs-identity trend (coverage_plot.R)."""
    data = {}
    with open(txt_path) as fh:
        for line in fh:
            parts = line.split()
            data[parts[0]] = np.array([float(x) for x in parts[1:]])
    fig, axes = plt.subplots(2, 3, figsize=(12, 7))
    panels = [
        ("ReadIdentity", "identity"),
        ("ReadCoverage", "read coverage"),
        ("MismatchesPerReadBase", "mismatches/base"),
        ("InsertionsPerBase", "insertions/base"),
        ("DeletionsPerBase", "deletions/base"),
    ]
    for ax, (key, label) in zip(axes.flat, panels):
        vals = data.get(key, np.array([]))
        vals = vals[np.isfinite(vals)]
        if len(vals):
            ax.hist(vals, bins=min(30, max(3, len(vals))), color="#3b6fb6")
        ax.set_xlabel(label)
        ax.set_ylabel("alignments")
    ax = axes.flat[5]
    lengths = data.get("MappedReadLengths", np.array([]))
    ident = data.get("ReadIdentity", np.array([]))
    if len(lengths) == len(ident) and len(lengths) > 1:
        ok = np.isfinite(ident)
        ax.scatter(lengths[ok], ident[ok], s=8, alpha=0.6)
        if ok.sum() > 2:
            coef = np.polyfit(lengths[ok], ident[ok], 1)
            xs = np.linspace(lengths[ok].min(), lengths[ok].max(), 50)
            resid = ident[ok] - np.polyval(coef, lengths[ok])
            ss_tot = ((ident[ok] - ident[ok].mean()) ** 2).sum()
            r2 = 1 - (resid**2).sum() / ss_tot if ss_tot > 0 else 0.0
            ax.plot(xs, np.polyval(coef, xs), "r-", lw=1,
                    label="fit R^2=%.3f" % r2)
            ax.legend(fontsize=7)
    ax.set_xlabel("read length")
    ax.set_ylabel("identity")
    fig.tight_layout()
    fig.savefig(pdf_path)
    plt.close(fig)


@_safe
def indel_plots(tsv_path: str, pdf_path: str) -> None:
    """Indel length and per-read count distributions (indelPlots.R)."""
    with open(tsv_path) as fh:
        header = fh.readline().rstrip("\n").split("\t")
        cols = {h: [] for h in header}
        for line in fh:
            for h, v in zip(header, line.rstrip("\n").split("\t")):
                if v not in ("None", ""):
                    try:
                        cols[h].append(float(v))
                    except ValueError:
                        pass
    fig, axes = plt.subplots(2, 2, figsize=(10, 7))
    for ax, key, label in (
        (axes[0][0], "readInsertionLengths", "insertion length"),
        (axes[0][1], "readDeletionLengths", "deletion length"),
        (axes[1][0], "NumberReadInsertions", "insertions per read"),
        (axes[1][1], "NumberReadDeletions", "deletions per read"),
    ):
        vals = np.array(cols.get(key, []))
        if len(vals):
            ax.hist(vals, bins=min(40, max(3, len(vals))), color="#b63b3b",
                    log=key.startswith("read"))
        ax.set_xlabel(label)
        ax.set_ylabel("count")
    fig.tight_layout()
    fig.savefig(pdf_path)
    plt.close(fig)


def kmer_significance(
    counts_path: str, pval_path: str, top_bot_path: str, pdf_path: str,
    title: str,
) -> None:
    """Significance test + volcano plot (kmer_analysis.R:16-52).

    The R script KS-tests resampled count vectors with Bonferroni
    correction; statistically the quantity of interest is whether each
    k-mer's read fraction differs from its reference fraction, which we
    test directly with a two-proportion z-test, Bonferroni-corrected.
    Outputs keep the R script's file roles: a per-kmer p-value table and
    a top/bottom significant table.
    """
    rows = []
    with open(counts_path) as fh:
        header = fh.readline()
        for line in fh:
            p = line.split()
            rows.append(
                (p[0], int(p[1]), float(p[2]), int(p[3]), float(p[4]), p[5])
            )
    if not rows:
        return
    ref_total = sum(r[1] for r in rows)
    read_total = sum(r[3] for r in rows)
    results = []
    for kmer, rc, rf, qc, qf, fold in rows:
        if ref_total == 0 or read_total == 0:
            pval = 1.0
        else:
            p_pool = (rc + qc) / (ref_total + read_total)
            se = math.sqrt(
                max(p_pool * (1 - p_pool), 1e-300)
                * (1.0 / ref_total + 1.0 / read_total)
            )
            z = (qf - rf) / se if se > 0 else 0.0
            pval = math.erfc(abs(z) / math.sqrt(2))
        results.append((kmer, rc, rf, qc, qf, fold, pval))
    n = len(results)
    with open(pval_path, "w") as fh:
        fh.write(
            "kmer\trefCount\trefFraction\treadCount\treadFraction\t"
            "logFoldChange\tpValue\tpValueBonferroni\n"
        )
        for kmer, rc, rf, qc, qf, fold, pval in results:
            fh.write(
                "%s\t%d\t%s\t%d\t%s\t%s\t%g\t%g\n"
                % (kmer, rc, rf, qc, qf, fold, pval, min(1.0, pval * n))
            )
    sig = [
        r for r in results
        if min(1.0, r[6] * n) < 0.05 and r[5] not in ("Inf", "-Inf")
    ]
    sig.sort(key=lambda r: float(r[5]))
    with open(top_bot_path, "w") as fh:
        fh.write(header.rstrip("\n") + "\tpValueBonferroni\n")
        for r in sig[:10] + sig[-10:]:
            fh.write(
                "%s\t%d\t%s\t%d\t%s\t%s\t%g\n"
                % (r[0], r[1], r[2], r[3], r[4], r[5], min(1.0, r[6] * n))
            )
    if HAVE_MPL:
        try:
            folds = np.array(
                [float(r[5]) for r in results if r[5] not in ("Inf", "-Inf")]
            )
            pvals = np.array(
                [r[6] for r in results if r[5] not in ("Inf", "-Inf")]
            )
            fig, ax = plt.subplots(figsize=(6, 5))
            ax.scatter(
                folds, -np.log10(np.maximum(pvals, 1e-300)), s=6, alpha=0.5
            )
            ax.axhline(-math.log10(0.05 / max(n, 1)), color="r", ls="--", lw=1)
            ax.set_xlabel("-log fold change (read vs ref)")
            ax.set_ylabel("-log10 p")
            ax.set_title(title)
            fig.tight_layout()
            fig.savefig(pdf_path)
            plt.close(fig)
        except Exception as exc:  # pragma: no cover
            logger.warning("volcano plot failed: %s", exc)


@_safe
def channel_plots(
    tsv_path: str, pdf_path: str, sorted_png: str, level_png: str,
    level_pct_png: str,
) -> None:
    """Per-channel mappability plots (channel_plots.R)."""
    data = np.genfromtxt(tsv_path, names=True, delimiter="\t")
    channel = np.atleast_1d(data["Channel"])
    total = np.atleast_1d(data["ReadCount"])
    mapped = np.atleast_1d(data["MappableReadCount"])
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.bar(channel, total, width=1.0, label="reads", color="#cccccc")
    ax.bar(channel, mapped, width=1.0, label="mapped", color="#3b6fb6")
    ax.set_xlabel("channel")
    ax.set_ylabel("reads")
    ax.legend()
    fig.tight_layout()
    fig.savefig(pdf_path)
    plt.close(fig)

    order = np.argsort(-total)
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.bar(range(len(order)), total[order], width=1.0, color="#cccccc")
    ax.bar(range(len(order)), mapped[order], width=1.0, color="#3b6fb6")
    ax.set_xlabel("channel (sorted by reads)")
    fig.tight_layout()
    fig.savefig(sorted_png)
    plt.close(fig)

    side = 32  # 512 channels as 16x32 grid
    for path, values in (
        (level_png, mapped),
        (level_pct_png, np.where(total > 0, mapped / np.maximum(total, 1), 0)),
    ):
        grid = np.zeros(side * 16)
        idx = (channel - 1).astype(int)
        ok = (idx >= 0) & (idx < len(grid))
        grid[idx[ok]] = values[ok]
        fig, ax = plt.subplots(figsize=(8, 5))
        im = ax.imshow(grid.reshape(16, side), cmap="viridis")
        fig.colorbar(im)
        ax.set_title("channel mappability")
        fig.tight_layout()
        fig.savefig(path)
        plt.close(fig)


@_safe
def histogram_plot(values, pdf_path: str, xlabel: str) -> None:
    """Simple histogram (match_hist.R and friends)."""
    values = np.asarray([v for v in values if np.isfinite(v)])
    fig, ax = plt.subplots(figsize=(6, 4))
    if len(values):
        ax.hist(values, bins=min(40, max(3, len(values))), color="#3b6fb6")
    ax.set_xlabel(xlabel)
    ax.set_ylabel("count")
    fig.tight_layout()
    fig.savefig(pdf_path)
    plt.close(fig)


@_safe
def emissions_plot(tsv_path: str, pdf_path: str) -> None:
    """Insert/delete gap emission bars (emissions_plot.R)."""
    with open(tsv_path) as fh:
        bases = fh.readline().split()
        ins = [float(x) for x in fh.readline().split()]
        dels = [float(x) for x in fh.readline().split()]
    x = np.arange(len(bases))
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.bar(x - 0.2, ins, width=0.4, label="insert emissions")
    ax.bar(x + 0.2, dels, width=0.4, label="delete emissions")
    ax.set_xticks(x, bases)
    ax.legend()
    fig.tight_layout()
    fig.savefig(pdf_path)
    plt.close(fig)


@_safe
def running_likelihood_plot(tsv_path: str, pdf_path: str) -> None:
    """EM convergence traces, one line per trial (running_likelihood.R)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    with open(tsv_path) as fh:
        for t, line in enumerate(fh):
            vals = [float(x) for x in line.split()]
            ax.plot(range(1, len(vals) + 1), vals, label="trial %d" % t)
    ax.set_xlabel("EM iteration")
    ax.set_ylabel("log likelihood")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(pdf_path)
    plt.close(fig)


@_safe
def venn_plot(sets: dict[str, set], pdf_path: str) -> None:
    """Mapper overlap as a membership-count bar chart (vennDiagram.R).

    A faithful n-set Venn needs geometry libraries; the information
    content (how many reads each mapper combination maps) is rendered as
    an UpSet-style bar chart instead.
    """
    from itertools import combinations

    names = list(sets)
    combos = []
    for r in range(1, len(names) + 1):
        for combo in combinations(names, r):
            inter = set.intersection(*(sets[c] for c in combo))
            outer = set.union(
                *(sets[c] for c in names if c not in combo), set()
            ) if len(combo) < len(names) else set()
            exclusive = inter - outer
            combos.append(("+".join(combo), len(exclusive)))
    fig, ax = plt.subplots(figsize=(max(6, len(combos)), 4))
    ax.bar(range(len(combos)), [c[1] for c in combos], color="#3b6fb6")
    ax.set_xticks(range(len(combos)), [c[0] for c in combos],
                  rotation=45, ha="right", fontsize=7)
    ax.set_ylabel("reads mapped by exactly this set")
    fig.tight_layout()
    fig.savefig(pdf_path)
    plt.close(fig)
