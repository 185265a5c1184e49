"""Kernel dispatch: route the fused realign to the fastest correct
backend for the current platform.

The complete ``cactus_realign`` equivalent (reference
/root/reference/nanopore/analyses/utils.py:587) exists twice here:

* ``ops.mea.realign_fused`` — XLA anti-diagonal scans; runs anywhere
  (CPU tests, virtual meshes) but is dispatch-latency-bound on TPU.
* ``ops.pairhmm_pallas_realign.pallas_realign_fused`` — the Pallas
  production kernel; one fused program per (W, 128-read) batch tile.

``realign_fused_auto`` picks Pallas on real TPU backends for batches
whose geometry the kernel serves (band width in _PALLAS_BAND_WIDTHS —
per-read band offsets ride the streamed code top bits, so mixed-band
production batches are fine), and the XLA scan elsewhere.  Override
with ``NANOPORE_TPU_KERNEL={auto,pallas,xla}``.

The Prepared* classes are the production entry points: built from raw
(ref, read, guide) pairs via ``prepared_from_pairs`` (fused one-pass
host pack on TPU), committed to a round-robin local device, async
LAUNCHED from the prefetch worker pool, and consumed through
layout-agnostic decode()/run() methods so callers never touch the
kernels' k-major tensor layouts.
"""

from __future__ import annotations

import os
from typing import NamedTuple

from nanopore_tpu.ops.pairhmm import BandedBatch, KernelParams
from nanopore_tpu.ops.mea import realign_fused

# Platforms with a Mosaic compiler behind them.  Everything else
# (cpu, virtual test meshes) takes the XLA scan; interpret-mode Pallas
# is test-only, never a production path.
_PALLAS_PLATFORMS = ("tpu", "axon")


def kernel_choice() -> str:
    """'pallas' or 'xla' for this process (env override honoured)."""
    mode = os.environ.get("NANOPORE_TPU_KERNEL", "auto")
    if mode in ("pallas", "xla"):
        return mode
    try:
        import jax

        platform = jax.default_backend()
    except Exception:  # pragma: no cover - no backend at all
        return "xla"
    return "pallas" if platform in _PALLAS_PLATFORMS else "xla"


# Band widths the Pallas kernels serve: whole int8 sublane tiles
# ((32, 128) native int8 tiling), W=64 hardware-validated end to end,
# W=32 for presets that trade band slack for 2x fewer cells (the
# reference's own production band was 21 wide: --diagonalExpansion=10).
_PALLAS_BAND_WIDTHS = (32, 64)


def tpu_backend() -> bool:
    """True when the default backend is a real TPU (Mosaic-capable)."""
    try:
        import jax

        return jax.default_backend() in _PALLAS_PLATFORMS
    except Exception:  # pragma: no cover - no backend at all
        return False


def require_gamma_safe_backend(band_width: int) -> None:
    """Refuse to produce XLA forward_backward gammas on a TPU backend.

    Round-3 hardware finding (scripts_dev/gamma_probe.py, PERF.md): the
    XLA scan's gamma bands miscompile on TPU (~0.03% of cells off by up
    to ~170 at K=10^4).  Posteriors are a correctness product
    (reference alignmentUncertainty.py:41) — on TPU they must come from
    the Pallas ``emit_gamma`` stream, which serves band widths in
    _PALLAS_BAND_WIDTHS.  Raises with the repack instruction instead of
    silently handing corrupt bands downstream.  Escape hatch for
    probes/bisection: NANOPORE_TPU_ALLOW_TPU_GAMMA=1.
    """
    if not tpu_backend():
        return
    if os.environ.get("NANOPORE_TPU_ALLOW_TPU_GAMMA") == "1":
        return
    raise RuntimeError(
        "posterior gamma bands requested from the XLA forward_backward "
        "on a TPU backend (band_width=%d): XLA's TPU scan compiles these "
        "gammas WRONG (scripts_dev/gamma_probe.py).  Repack the batch to "
        "band_width in %s so the Pallas emit_gamma stream serves it, or "
        "run on CPU.  Set NANOPORE_TPU_ALLOW_TPU_GAMMA=1 only for "
        "miscompile probes." % (band_width, _PALLAS_BAND_WIDTHS)
    )


def pallas_max_k() -> int:
    """Largest diagonal count the fused Pallas kernel serves per batch
    (its per-diagonal HBM streams — boundary checkpoints, dirs, retire
    rows — scale linearly with k; ~0.9 MB per diagonal per 128-lane
    tile at W=64).  Override with NANOPORE_TPU_PALLAS_MAX_K."""
    return int(os.environ.get("NANOPORE_TPU_PALLAS_MAX_K", "262144"))


def pack_choice() -> str:
    """How Pallas-path batches are packed: 'stream' (default — host
    streams 1 byte/diagonal/read and the ops.pack_pallas kernel builds
    the band codes ON DEVICE) or 'host' (full host-side band pack +
    upload; pre-round-4 behaviour).  Override with NANOPORE_TPU_PACK."""
    mode = os.environ.get("NANOPORE_TPU_PACK", "auto")
    if mode in ("stream", "host"):
        return mode
    return "stream"


def prefer_host_batch(band_width: int = 64) -> bool:
    """True when new banded batches will feed the Pallas repack: build
    them with prepare_banded_batch(device=False) so the band tensors
    stay host-side (the repack re-lays them out and uploads ONE packed
    tensor; uploading first just to pull them back is pure waste on
    remote-device runtimes)."""
    return (
        kernel_choice() == "pallas"
        and band_width in _PALLAS_BAND_WIDTHS
    )


def pallas_eligible(batch: BandedBatch) -> bool:
    """Geometry the fused Pallas kernel serves.  Per-read band offsets
    ride the streamed code top bits, so mixed-band batches need no
    uniformity check; the band must be a whole number of int8 sublane
    tiles (W in _PALLAS_BAND_WIDTHS) and the diagonal count must fit
    the kernel's per-diagonal HBM stream budget (pallas_max_k)."""
    import logging

    if batch.xc.shape[-1] not in _PALLAS_BAND_WIDTHS:
        logging.getLogger(__name__).warning(
            "pallas kernel skipped: band_width=%d not in %s, batch of "
            "%d falls back to the XLA scan (latency-bound on TPU)",
            batch.xc.shape[-1],
            _PALLAS_BAND_WIDTHS,
            batch.xc.shape[0],
        )
        return False
    if batch.k_max > pallas_max_k():
        logging.getLogger(__name__).warning(
            "pallas kernel skipped: k_max=%d exceeds "
            "NANOPORE_TPU_PALLAS_MAX_K=%d (HBM stream budget); batch "
            "of %d falls back to the XLA scan — consider windowing "
            "the guides (align.realign.window_global_pair)",
            batch.k_max, pallas_max_k(), batch.xc.shape[0],
        )
        return False
    return True


def local_dp_devices() -> list:
    """Local devices for single-process data parallelism, or [None].

    The TPU-native replacement for the reference's per-node process
    fan-out (batch-system maxThreads, reference Makefile:1-3): one host
    with N chips round-robins realign/EM/extension BATCHES across them
    — each prepared batch is placed on (and its kernel runs on) its own
    chip, and async dispatch overlaps the N in-flight batches.  Returns
    [None] (default placement) when there is only one device.
    """
    import jax

    try:
        devs = jax.local_devices()
    except Exception:  # pragma: no cover - no backend
        return [None]
    return list(devs) if len(devs) > 1 else [None]


def _place_batch(batch: BandedBatch, device):
    """Commit a batch's arrays to one device (host arrays upload there;
    device arrays copy).  The downstream jit/pallas calls then execute
    on that device."""
    if device is None:
        return batch
    import jax

    return batch._replace(
        **{
            f: jax.device_put(getattr(batch, f), device)
            for f in ("xc", "yc", "xn", "yn", "offsets", "m", "n", "k_end")
        }
    )


class LitePack(NamedTuple):
    """Host-side batch metadata for Pallas-packed pairs.

    The fused direct pack (pack_pallas_pairs) never materialises the
    (B, K+1, W) band tensors; downstream consumers (traceback, rescore,
    posterior expectations) only need offsets/m/n — this carries them
    with the same field names as BandedBatch.
    """

    offsets: object
    m: object
    n: object
    k_end: object
    band_width: int


def _pairs_k_max(pairs, k_max, step: int = 2048) -> int:
    """Tighten k_max to the batch's real diagonal need, rounded to a
    coarse step so jit/kernel shape counts stay bounded.  Power-of-two
    window bucketing alone leaves up to ~66% of diagonals as sentinel
    padding (pure wasted pack + upload + device work)."""
    need = max(len(x) + len(y) for x, y, _ in pairs)
    tight = -(-need // step) * step
    return min(k_max, tight) if k_max else tight


def prepared_from_pairs(
    cls_kwargs: dict,
    pairs,
    params: KernelParams,
    band_width: int = 64,
    k_max: int | None = None,
    prepared_cls=None,
    exact_k: bool = False,
):
    """Build a Prepared* object straight from (ref, read, guide) pairs.

    On the Pallas path the fused direct pack writes the kernel layout
    in one pass (no BandedBatch); elsewhere a device-resident
    BandedBatch feeds the XLA scans.  ``cls_kwargs`` are forwarded to
    the Prepared* constructor.  ``exact_k=True`` pins the diagonal
    count to the caller's ``k_max`` verbatim (k-bin bucketing: one
    compiled shape per bin) instead of tightening it per batch.
    """
    if not exact_k:
        k_max = _pairs_k_max(pairs, k_max)
    use_pallas = (
        kernel_choice() == "pallas" and band_width in _PALLAS_BAND_WIDTHS
    )
    if use_pallas and prepared_cls is PreparedViterbi:
        # the packed single-plane backpointer encoding only represents
        # the canonical fiveState transition structure; other models
        # must take the XLA Viterbi path.  Checked HERE (not just in
        # PallasViterbiPlan, which raises) so the stream-pack fast path
        # degrades to the BandedBatch fallback instead of crashing.
        from nanopore_tpu.ops.pairhmm_pallas_viterbi import (
            viterbi_structure_ok,
        )

        use_pallas = viterbi_structure_ok(params)
    if use_pallas and k_max > pallas_max_k():
        # the fused kernel's HBM side (boundary checkpoints, dirs,
        # retire rows) scales linearly with the diagonal count — a
        # megabase-lattice batch would exhaust HBM.  Realign/SNP window
        # their global records (align.realign.window_global_pair) so
        # production batches never get here; EM on un-windowed megabase
        # chained records can.  Fall back to the remat XLA path instead
        # of OOMing the chip.
        import logging

        logging.getLogger(__name__).warning(
            "pallas kernel skipped: k_max=%d exceeds "
            "NANOPORE_TPU_PALLAS_MAX_K=%d (HBM stream budget); batch "
            "of %d falls back to the XLA scan — consider windowing "
            "the guides (align.realign.window_global_pair)",
            k_max, pallas_max_k(), len(pairs),
        )
        use_pallas = False
    if use_pallas:
        if pack_choice() == "stream":
            # on-device band construction (cactus_realign builds its
            # band from sequences inside the binary; so do we): the
            # host streams ~1 byte per diagonal per read and the packer
            # kernel writes the packed band codes straight into HBM —
            # ~65x less upload than the host-packed band tensor
            from nanopore_tpu.ops.pack_pallas import (
                materialize_xyc,
                pack_stream_pairs,
            )

            prep = pack_stream_pairs(pairs, params, band_width, k_max)
            prep = materialize_xyc(
                prep,
                device=cls_kwargs.get("device"),
                interpret=os.environ.get("NANOPORE_TPU_PACK_INTERPRET")
                == "1",
            )
        else:
            from nanopore_tpu.ops.pairhmm_pallas_realign import (
                pack_pallas_pairs,
            )

            prep = pack_pallas_pairs(pairs, params, band_width, k_max)
        lite = LitePack(
            offsets=prep["offsets"], m=prep["m"], n=prep["n"],
            k_end=prep["k_end"], band_width=band_width,
        )
        return prepared_cls._from_prep(
            lite, params, prep, **cls_kwargs
        )
    from nanopore_tpu.ops.pairhmm import prepare_banded_batch

    batch = prepare_banded_batch(
        pairs, band_width=band_width, k_max=k_max, device=True
    )
    return prepared_cls(batch, params, **cls_kwargs)


def realign_fused_auto(
    batch: BandedBatch,
    params: KernelParams,
    gap_gamma: float = 0.5,
    match_gamma: float = 0.0,
) -> dict:
    """Fused realign (loglik/score/trans/emis) on the best backend.

    Direction layout differs by backend: the XLA path returns per-read
    ``dirs`` bands (decode with ops.mea.mea_traceback_fwd /
    traceback_cigars_batch); the Pallas path returns the kernel-native
    k-major ``dirs_raw`` (decode with
    ops.traceback_pallas.traceback_cigars_pallas, or convert via
    ops.pairhmm_pallas_realign.dirs_band_from_raw).  PreparedRealign
    .decode() hides the difference — prefer it.
    """
    if kernel_choice() == "pallas" and pallas_eligible(batch):
        from nanopore_tpu.ops.pairhmm_pallas_realign import (
            pallas_realign_fused,
        )

        return pallas_realign_fused(batch, params, gap_gamma, match_gamma)
    return realign_fused(batch, params, gap_gamma, match_gamma)


class PreparedRealign:
    """A realign batch prepared for the chosen kernel.

    Build on the prefetch thread (runtime.prefetch.prefetched): for the
    Pallas path that is where the host repack + HBM upload happen, so
    they overlap the previous batch's kernel; run() is then a single
    pallas_call.  The XLA path defers everything to run() (its inputs
    are the BandedBatch arrays, already device-resident).
    """

    def __init__(
        self,
        batch: BandedBatch,
        params: KernelParams,
        gap_gamma: float = 0.5,
        match_gamma: float = 0.0,
        emit_gamma: bool = False,
        device=None,
        emit_em: bool = True,
    ):
        self._params = params
        self._gg = gap_gamma
        self._mg = match_gamma
        if kernel_choice() == "pallas" and pallas_eligible(batch):
            from nanopore_tpu.ops.pairhmm_pallas_realign import (
                PallasRealignPlan,
            )

            self.batch = batch
            self._plan = PallasRealignPlan(
                batch, params, gap_gamma, match_gamma, emit_gamma,
                device=device, emit_em=emit_em,
            )
        else:
            self.batch = _place_batch(batch, device)
            self._plan = None

    @classmethod
    def _from_prep(
        cls, lite: LitePack, params: KernelParams, prep: dict,
        gap_gamma: float = 0.5, match_gamma: float = 0.0,
        emit_gamma: bool = False, device=None, emit_em: bool = True,
    ) -> "PreparedRealign":
        from nanopore_tpu.ops.pairhmm_pallas_realign import (
            PallasRealignPlan,
        )

        self = cls.__new__(cls)
        self._params = params
        self._gg = gap_gamma
        self._mg = match_gamma
        self._out = None
        self.batch = lite
        self._plan = PallasRealignPlan(
            None, params, gap_gamma, match_gamma, emit_gamma,
            device=device, emit_em=emit_em, prep=prep,
        )
        return self

    @property
    def has_gamma(self) -> bool:
        """True when run() will include the gamma_match band (the
        Pallas kernel streams it; the XLA fused scan does not — its
        rescore callers take the two-pass forward_backward instead)."""
        return self._plan is not None and self._plan.emit_gamma

    _out: dict | None = None

    def launch(self) -> "PreparedRealign":
        """Dispatch the kernel asynchronously NOW (JAX returns before
        the device finishes).  Called on the prefetch thread, this puts
        each round-robin device's batch in flight while earlier batches
        are still being consumed — the single-process multi-chip
        overlap.  run() then hands back the in-flight results."""
        if self._out is None:
            self._out = self._run()
        return self

    def _run(self) -> dict:
        if self._plan is not None:
            return self._plan.run()
        return realign_fused(self.batch, self._params, self._gg, self._mg)

    def run(self) -> dict:
        if self._out is not None:
            out, self._out = self._out, None
            return out
        return self._run()

    def decode(self):
        """(logliks (B,) float64, cigars, run-output) — realign decode.

        The traceback runs on device against whichever direction layout
        the backend produced (k-major raw for Pallas, per-read bands
        for the XLA scan); only op codes cross to the host.
        """
        import numpy as np

        from nanopore_tpu.ops.mea import traceback_cigars_batch

        out = self.run()
        if "dirs_raw" in out:
            # on-chip walker: the XLA scan version costs ~80 us per
            # diagonal in loop overhead (seconds per batch); the Pallas
            # walk is VPU arithmetic on one (W, BT) tile per diagonal
            from nanopore_tpu.ops.traceback_pallas import (
                traceback_cigars_pallas,
            )

            cigars = traceback_cigars_pallas(
                out["dirs_raw"], self.batch.offsets, self.batch.m,
                self.batch.n,
            )
        else:
            cigars = traceback_cigars_batch(
                out["dirs"], self.batch.offsets, self.batch.m,
                self.batch.n,
            )
        return np.asarray(out["loglik"], np.float64), cigars, out


class PreparedEm:
    """An EM E-step batch prepared for the chosen kernel.

    The Baum-Welch expectations (trans/emis/loglik — reference
    cactus_expectationMaximisation's E-step) fall out of the fused
    Pallas realign kernel as by-products, and the model parameters are
    RUNTIME scalars there, so one compiled kernel + one device-resident
    code pack serve every EM iteration and trial: run(params) swaps the
    scalar tables and re-launches.  Off-TPU it defers to the XLA
    rematerialised em_expectations.
    """

    def __init__(
        self, batch: BandedBatch, segment_size: int = 512, device=None
    ):
        self.batch = batch
        self._segment = segment_size
        self._plan = None
        self._prep = None
        self._dev_batch = None
        self._device = device
        self._use_pallas = (
            kernel_choice() == "pallas" and pallas_eligible(batch)
        )

    @classmethod
    def _from_prep(
        cls, lite: LitePack, params: KernelParams, prep: dict,
        segment_size: int = 512, device=None,
    ) -> "PreparedEm":
        self = cls.__new__(cls)
        self.batch = lite
        self._segment = segment_size
        self._plan = None
        self._prep = prep
        self._dev_batch = None
        self._device = device
        self._use_pallas = True
        return self

    def run(self, params: KernelParams) -> dict:
        """E-step expectations: {trans (B,5,5), emis (B,5,16), loglik (B,)}."""
        if self._use_pallas:
            from nanopore_tpu.ops.pairhmm_pallas_realign import (
                PallasRealignPlan,
            )

            if self._plan is None:
                from_prep = self._prep is not None
                self._plan = PallasRealignPlan(
                    None if from_prep else self.batch,
                    params,
                    device=self._device,
                    prep=self._prep,
                )
                self._prep = None  # plan owns the device arrays now
                if from_prep:
                    # the pack embedded pack-time scalars; swap in this
                    # iteration's model
                    self._plan.update_params(params)
            else:
                self._plan.update_params(params)
            out = self._plan.run()
            return {
                "trans": out["trans"],
                "emis": out["emis"],
                "loglik": out["loglik"],
            }
        from nanopore_tpu.ops.pairhmm import em_expectations

        if self._dev_batch is None:
            # host-built batches (prefer_host_batch) upload once here,
            # then every EM iteration reuses the device arrays
            import jax.numpy as jnp

            if self._device is not None:
                self._dev_batch = _place_batch(self.batch, self._device)
            else:
                self._dev_batch = self.batch._replace(
                    **{
                        f: jnp.asarray(getattr(self.batch, f))
                        for f in ("xc", "yc", "xn", "yn", "offsets",
                                  "m", "n", "k_end")
                    }
                )
        return em_expectations(
            self._dev_batch, params, segment_size=self._segment
        )


class PreparedPosteriors:
    """Posterior match-probability bands for the chosen kernel.

    The ``--outputAllPosteriorProbs`` / ``--rescoreByPosteriorProb``
    equivalent (reference marginAlignSnpCaller.py:136-146,
    alignmentUncertainty.py:41-42): run() returns DEVICE-resident
    {gamma_match (B, K+1, W), yc (B, K+1, W), loglik (B,)} for the
    batch — the Pallas fused kernel streams the gamma band out of its
    backward phase on TPU (``emit_gamma``); elsewhere the XLA
    forward_backward supplies it.  Consume with ops.posteriors (the
    bands never cross to the host).

    Like PreparedRealign, build on the prefetch thread: the Pallas
    repack + upload overlap the previous batch's kernel.
    """

    def __init__(
        self, batch: BandedBatch, params: KernelParams, device=None,
        emit_gamma: bool = True, emit_exp: bool = False,
        exp_threshold: float = 1e-3,
    ):
        self._params = params
        self._gamma = emit_gamma
        self._exp = emit_exp
        if kernel_choice() == "pallas" and pallas_eligible(batch):
            from nanopore_tpu.ops.pairhmm_pallas_realign import (
                PallasRealignPlan,
            )

            self.batch = batch
            # only what the consumer asked for: gamma band for rescore
            # (uncertainty), the fused retire stream for expectations
            # (SNP caller) — no Baum-Welch accumulators either way
            self._plan = PallasRealignPlan(
                batch, params, emit_gamma=emit_gamma, device=device,
                emit_em=False, emit_exp=emit_exp,
                exp_threshold=exp_threshold,
            )
        else:
            # FAIL-SAFE: the XLA forward_backward gamma bands are known
            # wrong on TPU backends (round-3 hardware finding,
            # scripts_dev/gamma_probe.py) — never hand corrupt
            # posteriors to SNP caller / uncertainty consumers.
            require_gamma_safe_backend(batch.xc.shape[-1])
            self.batch = _place_batch(batch, device)
            self._plan = None

    @classmethod
    def _from_prep(
        cls, lite: LitePack, params: KernelParams, prep: dict,
        device=None, emit_gamma: bool = True, emit_exp: bool = False,
        exp_threshold: float = 1e-3,
    ) -> "PreparedPosteriors":
        from nanopore_tpu.ops.pairhmm_pallas_realign import (
            PallasRealignPlan,
        )

        self = cls.__new__(cls)
        self._params = params
        self._gamma = emit_gamma
        self._exp = emit_exp
        self._out = None
        self.batch = lite
        self._plan = PallasRealignPlan(
            None, params, emit_gamma=emit_gamma, device=device,
            emit_em=False, prep=prep, emit_exp=emit_exp,
            exp_threshold=exp_threshold,
        )
        return self

    _out: dict | None = None

    def launch(self) -> "PreparedPosteriors":
        """Async-dispatch now (see PreparedRealign.launch)."""
        if self._out is None:
            self._out = self._run()
        return self

    def _run(self) -> dict:
        if self._plan is not None:
            out = self._plan.run()
            # k-major raw layouts; consume with the ops.posteriors
            # *_from_post wrappers (no band transposes)
            res = {"loglik": out["loglik"]}
            if self._gamma:
                res["gamma_raw"] = out["gamma_raw"]
                res["yc_raw"] = self._plan.yc_raw()
            if self._exp:
                res["ret_raw"] = out["ret_raw"]
                res["flush_raw"] = out["flush_raw"]
                # the retire threshold was applied IN KERNEL at plan
                # build; carry it so expectations_from_post can detect
                # a caller passing a different one (ADVICE r4)
                res["exp_threshold"] = self._plan.exp_threshold
            return res
        import jax.numpy as jnp

        from nanopore_tpu.ops.pairhmm import forward_backward

        fb = forward_backward(self.batch, self._params)
        return {
            "gamma_match": fb["gamma_match"],
            "yc": jnp.asarray(self.batch.yc),
            "loglik": fb["loglik"],
        }

    def run(self) -> dict:
        if self._out is not None:
            out, self._out = self._out, None
            return out
        return self._run()


class PreparedViterbi:
    """A max-product decode batch prepared for the chosen kernel.

    ``decode: "viterbi"`` extension path of the mapping engine: on TPU
    the single-pass Pallas Viterbi kernel
    (ops.pairhmm_pallas_viterbi — the forward pass runs ~1.5x the
    fused realign kernel's cells/s; the FULL decode, with the
    backpointer walk, measures slower than the MEA path —
    VITERBI_HW.json), elsewhere the XLA
    anti-diagonal scan.  launch() on the prefetch thread puts the
    kernel in flight; decode() walks the backpointers ON DEVICE and
    returns (scores, cigars).
    """

    def __init__(
        self, batch: BandedBatch, params: KernelParams, device=None
    ):
        self._params = params
        from nanopore_tpu.ops.pairhmm_pallas_viterbi import (
            viterbi_structure_ok,
        )

        if (
            kernel_choice() == "pallas"
            and pallas_eligible(batch)
            and viterbi_structure_ok(params)
        ):
            from nanopore_tpu.ops.pairhmm_pallas_viterbi import (
                PallasViterbiPlan,
            )

            self.batch = batch
            self._plan = PallasViterbiPlan(batch, params, device=device)
        else:
            self.batch = _place_batch(batch, device)
            self._plan = None
        self._out = None

    @classmethod
    def _from_prep(
        cls, lite: LitePack, params: KernelParams, prep: dict,
        device=None,
    ) -> "PreparedViterbi":
        from nanopore_tpu.ops.pairhmm_pallas_viterbi import (
            PallasViterbiPlan,
        )

        self = cls.__new__(cls)
        self._params = params
        self._out = None
        self.batch = lite
        self._plan = PallasViterbiPlan(
            None, params, device=device, prep=prep
        )
        return self

    def launch(self) -> "PreparedViterbi":
        if self._out is None:
            if self._plan is not None:
                self._out = self._plan.run()
            else:
                from nanopore_tpu.ops.viterbi import viterbi_decode_batch

                self._out = viterbi_decode_batch(self.batch, self._params)
        return self

    def decode(self):
        """(scores (B,) float64, cigars list) — backpointers consumed
        on device for the Pallas plan, on host for the XLA fallback."""
        import numpy as np

        self.launch()
        if self._plan is not None:
            # on-chip walker over the packed planes (the XLA scan costs
            # seconds per batch in loop overhead, ops.traceback_pallas)
            from nanopore_tpu.ops.traceback_pallas import (
                viterbi_cigars_pallas,
            )

            out = self._out
            cigars = viterbi_cigars_pallas(
                out["bp_raw"], self.batch.offsets, self.batch.m,
                self.batch.n, np.asarray(out["fstate"]),
            )
            return np.asarray(out["score"], np.float64), cigars
        from nanopore_tpu.ops.viterbi import viterbi_traceback

        scores, fstates, bps = self._out
        scores = np.asarray(scores, np.float64)
        fstates = np.asarray(fstates)
        bps = np.asarray(bps)
        offsets = np.asarray(self.batch.offsets)
        ms = np.asarray(self.batch.m)
        ns = np.asarray(self.batch.n)
        cigars = [
            viterbi_traceback(
                bps[b], offsets[b], int(ms[b]), int(ns[b]),
                int(fstates[b]),
            )
            for b in range(len(scores))
        ]
        return scores, cigars


def preferred_realign_batch_size(requested: int | None = None) -> int:
    """Batch size to feed the fused realign.

    The Pallas kernel processes 128 reads per batch tile regardless of
    occupancy, so production batches should fill whole tiles; the XLA
    scan is latency-bound and near-free in batch, where smaller batches
    bound host pack latency.  An explicit request wins.
    """
    if requested:
        return requested
    return 128 if kernel_choice() == "pallas" else 4
