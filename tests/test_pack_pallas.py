"""On-device band construction (ops.pack_pallas) vs the host pack.

The packer kernel must write BYTE-IDENTICAL ``xyc`` tensors to
pack_pallas_pairs (the round-3 host pack): the realign/Viterbi kernels
and all their parity evidence then carry over unchanged.  Anchored to
the reference's band construction contract — cactus_realign builds its
band from sequences + a guide cigar inside the binary
(/root/reference/nanopore/analyses/utils.py:587).
"""

import numpy as np
import pytest

from nanopore_tpu.align.model import PairHmmModel
from nanopore_tpu.io.sam import CIG
from nanopore_tpu.ops.pairhmm import make_kernel_params
from nanopore_tpu.ops.pairhmm_pallas_realign import pack_pallas_pairs
from nanopore_tpu.ops.pack_pallas import (
    materialize_xyc,
    pack_stream_pairs,
)


@pytest.fixture(scope="module")
def params():
    return make_kernel_params(PairHmmModel.default())


def _guide_pairs(rng):
    """Mixed geometries: pure match, deletions, insertions, leading
    indels, N bases, and very short reads."""
    pairs = []
    for cig in [
        [(CIG.M, 60)],
        [(CIG.M, 20), (CIG.D, 10), (CIG.M, 25)],
        [(CIG.M, 25), (CIG.I, 12), (CIG.M, 25)],
        [(CIG.I, 5), (CIG.M, 40), (CIG.D, 7), (CIG.M, 10)],
        [(CIG.D, 9), (CIG.M, 30), (CIG.I, 3)],
        [(CIG.M, 4)],
    ]:
        n = sum(ln for op, ln in cig if op in (CIG.M, CIG.D))
        m = sum(ln for op, ln in cig if op in (CIG.M, CIG.I))
        x = rng.integers(0, 4, n).astype(np.int8)
        y = rng.integers(0, 5, m).astype(np.int8)  # incl. N codes
        pairs.append((x, y, cig))
    return pairs


class TestStreamPackIdentity:
    @pytest.mark.parametrize("W", [32, 64])
    def test_byte_identical_to_host_pack(self, params, W):
        rng = np.random.default_rng(7)
        pairs = _guide_pairs(rng)
        ref = pack_pallas_pairs(pairs, params, band_width=W)
        prep = pack_stream_pairs(pairs, params, band_width=W)
        out = materialize_xyc(prep, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out["xyc"]), ref["xyc"]
        )
        np.testing.assert_array_equal(out["offsets"], ref["offsets"])
        np.testing.assert_array_equal(out["kend"], ref["kend"])
        np.testing.assert_array_equal(out["k_end"], ref["k_end"])
        assert (
            out["k_pad"], out["B"], out["K"], out["NB"], out["W"]
        ) == (
            ref["k_pad"], ref["B"], ref["K"], ref["NB"], ref["W"]
        )

    def test_multi_chunk_and_tight_kmax(self, params):
        """k_pad spanning several DMA chunks and an explicit k_max."""
        rng = np.random.default_rng(11)
        n = 200
        x = rng.integers(0, 4, n).astype(np.int8)
        y = x.copy()
        y[rng.integers(0, n, 30)] = rng.integers(0, 4, 30)
        pairs = [
            (x, y, [(CIG.M, n)]),
            (x[:150], y[:120], [(CIG.M, 100), (CIG.D, 50), (CIG.I, 20)]),
        ]
        ref = pack_pallas_pairs(pairs, params, 64, k_max=512)
        prep = pack_stream_pairs(pairs, params, 64, k_max=512)
        out = materialize_xyc(prep, interpret=True)
        np.testing.assert_array_equal(np.asarray(out["xyc"]), ref["xyc"])

    def test_stream_upload_bytes_are_small(self, params):
        """The point of the exercise: stream bytes ~ (k_pad + W) per
        read vs 2*W per diagonal for the host-packed band."""
        rng = np.random.default_rng(13)
        pairs = _guide_pairs(rng)
        ref = pack_pallas_pairs(pairs, params, band_width=64)
        prep = pack_stream_pairs(pairs, params, band_width=64)
        packed = ref["xyc"].nbytes
        streamed = (
            prep["stream"].nbytes + prep["initx"].nbytes + prep["mn"].nbytes
        )
        assert streamed * 30 < packed


class TestMultiTile:
    def test_nb2_byte_identity(self, params, monkeypatch):
        """Batches crossing the 128-lane tile boundary (NB=2): lane
        placement b -> (tile b//128, lane b%128) must match the host
        pack on both tiles."""
        import nanopore_tpu.ops.pack_pallas as pkp

        monkeypatch.setattr(pkp, "CHUNK", 8)
        monkeypatch.setattr(pkp, "SEG", 8)
        import nanopore_tpu.ops.pairhmm_pallas_realign as ppr

        old_chunk = ppr.CHUNK
        monkeypatch.setattr(ppr, "CHUNK", 8)
        rng = np.random.default_rng(17)
        pairs = []
        for b in range(130):  # 2 lane tiles, second nearly empty
            n = int(rng.integers(6, 14))
            cig = [(CIG.M, n)]
            x = rng.integers(0, 4, n).astype(np.int8)
            y = x.copy()
            y[rng.integers(0, n)] = rng.integers(0, 4)
            pairs.append((x, y, cig))
        ref = pack_pallas_pairs(pairs, params, band_width=8)
        prep = pack_stream_pairs(pairs, params, band_width=8)
        assert prep["NB"] == 2
        out = materialize_xyc(prep, interpret=True)
        pkp._pack_call.clear_cache()
        np.testing.assert_array_equal(np.asarray(out["xyc"]), ref["xyc"])
        assert old_chunk  # silence unused warning
