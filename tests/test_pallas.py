"""Fused Pallas kernels vs the composed XLA kernels (interpret mode — the
compiled path is exercised on hardware by bench.py and the driver)."""

import numpy as np
import pytest

from ska_pst_dsp_tpu.ops import polyphase_analysis
from ska_pst_dsp_tpu.ops.pallas.analysis_fused import (
    polyphase_analysis_fused,
    _plan,
)
from ska_pst_dsp_tpu.utils.rational import Rational
from ska_pst_dsp_tpu.design import fir


def _noise(n_pol, n_dat, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal((n_pol, n_dat))
        + 1j * rng.standard_normal((n_pol, n_dat))
    ).astype(np.complex64)


class TestFusedAnalysis:
    def test_plan_low(self):
        tile, L, A, ns2 = _plan(256, 192, 3328, 4)
        assert L == 768 and A == 4
        assert tile % 4 == 0 and tile % A == 0

    def test_matches_reference_low(self):
        os_f = Rational(4, 3)
        filt = fir.design_pfb_fir_filter(256, os_f, 12)
        x = _noise(2, 300000, seed=1)
        ref = np.asarray(polyphase_analysis(x, filt, 256, os_f))
        got = np.asarray(
            polyphase_analysis_fused(x, filt, 256, os_f, interpret=True)
        )
        assert got.shape == ref.shape
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=3e-6 * scale, rtol=0)

    def test_matches_reference_odd_pol(self):
        """Odd polarization counts are padded to the HBM sublane pair."""
        os_f = Rational(4, 3)
        filt = fir.design_pfb_fir_filter(256, os_f, 12)
        x = _noise(1, 250000, seed=2)
        ref = np.asarray(polyphase_analysis(x, filt, 256, os_f))
        got = np.asarray(
            polyphase_analysis_fused(x, filt, 256, os_f, interpret=True)
        )
        scale = np.abs(ref).max()
        # 3e-6·scale: fp32 accumulation-order differences between the fused
        # kernel and the composed XLA path reach ~2.2e-6·scale on a few bins.
        np.testing.assert_allclose(got, ref, atol=3e-6 * scale, rtol=0)

    def test_tuple_api(self):
        os_f = Rational(4, 3)
        filt = fir.design_pfb_fir_filter(256, os_f, 12)
        x = _noise(2, 250000, seed=3)
        rr, ri = polyphase_analysis_fused(
            (np.ascontiguousarray(x.real), np.ascontiguousarray(x.imag)),
            filt, 256, os_f, interpret=True,
        )
        ref = np.asarray(polyphase_analysis(x, filt, 256, os_f))
        got = np.asarray(rr) + 1j * np.asarray(ri)
        np.testing.assert_allclose(
            got, ref, atol=3e-6 * np.abs(ref).max(), rtol=0
        )

    def test_rejects_unaligned_block(self):
        with pytest.raises(ValueError):
            polyphase_analysis_fused(
                _noise(1, 10000), np.ones(100), 50, Rational(4, 3),
                interpret=True,
            )
