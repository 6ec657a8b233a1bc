"""Fused Pallas kernels vs the composed XLA kernels (interpret mode — the
compiled path is exercised on hardware by bench.py and the driver).

Tolerances: the kernels use the Karatsuba 3-multiplication complex GEMM
(cfft.kar_dot), whose Im = t3 - t1 - t2 cancellation costs ~1-2 bits over
the direct 4-GEMM form — a handful of elements land just past the direct
form's fp32 error bound, so the differential tolerances carry a 2x margin
(~1e-5 relative == -100 dB power, far below the -60 dB purity floor)."""

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
        np.testing.assert_allclose(got, ref, atol=8e-6 * scale, rtol=0)

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
        np.testing.assert_allclose(got, ref, atol=8e-6 * scale, rtol=0)

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
            got, ref, atol=8e-6 * np.abs(ref).max(), rtol=0
        )

    def test_rejects_unaligned_block(self):
        with pytest.raises(ValueError):
            polyphase_analysis_fused(
                _noise(1, 10000), np.ones(100), 50, Rational(4, 3),
                interpret=True,
            )


from ska_pst_dsp_tpu.ops import polyphase_synthesis
from ska_pst_dsp_tpu.ops.pallas.synthesis_fused import (
    polyphase_synthesis_fused,
)
from ska_pst_dsp_tpu.ops.pallas.ifft_fused import plan_ifft


def _fine_noise(n_pol, n_chan, n_dat, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal((n_pol, n_chan, n_dat))
        + 1j * rng.standard_normal((n_pol, n_chan, n_dat))
    ).astype(np.complex64)


class TestFusedSynthesis:
    """polyphase_synthesis_fused (Pallas frontend + fused IFFT epilogue) vs
    the composed XLA kernel, in interpret mode."""

    OS = Rational(4, 3)
    N_CHAN, L, OV = 256, 256, 48

    def _filt(self):
        return fir.design_pfb_fir_filter(self.N_CHAN, self.OS, 12)

    def _both(self, x, **kwargs):
        filt = kwargs.pop("deripple_coeff", self._filt())
        common = dict(
            input_overlap=self.OV, deripple_coeff=filt,
            temporal_taper="tukey", **kwargs,
        )
        ref = np.asarray(
            polyphase_synthesis(x, self.L, self.OS, **common)
        )
        got = np.asarray(
            polyphase_synthesis_fused(
                x, self.L, self.OS, interpret=True, **common
            )
        )
        return ref, got

    def test_plan_low_epilogue(self):
        # low: 49152-point IFFT = 128x384 (smallest n2 wins — it
        # minimizes total GEMM flops 18*n1*n2*(n2+keep), and the
        # matched-flops shape probe shows per-flop throughput is nearly
        # flat across candidate shapes; PERF_NOTES r5), overlap 9216
        assert plan_ifft(49152, 9216) == (128, 384)
        # mid: 1.8M-point blocks exceed VMEM — composed fallback
        assert plan_ifft(1_835_008, 458_752) is None

    def test_matches_reference_low(self):
        ref, got = self._both(_fine_noise(2, self.N_CHAN, 2000, seed=1))
        assert got.shape == ref.shape
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=1.2e-5 * scale, rtol=0)

    def test_spectral_taper(self):
        ref, got = self._both(
            _fine_noise(2, self.N_CHAN, 1500, seed=2), spectral_taper="tukey"
        )
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=1.2e-5 * scale, rtol=0)

    def test_spectral_filter(self):
        """Dedispersion-chirp slot rides the fused epilogue's elementwise
        constant (pre-rolled by the modulation-theorem shift)."""
        rng = np.random.default_rng(3)
        sf = np.exp(2j * np.pi * rng.random(self.N_CHAN * 192)).astype(
            np.complex64
        )
        ref, got = self._both(
            _fine_noise(1, self.N_CHAN, 1500, seed=3), spectral_filter=sf
        )
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=1.2e-5 * scale, rtol=0)

    def test_critical_no_nyquist(self):
        x = _fine_noise(1, self.N_CHAN, 1200, seed=4)
        filt = self._filt()
        ref = np.asarray(
            polyphase_synthesis(
                x, self.L, self.OS, spans_nyquist=False,
                input_overlap=self.OV, temporal_taper="tukey",
            )
        )
        got = np.asarray(
            polyphase_synthesis_fused(
                x, self.L, self.OS, spans_nyquist=False,
                input_overlap=self.OV, temporal_taper="tukey",
                interpret=True,
            )
        )
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=1.2e-5 * scale, rtol=0)

    def test_tuple_api(self):
        x = _fine_noise(1, self.N_CHAN, 1200, seed=5)
        rr, ri = polyphase_synthesis_fused(
            (np.ascontiguousarray(x.real), np.ascontiguousarray(x.imag)),
            self.L, self.OS, input_overlap=self.OV,
            temporal_taper="tukey", interpret=True,
        )
        ref = np.asarray(
            polyphase_synthesis(
                x, self.L, self.OS, input_overlap=self.OV,
                temporal_taper="tukey",
            )
        )
        got = np.asarray(rr) + 1j * np.asarray(ri)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=1.2e-5 * scale, rtol=0)

    def test_combine_permutation(self):
        ref, got = self._both(
            _fine_noise(1, self.N_CHAN, 1200, seed=6), combine=16
        )
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=1.2e-5 * scale, rtol=0)


class TestTimeMajorHandoff:
    """time_major analysis output feeding time_major_in synthesis — the
    transpose-free fused round trip bench.py runs on hardware."""

    def test_roundtrip_matches_channel_major(self):
        os_f = Rational(4, 3)
        filt = fir.design_pfb_fir_filter(256, os_f, 12)
        x = _noise(2, 300000, seed=9)
        pair = (np.ascontiguousarray(x.real), np.ascontiguousarray(x.imag))

        cr, ci = polyphase_analysis_fused(
            pair, filt, 256, os_f, time_major=True, interpret=True
        )
        assert cr.shape[2] == 256  # (P, T, C)
        rr, ri = polyphase_synthesis_fused(
            (cr, ci), 256, os_f, input_overlap=48, deripple_coeff=filt,
            temporal_taper="tukey", time_major_in=True, interpret=True,
        )
        got = np.asarray(rr) + 1j * np.asarray(ri)

        c2r, c2i = polyphase_analysis_fused(pair, filt, 256, os_f,
                                            interpret=True)
        assert c2r.shape[1] == 256  # (P, C, T)
        np.testing.assert_allclose(
            np.asarray(cr), np.asarray(c2r).transpose(0, 2, 1), atol=0
        )
        r2r, r2i = polyphase_synthesis_fused(
            (np.asarray(c2r), np.asarray(c2i)), 256, os_f, input_overlap=48,
            deripple_coeff=filt, temporal_taper="tukey", interpret=True,
        )
        ref = np.asarray(r2r) + 1j * np.asarray(r2i)
        np.testing.assert_array_equal(got, ref)


class TestFusedPaddedAnalysis:
    """Fused padded fold (+ reversal-free FFT phase identity) vs the
    composed padded kernel. Geometry: block=512, OS 4/3 -> step=384
    (step % 128 == 0, the kernel's applicability condition; mid production
    is 4096/3584 with the same structure)."""

    BLOCK, OS = 512, Rational(4, 3)

    @pytest.fixture(scope="class")
    def filt(self):
        return np.asarray(fir.design_pfb_fir_filter(self.BLOCK, self.OS, 4))

    def test_matches_reference(self, filt):
        from ska_pst_dsp_tpu.ops import polyphase_analysis_padded
        from ska_pst_dsp_tpu.ops.pallas.analysis_padded_fused import (
            polyphase_analysis_padded_fused,
        )

        x = _noise(2, 40_000, seed=3)
        ref = np.asarray(
            polyphase_analysis_padded(x, filt, self.BLOCK, self.OS)
        )
        got = np.asarray(
            polyphase_analysis_padded_fused(
                x, filt, self.BLOCK, self.OS, interpret=True
            )
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-3, rtol=0)
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 1e-5

    def test_tuple_api_time_major_odd_pol(self, filt):
        from ska_pst_dsp_tpu.ops import polyphase_analysis_padded
        from ska_pst_dsp_tpu.ops.pallas.analysis_padded_fused import (
            polyphase_analysis_padded_fused,
        )

        x = _noise(3, 30_000, seed=4)
        ref = np.asarray(
            polyphase_analysis_padded(x, filt, self.BLOCK, self.OS)
        )
        rr, ri = polyphase_analysis_padded_fused(
            (np.ascontiguousarray(x.real), np.ascontiguousarray(x.imag)),
            filt, self.BLOCK, self.OS, time_major=True, interpret=True,
        )
        got = (np.asarray(rr) + 1j * np.asarray(ri)).transpose(0, 2, 1)
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 1e-5

    def test_block0_streaming_ramp(self, filt):
        from ska_pst_dsp_tpu.ops import polyphase_analysis_padded
        from ska_pst_dsp_tpu.ops.pallas.analysis_padded_fused import (
            polyphase_analysis_padded_fused,
        )

        x = _noise(2, 25_000, seed=5)
        ref = np.asarray(
            polyphase_analysis_padded(
                x, filt, self.BLOCK, self.OS, block0=8, apply_delay=False
            )
        )
        got = np.asarray(
            polyphase_analysis_padded_fused(
                x, filt, self.BLOCK, self.OS, block0=8, apply_delay=False,
                interpret=True,
            )
        )
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 1e-5

    def test_rejects_unaligned_step(self, filt):
        from ska_pst_dsp_tpu.ops.pallas.analysis_padded_fused import (
            polyphase_analysis_padded_fused,
        )

        with pytest.raises(ValueError, match="step"):
            polyphase_analysis_padded_fused(
                _noise(2, 10_000), filt[:3072], 256, Rational(4, 3),
                interpret=True,
            )

    def test_fused_chan_dft_path(self):
        # block=1024, OS 8/7 -> step=896 (step % 128 == 0) and b1=128:
        # exercises the in-kernel radix-8 + GEMM channel DFT (mid's
        # 4096 = 8*512 has the same structure); block=512 above falls back
        # to the composed four-step (b1=64 < 128)
        from ska_pst_dsp_tpu.ops import polyphase_analysis_padded
        from ska_pst_dsp_tpu.ops.pallas.analysis_padded_fused import (
            polyphase_analysis_padded_fused,
        )
        from ska_pst_dsp_tpu.ops.pallas.chan_dft_fused import plan_chan_dft

        assert plan_chan_dft(1024) == (8, 128)
        assert plan_chan_dft(4096) == (8, 512)
        assert plan_chan_dft(512) is None

        block, os_f = 1024, Rational(8, 7)
        filt = np.asarray(fir.design_pfb_fir_filter(block, os_f, 4))
        x = _noise(2, 120_000, seed=6)
        ref = np.asarray(
            polyphase_analysis_padded(x, filt, block, os_f)
        )
        got = np.asarray(
            polyphase_analysis_padded_fused(
                x, filt, block, os_f, interpret=True
            )
        )
        assert got.shape == ref.shape
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 1e-5

    def test_aligned_fold_block0_streaming_ramp(self):
        # d = block/gcd(step,block) == 8 selects the shuffle-free aligned
        # fold whose per-spectrum cyclic shift is undone in the ramp
        # constant — block0 != 0 checks the local-k rotation composes
        # with the k0-offset derotation correctly
        from ska_pst_dsp_tpu.ops import polyphase_analysis_padded
        from ska_pst_dsp_tpu.ops.pallas.analysis_padded_fused import (
            polyphase_analysis_padded_fused,
        )

        block, os_f = 1024, Rational(8, 7)
        filt = np.asarray(fir.design_pfb_fir_filter(block, os_f, 4))
        x = _noise(2, 60_000, seed=7)
        ref = np.asarray(
            polyphase_analysis_padded(
                x, filt, block, os_f, block0=5, apply_delay=False
            )
        )
        got = np.asarray(
            polyphase_analysis_padded_fused(
                x, filt, block, os_f, block0=5, apply_delay=False,
                interpret=True,
            )
        )
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 1e-5


class TestOutOfCoreIfft:
    """ops/pallas/ifft_big.py vs the composed roll+ifft+keep reference —
    the out-of-core three-factor epilogue used at mid geometry (where a
    block exceeds VMEM). Tested at a reduced three-factor size with the
    same structure (p=7 like mid's 1,835,008 = 7*512*512)."""

    def test_plan_mid_geometry(self):
        from ska_pst_dsp_tpu.ops.pallas.ifft_big import plan_big_ifft

        assert plan_big_ifft(1835008, 458752) == (7, 512, 512)
        # low's 49152 = 96*512 block fits VMEM — the small path owns it
        from ska_pst_dsp_tpu.ops.pallas.ifft_fused import plan_ifft

        assert plan_ifft(49152, 9216) is not None

    def _run(self, has_elem, pqn=(7, 128, 128)):
        import jax.numpy as jnp
        from ska_pst_dsp_tpu.ops.pallas.ifft_big import fused_big_ifft_oc

        p, q, n1 = pqn
        n = p * q * n1
        n2 = p * q
        lo = n2 * 8
        roll = 224
        gain = 0.875
        rng = np.random.default_rng(0)
        fr = rng.standard_normal((1, 2, n)).astype(np.float32)
        fi = rng.standard_normal((1, 2, n)).astype(np.float32)
        if has_elem:
            er = rng.standard_normal(n).astype(np.float32)
            ei = rng.standard_normal(n).astype(np.float32)
            x = (fr + 1j * fi) * (er + 1j * ei)
            e_args = (jnp.asarray(er), jnp.asarray(ei))
        else:
            x = fr + 1j * fi
            e_args = (None, None)
        ref = np.fft.ifft(np.roll(x, -roll, axis=-1), axis=-1) * gain
        ref = ref[..., lo:n - lo]
        kr, ki = fused_big_ifft_oc(
            jnp.asarray(fr), jnp.asarray(fi), *e_args,
            shape_key=(n, p, q, n1, lo, roll, gain),
            has_elem=has_elem, interpret=True,
        )
        got = np.asarray(kr) + 1j * np.asarray(ki)
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 1e-4

    def test_matches_reference(self):
        self._run(has_elem=False)

    def test_elementwise_factor(self):
        self._run(has_elem=True)

    def test_radix4_beta_split(self):
        # q = 512 (qm = 128) triggers kernel 1's radix-4 beta split —
        # mid's production q; the dense q x q GEMM never runs
        from ska_pst_dsp_tpu.ops.pallas.ifft_big import _use_radix4

        assert _use_radix4(512) and not _use_radix4(128)
        self._run(has_elem=False, pqn=(3, 512, 128))

    def test_radix4_beta_split_elem(self):
        self._run(has_elem=True, pqn=(3, 512, 128))
