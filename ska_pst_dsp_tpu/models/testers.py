"""In-stream fidelity testers and phase-resolved folding.

Equivalents of the reference's TestSignal classes — TestPureTone.m:24-96
(SKAO-CSP_Low_PST_REQ-627 / Mid_REQ-385), TestImpulse.m:31-79
(REQ-697 / REQ-386), TestFrequencyComb.m:15-117 — and PhaseAverage.m:13-45.

Testers follow the streaming protocol ``test(state, x) -> (state, result)``
with result 0 = pass, -1 = fail (matching the reference's convention so
driver sweeps like test_sgcht translate directly).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from ..utils.rational import Rational, UNITY

MAX_NFFT_TONE = 8 * 1024 * 1024
MAX_NFFT_COMB = 8 * 1024


@dataclasses.dataclass
class TesterState:
    current: int = 0
    failures: int = 0
    detail: str = ""


class TestPureTone:
    __test__ = False  # not a pytest class

    """After inversion, the maximum spurious response to a pure tone must be
    <= -60 dB (power) relative to the tone (TestPureTone.m:20, dB_max=-60)."""

    def __init__(self, frequency: float, db_max: float = -60.0):
        self.frequency = frequency
        self.db_max = db_max

    def init_state(self) -> TesterState:
        return TesterState()

    def test(self, state: TesterState, x) -> tuple:
        x = np.asarray(x)
        n_pol, n_chan = x.shape[0], x.shape[1]
        for ipol in range(n_pol):
            for ichan in range(n_chan):
                v = x[ipol, ichan]
                nfft = min(v.size, MAX_NFFT_TONE)
                v = v[:nfft]
                exp_index = int(round(self.frequency * nfft))
                spec_db = 20 * np.log10(np.abs(np.fft.fft(v) / nfft) + 1e-30)
                a_index = int(spec_db.argmax())
                spec_db = spec_db - spec_db[a_index]
                if a_index != exp_index:
                    if a_index == (nfft // 2 + exp_index) % nfft:
                        pass  # band swap (TestPureTone.m:63-66)
                    else:
                        state = dataclasses.replace(
                            state,
                            failures=state.failures + 1,
                            detail=f"peak at {a_index}, expected {exp_index}",
                        )
                        return state, -1
                mask = np.ones(nfft, dtype=bool)
                mask[a_index] = False
                worst = spec_db[mask].max()
                if worst > self.db_max:
                    state = dataclasses.replace(
                        state,
                        failures=state.failures + 1,
                        detail=f"spurious {worst:.1f} dB > {self.db_max}",
                    )
                    return state, -1
        return dataclasses.replace(state, current=state.current + x.shape[-1]), 0


class TestImpulse:
    __test__ = False  # not a pytest class

    """After inversion, temporal leakage of an impulse must be <= -60 dB
    outside +-1 sample of the expected peak (TestImpulse.m:26, dB_max=-60)."""

    def __init__(self, offset: int, db_max: float = -60.0):
        self.offset = offset
        self.db_max = db_max

    def init_state(self) -> TesterState:
        return TesterState()

    def test(self, state: TesterState, x) -> tuple:
        x = np.asarray(x)
        n_pol, n_chan, nsample = x.shape
        off = self.offset - state.current
        new_state = dataclasses.replace(state, current=state.current + nsample)
        if not (0 <= off < nsample):
            return new_state, 0
        for ipol in range(n_pol):
            for ichan in range(n_chan):
                v = x[ipol, ichan]
                amp_db = 20 * np.log10(np.abs(v) + 1e-30)
                peak_db = amp_db[off]
                mask = np.ones(nsample, dtype=bool)
                mask[max(0, off - 1): off + 2] = False
                worst = (amp_db[mask] - peak_db).max()
                if worst > self.db_max:
                    i = int(np.where(mask, amp_db - peak_db, -np.inf).argmax())
                    new_state = dataclasses.replace(
                        new_state,
                        failures=new_state.failures + 1,
                        detail=f"leakage {worst:.1f} dB at {i} (peak {off})",
                    )
                    return new_state, -1
        return new_state, 0


class TestFrequencyComb:
    __test__ = False  # not a pytest class

    """Verify every expected comb harmonic lands in its expected channel and
    FFT bin with amplitude >= 0.5 (TestFrequencyComb.m:15-117); os-factor
    scaling of the harmonic positions follows the processing level."""

    def __init__(self, frequencies: Sequence[float],
                 os_factor: Rational = UNITY, *, two_stage=False,
                 invert=False, critical=False):
        self.frequencies = np.asarray(frequencies, dtype=np.float64)
        self.os_factor = Rational.coerce(os_factor)
        self.two_stage = two_stage
        self.invert = invert
        self.critical = critical

    def init_state(self) -> TesterState:
        return TesterState()

    def test(self, state: TesterState, x) -> tuple:
        x = np.asarray(x)
        n_pol, nchan = x.shape[0], x.shape[1]
        level = 2 if self.two_stage else (1 if nchan > 1 else 0)
        if self.invert:
            level -= 1
        if self.critical:
            level -= 1
        for ipol in range(n_pol):
            for ichan in range(nchan):
                v = x[ipol, ichan]
                nfft = min(v.size, MAX_NFFT_COMB)
                v = v[:nfft]
                spec = np.abs(np.fft.fft(v) / (nfft * nchan))
                hfac = nchan * nfft
                for _ in range(max(level, 0)):
                    hfac = (hfac * self.os_factor.de) // self.os_factor.nu
                for i, f in enumerate(self.frequencies):
                    jchan = (int(np.floor(f * nchan)) + nchan) % nchan
                    if jchan != ichan:
                        continue
                    offset = ichan / nchan
                    iharm = (int(np.floor((f - offset) * hfac)) + nfft) % nfft
                    if spec[iharm] < 0.5:
                        state = dataclasses.replace(
                            state,
                            failures=state.failures + 1,
                            detail=(
                                f"harmonic {i} ({f:.6f}) missing in chan "
                                f"{ichan} bin {iharm}: {spec[iharm]:.3f}"
                            ),
                        )
                        return state, -1
        return dataclasses.replace(state, current=state.current + x.shape[-1]), 0


@dataclasses.dataclass
class PhaseAverageState:
    current: int = 0
    result: Optional[np.ndarray] = None  # (n_pol, n_chan, nbin)
    hits: Optional[np.ndarray] = None


class PhaseAverage:
    """Streaming phase-resolved folding (PhaseAverage.m:13-45): accumulate
    samples into pulse-phase bins of a periodic signal."""

    def __init__(self, frequency: float, nbin: int = 256):
        self.frequency = frequency
        self.nbin = nbin

    def init_state(self) -> PhaseAverageState:
        return PhaseAverageState()

    def average(self, state: PhaseAverageState, data) -> PhaseAverageState:
        data = np.asarray(data)
        n_pol, n_chan, nsample = data.shape
        result = state.result
        hits = state.hits
        if result is None:
            result = np.zeros((n_pol, n_chan, self.nbin), dtype=data.dtype)
            hits = np.zeros(self.nbin, dtype=np.int64)
        phase = (np.arange(1, nsample + 1) + state.current) * self.frequency
        ibin = np.mod(np.round(phase * self.nbin).astype(np.int64), self.nbin)
        for b in range(self.nbin):
            sel = ibin == b
            if sel.any():
                result[:, :, b] += data[:, :, sel].sum(axis=2)
        hits += np.bincount(ibin, minlength=self.nbin)
        return PhaseAverageState(
            current=state.current + nsample, result=result, hits=hits
        )
