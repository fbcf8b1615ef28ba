"""Synthetic broadband speech-like corpus: formant-filtered excitation.

The narrowband tone corpus (data/synth.py) is separable but makes BSS-eval
non-identifiable at N=3 (its sources occupy a handful of frequency bins; the
512-tap distortion filter can rotate one narrowband source into another —
see ops/loss.py caveat).  This corpus produces *broadband* sources with the
spectro-temporal structure separation metrics assume, without shipping
TIMIT/WSJ0 (reference corpora, /root/reference/app/datasets/WSJ0/
process.py:145-223):

  * a per-speaker voice: base pitch F0 and a vocal-tract length factor
    scaling a canonical formant table;
  * a phone sequence: random 80-220 ms segments, voiced (glottal pulse
    train following a drifting F0 contour + aspiration noise) or unvoiced
    (broadband noise), with per-segment formant targets drawn around
    vowel-like patterns;
  * a cascade of 2nd-order formant resonators (poles at the formant
    frequencies/bandwidths) filtering the excitation, with filter state
    carried across segments so the waveform is continuous;
  * amplitude envelope per segment (attack/decay) and utterance-level
    RMS normalization.

Mixtures of two such "speakers" differ in pitch and formant structure, so
time-frequency masking separation is learnable, and the sources span the
whole band, so SDR/SI-SNR/BSS-eval are identifiable at N=2 and N=3.

Follows the standard Dataset contract via SyntheticTonesData (epoch ->
complex spectra batches, per-batch deterministic seeding + in-process
caching).
"""
from __future__ import annotations

import numpy as np

from danet_tpu.data.synth import SyntheticTonesData
from danet_tpu.hparams import hparams

# canonical (neutral-voice) formant targets, Hz — roughly /a/, /i/, /u/,
# /e/, /o/-like patterns plus a fricative-ish broadband setting
_VOWEL_FORMANTS = np.asarray([
    [730.0, 1090.0, 2440.0],
    [270.0, 2290.0, 3010.0],
    [300.0, 870.0, 2240.0],
    [530.0, 1840.0, 2480.0],
    [570.0, 840.0, 2410.0],
], dtype=np.float64)
_FORMANT_BW = np.asarray([90.0, 110.0, 170.0], dtype=np.float64)


def _resonator_coeffs(freq: float, bw: float, sr: float):
    """2nd-order all-pole resonator (b, a) at `freq` Hz, bandwidth `bw`."""
    r = np.exp(-np.pi * bw / sr)
    theta = 2.0 * np.pi * freq / sr
    a = np.asarray([1.0, -2.0 * r * np.cos(theta), r * r])
    # unit gain at the resonance peak
    b = np.asarray([(1.0 - r) * np.sqrt(1.0 - 2.0 * r * np.cos(2 * theta)
                                        + r * r)])
    return b, a


@hparams.register_dataset("synth-speech")
class SyntheticSpeechData(SyntheticTonesData):
    """Deterministic-seed formant-synthesis corpus, STFT'd on the fly."""

    DURATION_S = 1.5
    # amplitude bound declared for the int16 wave wire: utterances are
    # RMS-normalized to 0.2 with no peak limit, and impulse-train
    # excitation reaches crest factors well past 1.0 — the PCM wire
    # quantizes x/WAVE_SCALE, so 4.0 gives clip-free headroom at a
    # still-~13-bit effective depth (set WAVE_PCM_SCALE=4 in configs)
    WAVE_SCALE = 4.0

    def _utterance(self, rng: np.random.RandomState) -> np.ndarray:
        from scipy.signal import lfilter, lfilter_zi

        sr = float(hparams.SMPRATE)
        n = int(self.DURATION_S * sr)
        nyq = sr / 2.0

        # ---- per-speaker voice ----
        f0_base = rng.uniform(85.0, 245.0)
        vt = rng.uniform(0.82, 1.18)          # vocal-tract length factor

        wav = np.zeros(n, dtype=np.float64)
        # filter states carried across segments -> continuous waveform
        zis = [None] * len(_FORMANT_BW)

        pos = 0
        phase = 0.0                            # glottal pulse phase
        while pos < n:
            seg = int(rng.uniform(0.08, 0.22) * sr)
            seg = min(seg, n - pos)
            voiced = rng.rand() < 0.75
            t = np.arange(seg) / sr

            if voiced:
                # drifting F0 contour: declination + slow wobble
                f0 = f0_base * (1.0 + 0.12 * np.sin(
                    2 * np.pi * rng.uniform(1.5, 5.0) * t
                    + rng.uniform(0, 2 * np.pi))
                    - 0.06 * t / max(t[-1], 1e-6))
                phases = phase + np.cumsum(f0) / sr
                phase = float(phases[-1])
                # impulse-ish glottal excitation: narrow raised-cosine
                # pulses at each period boundary give a full harmonic series
                frac = phases % 1.0
                pulse = np.clip(1.0 - (frac / 0.12), 0.0, 1.0) ** 2
                exc = pulse + 0.06 * rng.randn(seg)       # + aspiration
                formants = (_VOWEL_FORMANTS[rng.randint(
                    len(_VOWEL_FORMANTS))] * vt)
                bws = _FORMANT_BW * rng.uniform(0.9, 1.4)
            else:
                exc = rng.randn(seg)                      # broadband noise
                # fricative-like: higher, wider resonances
                formants = np.sort(rng.uniform(0.25, 0.95, 3)) * nyq * vt
                bws = _FORMANT_BW * rng.uniform(2.0, 4.0)
            formants = np.clip(formants, 60.0, nyq * 0.95)

            # amplitude envelope: attack/decay per phone
            env = np.minimum(1.0, np.minimum(
                np.arange(seg) / max(1.0, 0.015 * sr),
                (seg - np.arange(seg)) / max(1.0, 0.03 * sr)))
            y = exc * env * rng.uniform(0.5, 1.0)

            # formant resonator cascade with carried state
            for fi, (freq, bw) in enumerate(zip(formants, bws)):
                b, a = _resonator_coeffs(float(freq), float(bw), sr)
                if zis[fi] is None:
                    zis[fi] = lfilter_zi(b, a) * 0.0
                y, zis[fi] = lfilter(b, a, y, zi=zis[fi])
            wav[pos:pos + seg] = y
            pos += seg

        # radiation-ish high-frequency tilt + RMS normalization
        wav = np.diff(wav, prepend=wav[:1]) * 0.5 + wav * 0.5
        rms = np.sqrt(np.mean(np.square(wav))) + 1e-9
        return (0.2 * wav / rms).astype(np.float32)
