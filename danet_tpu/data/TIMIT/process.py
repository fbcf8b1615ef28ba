"""Offline TIMIT preprocessing: WAV -> STFT spectra + transcript pickles.

Equivalent of the reference pipeline
(/root/reference/app/datasets/TIMIT/process.py): loads each train/test WAV
(integer-factor downsample via reshape+mean when possible), STFTs it with the
shared DSP settings, parses .TXT transcripts and .PHN phoneme alignments,
sorts all utterances by length (so minibatches need minimal zero padding),
and writes three pickles per subset into {train,test}_set.pkl.

Unlike the reference (which duplicates the DSP constants and warns they must
match, TIMIT/readme:3-4), this imports them from the shared hparams default
config — one source of truth.
"""
from __future__ import annotations

import argparse
import os
import pickle
import string
import sys
from math import ceil

import numpy as np
import scipy.io.wavfile as wavfile
import scipy.signal as signal

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, _REPO)

from danet_tpu.hparams import hparams  # noqa: E402

hparams.load_json(os.path.join(_REPO, "default.json"))
hparams.digest()

FLOATX = hparams.FLOATX
COMPLEXX = hparams.COMPLEXX
FFT_SIZE = hparams.FFT_SIZE
FFT_STRIDE = hparams.FFT_STRIDE
FFT_WND = hparams.FFT_WND_ARRAY
SMPRATE = hparams.SMPRATE

# "$" terminates text/phoneme streams
CHARSET = string.ascii_lowercase + " "
PHONEME_LIST = (
    "$_aa_ae_ah_ao_aw_ax_ax-h_axr_ay_b_bcl_ch_d_dcl_dh_"
    "dx_eh_el_em_en_eng_epi_er_ey_f_g_gcl_h#_hh_hv_ih_"
    "ix_iy_jh_k_kcl_l_m_n_ng_nx_ow_oy_p_pau_pcl_q_r_"
    "s_sh_t_tcl_th_uh_uw_ux_v_w_y_z_zh").split("_")
PHONEME_DIC = {v: k for k, v in enumerate(PHONEME_LIST)}
WORD_DIC = {v: k for k, v in enumerate(CHARSET)}
INTX = "int32"


def load_wav_file(fname: str, smprate: int = 16000) -> np.ndarray:
    """Load WAV as float vector at `smprate`; integer-factor downsample via
    reshape+mean when the rates divide (reference TIMIT/process.py:44-58)."""
    smprate_real, data = wavfile.read(fname)
    if smprate_real == smprate:
        return data.astype(FLOATX)
    if (smprate_real % smprate) == 0:
        factor = smprate_real // smprate
        data = np.pad(data, [(0, (-len(data)) % factor)], mode="constant")
        return data.reshape(len(data) // factor, factor).astype(
            FLOATX).mean(axis=1)
    newlen = int(ceil(len(data) * (smprate / smprate_real)))
    return signal.resample(data, newlen).astype(FLOATX)


def read_timit_txt(f) -> np.ndarray:
    """Parse a TIMIT .TXT transcript (skip start/end sample fields)."""
    words = f.readlines()[0].strip().split(" ")[2:]
    line = " ".join(words).replace(".", "").lower() + "$"
    return np.asarray(
        [WORD_DIC[c] for c in line if c in CHARSET], dtype=INTX)


def read_timit_phoneme(f) -> np.ndarray:
    """Parse a TIMIT .PHN phoneme alignment (labels only)."""
    pho = [PHONEME_DIC[line.strip().split(" ")[-1]] for line in f]
    pho.append(0)  # '$' terminator
    return np.asarray(pho, dtype=INTX)


def process_subset(dirpath: str):
    signals, phonemes, texts = [], [], []
    for fname in sorted(os.listdir(dirpath)):
        if not fname.endswith(".wav") or fname.startswith("sa"):
            continue  # 'sa' sentences are excluded (speaker-identical text)
        path = os.path.join(dirpath, fname)
        waveform = load_wav_file(path, smprate=SMPRATE)
        zxx = signal.stft(
            waveform, window=FFT_WND, nperseg=FFT_SIZE,
            noverlap=FFT_SIZE - FFT_STRIDE)[2].astype(COMPLEXX).T
        meta = os.path.join(dirpath, fname.upper())
        with open(meta.replace(".WAV", ".TXT"), "r") as f:
            text = read_timit_txt(f)
        with open(meta.replace(".WAV", ".PHN"), "r") as f:
            phoneme = read_timit_phoneme(f)
        signals.append(zxx)
        texts.append(text)
        phonemes.append(phoneme)
        sys.stdout.write(".")
        sys.stdout.flush()
    # sort by length so minibatches need minimal padding
    order = np.argsort([len(s) for s in signals])
    return ([signals[i] for i in order], [phonemes[i] for i in order],
            [texts[i] for i in order])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train-dir", default="./train")
    parser.add_argument("--test-dir", default="./test")
    parser.add_argument("--out-dir", default=".")
    args = parser.parse_args()
    for subset, dirpath in [("train", args.train_dir),
                            ("test", args.test_dir)]:
        signals, phonemes, texts = process_subset(dirpath)
        out = os.path.join(args.out_dir, "%s_set.pkl" % subset)
        with open(out, "wb") as f:
            pickle.dump(signals, f, -1)
            pickle.dump(phonemes, f, -1)
            pickle.dump(texts, f, -1)
        print("\n%s: %d utterances -> %s" % (subset, len(signals), out))
    print("Finished preprocessing")


if __name__ == "__main__":
    main()
