"""TIMIT dataset: pickle-backed STFT spectra + transcripts.

Same on-disk artifacts and epoch contract as the reference
(/root/reference/app/datasets/timit.py): loads ``TIMIT/{train,test}_set.pkl``
(each holding three pickled lists: spectra, phonemes, texts — produced by
danet_tpu/data/TIMIT/process.py), aliases valid=test, shuffles utterance
order, zero-pads every batch to its max length with the random left/right
split augmentation, and yields sparse-text aux tensors (ASR leftover the
training loop ignores, reference main.py:417).
"""
from __future__ import annotations

import gc
import os
import pickle
import string

import numpy as np

from danet_tpu.data.audio import random_zeropad
from danet_tpu.data.dataset import Dataset
from danet_tpu.hparams import hparams


@hparams.register_dataset("timit")
class TimitDataset(Dataset):
    CHARSET = string.ascii_lowercase + " "
    # '$' stream terminator at index 0 — MUST match the encoding table in
    # data/TIMIT/process.py (PHONEME_LIST), which writes the pickles
    PHONEME_LI = (
        "$_aa_ae_ah_ao_aw_ax_ax-h_axr_ay_b_bcl_ch_d_dcl_dh_"
        "dx_eh_el_em_en_eng_epi_er_ey_f_g_gcl_h#_hh_hv_ih_"
        "ix_iy_jh_k_kcl_l_m_n_ng_nx_ow_oy_p_pau_pcl_q_r_"
        "s_sh_t_tcl_th_uh_uw_ux_v_w_y_z_zh").split("_")
    PHONEME_DI = {v: k for k, v in enumerate(PHONEME_LI)}
    WORD_DI = {v: k for k, v in enumerate(CHARSET)}

    def __init__(self, data_dir: str | None = None):
        super().__init__()
        # TIMIT_DIR config key lets the CLI train on a corpus anywhere on
        # disk (the reference hardcodes its package-relative path,
        # timit.py:19-24); constructor arg > config > package default
        self.data_dir = data_dir \
            or getattr(hparams, "TIMIT_DIR", "") \
            or os.path.join(os.path.dirname(__file__), "TIMIT")

    def install_and_load(self):
        self.subset = {}
        for subset in ["train", "test"]:
            filepath = os.path.join(self.data_dir, "%s_set.pkl" % subset)
            if not os.path.exists(filepath):
                raise IOError(
                    'Did not find TIMIT file "%s", make sure you download '
                    "and preprocess the dataset (data/TIMIT/install.sh)"
                    % filepath)
            with open(filepath, "rb") as f:
                gc.disable()  # bulk unpickle speedup (reference timit.py:104)
                all_data = [pickle.load(f), pickle.load(f), pickle.load(f)]
                gc.enable()
            self.subset[subset] = all_data
        # TIMIT is small: reuse test for validation (reference timit.py:111)
        self.subset["valid"] = self.subset["test"]
        self.is_loaded = True

    def epoch(self, subset, batch_size, shuffle=False):
        if subset not in self.subset:
            raise KeyError(
                'Unknown subset "%s", valid options are %s'
                % (subset, list(self.subset.keys())))
        signals_li, phonemes_li, texts_li = self.subset[subset]
        tot = len(signals_li)
        idx = np.random.permutation(tot) if shuffle else np.arange(tot)

        def make_batch(sel):
            sigs = [signals_li[j] for j in sel]
            txts = [texts_li[j] for j in sel]
            max_len = max(len(s) for s in sigs)
            batch = np.stack([
                random_zeropad(s, max_len - len(s), axis=-2) for s in sigs])
            # sparse text aux (reference timit.py:53-66)
            n_chars = sum(len(t) for t in txts)
            t_idx = np.empty((n_chars, 2), dtype=np.int32)
            t_val = (np.concatenate(txts) if n_chars
                     else np.zeros((0,), dtype=np.int32))
            pos = 0
            for j, t in enumerate(txts):
                t_idx[pos:pos + len(t), 0] = j
                t_idx[pos:pos + len(t), 1] = np.arange(len(t))
                pos += len(t)
            t_shape = (len(sel), max((len(t) for t in txts), default=0))
            return batch, (t_idx, t_val, t_shape)

        # note: the reference's loop (timit.py:46) drops the final FULL
        # batch when tot is an exact multiple of batch_size — fixed here
        for i in range(0, tot - batch_size + 1, batch_size):
            yield make_batch(idx[i:i + batch_size])
        if tot >= batch_size and tot % batch_size:
            yield make_batch(idx[-batch_size:])

    # pickled spectra are STFTs of raw int16-scale samples (TIMIT is
    # 16-bit PCM; data/TIMIT/process.py STFTs the integer-downsample mean
    # verbatim), so inverted waveforms come back at int16 scale and the
    # int16 wave wire's WAVE_PCM_SCALE=32768 contract holds
    WAVE_SCALE = 32768.0

    def epoch_wave(self, subset, batch_size, shuffle=False):
        """Waveform epochs for TRANSFER_DOMAIN='wave': [batch, S] float32.

        The pickle artifacts stay spectra; each utterance's stored STFT
        is inverted host-side once (exact, audio.spectra_to_wave) and
        cached (Dataset._wave_from_spectra).  The sparse-text ASR aux of
        epoch() is not carried — the training loop ignores it (reference
        main.py:417) and the wave wire exists for the train/valid hot
        path."""
        if subset not in self.subset:
            raise KeyError(
                'Unknown subset "%s", valid options are %s'
                % (subset, list(self.subset.keys())))
        signals_li, _, _ = self.subset[subset]
        tot = len(signals_li)
        idx = np.random.permutation(tot) if shuffle else np.arange(tot)

        def make_batch(sel):
            waves = [self._wave_from_spectra((subset, int(j)), signals_li[j])
                     for j in sel]
            max_len = max(len(w) for w in waves)
            return (np.stack([
                random_zeropad(w, max_len - len(w), axis=-1)
                for w in waves]),)

        for i in range(0, tot - batch_size + 1, batch_size):
            yield make_batch(idx[i:i + batch_size])
        if tot >= batch_size and tot % batch_size:
            yield make_batch(idx[-batch_size:])

    @classmethod
    def encode_from_str(cls, s):
        return np.asarray([cls.WORD_DI[c] for c in s], dtype=np.int32)

    @classmethod
    def decode_to_str(cls, arr):
        charset = cls.CHARSET + "$"
        return "".join(charset[i] for i in arr).strip(" $")
