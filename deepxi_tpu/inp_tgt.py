"""Input/target transform families (ref: deepxi/inp_tgt.py).

Each family is a `flax.struct` pytree: its map statistics are explicit
arrays (serialised via orbax/npz, importable from the reference's pickles
via `deepxi_tpu.compat`), and every method is a pure jittable function --
`example` (training pair synthesis), `observation` (inference features),
`enhanced_speech` (estimate -> waveform) all run on device end to end.

Family catalogue (ref: deepxi/inp_tgt.py:24-71):
  MagXi       STMS -> mapped a priori SNR            (the published Deep Xi target)
  MagGamma    STMS -> mapped a posteriori SNR
  MagXiGamma  STMS -> [xi_bar, gamma_bar]
  MagGain     STMS -> gain function target
  MagMag      STMS -> mapped clean STMS
  MagSMM      STMS -> spectral magnitude mask (clip [0,5])
  MagPhaXiPha STMS+STPS -> [xi_bar, mapped clean STPS]
  STDCTXiCD   STDCT -> [xi_bar, mapped constructive/destructive target]
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from deepxi_tpu import sig
from deepxi_tpu.ops.gains import gfunc
from deepxi_tpu.ops.maps import map_selector


def _stack_valid_frames(transform, sample_wavs: np.ndarray, wav_len: np.ndarray,
                        n_feat: int, N_s: int = 256,
                        chunk: int = 64) -> np.ndarray:
    """Per-utterance spectra stacked over valid frames only, mirroring the
    reference's stats transform (ref: deepxi/inp_tgt.py:114-139).

    The transform runs batched over fixed-shape chunks (one jit compile)
    and valid frames are sliced afterwards -- zero-padding beyond an
    utterance's length does not change its first ceil(len/N_s) frames, and
    per-utterance shapes would trigger a compile per length on the
    remote-compile TPU runtime."""
    tf_j = jax.jit(transform)
    out = []
    N = sample_wavs.shape[0]
    for c0 in range(0, N, chunk):
        rows = sample_wavs[c0:c0 + chunk]
        if rows.shape[0] < chunk:  # keep one static shape for the last chunk
            rows = np.pad(rows, ((0, chunk - rows.shape[0]), (0, 0)))
        S = np.asarray(tf_j(jnp.asarray(rows)))
        for i in range(min(chunk, N - c0)):
            n_frames = -(-int(wav_len[c0 + i]) // N_s)
            out.append(S[i, :n_frames].reshape(-1, n_feat))
    return np.vstack(out)


@struct.dataclass
class InpTgtBase:
    """Shared analysis/synthesis config. N_d/N_s/K/f_s are static fields so
    they bake into jitted shapes."""
    N_d: int = struct.field(pytree_node=False, default=512)
    N_s: int = struct.field(pytree_node=False, default=256)
    K: int = struct.field(pytree_node=False, default=512)
    f_s: int = struct.field(pytree_node=False, default=16000)

    @property
    def n_feat(self) -> int:
        return math.ceil(self.K / 2 + 1)

    @property
    def n_outp(self) -> int:
        return self.n_feat

    def polar_analysis(self, x):
        return sig.polar_analysis(x, self.N_d, self.N_s, self.K)

    def polar_synthesis(self, STMS, STPS):
        return sig.polar_synthesis(STMS, STPS, self.N_d, self.N_s, self.K)

    def n_frames(self, n):
        return sig.n_frames(n, self.N_s)

    def observation(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Noisy-speech STMS (+ STPS supplementary) from int16 waveform
        (ref: deepxi/inp_tgt.py:87-101)."""
        x = sig.normalise(x)
        return self.polar_analysis(x)

    def mix(self, key, s, d, s_len, d_len, snr):
        return sig.mix(key, s, d, s_len, d_len, snr, self.N_s)

    # -- stats plumbing -----------------------------------------------------
    def with_stats(self, s_sample, d_sample, x_sample, wav_len):
        """Fit map statistics from a training sample (host-side one-off;
        ref: deepxi/model.py:90-100). Default: no stats."""
        return self

    def _stms(self, w):
        return self.polar_analysis(w)[0]


@struct.dataclass
class MagXi(InpTgtBase):
    """STMS input, mapped instantaneous a priori SNR target
    (ref: deepxi/inp_tgt.py:141-240)."""
    xi_map: Any = None

    def with_stats(self, s_sample, d_sample, x_sample, wav_len):
        s = _stack_valid_frames(self._stms, s_sample, wav_len, self.n_feat, self.N_s)
        d = _stack_valid_frames(self._stms, d_sample, wav_len, self.n_feat, self.N_s)
        xi_sample = np.asarray(sig.xi(jnp.asarray(s), jnp.asarray(d)))
        return self.replace(xi_map=self.xi_map.with_stats(jnp.asarray(xi_sample)))

    def example(self, key, s, d, s_len, d_len, snr):
        s, d, x, n_frames = self.mix(key, s, d, s_len, d_len, snr)
        s_STMS = self._stms(s)
        d_STMS = self._stms(d)
        x_STMS = self._stms(x)
        xi_bar = self.xi_map.map(sig.xi(s_STMS, d_STMS))
        return x_STMS, xi_bar, n_frames

    def enhanced_speech(self, x_STMS, x_STPS, xi_bar_hat, gtype: str):
        xi_hat = self.xi_map.inverse(xi_bar_hat)
        gamma_hat = xi_hat + 1.0
        y_STMS = x_STMS * gfunc(xi_hat, gamma_hat, gtype)
        return self.polar_synthesis(y_STMS, x_STPS)

    def xi_hat(self, xi_bar_hat):
        return self.xi_map.inverse(xi_bar_hat)

    def gamma_hat(self, xi_bar_hat):
        """ML a posteriori SNR estimate xi_hat + 1 (ref: deepxi/inp_tgt.py:229-240)."""
        return self.xi_map.inverse(xi_bar_hat) + 1.0


@struct.dataclass
class MagGamma(InpTgtBase):
    """STMS input, mapped a posteriori SNR target (ref: deepxi/inp_tgt.py:242-343)."""
    gamma_map: Any = None

    def with_stats(self, s_sample, d_sample, x_sample, wav_len):
        x = _stack_valid_frames(self._stms, x_sample, wav_len, self.n_feat, self.N_s)
        d = _stack_valid_frames(self._stms, d_sample, wav_len, self.n_feat, self.N_s)
        gamma_sample = np.asarray(sig.gamma(jnp.asarray(x), jnp.asarray(d)))
        return self.replace(gamma_map=self.gamma_map.with_stats(jnp.asarray(gamma_sample)))

    def example(self, key, s, d, s_len, d_len, snr):
        s, d, x, n_frames = self.mix(key, s, d, s_len, d_len, snr)
        d_STMS = self._stms(d)
        x_STMS = self._stms(x)
        gamma_bar = self.gamma_map.map(sig.gamma(x_STMS, d_STMS))
        return x_STMS, gamma_bar, n_frames

    def enhanced_speech(self, x_STMS, x_STPS, gamma_bar_hat, gtype: str,
                        xi_hat: Optional[jnp.ndarray] = None):
        """The reference requires an a priori SNR loaded from an external
        .mat here (ref: deepxi/inp_tgt.py:299-317) yet also defines the ML
        estimate ``max(gamma_hat - 1, 1e-12)`` on this family (:332-343).
        Deviation: when no external xi_hat is given, that ML estimate is
        used so MagGamma enhances standalone instead of crashing."""
        if xi_hat is None:
            xi_hat = self.xi_hat(gamma_bar_hat)
        gamma_hat = self.gamma_map.inverse(gamma_bar_hat)
        y_STMS = x_STMS * gfunc(xi_hat, gamma_hat, gtype)
        return self.polar_synthesis(y_STMS, x_STPS)

    def gamma_hat(self, gamma_bar_hat):
        return self.gamma_map.inverse(gamma_bar_hat)

    def xi_hat(self, gamma_bar_hat):
        """ML a priori estimate max(gamma_hat - 1, 1e-12) (ref: deepxi/inp_tgt.py:332-343)."""
        return jnp.maximum(self.gamma_map.inverse(gamma_bar_hat) - 1.0, 1e-12)


@struct.dataclass
class MagXiGamma(InpTgtBase):
    """STMS input, [xi_bar, gamma_bar] target (ref: deepxi/inp_tgt.py:345-457)."""
    xi_map: Any = None
    gamma_map: Any = None

    @property
    def n_outp(self) -> int:
        return self.n_feat * 2

    def with_stats(self, s_sample, d_sample, x_sample, wav_len):
        s = _stack_valid_frames(self._stms, s_sample, wav_len, self.n_feat, self.N_s)
        d = _stack_valid_frames(self._stms, d_sample, wav_len, self.n_feat, self.N_s)
        x = _stack_valid_frames(self._stms, x_sample, wav_len, self.n_feat, self.N_s)
        xi_map = self.xi_map.with_stats(jnp.asarray(sig.xi(jnp.asarray(s), jnp.asarray(d))))
        gamma_map = self.gamma_map.with_stats(jnp.asarray(sig.gamma(jnp.asarray(x), jnp.asarray(d))))
        return self.replace(xi_map=xi_map, gamma_map=gamma_map)

    def example(self, key, s, d, s_len, d_len, snr):
        s, d, x, n_frames = self.mix(key, s, d, s_len, d_len, snr)
        s_STMS, d_STMS, x_STMS = self._stms(s), self._stms(d), self._stms(x)
        xi_bar = self.xi_map.map(sig.xi(s_STMS, d_STMS))
        gamma_bar = self.gamma_map.map(sig.gamma(x_STMS, d_STMS))
        return x_STMS, jnp.concatenate([xi_bar, gamma_bar], axis=-1), n_frames

    def enhanced_speech(self, x_STMS, x_STPS, tgt_hat, gtype: str):
        xi_bar_hat, gamma_bar_hat = jnp.split(tgt_hat, 2, axis=-1)
        xi_hat = self.xi_map.inverse(xi_bar_hat)
        gamma_hat = self.gamma_map.inverse(gamma_bar_hat)
        y_STMS = x_STMS * gfunc(xi_hat, gamma_hat, gtype)
        return self.polar_synthesis(y_STMS, x_STPS)

    def xi_hat(self, tgt_hat):
        return self.xi_map.inverse(jnp.split(tgt_hat, 2, axis=-1)[0])

    def gamma_hat(self, tgt_hat):
        return self.gamma_map.inverse(jnp.split(tgt_hat, 2, axis=-1)[1])


@struct.dataclass
class MagGain(InpTgtBase):
    """STMS input, gain target (ref: deepxi/inp_tgt.py:459-519)."""
    gain: str = struct.field(pytree_node=False, default="mmse-lsa")

    def example(self, key, s, d, s_len, d_len, snr):
        s, d, x, n_frames = self.mix(key, s, d, s_len, d_len, snr)
        s_STMS, d_STMS, x_STMS = self._stms(s), self._stms(d), self._stms(x)
        G = gfunc(sig.xi(s_STMS, d_STMS), sig.gamma(x_STMS, d_STMS), self.gain)
        return x_STMS, G, n_frames

    def enhanced_speech(self, x_STMS, x_STPS, G_hat, gtype: str = None):
        if self.gain == "ibm":
            G_hat = (G_hat > 0.5).astype(jnp.float32)
        return self.polar_synthesis(x_STMS * G_hat, x_STPS)


@struct.dataclass
class MagMag(InpTgtBase):
    """STMS input, mapped clean-speech STMS target (ref: deepxi/inp_tgt.py:521-602)."""
    mag_map: Any = None

    def with_stats(self, s_sample, d_sample, x_sample, wav_len):
        s = _stack_valid_frames(self._stms, s_sample, wav_len, self.n_feat, self.N_s)
        return self.replace(mag_map=self.mag_map.with_stats(jnp.asarray(s)))

    def example(self, key, s, d, s_len, d_len, snr):
        s, d, x, n_frames = self.mix(key, s, d, s_len, d_len, snr)
        s_STMS, x_STMS = self._stms(s), self._stms(x)
        return x_STMS, self.mag_map.map(s_STMS), n_frames

    def enhanced_speech(self, x_STMS, x_STPS, tgt_hat, gtype: str = None):
        return self.polar_synthesis(self.mag_map.inverse(tgt_hat), x_STPS)

    def mag_hat(self, tgt_hat):
        return self.mag_map.inverse(tgt_hat)


@struct.dataclass
class MagSMM(InpTgtBase):
    """STMS input, spectral magnitude mask target clipped to [0, 5]
    (ref: deepxi/inp_tgt.py:604-677)."""

    def example(self, key, s, d, s_len, d_len, snr):
        s, d, x, n_frames = self.mix(key, s, d, s_len, d_len, snr)
        s_STMS, x_STMS = self._stms(s), self._stms(x)
        # floor the denominator: padded frames are all-zero and 0/0 NaNs
        # would poison the masked loss (NaN * mask0 = NaN)
        smm = jnp.clip(s_STMS / jnp.maximum(x_STMS, 1e-12), 0.0, 5.0)
        return x_STMS, smm, n_frames

    def enhanced_speech(self, x_STMS, x_STPS, smm_hat, gtype: str = None):
        return self.polar_synthesis(smm_hat * x_STMS, x_STPS)


@struct.dataclass
class MagPhaXiPha(InpTgtBase):
    """[STMS, STPS] input, [xi_bar, mapped clean STPS] target
    (ref: deepxi/inp_tgt.py:679-810)."""
    xi_map: Any = None
    s_stps_map: Any = None

    @property
    def n_feat(self) -> int:
        return math.ceil(self.K / 2 + 1) * 2

    @property
    def n_outp(self) -> int:
        return self.n_feat

    def observation(self, x):
        x = sig.normalise(x)
        x_STMS, x_STPS = self.polar_analysis(x)
        obs = jnp.concatenate([x_STMS, x_STPS], axis=-1)
        return obs, obs

    def with_stats(self, s_sample, d_sample, x_sample, wav_len):
        nb = math.ceil(self.K / 2 + 1)
        s = _stack_valid_frames(self._stms, s_sample, wav_len, nb, self.N_s)
        d = _stack_valid_frames(self._stms, d_sample, wav_len, nb, self.N_s)
        xi_map = self.xi_map.with_stats(jnp.asarray(sig.xi(jnp.asarray(s), jnp.asarray(d))))
        return self.replace(xi_map=xi_map)

    def example(self, key, s, d, s_len, d_len, snr):
        s, d, x, n_frames = self.mix(key, s, d, s_len, d_len, snr)
        s_STMS, s_STPS = self.polar_analysis(s)
        d_STMS = self._stms(d)
        x_STMS, x_STPS = self.polar_analysis(x)
        obs = jnp.concatenate([x_STMS, x_STPS], axis=-1)
        xi_bar = self.xi_map.map(sig.xi(s_STMS, d_STMS))
        s_stps_bar = self.s_stps_map.map(s_STPS)
        return obs, jnp.concatenate([xi_bar, s_stps_bar], axis=-1), n_frames

    def enhanced_speech(self, x_STMS_STPS, dummy, tgt_hat, gtype: str):
        x_STMS, _ = jnp.split(x_STMS_STPS, 2, axis=-1)
        xi_bar_hat, s_stps_bar_hat = jnp.split(tgt_hat, 2, axis=-1)
        xi_hat = self.xi_map.inverse(xi_bar_hat)
        y_STPS = self.s_stps_map.inverse(s_stps_bar_hat)
        y_STMS = x_STMS * gfunc(xi_hat, xi_hat + 1.0, gtype)
        return self.polar_synthesis(y_STMS, y_STPS)

    def xi_hat(self, tgt_hat):
        return self.xi_map.inverse(jnp.split(tgt_hat, 2, axis=-1)[0])

    def s_stps_hat(self, tgt_hat):
        return self.s_stps_map.inverse(jnp.split(tgt_hat, 2, axis=-1)[1])


@struct.dataclass
class STDCTXiCD(InpTgtBase):
    """STDCT input, [xi_bar, mapped constructive/destructive] target
    (ref: deepxi/inp_tgt.py:812-966)."""
    xi_map: Any = None
    cd_map: Any = None

    @property
    def n_feat(self) -> int:
        return self.K

    @property
    def n_outp(self) -> int:
        return self.K * 2

    def _stdct(self, x):
        return sig.stdct(x, self.N_d, self.N_s, self.K)

    def observation(self, x):
        x = sig.normalise(x)
        X = self._stdct(x)
        return X, X  # supplementary unused; kept array-shaped for batching

    def with_stats(self, s_sample, d_sample, x_sample, wav_len):
        s = _stack_valid_frames(self._stdct, s_sample, wav_len, self.K, self.N_s)
        d = _stack_valid_frames(self._stdct, d_sample, wav_len, self.K, self.N_s)
        xi_map = self.xi_map.with_stats(jnp.asarray(sig.xi(jnp.asarray(s), jnp.asarray(d))))
        cd_map = self.cd_map.with_stats(jnp.asarray(sig.cd(jnp.asarray(s), jnp.asarray(d))))
        return self.replace(xi_map=xi_map, cd_map=cd_map)

    def example(self, key, s, d, s_len, d_len, snr):
        s, d, x, n_frames = self.mix(key, s, d, s_len, d_len, snr)
        s_X, d_X, x_X = self._stdct(s), self._stdct(d), self._stdct(x)
        xi_bar = self.xi_map.map(sig.xi(s_X, d_X))
        cd_bar = self.cd_map.map(sig.cd(s_X, d_X))
        return x_X, jnp.concatenate([xi_bar, cd_bar], axis=-1), n_frames

    def enhanced_speech(self, x_STDCT, dummy, tgt_hat, gtype: str):
        xi_bar_hat, cd_bar_hat = jnp.split(tgt_hat, 2, axis=-1)
        xi_hat = self.xi_map.inverse(xi_bar_hat)
        cdm_hat = self.cd_map.inverse(cd_bar_hat) > 0.0
        y = x_STDCT * gfunc(xi_hat, xi_hat + 1.0, gtype, cdm_hat)
        # REFERENCE DEFECT NOT REPRODUCED: tf.signal's unnormalised idct
        # makes the reference's analysis->synthesis round trip carry a 2K
        # gain (deepxi/dct.py:78 idct with no norm), so its STDCT
        # enhancement would write ~1000x-hot clipped wavs (no STDCT
        # checkpoint ships to hide it). inverse_stdct stays faithful to
        # the tf.signal convention (golden-tested); the family normalises
        # here so enhanced speech comes back at signal scale.
        return sig.inverse_stdct(y, self.N_d, self.N_s, self.K) / (2.0 * self.K)

    def xi_hat(self, tgt_hat):
        return self.xi_map.inverse(jnp.split(tgt_hat, 2, axis=-1)[0])

    def cd_hat(self, tgt_hat):
        return self.cd_map.inverse(jnp.split(tgt_hat, 2, axis=-1)[1])


@struct.dataclass
class MagPhonemes(InpTgtBase):
    """STMS input, per-frame phoneme-posterior target; enhancement through
    the classical hybrid stack (ref: deepxi/inp_tgt.py:970-1087 MagPhonemes:
    the fork's network classifies phonemes, and synthesis runs OM-LSA or
    MixMax with the network posteriors).

    Targets are one-hot phoneme labels (built by
    deepxi_tpu.dsp.labels.one_hot_targets from forced alignments); the
    noisy-mixture example path mirrors phoneme_mbatch_gen_aug
    (ref: deepxi/model.py:2061-2112).

    NOTE: the stock trainer (training.make_train_step / MiniBatchLoader)
    covers the SNR-target families; phoneme-classifier training additionally
    needs per-file label plumbing through the loader (the fork reads labels
    from alignment CSVs at list-build time, ref: deepxi/utils.py:205-267).
    example() takes the labels explicitly; wiring them through a labelled
    loader is a planned extension."""
    n_phonemes: int = struct.field(pytree_node=False, default=98)
    mixmax_model: Any = None   # optional dsp.mixmax.MixMaxModel

    @property
    def n_outp(self) -> int:
        return self.n_phonemes

    def example(self, key, s, d, s_len, d_len, snr, labels=None):
        """(x_STMS, one-hot targets, n_frames). `labels`: [B, T] int frame
        labels (already at the STFT frame rate); without labels the target
        is all-"class 0" (useful only for shape plumbing)."""
        s, d, x, n_frames = self.mix(key, s, d, s_len, d_len, snr)
        x_STMS = self._stms(x)
        T = x_STMS.shape[1]
        if labels is None:
            labels = jnp.zeros(x_STMS.shape[:2], jnp.int32)
        labels = labels[:, :T]
        tgt = jax.nn.one_hot(labels, self.n_phonemes)
        return x_STMS, tgt, n_frames

    def enhanced_speech(self, x_STMS, x_STPS, posteriors, gtype: str = "omlsa"):
        """OM-LSA (default, ref: deepxi/inp_tgt.py:1044-1057) or MixMax with
        the network's phoneme posteriors (ref: deepxi/inp_tgt.py:1058-1072)."""
        if gtype == "omlsa":
            from deepxi_tpu.dsp.trackers import omlsa_enhance
            y_STMS = omlsa_enhance(x_STMS)
            return self.polar_synthesis(y_STMS, x_STPS)
        if gtype == "mixmax":
            if self.mixmax_model is None:
                raise ValueError("MagPhonemes mixmax synthesis needs a "
                                 "mixmax_model (dsp.mixmax.MixMaxModel)")
            from deepxi_tpu.dsp.mixmax import enhance as mixmax_enhance
            log_mag = jnp.log(jnp.maximum(x_STMS, jnp.finfo(jnp.float32).eps))
            x_hat = mixmax_enhance(self.mixmax_model, log_mag,
                                   posteriors=posteriors)
            return self.polar_synthesis(jnp.exp(x_hat), x_STPS)
        raise ValueError(f"MagPhonemes gtype must be omlsa|mixmax, got {gtype!r}")


def inp_tgt_selector(inp_tgt_type: str, N_d: int, N_s: int, K: int, f_s: int,
                     **kwargs: Any):
    """Build an inp_tgt family (ref: deepxi/inp_tgt.py:24-71). `map_type`/
    `map_params` follow the reference's nesting: scalar for single-map
    families, 2-element lists for dual-map families."""
    dims = dict(N_d=N_d, N_s=N_s, K=K, f_s=f_s)
    mt, mp = kwargs.get("map_type"), kwargs.get("map_params")
    if isinstance(mt, (list, tuple)) and mp is None:
        mp = [None] * len(mt)  # dual-map family with default map params
    if inp_tgt_type == "MagXi":
        return MagXi(**dims, xi_map=map_selector(mt, mp))
    if inp_tgt_type == "MagGamma":
        return MagGamma(**dims, gamma_map=map_selector(mt, mp))
    if inp_tgt_type == "MagXiGamma":
        return MagXiGamma(**dims, xi_map=map_selector(mt[0], mp[0]),
                          gamma_map=map_selector(mt[1], mp[1]))
    if inp_tgt_type == "MagGain":
        return MagGain(**dims, gain=kwargs["gain"])
    if inp_tgt_type == "MagMag":
        return MagMag(**dims, mag_map=map_selector(mt, mp))
    if inp_tgt_type == "MagSMM":
        return MagSMM(**dims)
    if inp_tgt_type == "MagPhaXiPha":
        # STPS lives in [-pi, pi]; default the phase map's range to that
        # when no map_params are given (the reference requires explicit
        # params and crashes otherwise, deepxi/map.py:597).
        stps_mp = mp[1] if mp[1] is not None else [-math.pi, math.pi]
        return MagPhaXiPha(**dims, xi_map=map_selector(mt[0], mp[0]),
                           s_stps_map=map_selector(mt[1], stps_mp))
    if inp_tgt_type == "STDCTXiCD":
        return STDCTXiCD(**dims, xi_map=map_selector(mt[0], mp[0]),
                         cd_map=map_selector(mt[1], mp[1]))
    if inp_tgt_type in ("MagPhonemes", "MagPhonme"):  # fork's typo accepted
        return MagPhonemes(**dims, n_phonemes=kwargs.get("Noutp") or 98)
    raise ValueError(f"Invalid inp_tgt type: {inp_tgt_type!r}")
