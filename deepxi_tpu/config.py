"""Typed configuration + the reference's version-preset catalogue.

One typed config replaces the reference's three stacked layers --
hostname-keyed config.sh, per-version bash blocks in run.sh, and argparse
(ref: config.sh:10-64, run.sh:11-353, deepxi/args.py:28-133). The preset
hyper-parameters are carried over verbatim from run.sh; the DEMAND
VoiceBank variants (SNR 0..15 step 5, no val set, test epoch 125) come from
run_demand_voice_bank.sh.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Union


def str_to_list(x: str):
    """The reference's nested-flag mini-DSL (ref: deepxi/args.py:11-24):
    ';' splits sublists, ',' splits items, 'neg_'->'-', 'pi' -> math.pi."""
    def read_dtype(v: str):
        v = v.replace("neg_", "-")
        if v == "pi":
            return math.pi
        if v == "-pi":
            return -math.pi
        if any(c.isdigit() for c in v):
            return float(v) if "." in v else int(v)
        return v

    if ";" in x:
        return [[read_dtype(z) for z in y.split(",")] for y in x.split(";")]
    if "," in x:
        return [read_dtype(y) for y in x.split(",")]
    return read_dtype(x)


def str_to_bool(s: Union[str, bool]) -> bool:
    if isinstance(s, bool):
        return s
    return s.lower() in ("yes", "true", "t", "1")


@dataclasses.dataclass
class Config:
    """Full framework configuration (flag parity with ref: deepxi/args.py)."""
    ver: str = "resnet-1.1c"
    network_type: str = "ResNetV2"
    inp_tgt_type: str = "MagXi"

    # modes
    train: bool = False
    infer: bool = False
    test: bool = False
    spect_dist: bool = False
    prelim: bool = False
    export: bool = False  # AOT serving export (deepxi_tpu.serving)
    export_path: Optional[str] = None  # default: out/<ver>/e<N>/serving
    sd_snr_levels: Any = dataclasses.field(default_factory=lambda: [-5, 0, 5, 10, 15])
    sd_target: Any = "xi"  # "xi", "gamma", or a list of both

    # features (ref: main.py:33-35 derivations)
    f_s: int = 16000
    T_d: int = 32
    T_s: int = 16
    min_snr: int = -10
    max_snr: int = 20
    snr_inter: int = 1
    n_filters: int = 40

    # training
    mbatch_size: int = 8
    sample_size: int = 1000
    max_epochs: int = 200
    resume_epoch: int = 0
    test_epoch: Union[int, List[int]] = 200
    save_model: bool = True
    save_every: int = 1   # checkpoint every N epochs (always at the last)
    val_every: int = 1    # evaluate the validation set every N epochs
    log_iter: bool = False
    eval_example: bool = False
    val_flag: bool = True
    loss_fnc: str = "BinaryCrossentropy"
    seed: int = 0

    # resets
    reset_inp_tgt: bool = False
    reset_sample: bool = False

    # network hyper-parameters
    d_model: Optional[int] = None
    n_blocks: Optional[int] = None
    n_heads: Optional[int] = None
    d_f: Optional[int] = None
    d_b: Optional[int] = None
    d_ff: Optional[int] = None
    k: Optional[int] = None
    max_d_rate: Optional[int] = None
    causal: bool = True
    warmup_steps: int = 40000
    length: Optional[int] = None
    m_1: Optional[int] = None
    unit_type: Optional[str] = None
    outp_act: str = "Sigmoid"
    max_len: Optional[int] = None
    Noutp: Optional[int] = None  # MagPhonemes class count (ref: args.py:117)
    attention_impl: str = "full"  # "block": O(T*block_q) long-audio attention
    block_q: int = 256
    tcn_fused: bool = False  # fused Pallas TCN in the infer fast path (1.7x)
    # Differentiable fused TCN (custom-VJP Pallas fwd+bwd,
    # ops/kernels/tcn_fused_train.py) in the train step; gradient-parity
    # tested vs the flax path (tests/test_tcn_fused_train.py).
    tcn_fused_train: bool = False
    # Fused Pallas attention (VMEM-resident scores) for MHANetV2/V3 in the
    # infer fast path; matches the full path on valid rows to float
    # rounding (tests/test_mha_fused.py), forward-only so inference-gated.
    # Ignored when attention_impl is explicitly "block".
    mha_fused: bool = True
    # MXU precision of the analysis/synthesis DFT matmuls in the fused
    # inference path ("highest" = f32-exact, "default" = one-pass bf16
    # multiplies, ~1.2x end-to-end; quality-neutral on trained weights:
    # |PESQ delta| <= 0.002 MOS, |STOI delta| <= 0.2 pp -- hardware-gated
    # regression in tests/test_tpu_hw.py). Training and the polar
    # (non-fused) paths always use the exact FFT.
    dft_precision: str = "highest"
    import_stats: Optional[str] = None  # reference <ver>_inp_tgt.p to adopt

    # map
    map_type: Any = "DBNormalCDF"
    map_params: Any = None

    # inference
    out_type: str = "y"
    gain: Union[str, List[str]] = "mmse-lsa"
    saved_data_path: Optional[str] = None

    # phoneme-classifier mode (MagPhonemes): forced-alignment + lexicon
    # inputs for the labelled loader (ref: deepxi/utils.py:205-267)
    ali_path: Optional[str] = None
    lexicon_path: Optional[str] = None

    # hybrid/classical inference artifacts (tools/build_gaussians.py):
    # per-phoneme log-STMS Gaussians for hybrid_mixmax / tracking_vts
    mixmax_stats: Optional[str] = None
    vts_stats: Optional[str] = None

    # paths (ref: deepxi/args.py:76-85)
    model_path: str = "model"
    set_path: str = "set"
    log_path: str = "log"
    data_path: str = "data"
    test_x_path: str = "set/test_noisy_speech"
    test_s_path: str = "set/test_clean_speech"
    test_d_path: str = "set/test_noise"
    out_path: str = "out"

    # parallelism (TPU-native; no reference equivalent)
    n_data_shards: Optional[int] = None
    n_model_shards: int = 1
    # host-metric process pool in test(): 0 = one per CPU, 1 = serial
    metric_workers: int = 0

    @property
    def N_d(self) -> int:
        return int(self.f_s * self.T_d * 0.001)

    @property
    def N_s(self) -> int:
        return int(self.f_s * self.T_s * 0.001)

    @property
    def K(self) -> int:
        return int(2 ** math.ceil(math.log2(self.N_d)))

    @property
    def snr_levels(self) -> List[int]:
        return list(range(self.min_snr, self.max_snr + 1, self.snr_inter))

    def network_kwargs(self) -> Dict[str, Any]:
        return {k: getattr(self, k) for k in
                ("d_model", "n_blocks", "n_heads", "d_f", "k", "max_d_rate",
                 "causal", "unit_type", "outp_act", "max_len", "length", "m_1",
                 "warmup_steps", "attention_impl", "block_q")}

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# Hyper-parameter presets carried over verbatim from run.sh
# (ref: run.sh:11-353; DEMAND-VB variants ref: run_demand_voice_bank.sh).
_COMMON = dict(inp_tgt_type="MagXi", map_type="DBNormalCDF", sample_size=1000,
               f_s=16000, T_d=32, T_s=16, loss_fnc="BinaryCrossentropy",
               outp_act="Sigmoid", max_epochs=200, mbatch_size=8)

VERSION_PRESETS: Dict[str, Dict[str, Any]] = {
    # dft_precision="default" (one bf16 MXU pass for the analysis/
    # synthesis matmuls instead of 6-pass f32 emulation) is measured
    # quality-neutral for the attention flagship on REAL trained weights:
    # PESQ delta +0.0001 MOS, STOI delta -0.008 pp on the checked-in
    # big-corpus e400 artifact (bench.bench_numerics, re-run every round).
    "mhanet-1.1c": dict(network_type="MHANetV3", d_model=256, n_blocks=5,
                        n_heads=8, warmup_steps=40000, causal=True,
                        max_len=2048, test_epoch=200,
                        dft_precision="default", **_COMMON),
    "mhanet-1.0c": dict(network_type="MHANetV2", d_model=256, n_blocks=5,
                        n_heads=8, warmup_steps=40000, causal=True,
                        test_epoch=200, dft_precision="default", **_COMMON),
    # tcn_fused: the fused Pallas TCN kernel (bf16 in-kernel matmuls) is
    # 1.7x faster and measured quality-neutral on trained weights: on the
    # 150-epoch quality-campaign checkpoint, |PESQ delta| <= 0.0005 MOS
    # and |STOI delta| <= 0.04 pp vs the f32 XLA path over held-out
    # conditions (hardware-gated regression: tests/test_tpu_hw.py, run
    # with DEEPXI_TPU_TESTS=1), so the flagship preset enables it for
    # inference. Random (untrained) weights DO diverge under bf16 -- the
    # neutrality claim is for trained models only.
    # tcn_fused_train: the differentiable fused stack wins the
    # interleaved A/B at the preset's own mbatch_size=8 (driver-protocol
    # bench.bench_train_ab, round 5: fused 86.3 vs XLA 84.9 steps/s,
    # ratio 1.017 on the full step; isolated fwd+bwd 1.12-1.20x -- the
    # full step is dominated by mixing/STFT/Adam shared by both arms),
    # and a full 150-epoch campaign trained through it matches the XLA
    # path's quality (PESQ 2.70/STOI 87.8 vs 2.63/87.0 -- run-to-run
    # noise). Round-4 driver benches that showed XLA ~1.5x ahead timed
    # the arms sequentially, minutes apart -- relay-jitter artifact.
    "resnet-1.1c": dict(network_type="ResNetV2", d_model=256, n_blocks=40,
                        d_f=64, k=3, max_d_rate=16, causal=True,
                        unit_type="ReLU->LN->W+b", test_epoch=200,
                        tcn_fused=True, tcn_fused_train=True,
                        dft_precision="default", **_COMMON),
    "resnet-1.1n": dict(network_type="ResNetV2", d_model=256, n_blocks=40,
                        d_f=64, k=3, max_d_rate=16, causal=False,
                        unit_type="ReLU->LN->W+b", test_epoch=180, **_COMMON),
    "rdlnet-1.0n": dict(network_type="RDLNet", n_blocks=18, length=7, m_1=32,
                        causal=False, unit_type="ReLU->LN->W+b",
                        test_epoch=180, **_COMMON),
    "resnet-1.0c": dict(network_type="ResNet", d_model=256, n_blocks=40,
                        d_f=64, k=3, max_d_rate=16, causal=True,
                        test_epoch=100, **_COMMON),
    "resnet-1.0n": dict(network_type="ResNet", d_model=256, n_blocks=40,
                        d_f=64, k=3, max_d_rate=16, causal=False,
                        test_epoch=180, **_COMMON),
    "reslstm-1.0c": dict(network_type="ResLSTM", d_model=512, n_blocks=5,
                         causal=True, test_epoch=200, **_COMMON),
}

# DEMAND VoiceBank training variants (ref: run_demand_voice_bank.sh:6-8,40).
for _ver in list(VERSION_PRESETS):
    VERSION_PRESETS[_ver + "-vb"] = dict(VERSION_PRESETS[_ver], min_snr=0,
                                         max_snr=15, snr_inter=5,
                                         val_flag=False, test_epoch=125)


def preset(ver: str, **overrides: Any) -> Config:
    """Config for a version preset, with overrides."""
    if ver not in VERSION_PRESETS:
        raise ValueError(f"Unknown version preset: {ver!r} "
                         f"(known: {sorted(VERSION_PRESETS)})")
    kw = dict(VERSION_PRESETS[ver])
    kw.update(overrides)
    return Config(ver=ver, **kw)
