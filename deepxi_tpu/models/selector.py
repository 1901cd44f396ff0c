"""Network selector (ref: deepxi/network/selector.py:8-132).

Maps a `network_type` string to a flax module. All reference network types
are supported, including the ones the fork broke (`ResNetV4` does not exist
upstream either; `MHANet`/`RDLNet` import dead `dev.*` modules in the fork --
here MHANet V1 and RDLNet are working implementations).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn

from deepxi_tpu.models.attention import MHANet, MHANetV2, MHANetV3
from deepxi_tpu.models.rdlnet import RDLNet
from deepxi_tpu.models.rnn import ResBiLSTM, ResLSTM
from deepxi_tpu.models.tcn import ResNet, ResNetV2, ResNetV3


def network_selector(network_type: str, n_outp: int, **kwargs: Any) -> nn.Module:
    """Build the network module for `network_type`.

    kwargs use the reference flag names (d_model, n_blocks, d_f, k,
    max_d_rate, n_heads, causal, unit_type, outp_act, max_len, length, m_1,
    warmup_steps), extra keys are ignored per network.
    """
    def pick(*names):
        out: Dict[str, Any] = {}
        for n in names:
            if kwargs.get(n) is not None:
                out[n] = kwargs[n]
        return out

    if network_type == "MHANet":
        return MHANet(n_outp=n_outp, **pick(
            "d_model", "n_blocks", "n_heads", "causal", "outp_act", "warmup_steps"))
    if network_type == "MHANetV2":
        return MHANetV2(n_outp=n_outp, **pick(
            "d_model", "n_blocks", "n_heads", "causal", "outp_act",
            "warmup_steps", "attention_impl", "block_q"))
    if network_type == "MHANetV3":
        return MHANetV3(n_outp=n_outp, **pick(
            "d_model", "n_blocks", "n_heads", "causal", "outp_act",
            "warmup_steps", "max_len", "attention_impl", "block_q"))
    if network_type == "ResNet":
        return ResNet(n_outp=n_outp, **pick(
            "d_model", "n_blocks", "d_f", "k", "max_d_rate", "causal", "outp_act"))
    if network_type in ("ResNetV2", "ResNetV3"):
        cls = ResNetV2 if network_type == "ResNetV2" else ResNetV3
        return cls(n_outp=n_outp, **pick(
            "d_model", "n_blocks", "d_f", "k", "max_d_rate", "causal", "unit_type",
            "outp_act"))
    if network_type == "ResLSTM":
        return ResLSTM(n_outp=n_outp, **pick("d_model", "n_blocks", "outp_act"))
    if network_type == "ResBiLSTM":
        return ResBiLSTM(n_outp=n_outp, **pick("d_model", "n_blocks", "outp_act"))
    if network_type == "RDLNet":
        return RDLNet(n_outp=n_outp, **pick(
            "n_blocks", "length", "m_1", "causal", "unit_type", "outp_act"))
    raise ValueError(f"Invalid network type: {network_type!r}")
