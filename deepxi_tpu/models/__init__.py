"""L3 networks (ref: deepxi/network/)."""

from deepxi_tpu.models.attention import MHANet, MHANetV2, MHANetV3
from deepxi_tpu.models.rdlnet import RDLNet
from deepxi_tpu.models.rnn import ResBiLSTM, ResLSTM
from deepxi_tpu.models.selector import network_selector
from deepxi_tpu.models.tcn import ResNet, ResNetV2, ResNetV3

__all__ = [
    "MHANet", "MHANetV2", "MHANetV3", "RDLNet", "ResBiLSTM", "ResLSTM",
    "ResNet", "ResNetV2", "ResNetV3", "network_selector",
]
