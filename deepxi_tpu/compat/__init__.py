"""Importers for reference artifacts (SavedModel checkpoints, stats pickles)."""

from deepxi_tpu.compat.tf_import import (
    import_mhanet_v1,
    import_mhanet_v2,
    import_mhanet_v3,
    import_reslstm,
    import_resnet,
    load_inp_tgt_stats,
    read_keras_checkpoint,
)

__all__ = ["import_mhanet_v1", "import_mhanet_v2", "import_mhanet_v3",
           "import_reslstm", "import_resnet", "load_inp_tgt_stats",
           "read_keras_checkpoint"]
