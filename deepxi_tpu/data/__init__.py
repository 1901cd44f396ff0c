"""L6 data/batch IO (ref: deepxi/utils.py, deepxi/se_batch.py)."""

from deepxi_tpu.data.listing import (batch_list, batch_list_labelled,
                                     test_batch, val_wav_batch)
from deepxi_tpu.data.loader import MiniBatchLoader, bucket_length
from deepxi_tpu.data.wavio import read_wav, save_wav, wav_length

__all__ = ["MiniBatchLoader", "batch_list", "batch_list_labelled", "bucket_length", "read_wav",
           "save_wav", "test_batch", "val_wav_batch", "wav_length"]
