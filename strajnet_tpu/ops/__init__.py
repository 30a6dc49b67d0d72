from strajnet_tpu.ops.attention import TfaMultiHeadAttention
from strajnet_tpu.ops.windows import window_partition, window_reverse

__all__ = ["TfaMultiHeadAttention", "window_partition", "window_reverse"]
