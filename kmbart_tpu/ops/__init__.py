from kmbart_tpu.ops.layers import dense, layer_norm, gelu, dropout  # noqa: F401
from kmbart_tpu.ops.attention import multi_head_attention  # noqa: F401
