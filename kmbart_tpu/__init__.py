"""KM-BART TPU: a TPU-native JAX framework for knowledge-enhanced multimodal BART.

A from-scratch rebuild of the capabilities of fomalhautb/KM-BART (ACL 2021)
designed TPU-first: functional JAX models (pytree params, stacked layers run
under ``lax.scan``), fully ``jit``-ed training and decoding (``lax.while_loop``
beam search with a preallocated KV cache), ``jax.sharding`` data/tensor
parallelism over a device mesh, bf16 matmuls with fp32 params, and Pallas
kernels on the hot paths.

No PyTorch and no HuggingFace ``transformers`` at runtime — the byte-level BPE
tokenizer, BART blocks, beam search, AdamW, checkpointing and the
BLEU/METEOR/CIDEr evaluation stack are all owned by this package.
"""

__version__ = "0.1.0"

from kmbart_tpu.config import MultiModalBartConfig  # noqa: F401
from kmbart_tpu.utils.task import TaskType  # noqa: F401
