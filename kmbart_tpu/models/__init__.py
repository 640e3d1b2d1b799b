from kmbart_tpu.models.bart import (  # noqa: F401
    init_bart_params,
    encode,
    decode,
    init_decode_cache,
    lm_logits,
)
from kmbart_tpu.models.pretraining import MultiModalBartForPreTraining  # noqa: F401
from kmbart_tpu.models.conditional import MultiModalBartForConditionalGeneration  # noqa: F401
