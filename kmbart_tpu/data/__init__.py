from kmbart_tpu.data.tokenization import ConditionTokenizer  # noqa: F401
from kmbart_tpu.data.collation import Collator  # noqa: F401
