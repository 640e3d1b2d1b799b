from kmbart_tpu.checkpoint.io import save_pretrained, load_pretrained, save_training_data, load_training_data  # noqa: F401
from kmbart_tpu.checkpoint.torch_import import load_torch_checkpoint, state_dict_to_pytree  # noqa: F401
