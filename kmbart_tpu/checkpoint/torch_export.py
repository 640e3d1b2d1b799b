"""Export framework checkpoints back to the reference's torch format.

Interop in the other direction from torch_import.py: a user switching
between the PyTorch reference and this framework can hand checkpoints both
ways (``pytorch_model.bin`` + ``config.json`` per the reference's
``save_pretrained`` layout, pretrain.py:314-320). Uses torch when imported
(test/interop convenience only — the framework itself never requires it).
"""

import json
import os

from kmbart_tpu.checkpoint.torch_import import pytree_to_state_dict


def save_torch_pretrained(path, config, params):
    """Write ``path/pytorch_model.bin`` + ``path/config.json``."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "torch is required for exporting reference-format checkpoints "
            "(the framework's own format is checkpoint/io.py)") from e
    os.makedirs(path, exist_ok=True)
    sd = pytree_to_state_dict(params, config)
    torch.save({k: torch.tensor(v) for k, v in sd.items()},
               os.path.join(path, "pytorch_model.bin"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config.to_dict(), f, indent=2, sort_keys=True)
