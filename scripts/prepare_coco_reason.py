"""COMET reasoning generation over the prepared COCO index.

Parity target: scripts/prepare_coco_reason.py in the reference — shard the
entries, run the ATOMIC generator per caption, checkpoint every 10k and
resume; merge per-shard outputs into reason_{split}.json.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


from scripts.reason_common import run

if __name__ == "__main__":
    run(caption_key="labels",
        annot_help="directory with the prepared coco {split}.json files")
