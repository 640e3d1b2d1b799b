"""COMET reasoning generation over the prepared VCG index.

Parity target: scripts/prepare_vcg_reason.py — identical driver to the
caption datasets, but the conditioning text is the VCG event field.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


from scripts.reason_common import run

if __name__ == "__main__":
    run(caption_key="event",
        annot_help="directory with the prepared VCG {split}.json files")
