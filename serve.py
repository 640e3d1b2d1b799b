"""Serving CLI: load a checkpoint and serve generation over HTTP.

No reference counterpart (the reference is research code); this completes
the production-serving story: dynamic batching on fixed-shape compiled
programs (kmbart_tpu/serving/engine.py) behind a threaded HTTP endpoint.

    python serve.py --checkpoint ckpt/model39 --tokenizer_dir ASSETS \\
        --port 8000 --num_beams 5 --max_length 32
    curl -XPOST localhost:8000/generate -d '{"text": "<caption><event> ... </event>"}'
"""

import argparse
import os

from kmbart_tpu.cli_common import setup_platform
from kmbart_tpu.checkpoint.io import load_pretrained
from kmbart_tpu.data.tokenization import ConditionTokenizer
from kmbart_tpu.models.conditional import init_conditional_params
from kmbart_tpu.serving.engine import GenerationEngine
from kmbart_tpu.serving.http import serve
from kmbart_tpu.utils.logger import Logger


def main(args):
    setup_platform(args)
    logger = Logger()
    logger.info("Loading model...")
    tokenizer = (ConditionTokenizer(assets_dir=args.tokenizer_dir)
                 if args.tokenizer_dir else None)
    cfg, params, _ = load_pretrained(args.checkpoint, init_conditional_params,
                                     strict=False)
    if args.continuous:
        from kmbart_tpu.serving.continuous import ContinuousGenerationEngine
        engine = ContinuousGenerationEngine(
            params, cfg, tokenizer=tokenizer,
            pool_size=args.pool_size,
            encoder_seq_len=args.encoder_seq_len,
            chunk_steps=args.chunk_steps,
            num_beams=args.num_beams, max_length=args.max_length,
            early_stopping=True)
    else:
        engine = GenerationEngine(
            params, cfg, tokenizer=tokenizer,
            max_batch_size=args.max_batch_size,
            encoder_seq_len=args.encoder_seq_len,
            max_wait_ms=args.max_wait_ms,
            batch_buckets=(tuple(int(b)
                                 for b in args.batch_buckets.split(","))
                           if args.batch_buckets else None),
            num_beams=args.num_beams, max_length=args.max_length,
            early_stopping=True)
    logger.info(f"Serving on http://{args.host}:{args.port}", pad=True)
    try:
        serve(engine, host=args.host, port=args.port, block=True)
    finally:
        engine.shutdown()


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True, type=str)
    parser.add_argument("--tokenizer_dir",
                        default=os.environ.get("KMBART_TOKENIZER_DIR"), type=str)
    parser.add_argument("--host", default="127.0.0.1", type=str)
    parser.add_argument("--port", default=8000, type=int)
    parser.add_argument("--max_batch_size", default=32, type=int)
    parser.add_argument("--batch_buckets", default=None, type=str,
                        help="comma-separated measured-good batch sizes "
                             "(default: engine.DEFAULT_BATCH_BUCKETS from "
                             "the v5e bench sweep)")
    parser.add_argument("--encoder_seq_len", default=96, type=int)
    parser.add_argument("--max_wait_ms", default=5.0, type=float)
    parser.add_argument("--num_beams", default=5, type=int)
    parser.add_argument("--max_length", default=32, type=int)
    parser.add_argument("--continuous", action="store_true",
                        help="slot-pool continuous batching "
                             "(serving/continuous.py): requests admit into "
                             "finished rows of the in-flight pool at chunk "
                             "granularity instead of bucket coalescing")
    parser.add_argument("--pool_size", default=112, type=int,
                        help="in-flight slot count for --continuous")
    parser.add_argument("--chunk_steps", default=4, type=int,
                        help="decode steps per pool chunk for --continuous")
    parser.add_argument("--cpu", action="store_true")
    return parser.parse_args()


def cli():
    """console-script entry point (pyproject.toml)."""
    main(parse_args())


if __name__ == "__main__":
    cli()
