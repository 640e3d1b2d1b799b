"""Metric-scoring CLI.

Parity target: the reference's vcg_eval.py:8-41 — score a generation file
against a reference file with BLEU/METEOR/CIDEr (+ optional Unique/Novel
diversity vs the train annotations).
"""

import argparse
import json

from kmbart_tpu.eval.metrics import compute_metric_inference
from kmbart_tpu.utils.logger import Logger


def main(args):
    logger = Logger()
    with open(args.generation) as f:
        gens_list = json.load(f)
    with open(args.reference) as f:
        refs_list = json.load(f)
    scores = compute_metric_inference(
        gens_list=gens_list,
        refs_list=refs_list,
        calculate_diversity=args.annotation is not None,
        train_file=args.annotation)
    logger.info(scores)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--generation', type=str, required=True,
                        help='path to the generation file')
    parser.add_argument('--reference', type=str, required=True,
                        help='path to the reference file')
    parser.add_argument('--annotation', type=str, required=False,
                        help='path to vcg annotation. If not specified, do not compute novel and unique')
    return parser.parse_args()


def cli():
    """console-script entry point (pyproject.toml)."""
    main(parse_args())


if __name__ == '__main__':
    cli()
