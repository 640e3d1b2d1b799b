"""Shared driver for the COMET reasoning-generation CLIs.

Parity target: scripts/prepare_{sbu,cc,coco,vcg}_reason.py — run the
ATOMIC generator over each dataset entry's caption/event, emit
``reason_{split}.json`` rows (one per generated inference, task-typed),
``*_eval.json`` / ``*_ref.json``, with the reference's crude resumability:
periodic checkpoint dumps every ``--save_every`` items and resume from the
last saved index (scripts/prepare_sbu_reason.py:126-160).
"""

import argparse
import json
import os
from datetime import datetime


def build_generator(args):
    import jax
    from kmbart_tpu.knowledge.atomic import AtomicGenerator
    from kmbart_tpu.knowledge.bpe_gpt1 import GPT1BPE
    from kmbart_tpu.knowledge import gpt

    enc = GPT1BPE(os.path.join(args.comet_vocab_dir, "vocab.json"),
                  os.path.join(args.comet_vocab_dir, "merges.txt"))
    n_vocab = len(enc.encoder) + 5 + 1  # +categories +<END> appended rows
    params = gpt.init_gpt_params(jax.random.PRNGKey(0), n_vocab,
                                 n_ctx=17 + 34 + 1, d_model=args.gpt_dim,
                                 n_layers=args.gpt_layers,
                                 n_heads=args.gpt_heads)
    if args.model_file:
        from kmbart_tpu.checkpoint.torch_import import load_torch_checkpoint
        from kmbart_tpu.knowledge.gpt import import_openai_gpt_state_dict
        sd = load_torch_checkpoint(args.model_file)
        params, ok = import_openai_gpt_state_dict(sd, params)
        print("comet weights loaded:", ok, flush=True)
    return AtomicGenerator(params, enc,
                           sampling_algorithm=args.sampling_algorithm,
                           n_heads=args.gpt_heads)


def get_text_data(entry, index, caption, generator):
    base = {"img_id": str(entry["img_id"]), "img_fn": entry.get("img_fn"),
            "index": index}
    res = generator.get_reason(caption)
    data = []
    for k in ("before", "after", "intent"):
        for ans in res[k]:
            data.append({**base, "event": caption, "task_type": k,
                         "labels": ans})
    return data, res


def get_eval_data(entry, index, caption, ref_ans):
    base = {"img_id": str(entry["img_id"]), "img_fn": entry.get("img_fn"),
            "index": index}
    return [{**base, "event": caption, "task_type": t}
            for t in ("before", "after", "intent") if len(ref_ans[t])]


def process_split(args, split, entries, caption_key):
    generator = build_generator(args)
    local = entries[args.shard::args.num_shards]
    suffix = str(args.shard)
    paths = {
        "text": os.path.join(args.output_dir, split + suffix + ".json"),
        "eval": os.path.join(args.output_dir, split + suffix + "_eval.json"),
        "ref": os.path.join(args.output_dir, split + suffix + "_ref.json"),
    }
    if all(os.path.exists(p) for p in paths.values()):
        text_data = json.load(open(paths["text"]))
        eval_data = json.load(open(paths["eval"]))
        ref_data = json.load(open(paths["ref"]))
        start_idx = text_data[-1]["index"] if text_data else -1
    else:
        text_data, eval_data, ref_data = [], [], []
        start_idx = -1

    def dump():
        json.dump(text_data, open(paths["text"], "w"))
        json.dump(eval_data, open(paths["eval"], "w"))
        json.dump(ref_data, open(paths["ref"], "w"))

    start_time = datetime.now()
    for i in range(start_idx + 1, len(local)):
        entry = local[i]
        caption = entry[caption_key]
        rows, ref_ans = get_text_data(entry, i, caption, generator)
        text_data += rows
        eval_data += get_eval_data(entry, i, caption, ref_ans)
        ref_data.append(ref_ans)
        print("shard{}, {}/{}, ETA: {}".format(
            args.shard, i, len(local),
            str((len(local) - (i + 1)) / (i + 1)
                * (datetime.now() - start_time))), flush=True)
        if i % args.save_every == 0:
            dump()
    dump()


def merge_shards(args, split):
    """Concatenate per-shard outputs into reason_{split}.json etc."""
    for kind, out_name in (("", f"reason_{split}.json"),
                           ("_eval", f"reason_{split}_eval.json"),
                           ("_ref", f"reason_{split}_ref.json")):
        merged = []
        for shard in range(args.num_shards):
            p = os.path.join(args.output_dir, f"{split}{shard}{kind}.json")
            if os.path.exists(p):
                merged += json.load(open(p))
        json.dump(merged, open(os.path.join(args.output_dir, out_name), "w"))


def make_parser(annot_help):
    parser = argparse.ArgumentParser()
    parser.add_argument("--annot_dir", type=str, required=True, help=annot_help)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--model_file", type=str, default=None,
                        help="COMET GPT checkpoint (.pickle/.pth)")
    parser.add_argument("--comet_vocab_dir", type=str, required=True,
                        help="dir with the GPT-1 vocab.json + merges.txt")
    parser.add_argument("--sampling_algorithm", type=str, default="greedy",
                        help="greedy | topk-N")
    parser.add_argument("--splits", nargs="*", default=["train", "val"])
    parser.add_argument("--save_every", type=int, default=10000)
    parser.add_argument("--merge_only", action="store_true")
    parser.add_argument("--num_shards", default=1, type=int)
    parser.add_argument("--shard", default=0, type=int)
    # model-shape knobs (framework extension): the COMET GPT-1 defaults
    # match the pretrained checkpoint; smaller values make smoke tests
    # cheap. Checkpoint import requires the defaults.
    parser.add_argument("--gpt_dim", default=768, type=int)
    parser.add_argument("--gpt_layers", default=12, type=int)
    parser.add_argument("--gpt_heads", default=12, type=int)
    return parser


def run(caption_key, annot_help):
    args = make_parser(annot_help).parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    for split in args.splits:
        if not args.merge_only:
            with open(os.path.join(args.annot_dir, split + ".json")) as f:
                entries = json.load(f)
            process_split(args, split, entries, caption_key)
        merge_shards(args, split)
