"""VCG fine-tuning CLI.

Parity target: the reference's vcg_train.py:31-355 — fine-tune
MultiModalBartForConditionalGeneration on VCG with per-epoch checkpoints,
optional validation loss and generation-score validation, a sample-decode
callback every 100 steps, and TensorBoard logging. TPU-native: single
process, pjit over a data(-x model) mesh instead of mp.spawn + DDP.
"""

import argparse
import json
import os
from datetime import datetime

import jax
import numpy as np

from kmbart_tpu.cli_common import (
    add_common_model_args, add_dropout_args, add_hardware_args,
    build_model_params, is_main_process, load_model_config,
    load_sharded_train_checkpoint, local_batch_divisor, make_mesh_from_args,
    save_train_checkpoint, setup_platform, sync_timestamp)
from kmbart_tpu.checkpoint.io import load_training_data
from kmbart_tpu.data.collation import Collator
from kmbart_tpu.data.datasets import VCGDataset
from kmbart_tpu.data.loader import DataLoader, ShardedSampler
from kmbart_tpu.data.tokenization import ConditionTokenizer
from kmbart_tpu.generation.api import generate
from kmbart_tpu.models.conditional import conditional_loss, init_conditional_params
from kmbart_tpu.parallel.train_step import build_eval_step, build_train_step
from kmbart_tpu.training.adamw import adamw, adamw_init
from kmbart_tpu.training.state import TrainState
from kmbart_tpu.training.trainer import run_epoch
from kmbart_tpu.training.validation import (
    validate_fine_tune_loss, validate_generation_score)
from kmbart_tpu.utils.logger import Logger


def main(args):
    setup_platform(args)
    is_main = is_main_process()
    timestamp = sync_timestamp(datetime.now().strftime("%Y-%m-%d-%H-%M-%S"))
    checkpoint_path = os.path.join(args.checkpoint_dir, timestamp)
    tb_writer = None
    log_dir = os.path.join(args.log_dir, timestamp) if args.log_dir else None

    if log_dir is not None and is_main:
        os.makedirs(log_dir, exist_ok=True)
        from kmbart_tpu.utils.tb import SummaryWriter
        tb_writer = SummaryWriter(log_dir=log_dir)
    # rank-gated like the reference Logger (src/utils.py:42-79)
    logger = Logger(log_file=os.path.join(log_dir, 'log.txt')
                    if (log_dir and is_main) else None, enabled=is_main)

    os.makedirs(checkpoint_path, exist_ok=True)
    logger.info('Made checkpoint directory: "{}"'.format(checkpoint_path))
    logger.info('Initialised with {} device(s)'.format(len(jax.devices())), pad=True)
    for k, v in vars(args).items():
        logger.info('{}: {}'.format(k, v))

    logger.info('Loading model...')
    tokenizer = ConditionTokenizer(assets_dir=args.tokenizer_dir)
    cfg = load_model_config(args)
    params = build_model_params(args, cfg, init_conditional_params, logger)

    optimizer = adamw(lr=args.lr)
    state = TrainState.create(params)

    epoch = 0
    if args.continue_training:
        sh = load_sharded_train_checkpoint(args, state)
        if sh is not None:
            state, saved_epoch = sh
            epoch = saved_epoch + 1
        else:
            td = load_training_data(args.checkpoint,
                                    opt_state_template=state.opt_state)
            epoch = td['epoch'] + 1
            if td['opt_state'] is not None:
                state = state._replace(opt_state=td['opt_state'],
                                       step=np.int32(td['step'] or 0))

    mesh = make_mesh_from_args(args) if len(jax.devices()) > 1 else None
    if getattr(args, 'sequence_parallel', False) and mesh is not None:
        from kmbart_tpu.parallel import sp
        if sp.activate(mesh):
            logger.info('Sequence parallelism active (TP degree {})'.format(
                dict(mesh.shape).get('model', 1)))
    pp_active = (mesh is not None
                 and dict(mesh.shape).get('stage', 1) > 1)
    if pp_active:
        from kmbart_tpu.cli_common import pipeline_microbatches
        n_micro = pipeline_microbatches(args)
    n_data = local_batch_divisor(mesh)  # data shards fed by THIS process
    if pp_active:
        # every data shard must further split into n_micro pipeline
        # microbatches, so partial batches trim to this multiple
        n_data *= n_micro
    from kmbart_tpu.cli_common import data_feed, validate_batch_layout
    validate_batch_layout(args, n_data)
    # sampler striding by FEED GROUP: processes covering the same data
    # shards (stage-spanning pipelines) load identical batches
    feed_replicas, feed_rank = data_feed(mesh)
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        batch_sharding = NamedSharding(mesh, PartitionSpec('data'))

    logger.info('Loading data...')
    collate_fn = Collator(tokenizer, has_label=True,
                          max_img_num=cfg.max_img_num,
                          image_feature_size=cfg.image_feature_size,
                          num_mrm_labels=cfg.num_labels,
                          rng=np.random.default_rng(args.seed))
    collate_fn_gen = Collator(tokenizer, has_label=False,
                              max_img_num=cfg.max_img_num,
                              image_feature_size=cfg.image_feature_size)

    train_dataset = VCGDataset(args.data_dir, split='train',
                               use_image=args.use_image, use_event=args.use_event)
    train_loader = DataLoader(
        train_dataset, batch_size=args.batch_size, collate_fn=collate_fn,
        sampler=ShardedSampler(len(train_dataset),
                               num_replicas=feed_replicas,
                               rank=feed_rank,
                               shuffle=True, seed=args.seed),
        num_workers=args.num_workers, drop_last=True, batch_divisor=n_data)

    val_dataset = VCGDataset(args.data_dir, split='val',
                             use_image=args.use_image, use_event=args.use_event)
    val_loader = DataLoader(val_dataset, batch_size=args.batch_size,
                            collate_fn=collate_fn, num_workers=args.num_workers,
                            sampler=ShardedSampler(len(val_dataset),
                                                   num_replicas=feed_replicas,
                                                   rank=feed_rank,
                                                   shuffle=False),
                            batch_divisor=n_data)

    gen_dataset = VCGDataset(args.data_dir, split='val', use_image=args.use_image,
                             use_event=args.use_event, eval_mode=True)
    gen_loader = DataLoader(gen_dataset, batch_size=args.batch_size,
                            collate_fn=collate_fn_gen,
                            num_workers=args.num_workers)

    val_ref = json.load(open(os.path.join(args.data_dir, 'val_ref.json')))

    if pp_active:
        from kmbart_tpu.parallel import pp
        logger.info('Pipeline parallelism active ({} stages, {} '
                    'microbatches)'.format(dict(mesh.shape)['stage'], n_micro))

        def loss_fn(p, b, rng):
            loss, _ = pp.pipelined_conditional_loss(
                p, cfg, b, mesh, n_micro=n_micro, train=True, rng=rng)
            return loss, {}

        def eval_loss_fn(p, b, rng):
            loss, _ = pp.pipelined_conditional_loss(
                p, cfg, b, mesh, n_micro=n_micro, train=False)
            return loss, {}

        param_specs = pp.stage_train_state_shardings(
            mesh, state.params, zero1=getattr(args, 'zero1', False))
        state = jax.tree.map(jax.device_put, state, param_specs)
    else:
        def loss_fn(p, b, rng):
            loss, _ = conditional_loss(p, cfg, b, train=True, rng=rng)
            return loss, {}

        def eval_loss_fn(p, b, rng):
            loss, _ = conditional_loss(p, cfg, b, train=False)
            return loss, {}

        param_specs = None
        zero1 = getattr(args, 'zero1', False)
        if mesh is not None and (mesh.shape.get('model', 1) > 1
                                 or zero1):
            from kmbart_tpu.parallel.tp import (
                shard_train_state, train_state_shardings)
            param_specs = train_state_shardings(mesh, state.params,
                                                zero1=zero1)
            state = shard_train_state(mesh, state, zero1=zero1)
    train_step = build_train_step(loss_fn, optimizer, mesh=mesh,
                                  param_specs=param_specs,
                                  grad_accum_steps=args.grad_accum_steps)

    eval_step = build_eval_step(
        eval_loss_fn, mesh=mesh,
        param_specs=None if param_specs is None else param_specs.params)

    def callback(step, epoch, state, logger, **kwargs):
        if args.save_every_steps and (step + 1) % args.save_every_steps == 0:
            path = os.path.join(checkpoint_path,
                                'step{}'.format(int(state.step)))
            save_train_checkpoint(path, cfg, state, epoch, args)
            logger.info('Saved mid-epoch checkpoint at "{}"'.format(path))
        if (step + 1) % 100 == 0:
            params = state.params
            if jax.process_count() > 1 or pp_active:
                # generate() is a process-local jit; pull a host copy of the
                # (replicated, stage- or TP-sharded) global params for the
                # decode — a collective gather when shards span processes,
                # so EVERY rank joins before the is_main gate below
                from kmbart_tpu.cli_common import host_replicated
                params = host_replicated(params)
            if not is_main:
                return
            inputs = collate_fn([train_dataset[0]])
            out = generate(params, cfg,
                           {'input_ids': inputs['input_ids'],
                            'attention_mask': inputs['attention_mask'],
                            'image_features': inputs['image_features']},
                           max_length=args.max_length)
            ans = tokenizer.decode(out[0], skip_special_tokens=True)
            event = tokenizer.decode(
                inputs['input_ids'][0], skip_special_tokens=True)
            logger.info('Input ({} image): "{}"'.format(
                'with' if args.use_image else 'without', event))
            logger.info('Generated: "{}"'.format(ans))

    logger.info('Start training', pad=True)
    start = datetime.now()
    rng = jax.random.PRNGKey(args.seed)

    while epoch < args.epochs:
        logger.info('Epoch {}'.format(epoch + 1), pad=True)
        train_loader.set_epoch(epoch)
        state, _ = run_epoch(epoch, state, train_step, train_loader, rng,
                             epochs=args.epochs, logger=logger,
                             callback=callback, log_interval=1,
                             tb_writer=tb_writer, tb_interval=1,
                             batch_sharding=batch_sharding)

        logger.info('Validating Epoch {}'.format(epoch + 1), pad=True)
        if args.validate_loss:
            validate_fine_tune_loss(epoch, state.params, eval_step, val_loader,
                                    logger=logger, tb_writer=tb_writer,
                                    batch_sharding=batch_sharding)
        if args.validate_score:
            # decode is process-local; run it on process 0 with host params
            # (the gather is a collective when shards span processes, so it
            # runs on every rank; only the scoring itself is rank-0)
            score_params = state.params
            if jax.process_count() > 1 or pp_active:
                from kmbart_tpu.cli_common import host_replicated
                score_params = host_replicated(state.params)
            if is_main:
                validate_generation_score(epoch, score_params, cfg,
                                          gen_loader, val_ref, tokenizer,
                                          args, logger=logger,
                                          tb_writer=tb_writer)

        current = os.path.join(checkpoint_path, 'model{}'.format(epoch))
        save_train_checkpoint(current, cfg, state, epoch, args)
        logger.info('Saved checkpoint at "{}"'.format(checkpoint_path))
        epoch += 1

    from kmbart_tpu.checkpoint.sharded import wait_for_async_saves
    wait_for_async_saves()  # final checkpoint must be durable before exit
    logger.info('Training complete in: ' + str(datetime.now() - start), pad=True)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_dir', required=True, type=str,
                        help='path to load data, output_dir of prepare_vcg')
    parser.add_argument('--checkpoint_dir', required=True, type=str,
                        help='where to save the checkpoint')
    add_common_model_args(parser)
    parser.add_argument('--epochs', default=40, type=int)
    parser.add_argument('--lr', default=1e-5, type=float)
    parser.add_argument('--num_gen', default=1, type=int,
                        help='number of generated sentence on validation.')
    parser.add_argument('--num_beams', default=1, type=int,
                        help='level of beam search on validation')
    parser.add_argument('--max_length', default=30, type=int,
                        help='max decode length')
    parser.add_argument('--continue_training', action='store_true')
    parser.add_argument('--save_every_steps', default=0, type=int,
                        help='also checkpoint every N steps (0 = per-epoch only, the reference behaviour); preemption robustness')
    parser.add_argument('--validate_loss', action='store_true')
    parser.add_argument('--validate_score', action='store_true')
    add_dropout_args(parser)
    add_hardware_args(parser)
    parser.set_defaults(use_event=True, use_image=True)
    args = parser.parse_args()
    if args.checkpoint is None and args.model_config is None:
        raise ValueError('--model_config and --checkpoint cannot be empty at the same time')
    return args


def cli():
    """console-script entry point (pyproject.toml)."""
    main(parse_args())


if __name__ == '__main__':
    cli()
