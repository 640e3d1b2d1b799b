"""Multi-task pretraining CLI.

Parity target: the reference's pretrain.py:23-448 — the 16-name dataset
registry (coco/sbu/cc/vg/vcg + reason variants), multi-task MLM + MRM +
attribute/relation pretraining of MultiModalBartForPreTraining, per-epoch
checkpoints with optimizer state, a teacher-forced sample-decode callback
every 100 steps, and TensorBoard logging. TPU-native: single process with a
pjit data(-x model) mesh instead of mp.spawn + NCCL DDP.
"""

import argparse
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
from kmbart_tpu.data.datasets import (
    CCDataset, COCODataset, ConcatDataset, ReasonDataset, SBUDataset,
    VCGDataset, VGDataset)
from kmbart_tpu.data.loader import DataLoader, ShardedSampler
from kmbart_tpu.data.tokenization import ConditionTokenizer
from kmbart_tpu.models.pretraining import init_pretraining_params, pretraining_loss
from kmbart_tpu.parallel.train_step import build_train_step
from kmbart_tpu.training.adamw import adamw
from kmbart_tpu.training.state import TrainState
from kmbart_tpu.training.trainer import run_epoch
from kmbart_tpu.utils.logger import Logger

DATASET_NAMES = (
    'coco_train', 'coco_val', 'coco_reason_train', 'coco_reason_val',
    'sbu_train', 'sbu_val', 'sbu_reason_train', 'sbu_reason_val',
    'vg_train', 'vg_val', 'cc_train', 'cc_val', 'cc_reason_train',
    'cc_reason_val', 'vcg_train', 'vcg_reason_train'
)


def build_datasets(args):
    """Dataset registry (pretrain.py:128-248 in the reference)."""
    ds = []

    def reason(name, split):
        if name in args.dataset:
            ds.append(ReasonDataset(args.dataset[name], split=split,
                                    use_image=args.use_image,
                                    use_event=args.use_event))

    for name, split in (('sbu_train', 'train'), ('sbu_val', 'val')):
        if name in args.dataset:
            ds.append(SBUDataset(args.dataset[name], split=split,
                                 use_image=args.use_image))
    reason('sbu_reason_train', 'train')
    reason('sbu_reason_val', 'val')
    for name, split in (('coco_train', 'train'), ('coco_val', 'val')):
        if name in args.dataset:
            ds.append(COCODataset(args.dataset[name], split=split,
                                  use_image=args.use_image))
    reason('coco_reason_train', 'train')
    reason('coco_reason_val', 'val')
    for name, split in (('vg_train', 'train'), ('vg_val', 'val')):
        if name in args.dataset:
            ds.append(VGDataset(args.dataset[name], split=split))
    for name, split in (('cc_train', 'train'), ('cc_val', 'val')):
        if name in args.dataset:
            ds.append(CCDataset(args.dataset[name], split=split,
                                use_image=args.use_image))
    reason('cc_reason_train', 'train')
    reason('cc_reason_val', 'val')
    if 'vcg_train' in args.dataset:
        ds.append(VCGDataset(args.dataset['vcg_train'], split='train',
                             use_image=args.use_image, pretrain=True))
    reason('vcg_reason_train', 'train')
    return ConcatDataset(ds)


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
    params = build_model_params(args, cfg, init_pretraining_params, logger)

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
    # sampler striding by FEED GROUP (see vcg_train.py): stage-spanning
    # pipelines have several processes loading identical batches
    feed_replicas, feed_rank = data_feed(mesh)
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        batch_sharding = NamedSharding(mesh, PartitionSpec('data'))

    logger.info('Loading data...')
    collate_fn = Collator(
        tokenizer,
        mlm_enabled=True,
        mlm_probability=args.mlm_probability,
        mrm_enabled=args.mrm_enabled,
        mrm_probability=args.mrm_probability,
        ap_enabled=args.ap_enabled,
        rp_enabled=args.rp_enabled,
        lm_max_len=args.lm_max_len,
        max_img_num=args.max_img_num,
        image_feature_size=cfg.image_feature_size,
        num_mrm_labels=cfg.num_labels,
        rng=np.random.default_rng(args.seed),
    )
    train_dataset = build_datasets(args)
    train_loader = DataLoader(
        train_dataset, batch_size=args.batch_size, collate_fn=collate_fn,
        sampler=ShardedSampler(len(train_dataset),
                               num_replicas=feed_replicas,
                               rank=feed_rank,
                               shuffle=True, seed=args.seed),
        num_workers=args.num_workers, drop_last=True, batch_divisor=n_data)

    if pp_active:
        from kmbart_tpu.parallel import pp
        logger.info('Pipeline parallelism active ({} stages, {} '
                    'microbatches)'.format(dict(mesh.shape)['stage'], n_micro))

        def loss_fn(p, b, rng):
            loss, aux = pp.pipelined_pretraining_loss(
                p, cfg, b, mesh, n_micro=n_micro, train=True, rng=rng)
            return loss, {k: v for k, v in aux['losses'].items() if k != 'loss'}

        param_specs = pp.stage_train_state_shardings(
            mesh, state.params, zero1=getattr(args, 'zero1', False))
        state = jax.tree.map(jax.device_put, state, param_specs)
    else:
        def loss_fn(p, b, rng):
            loss, aux = pretraining_loss(p, cfg, b, train=True, rng=rng)
            return loss, {k: v for k, v in aux['losses'].items() if k != 'loss'}

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

    def callback(step, epoch, state, logger, **kwargs):
        if args.save_every_steps and (step + 1) % args.save_every_steps == 0:
            path = os.path.join(checkpoint_path,
                                'step{}'.format(int(state.step)))
            save_train_checkpoint(path, cfg, state, epoch, args)
            logger.info('Saved mid-epoch checkpoint at "{}"'.format(path))
        if step % 100 == 0:
            from kmbart_tpu.models.pretraining import MultiModalBartForPreTraining
            params = state.params
            if jax.process_count() > 1 or pp_active:
                # forward_logits is a process-local jit; pull a host copy of
                # the (replicated, stage- or TP-sharded) params — a
                # collective gather when shards span processes, so EVERY
                # rank joins before the is_main gate below
                from kmbart_tpu.cli_common import host_replicated
                params = host_replicated(params)
            if not is_main:
                return
            data = collate_fn([train_dataset[0]])
            model = MultiModalBartForPreTraining(cfg, params=params)
            logits = model.forward_logits(
                {k: v for k, v in data.items()
                 if hasattr(v, 'shape') and getattr(v, 'ndim', 0) >= 1})
            event_ids = np.asarray(data['input_ids'][0])
            event_ids[event_ids == -100] = tokenizer.unk_token_id
            ans = tokenizer.decode(np.asarray(logits[0]).argmax(axis=-1))
            labels = np.asarray(data['labels'][0])
            labels[labels == -100] = tokenizer.unk_token_id
            logger.info('Input ({} image): "{}"'.format(
                'with' if args.use_image else 'without',
                tokenizer.decode(event_ids)))
            logger.info('Generated: "{}"'.format(ans))
            logger.info('Labels: "{}"'.format(tokenizer.decode(labels)))

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
        current = os.path.join(checkpoint_path, 'model{}'.format(epoch))
        save_train_checkpoint(current, cfg, state, epoch, args)
        logger.info('Saved checkpoint at "{}"'.format(checkpoint_path))
        epoch += 1

    from kmbart_tpu.checkpoint.sharded import wait_for_async_saves
    wait_for_async_saves()  # final checkpoint must be durable before exit
    logger.info('Training complete in: ' + str(datetime.now() - start), pad=True)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--dataset', action='append', nargs=2,
                        metavar=('DATASET_NAME', 'DATASET_PATH'), required=True,
                        help='append a dataset, one of "{}"'.format('", "'.join(DATASET_NAMES)))
    parser.add_argument('--checkpoint_dir', required=True, type=str,
                        help='where to save the checkpoint')
    add_common_model_args(parser)
    parser.add_argument('--no_mrm', dest='mrm_enabled', action='store_false',
                        help='do not use masked region modelling')
    parser.add_argument('--no_ap', dest='ap_enabled', action='store_false',
                        help='do not use attribute prediction (VG only)')
    parser.add_argument('--no_rp', dest='rp_enabled', action='store_false',
                        help='do not use relation prediction')
    parser.add_argument('--epochs', default=40, type=int)
    parser.add_argument('--lr', default=1e-5, type=float)
    parser.add_argument('--num_gen', default=1, type=int)
    parser.add_argument('--num_beams', default=1, type=int)
    parser.add_argument('--continue_training', action='store_true')
    parser.add_argument('--save_every_steps', default=0, type=int,
                        help='also checkpoint every N steps (0 = per-epoch only, the reference behaviour); preemption robustness')
    parser.add_argument('--validate_loss', action='store_true')
    parser.add_argument('--validate_score', action='store_true')
    parser.add_argument('--max_img_num', type=int, default=30)
    parser.add_argument('--lm_max_len', type=int, default=30)
    parser.add_argument('--mrm_probability', type=float, default=0.2)
    parser.add_argument('--mlm_probability', type=float, default=0.2)
    add_dropout_args(parser)
    add_hardware_args(parser)
    parser.set_defaults(use_event=True, use_image=True, mrm_enabled=True,
                        rp_enabled=True, ap_enabled=True)
    args = parser.parse_args()

    if args.checkpoint is None and args.model_config is None:
        raise ValueError('--model_config and --checkpoint cannot be empty at the same time')
    names = [k for k, _ in args.dataset]
    if len(names) != len(set(names)):
        raise ValueError('repeated datasets')
    args.dataset = {k: v for k, v in args.dataset}
    for name in names:
        if name not in DATASET_NAMES:
            raise ValueError('"{}" is not a valid dataset'.format(name))
    if ('vg_val' in args.dataset or 'vg_train' in args.dataset) and not args.use_image:
        raise ValueError('--no_image can not be set while using VG dataset')
    return args


def cli():
    """console-script entry point (pyproject.toml)."""
    main(parse_args())


if __name__ == '__main__':
    cli()
