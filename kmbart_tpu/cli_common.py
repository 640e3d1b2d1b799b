"""Shared CLI plumbing for the entry points at the repo root.

Parity target: the common argparse surface of pretrain.py:337-437 and
vcg_train.py:272-344 (paths, dropout overrides, training and hardware
flags). TPU deltas: ``--tokenizer_dir`` (BPE assets; the reference downloads
facebook/bart-large from the hub), ``--model_parallel`` (2-D mesh TP degree)
instead of ``--gpu_num``/``--master_port`` process spawning, and no
``--amp`` (bf16 mixed precision is always on; flag kept as a no-op for
drop-in compatibility).
"""

import argparse
import os

import jax


def add_common_model_args(parser: argparse.ArgumentParser):
    parser.add_argument('--log_dir', default=None, type=str,
                        help='path to output log files, not output to file if not specified')
    parser.add_argument('--model_config', default=None, type=str,
                        help='path to load model config (JSON)')
    parser.add_argument('--checkpoint', default=None, type=str,
                        help='name or path to load weights (framework npz dir or pytorch_model.bin dir)')
    parser.add_argument('--tokenizer_dir', default=os.environ.get('KMBART_TOKENIZER_DIR'),
                        type=str, help='dir with vocab.json + merges.txt (BART BPE assets)')
    parser.add_argument('--no_event', dest='use_event', action='store_false',
                        help='not to use event descriptions')
    parser.add_argument('--no_image', dest='use_image', action='store_false',
                        help='not to use image features')


def add_dropout_args(parser):
    parser.add_argument('--dropout', default=None, type=float,
                        help='dropout rate for the transformer. This overwrites the model config')
    parser.add_argument('--classif_dropout', default=None, type=float,
                        help='dropout rate for the classification layers. This overwrites the model config')
    parser.add_argument('--attention_dropout', default=None, type=float,
                        help='dropout rate for the attention layers. This overwrites the model config')
    parser.add_argument('--activation_dropout', default=None, type=float,
                        help='dropout rate for the activation layers. This overwrites the model config')


def add_hardware_args(parser):
    parser.add_argument('--cpu', action='store_true',
                        help='run on host CPU instead of TPU')
    parser.add_argument('--amp', action='store_true',
                        help='kept for reference-CLI compatibility (bf16 is always on for TPU)')
    parser.add_argument('--model_parallel', default=1, type=int,
                        help='tensor-parallel degree (mesh = data x model)')
    parser.add_argument('--sequence_parallel', action='store_true',
                        help='with --model_parallel>1: shard the LN/dropout '
                             'regions along the sequence dim (Megatron-SP; '
                             'parallel/sp.py) — same math, less replicated '
                             'activation work/memory per TP shard')
    parser.add_argument('--pipeline_stages', default=1, type=int,
                        help='pipeline-parallel stage count (GPipe '
                             'scan+ppermute schedule, parallel/pp.py; mesh = '
                             'data x stage, or data x stage x model combined '
                             'with --model_parallel>1). For models whose '
                             'layers outgrow one chip. Layer counts must '
                             'divide it.')
    parser.add_argument('--zero1', action='store_true',
                        help='ZeRO stage 1: shard the AdamW moments (2/3 of '
                             'optimizer memory) over the data axis instead '
                             'of replicating them; params/grads stay plain '
                             'DP (parallel/tp.py zero1_moment_specs)')
    parser.add_argument('--pipeline_span_processes', action='store_true',
                        help='with --pipeline_stages>1 and --multihost: lay '
                             'the stage axis ACROSS processes (each process '
                             'hosts a contiguous stage block, ppermute ring '
                             'hops cross the host link — the DCN-pipeline '
                             'layout). Processes sharing data shards load '
                             'identical batches automatically.')
    parser.add_argument('--pipeline_microbatches', default=0, type=int,
                        help='microbatches per pipeline (0 = stage count). '
                             'The per-data-shard batch must be divisible by '
                             'it; more microbatches shrink the GPipe bubble.')
    parser.add_argument('--batch_size', type=int, default=64,
                        help='training batch size')
    parser.add_argument('--num_workers', type=int, default=0,
                        help='#workers for data loader')
    parser.add_argument('--seed', type=int, default=42, help='PRNG seed')
    parser.add_argument('--debug_nans', action='store_true',
                        help='enable jax_debug_nans (numerical-fault detector; '
                             'slow, for debugging only)')
    parser.add_argument('--multihost', action='store_true',
                        help='multi-host (DCN) training: call '
                             'jax.distributed.initialize() and shard data '
                             'loading by process (replaces the reference\'s '
                             'NCCL rendezvous, src/utils.py:9-13)')
    parser.add_argument('--grad_accum_steps', default=1, type=int,
                        help='split each batch into this many micro-batches '
                             'and accumulate gradients before the optimizer '
                             'update (peak activation memory = micro-batch '
                             'size). batch_size must be divisible by it, '
                             'and by model-parallel data shards after the '
                             'split.')
    parser.add_argument('--sharded_checkpoints', action='store_true',
                        help='save checkpoints as orbax sharded state (each '
                             'process writes only its own shards; required '
                             'for models that do not fit one host). Default '
                             'is the portable npz format.')


def setup_platform(args):
    if getattr(args, 'cpu', False):
        jax.config.update('jax_platforms', 'cpu')
    if getattr(args, 'debug_nans', False):
        jax.config.update('jax_debug_nans', True)
    if getattr(args, 'multihost', False):
        # On a TPU pod the coordinator/process env comes from the runtime
        # (GCE metadata) and the no-arg call auto-detects it. The KMBART_*
        # env vars allow an explicit rendezvous — used by the real
        # multi-process CPU tests (tests/test_multiprocess.py) and any
        # launcher that prefers explicit wiring (the reference's equivalent
        # is the MASTER_PORT/init_process_group rendezvous, src/utils.py:9-13).
        addr = os.environ.get('KMBART_COORDINATOR_ADDRESS')
        if addr:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=int(os.environ['KMBART_NUM_PROCESSES']),
                process_id=int(os.environ['KMBART_PROCESS_ID']))
        else:
            jax.distributed.initialize()


def is_main_process():
    return jax.process_index() == 0


def sync_timestamp(timestamp):
    """Make every process use process 0's run timestamp, so the whole job
    writes one checkpoint/log directory (the reference forks its workers
    AFTER the single parent picked the path, pretrain.py:443-448; JAX
    processes start independently, so agree via a broadcast)."""
    if jax.process_count() == 1:
        return timestamp
    import numpy as np
    from jax.experimental import multihost_utils
    buf = np.frombuffer(timestamp.encode().ljust(64), dtype=np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(out)).decode().strip()


def local_batch_divisor(mesh):
    """Per-process batches must divide the data-mesh shards THIS process
    feeds (a global batch is assembled from per-process slices via
    jax.make_array_from_process_local_data). Feed groups, not raw process
    count: under ``--pipeline_span_processes`` several processes cover the
    same data shards and each loads the full group batch."""
    if mesh is None:
        return 1
    from kmbart_tpu.parallel.mesh import data_feed_layout
    n_data = mesh.shape['data']
    n_groups, _ = data_feed_layout(mesh)
    if n_data % n_groups:
        raise ValueError(
            f'data-mesh size {n_data} not divisible by {n_groups} '
            f'process feed groups')
    return n_data // n_groups


def data_feed(mesh):
    """(num_replicas, rank) for ShardedSampler: which slice of the global
    index stream THIS process loads. Identical to
    (process_count, process_index) except when several processes feed the
    same data shards (stage-spanning pipelines) — then each feed group
    loads one slice and every process in it loads the same rows."""
    if mesh is None or jax.process_count() == 1:
        return jax.process_count(), jax.process_index()
    from kmbart_tpu.parallel.mesh import data_feed_layout
    return data_feed_layout(mesh)


def apply_dropout_overrides(cfg, args):
    """CLI dropout flags override the JSON config (pretrain.py:76-83)."""
    overrides = {}
    for name in ('dropout', 'attention_dropout', 'classif_dropout',
                 'activation_dropout'):
        v = getattr(args, name, None)
        if v is not None:
            overrides[name] = v
    return cfg.replace(**overrides) if overrides else cfg


def load_model_config(args):
    from kmbart_tpu.config import MultiModalBartConfig
    import json
    if args.model_config is not None:
        cfg = MultiModalBartConfig.from_dict(json.load(open(args.model_config)))
    elif args.checkpoint:
        cfg = MultiModalBartConfig.from_json(
            os.path.join(args.checkpoint, 'config.json'))
    else:
        raise ValueError('--model_config and --checkpoint cannot be empty at the same time')
    return apply_dropout_overrides(cfg, args)


def sharded_state_dir(path):
    return os.path.join(path, "sharded_state") if path else None


def host_replicated(tree):
    """Host (numpy) copies of a possibly cross-process-sharded pytree.

    ``np.asarray`` is only legal on fully-addressable arrays; TP-sharded
    params under ``--multihost`` and ZeRO-1 moments span processes, so such
    leaves are first gathered to a replicated layout (a collective every
    process participates in — call this from ALL processes BEFORE any
    rank-gated write, never inside an ``is_main_process()`` branch)."""
    import numpy as _np
    from jax.sharding import NamedSharding, PartitionSpec

    def fix(x):
        if (hasattr(x, "is_fully_addressable")
                and not x.is_fully_addressable):
            x = jax.device_put(
                x, NamedSharding(x.sharding.mesh, PartitionSpec()))
        return _np.asarray(x)

    return jax.tree_util.tree_map(fix, tree)


def save_train_checkpoint(path, cfg, state, epoch, args):
    """Per-epoch/step train checkpoint.

    Default: the reference-style portable directory (config.json +
    params.npz + training_data.npz, checkpoint/io.py). With
    ``--sharded_checkpoints``: config.json + an orbax sharded state dir —
    every process writes only the shards it owns, so saving a TP/DP-sharded
    pod state never gathers to one host (checkpoint/sharded.py)."""
    from kmbart_tpu.checkpoint.io import save_pretrained, save_training_data
    if getattr(args, "sharded_checkpoints", False):
        import numpy as _np
        from kmbart_tpu.checkpoint.sharded import save_sharded
        os.makedirs(path, exist_ok=True)
        if cfg is not None and is_main_process():
            cfg.save_json(os.path.join(path, "config.json"))
        # non-blocking: the device->host snapshot is taken before this
        # returns; filesystem writes drain in the background while training
        # continues (an atexit hook and any subsequent load wait for them)
        save_sharded(sharded_state_dir(path),
                     {"state": state, "epoch": _np.asarray(epoch)},
                     block=False)
        return
    # portable npz: gather any cross-process-sharded leaves (TP params
    # under --multihost, ZeRO-1 moments) to host replicas — every process
    # participates in the collective — then process 0 writes the whole
    # state, the reference's rank-0 torch.save (src/utils.py:20-27).
    host_state = host_replicated(state)
    if is_main_process():
        save_pretrained(path, cfg, host_state.params)
        save_training_data(path, opt_state=host_state.opt_state,
                           epoch=epoch, step=int(host_state.step))


def load_sharded_train_checkpoint(args, state_template):
    """Resume from a --sharded_checkpoints directory if ``args.checkpoint``
    holds one. Returns (state, saved_epoch) or None."""
    p = sharded_state_dir(getattr(args, "checkpoint", None))
    if not (p and os.path.isdir(p)):
        return None
    import numpy as _np
    from kmbart_tpu.checkpoint.sharded import (
        load_sharded, wait_for_async_saves)
    wait_for_async_saves()
    host_template = jax.tree_util.tree_map(_np.asarray, state_template)
    out = load_sharded(p, {"state": host_template, "epoch": _np.asarray(0)})
    return out["state"], int(out["epoch"])


def build_model_params(args, cfg, init_fn, logger=None):
    """Init params, then overlay checkpoint weights (partial-load aware).
    A sharded checkpoint dir defers to load_sharded_train_checkpoint (the
    whole TrainState, params included, restores from the orbax shards)."""
    from kmbart_tpu.checkpoint.io import load_pretrained
    sh = sharded_state_dir(getattr(args, "checkpoint", None))
    if sh and os.path.isdir(sh):
        if logger is not None:
            logger.info("Deferring weight load to the sharded checkpoint "
                        'at "{}"'.format(sh))
        import jax as _jax
        return init_fn(_jax.random.PRNGKey(args.seed), cfg)
    if args.checkpoint:
        _, params, report = load_pretrained(args.checkpoint, init_fn,
                                            config=cfg, strict=False)
        if logger is not None:
            for line in report:
                logger.info(line)
        return params
    import jax as _jax
    return init_fn(_jax.random.PRNGKey(args.seed), cfg)


def make_mesh_from_args(args):
    from kmbart_tpu.parallel.mesh import make_mesh
    n = len(jax.devices())
    mp = max(1, args.model_parallel)
    pp_stages = max(1, getattr(args, 'pipeline_stages', 1))
    if mp > 1 or pp_stages > 1:
        # the fused FFN kernel's row-parallel custom_partitioning would
        # all-gather the F-sharded Megatron weights under TP, and the
        # shard_map pipeline body bypasses custom_partitioning entirely —
        # keep the composite (natively TP-sharded) FFN there
        os.environ.setdefault('KMBART_NO_FUSED_FFN', '1')
    if pp_stages > 1:
        if getattr(args, 'sequence_parallel', False):
            raise ValueError('--pipeline_stages cannot be combined with '
                             '--sequence_parallel')
        # --model_parallel composes: 3-D data x stage x model mesh with
        # Megatron-TP inside each pipeline stage (parallel/pp.py)
        from kmbart_tpu.parallel.pp import make_pp_mesh
        return make_pp_mesh(
            pp_stages, model_parallel=mp,
            span_processes=getattr(args, 'pipeline_span_processes', False))
    if n % mp:
        raise ValueError(f'{n} devices not divisible by model_parallel={mp}')
    return make_mesh(model_parallel=mp)


def pipeline_microbatches(args):
    pp_stages = max(1, getattr(args, 'pipeline_stages', 1))
    m = getattr(args, 'pipeline_microbatches', 0)
    return m if m > 0 else pp_stages


def validate_batch_layout(args, n_data):
    """The train step splits each batch by grad_accum_steps FIRST, so every
    accum micro-batch (batch_size / G) must itself divide the per-step
    divisor ``n_data`` (data-mesh shards, times pipeline microbatches when
    PP is on). The loader's trim divisor alone cannot enforce this — a
    batch_size divisible by n_data but not by G*n_data would pass loading
    and then fail shape checks at the first train step."""
    G = max(1, getattr(args, 'grad_accum_steps', 1))
    if args.batch_size % (G * n_data):
        raise ValueError(
            f'batch_size={args.batch_size} must be divisible by '
            f'grad_accum_steps={G} x per-step batch divisor {n_data} '
            f'(data shards, x pipeline microbatches under --pipeline_stages)')
