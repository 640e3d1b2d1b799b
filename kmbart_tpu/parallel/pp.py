"""Pipeline parallelism: GPipe microbatch schedule as scan + ppermute.

The reference has no pipeline parallelism (its distributed runtime is
single-host DDP, src/utils.py:9-17); this is the TPU-native last axis of
the parallelism inventory (data x model/sequence x stage). The design is
the canonical JAX/TPU pipeline (scaling-book recipe), not a port of any
torch schedule:

- Per-layer weights are ALREADY stacked on a leading [L, ...] axis
  (models/bart.py design note), so a stage's weights are just that axis
  sharded over a ``stage`` mesh axis — no parameter surgery.
- The schedule is one ``lax.scan`` over M + S - 1 ticks inside a
  ``shard_map``. At tick t, stage s runs microbatch m = t - s through
  its local layers and hands the activation to stage s+1 with a single
  ``ppermute`` ring shift. The bubble (S-1 idle ticks per stage) is the
  GPipe cost; XLA overlaps the ppermute DMA with the next tick's
  compute.
- The BACKWARD pipeline is free: scan + ppermute are differentiable, so
  ``jax.grad`` of the pipelined loss replays the ring in reverse — the
  transpose of ppermute is the opposite rotation — giving the standard
  GPipe fwd/bwd schedule without writing a backward scheduler.
- Encoder/decoder stacks are pipelined one after the other (BART's
  decoder needs the FULL encoder output for cross-attention, so there
  is a natural barrier between the stacks). The embedding/LM-head ends
  stay replicated: at BART scale they are ~1 matmul each and replicating
  them avoids the embedding-stage load imbalance classic GPipe suffers.

Forward activations are BITWISE identical to the sequential path (each
layer still runs whole on one device; only transport changes), so the
parity tests assert exact equality at fp32.

Capacity note: this path exists for models whose LAYERS outgrow one
chip's HBM. At BART-base/large scale a single v5e chip holds the whole
model — use DP/TP/SP first; the tests pin correctness on a virtual mesh
so the path is ready when a config actually needs it.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from kmbart_tpu.config import MultiModalBartConfig
from kmbart_tpu.models import bart
from kmbart_tpu.models.bart import (ACTIVATIONS, _decoder_embed,
                                    _decoder_layer, _encoder_embed,
                                    _encoder_layer)
from kmbart_tpu.ops.layers import layer_norm


def make_stage_mesh(n_stages, devices=None):
    """1-D ``stage`` mesh (ring order = device order, so ppermute hops
    ride neighbouring ICI links on a real slice)."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_stages:
        raise ValueError(f"{n_stages} stages > {len(devices)} devices")
    return Mesh(np.asarray(devices[:n_stages]), ("stage",))


def make_pp_mesh(n_stages, devices=None, model_parallel=1,
                 span_processes=False):
    """2-D ``data x stage`` mesh over ALL devices: each data replica runs
    its own n_stages-deep pipeline (stage innermost, so ring hops ride
    neighbouring ICI links — the same invariant make_mesh keeps for TP).

    ``model_parallel > 1`` makes it the full 3-D ``data x stage x model``
    mesh: Megatron-TP *within* each pipeline stage, the TP axis innermost
    so its (per-layer, frequent) all-reduces ride the fastest ICI links
    while the (per-microbatch, rarer) stage hops take the next dimension.

    ``span_processes``: lay the STAGE axis across process boundaries —
    each process hosts one contiguous block of stages and the ppermute
    ring hops cross the host interconnect (the DCN-pipeline layout: stage
    traffic is per-microbatch activations, the cheapest thing to put on
    the slow links, exactly why GPipe-over-hosts is the standard pod
    recipe). Default keeps rings inside a process/host. Requires the
    process count and stage count to divide one another."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % n_stages:
        raise ValueError(f"{n} devices not divisible by stages={n_stages}")
    if span_processes:
        grid2 = _span_process_grid(devices, n_stages)  # [n/S, S]
        if model_parallel > 1:
            if (n // n_stages) % model_parallel:
                raise ValueError(
                    f"{n} devices not divisible by stages={n_stages} x "
                    f"model_parallel={model_parallel}")
            # split each stage column's replica dim into data x model
            # (TP groups = consecutive devices within the stage block)
            grid = grid2.reshape(n // (n_stages * model_parallel),
                                 model_parallel,
                                 n_stages).transpose(0, 2, 1)
            return Mesh(grid, ("data", "stage", "model"))
        return Mesh(grid2, ("data", "stage"))
    if model_parallel > 1:
        if n % (n_stages * model_parallel):
            raise ValueError(
                f"{n} devices not divisible by stages={n_stages} x "
                f"model_parallel={model_parallel}")
        grid = np.asarray(devices).reshape(
            n // (n_stages * model_parallel), n_stages, model_parallel)
        return Mesh(grid, ("data", "stage", "model"))
    from kmbart_tpu.parallel.mesh import make_mesh
    return make_mesh(devices=devices, model_parallel=n_stages,
                     axis_names=("data", "stage"))


def _span_process_grid(devices, n_stages):
    """[n/S, S] device grid whose stage axis crosses process boundaries:
    stage j's column holds the devices of process block j (P >= S) or the
    j-th slice of its process's local devices (S > P)."""
    procs = sorted({d.process_index for d in devices})
    P = len(procs)
    by_proc = {p: [d for d in devices if d.process_index == p]
               for p in procs}
    local = len(devices) // P
    if any(len(v) != local for v in by_proc.values()):
        raise ValueError("span_processes needs equal devices per process")
    cols = []
    if P % n_stages == 0:
        pps = P // n_stages      # processes per stage
        for j in range(n_stages):
            cols.append([d for p in procs[j * pps:(j + 1) * pps]
                         for d in by_proc[p]])
    elif n_stages % P == 0:
        spp = n_stages // P      # stages per process
        if local % spp:
            raise ValueError(
                f"{local} local devices not divisible by {spp} "
                f"stages per process")
        per = local // spp
        for j in range(n_stages):
            p = procs[j // spp]
            k = j % spp
            cols.append(by_proc[p][k * per:(k + 1) * per])
    else:
        raise ValueError(
            f"span_processes: {P} processes and {n_stages} stages must "
            f"divide one another")
    grid = np.empty((len(devices) // n_stages, n_stages), object)
    for j, col in enumerate(cols):
        grid[:, j] = np.asarray(col, object)
    return grid


def stage_param_specs(params, model_parallel=False):
    """PartitionSpec pytree: stacked [L, ...] layer tensors shard their
    layer axis over ``stage``; everything else is replicated. L must be
    divisible by the stage count (checked at shard time by GSPMD).

    ``model_parallel=True`` composes Megatron-TP on top: layer leaves get
    ``stage`` on the layer axis PLUS tp.py's column/row feature sharding
    over ``model``, and the non-layer ends (embeddings, heads) take tp.py's
    specs unchanged."""
    tp_specs = None
    if model_parallel:
        from kmbart_tpu.parallel.tp import param_partition_specs
        tp_specs = param_partition_specs(params)

    def spec_for(path, leaf, tp_spec):
        if any(getattr(p, "key", None) == "layers" for p in path):
            if tp_spec is not None:
                # tp.py's stacked-layer rules lead with None for the [L]
                # axis — swap that slot for the stage axis
                return P("stage", *tuple(tp_spec)[1:])
            return P("stage")
        return tp_spec if tp_spec is not None else P()

    paths, treedef = jax.tree_util.tree_flatten_with_path(params)
    tp_leaves = (jax.tree.leaves(tp_specs,
                                 is_leaf=lambda x: isinstance(x, P))
                 if tp_specs is not None else [None] * len(paths))
    return treedef.unflatten([spec_for(path, leaf, ts)
                              for (path, leaf), ts in zip(paths, tp_leaves)])


def stage_train_state_shardings(mesh, params, zero1=False):
    """NamedSharding pytree for a TrainState with stage-sharded stacked
    layers (optimizer moments inherit the parameter layout; the assembly
    is tp.train_state_shardings with the stage specs swapped in). On a
    3-D mesh with a ``model`` axis the specs compose TP within stages;
    ``zero1`` additionally shards the moments over ``data``."""
    from kmbart_tpu.parallel.tp import train_state_shardings
    tp = dict(mesh.shape).get("model", 1) > 1
    return train_state_shardings(mesh, params,
                                 specs=stage_param_specs(params,
                                                         model_parallel=tp),
                                 zero1=zero1)


def _pipeline_stack(mesh, stacked_layers, apply_layer, x, n_micro,
                    layers_per_stage, extras, remat=False):
    """Run ``x`` [B, T, D] through the stacked layers as a GPipe pipeline.

    ``apply_layer(local_layers_j, x_mb, micro_idx, global_layer_idx,
    extras)`` applies ONE layer to one microbatch; ``extras`` is a dict of
    replicated side inputs (masks, encoder output, rng key) passed through
    shard_map explicitly — closing over enclosing-jit tracers inside the
    shard_map body is not part of its contract. Returns [B, T, D].

    ``remat``: rematerialise each layer application in the backward
    (cfg.remat parity with the sequential stacks) — with PP's long
    M+S-1-tick schedule this is usually the difference between fitting
    and not fitting the backward in HBM.
    """
    S = mesh.shape["stage"]
    n_data = dict(mesh.shape).get("data", 1)
    B = x.shape[0]
    if n_micro < 1:
        raise ValueError(f"n_micro must be >= 1, got {n_micro}")
    if B % (n_micro * n_data):
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}"
                         f" x data shards={n_data}")
    M = n_micro
    extras = {k: v for k, v in extras.items() if v is not None}
    # batch-like extras (leading dim == global B) shard with the data axis;
    # the rng key is always replicated (a legacy (2,)-uint32 key would
    # false-positive the leading-dim test whenever B == 2)
    data_ax = "data" if n_data > 1 else None
    ex_spec = {k: (P(data_ax) if k != "rng" and getattr(v, "ndim", 0) >= 1
                   and v.shape[0] == B else P())
               for k, v in extras.items()}
    if remat:
        apply_layer = jax.checkpoint(apply_layer)

    # On a PP x TP mesh (auto ``model`` axis) XLA's partial-auto
    # partitioner miscompiles psum-over-a-MANUAL-axis on sub-fp32 floats
    # (fatal "Invalid binary instruction opcode copy"), and shard_map's
    # autodiff inserts exactly such psums for every float boundary tensor
    # that is replicated along ``stage``. Lift the sub-fp32 float boundary
    # I/O to fp32 — bf16 values are exactly representable, so results are
    # bit-identical — and cast back to the compute dtype inside the body.
    def _subf32(v):
        return (jnp.issubdtype(v.dtype, jnp.floating)
                and jnp.dtype(v.dtype).itemsize < 4)

    io_dtype = x.dtype
    lift = "model" in mesh.axis_names and _subf32(x)
    lifted_extras = ({k for k, v in extras.items() if _subf32(v)}
                     if lift else set())
    if lift:
        x = x.astype(jnp.float32)
        extras = {k: (v.astype(jnp.float32) if k in lifted_extras else v)
                  for k, v in extras.items()}

    def staged(local_layers, x_full, ex):
        if lift:
            x_full = x_full.astype(io_dtype)
            ex = {k: (v.astype(io_dtype) if k in lifted_extras else v)
                  for k, v in ex.items()}
        s = jax.lax.axis_index("stage")
        mb = x_full.shape[0] // M  # local (per-data-shard) microbatch
        xm = x_full.reshape((M, mb) + x_full.shape[1:])
        state0 = jnp.zeros((mb,) + x_full.shape[1:], x_full.dtype)
        out0 = jnp.zeros_like(xm)

        def compute(state, out, t):
            # stage 0 ingests microbatch t while t < M; later stages take
            # the ring-shifted activation from the previous tick
            inp = xm[jnp.clip(t, 0, M - 1)]
            h = jnp.where(s == 0, inp, state)
            m = jnp.clip(t - s, 0, M - 1)  # microbatch this stage holds
            for j in range(layers_per_stage):
                lp = jax.tree.map(lambda a: a[j], local_layers)
                h = apply_layer(lp, h, m, s * layers_per_stage + j, ex)
            # the last stage has finished microbatch t-(S-1) at this tick
            done = t - (S - 1)
            write = (s == S - 1) & (done >= 0)
            upd = jax.lax.dynamic_update_slice(
                out, h[None].astype(out.dtype),
                (jnp.clip(done, 0, M - 1),) + (0,) * (out.ndim - 1))
            return h, jnp.where(write, upd, out)

        def tick(carry, t):
            state, out = carry
            h, out = compute(state, out, t)
            state = jax.lax.ppermute(
                h, "stage", [(i, (i + 1) % S) for i in range(S)])
            return (state, out), None

        # scan all but the final tick; the final tick's shifted activation
        # would land in a discarded carry, so peel it and skip the ppermute
        # (one [mb, T, D] ICI hop saved per stack per step, fwd and bwd)
        (state, out), _ = jax.lax.scan(tick, (state0, out0),
                                       jnp.arange(M + S - 2))
        _, out = compute(state, out, M + S - 2)
        # broadcast the collected outputs (non-last stages hold zeros);
        # the psum runs in fp32 under ``lift`` (see above) — exact, since
        # every non-zero contribution is a bf16-representable value
        res = jnp.where(s == S - 1, out, 0)
        if lift:
            res = res.astype(jnp.float32)  # boundary tensor: fp32 psum
        out = jax.lax.psum(res, "stage")
        return out.reshape((x_full.shape[0],) + x_full.shape[1:])

    layer_specs = jax.tree.map(lambda _: P("stage"), stacked_layers)
    # manual over data+stage only; a ``model`` mesh axis (PP x TP) stays
    # automatic, so GSPMD partitions each stage's layer compute over it
    # exactly as on a plain TP mesh (the in_specs name manual axes only —
    # the weights' model-axis sharding flows through untouched)
    manual = frozenset(mesh.axis_names) - {"model"}
    fn = jax.shard_map(staged, mesh=mesh,
                       in_specs=(layer_specs, P(data_ax), ex_spec),
                       out_specs=P(data_ax), axis_names=manual,
                       check_vma=False)
    out = fn(stacked_layers, x, extras)
    return out.astype(io_dtype) if lift else out


def pipelined_forward(params, cfg: MultiModalBartConfig, batch, mesh, *,
                      n_micro, train=False, rng=None):
    """Trunk forward (bart.forward semantics) with both layer stacks
    pipelined over ``mesh``'s ``stage`` axis. Returns (dec, enc) hidden.

    Dropout keys are folded per (layer, microbatch), so masks differ from
    the sequential path when dropout > 0 (they are still independent and
    correctly scaled); with dropout off the forward is bit-identical.
    LayerDrop is unsupported here (a skipped layer would unbalance the
    ring) — train with layerdrop 0 on the pipeline path."""
    if train and (cfg.encoder_layerdrop or cfg.decoder_layerdrop):
        raise ValueError("pipeline parallelism does not support LayerDrop")
    S = mesh.shape["stage"]
    if cfg.encoder_layers % S or cfg.decoder_layers % S:
        raise ValueError(
            f"encoder/decoder layer counts ({cfg.encoder_layers}/"
            f"{cfg.decoder_layers}) must divide the stage count {S}")
    dtype = jnp.dtype(cfg.dtype)
    act = ACTIVATIONS[cfg.activation_function]
    attention_mask = batch.get("attention_mask")
    dec_mask = batch.get("decoder_attention_mask")
    B = batch["input_ids"].shape[0]
    if n_micro < 1:
        raise ValueError(f"n_micro must be >= 1, got {n_micro}")
    # slice_mb runs inside the shard_map body, where batch-like extras are
    # LOCAL data shards — the slice width is the per-shard microbatch
    mb = B // dict(mesh.shape).get("data", 1) // n_micro

    if rng is not None:
        rng_enc, rng_dec = jax.random.split(rng)
    else:
        rng_enc = rng_dec = None

    def slice_mb(arr, m):
        if arr is None:
            return None
        return jax.lax.dynamic_slice_in_dim(arr, m * mb, mb, axis=0)

    def layer_rng(key, li, m):
        if key is None:
            return None
        return jax.random.fold_in(jax.random.fold_in(key, li), m)

    # ---- encoder pipeline ----
    x, rng_enc = _encoder_embed(params, cfg, batch["input_ids"],
                                batch.get("image_features"), train, rng_enc)

    def enc_apply(lp, h, m, li, ex):
        return _encoder_layer(h, lp, slice_mb(ex.get("mask"), m), cfg,
                              layer_rng(ex.get("rng"), li, m), train,
                              dtype, act)

    enc = _pipeline_stack(mesh, params["encoder"]["layers"], enc_apply, x,
                          n_micro, cfg.encoder_layers // S,
                          {"mask": attention_mask, "rng": rng_enc},
                          remat=cfg.remat)
    if cfg.normalize_before:
        ln = params["encoder"]["layer_norm"]
        enc = layer_norm(enc, ln["scale"], ln["bias"])

    # ---- decoder pipeline (cross-attends the full encoder output) ----
    y, rng_dec = _decoder_embed(params, cfg, batch["decoder_input_ids"], 0,
                                train, rng_dec)

    def dec_apply(lp, h, m, li, ex):
        out, _ = _decoder_layer(
            h, lp, None, None, slice_mb(ex["enc"], m), cfg,
            layer_rng(ex.get("rng"), li, m), train, dtype, act,
            self_key_mask=slice_mb(ex.get("dec_mask"), m),
            cross_key_mask=slice_mb(ex.get("mask"), m), causal=True)
        return out

    dec = _pipeline_stack(mesh, params["decoder"]["layers"], dec_apply, y,
                          n_micro, cfg.decoder_layers // S,
                          {"enc": enc, "mask": attention_mask,
                           "dec_mask": dec_mask, "rng": rng_dec},
                          remat=cfg.remat)
    if cfg.add_final_layer_norm:
        ln = params["decoder"]["layer_norm"]
        dec = layer_norm(dec, ln["scale"], ln["bias"])
    return dec, enc


def pipelined_conditional_loss(params, cfg, batch, mesh, *, n_micro,
                               train=False, rng=None):
    """conditional_loss (models/conditional.py) with the trunk pipelined.
    Loss/logits are computed replicated on the gathered decoder output —
    bitwise-equal to the sequential loss at fp32 when dropout is off."""
    from kmbart_tpu.models.heads import cross_entropy_ignore_index

    hidden, _ = pipelined_forward(params["model"], cfg, batch, mesh,
                                  n_micro=n_micro, train=train, rng=rng)
    logits = bart.lm_logits(params["model"], cfg, hidden,
                            params["final_logits_bias"],
                            logits_dtype=jnp.dtype(cfg.dtype))
    loss, _ = cross_entropy_ignore_index(logits, batch["labels"])
    return loss, {"logits": logits}


def pipelined_pretraining_loss(params, cfg, batch, mesh, *, n_micro,
                               train=False, rng=None):
    """pretraining_loss (models/pretraining.py) with the trunk pipelined;
    the four heads run replicated on the gathered decoder output (they are
    ~1 matmul each — staging them would unbalance the ring for nothing)."""
    from kmbart_tpu.models.pretraining import pretraining_loss

    def trunk(model_params, _cfg, b, tr, r):
        dec, _ = pipelined_forward(model_params, _cfg, b, mesh,
                                   n_micro=n_micro, train=tr, rng=r)
        return dec

    return pretraining_loss(params, cfg, batch, train=train, rng=rng,
                            trunk_fn=trunk)
