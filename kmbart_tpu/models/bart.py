"""Functional JAX BART trunk with a multimodal encoder.

Parity targets in the reference:
  - ``MultiModalBartModel`` (src/model/model.py:27-114): shared embedding,
    multimodal encoder + text decoder, mask preparation, KV-cache pass-through.
  - ``MultiModalBartEncoder`` / ``ImageEmbedding`` (src/model/modules.py:19-165):
    2052->d_model projection and the splice of projected ROI vectors into the
    token-embedding rows whose input id is ``img_feat_id`` or ``cls_token_id``.
  - The HF 3.0.2 BART internals the reference inherits (EncoderLayer,
    BartDecoder, LearnedPositionalEmbedding with the ``+2`` offset,
    SinusoidalPositionalEmbedding, causal/padding mask preparation).

TPU-first design decisions (not a port):
  - Parameters are a plain pytree of fp32 arrays; per-layer weights are
    stacked on a leading layer axis and executed with ``lax.scan`` — one
    compiled layer body regardless of depth (fast compiles, good XLA fusion).
  - The ragged list-of-ROI-tensors of the reference becomes a fixed-shape
    ``[B, max_img, feat]`` tensor; the row splice is a vectorised
    cumsum-gather-select (no scatter, no dynamic shapes).
  - Decode runs with a preallocated static KV cache written via
    ``dynamic_update_slice`` so the whole decode loop jits into a single
    ``lax.while_loop`` (see generation/decode.py).
  - bf16 matmuls / fp32 params, softmax + layernorm in fp32 (ops/layers.py).
  - Optional ``jax.checkpoint`` rematerialisation per layer (config.remat).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from kmbart_tpu.config import MultiModalBartConfig
from kmbart_tpu.ops.attention import (
    causal_bias,
    multi_head_attention,
    padding_bias,
    split_heads,
    NEG_INF,
)
from kmbart_tpu.ops.layers import ACTIVATIONS, dense, dropout, layer_norm
from kmbart_tpu.parallel import sp


# --------------------------------------------------------------------------
# Parameter initialisation
# --------------------------------------------------------------------------

def _linear_init(rng, shape, std):
    return jax.random.normal(rng, shape, dtype=jnp.float32) * std


def _ln_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _stacked_attn_init(rng, n_layers, d_model, std):
    ks = jax.random.split(rng, 4)
    return {
        "q_kernel": _linear_init(ks[0], (n_layers, d_model, d_model), std),
        "q_bias": jnp.zeros((n_layers, d_model), jnp.float32),
        "k_kernel": _linear_init(ks[1], (n_layers, d_model, d_model), std),
        "k_bias": jnp.zeros((n_layers, d_model), jnp.float32),
        "v_kernel": _linear_init(ks[2], (n_layers, d_model, d_model), std),
        "v_bias": jnp.zeros((n_layers, d_model), jnp.float32),
        "o_kernel": _linear_init(ks[3], (n_layers, d_model, d_model), std),
        "o_bias": jnp.zeros((n_layers, d_model), jnp.float32),
    }


def _stacked_ln_init(n_layers, dim):
    return {"scale": jnp.ones((n_layers, dim), jnp.float32),
            "bias": jnp.zeros((n_layers, dim), jnp.float32)}


def _sinusoidal_table(n_pos, dim):
    """SinusoidalPositionalEmbedding weights (HF 3.0.2 layout: sin | cos halves)."""
    position = np.arange(n_pos)[:, None]
    div = np.exp(np.arange(0, dim, 2) * -(math.log(10000.0) / dim))
    out = np.zeros((n_pos, dim), dtype=np.float32)
    sentinel = dim // 2 if dim % 2 == 0 else (dim // 2) + 1
    out[:, :sentinel] = np.sin(position * div)
    out[:, sentinel:] = np.cos(position * div)
    return jnp.asarray(out)


def init_bart_params(rng, cfg: MultiModalBartConfig) -> dict:
    """Initialise the full trunk (normal(0, init_std); LN identity; pad row 0)."""
    keys = jax.random.split(rng, 16)
    std = cfg.init_std
    d = cfg.d_model

    shared = _linear_init(keys[0], (cfg.vocab_size, d), std)
    shared = shared.at[cfg.pad_token_id].set(0.0)

    if cfg.static_position_embeddings:
        enc_pos = _sinusoidal_table(cfg.max_position_embeddings, d)
        dec_pos = enc_pos
    else:
        n_pos = cfg.max_position_embeddings + cfg.extra_pos_embeddings
        enc_pos = _linear_init(keys[1], (n_pos, d), std)
        dec_pos = _linear_init(keys[2], (n_pos, d), std)

    def _layers(rng, n_layers, ffn_dim, cross_attn):
        ks = jax.random.split(rng, 8)
        layers = {
            "self_attn": _stacked_attn_init(ks[0], n_layers, d, std),
            "self_attn_layer_norm": _stacked_ln_init(n_layers, d),
            "fc1_kernel": _linear_init(ks[1], (n_layers, d, ffn_dim), std),
            "fc1_bias": jnp.zeros((n_layers, ffn_dim), jnp.float32),
            "fc2_kernel": _linear_init(ks[2], (n_layers, ffn_dim, d), std),
            "fc2_bias": jnp.zeros((n_layers, d), jnp.float32),
            "final_layer_norm": _stacked_ln_init(n_layers, d),
        }
        if cross_attn:
            layers["encoder_attn"] = _stacked_attn_init(ks[3], n_layers, d, std)
            layers["encoder_attn_layer_norm"] = _stacked_ln_init(n_layers, d)
        return layers

    params = {
        "shared": shared,
        "encoder": {
            "embed_positions": enc_pos,
            "embed_images": {
                "kernel": _linear_init(keys[3], (cfg.image_feature_size, d), std),
                "bias": jnp.zeros((d,), jnp.float32),
            },
            "layers": _layers(keys[4], cfg.encoder_layers, cfg.encoder_ffn_dim, False),
        },
        "decoder": {
            "embed_positions": dec_pos,
            "layers": _layers(keys[5], cfg.decoder_layers, cfg.decoder_ffn_dim, True),
        },
    }
    if cfg.normalize_embedding:
        params["encoder"]["layernorm_embedding"] = _ln_init(d)
        params["decoder"]["layernorm_embedding"] = _ln_init(d)
    if cfg.normalize_before:  # mbart-style extra encoder LN
        params["encoder"]["layer_norm"] = _ln_init(d)
    if cfg.add_final_layer_norm:
        params["decoder"]["layer_norm"] = _ln_init(d)
    return params


# --------------------------------------------------------------------------
# Multimodal embedding splice
# --------------------------------------------------------------------------

def embed_multimodal(params, cfg, input_ids, image_features, dtype):
    """Token embeddings with projected ROI features spliced into image rows.

    Reference semantics (src/model/modules.py:89-102): every position whose
    id is ``img_feat_id`` or ``cls_token_id`` receives the next ROI vector of
    that example, in order. Fixed-shape version: ``image_features`` is
    [B, max_img, image_feature_size]; the i-th image-token position of row b
    takes ``image_features[b, i]`` via a cumsum-indexed gather.
    """
    tok = jnp.take(params["shared"], input_ids, axis=0)

    if image_features is None:
        return tok

    mask = (input_ids == cfg.img_feat_id) | (input_ids == cfg.cls_token_id)
    img = dense(image_features, params["encoder"]["embed_images"]["kernel"],
                params["encoder"]["embed_images"]["bias"], dtype)  # [B, N, D]
    slot = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    slot = jnp.clip(slot, 0, image_features.shape[1] - 1)
    gathered = jnp.take_along_axis(img, slot[..., None], axis=1)
    return jnp.where(mask[..., None], gathered, tok)


def _positions(table, length, offset, start=0):
    if isinstance(start, int) and start + length + offset > table.shape[0]:
        raise ValueError(
            f"sequence length {start + length} exceeds max_position_embeddings "
            f"{table.shape[0] - offset} (jnp.take would fill NaN)")
    idx = start + jnp.arange(length) + offset
    return jnp.take(table, idx, axis=0)


# --------------------------------------------------------------------------
# Layer bodies (scanned)
# --------------------------------------------------------------------------

def _res_ln(residual, h, ln):
    """LN(residual + h). A fused Pallas fwd/bwd kernel for this site
    (bit-matching numerics) measured -1.7% on the v5e train step — XLA's
    surrounding fusions already amortise the LN backward better than a
    standalone kernel call — so the composition stays (the experiment is
    recorded in BASELINE.md round-3; the kernel was deleted per the
    repo's measured-not-kept convention).

    This is every residual+LN site in the network, which makes it the
    single hook for Megatron-style sequence parallelism: under an active
    ``parallel.sp.sequence_parallel`` context the output is constrained
    to (data, model, -) layout, so GSPMD turns the TP all-reduces feeding
    it into reduce-scatter + all-gather pairs and runs the LN/dropout
    regions sequence-sharded (no-op otherwise)."""
    return sp.constrain(layer_norm(residual + h, ln["scale"], ln["bias"]))


def _residual_ffn(x, lp, cfg, rngs, train, dtype, act):
    residual = x
    # fused Pallas fc1->gelu->fc2 on the hot path: the round-5 itemization
    # measured the composite FFN fusions at 53-63% of MXU peak
    # (epilogue-bound); the kernel keeps the [rows, ffn_dim] intermediate
    # in VMEM both directions (ops/pallas_ffn.py)
    from kmbart_tpu.ops.pallas_ffn import fused_ffn, fused_ffn_supported
    if fused_ffn_supported(
            x.shape[0] * x.shape[1], x.shape[-1], lp["fc1_kernel"].shape[-1],
            cfg.activation_function, cfg.activation_dropout, train,
            dtype=dtype):
        h = fused_ffn(x.astype(dtype), lp["fc1_kernel"], lp["fc1_bias"],
                      lp["fc2_kernel"], lp["fc2_bias"])
    else:
        h = dense(x, lp["fc1_kernel"], lp["fc1_bias"], dtype)
        h = act(h)
        h = dropout(h, cfg.activation_dropout, rngs.get("act"), train)
        h = dense(h, lp["fc2_kernel"], lp["fc2_bias"], dtype)
    h = dropout(h, cfg.dropout, rngs.get("ffn"), train)
    return _res_ln(residual, h, lp["final_layer_norm"])


def _rngs_for(rng, names):
    if rng is None:
        return {n: None for n in names}
    subkeys = jax.random.split(rng, len(names))
    return dict(zip(names, subkeys))


def _encoder_layer(x, lp, key_mask, cfg, rng, train, dtype, act):
    rngs = _rngs_for(rng, ["attn", "res1", "act", "ffn"])
    residual = x
    h, _ = multi_head_attention(
        lp["self_attn"], x, key_mask=key_mask,
        num_heads=cfg.encoder_attention_heads,
        dropout_rate=cfg.attention_dropout, rng=rngs["attn"],
        train=train, dtype=dtype)
    h = dropout(h, cfg.dropout, rngs["res1"], train)
    x = _res_ln(residual, h, lp["self_attn_layer_norm"])
    return _residual_ffn(x, lp, cfg, rngs, train, dtype, act)


def _decoder_layer(x, lp, self_bias, cross_bias, enc_hidden, cfg, rng, train,
                   dtype, act, cache=None, cache_index=None,
                   cache_reorder_idx=None,
                   self_key_mask=None, cross_key_mask=None, causal=False):
    rngs = _rngs_for(rng, ["attn", "res1", "xattn", "res2", "act", "ffn"])
    new_cache = None

    residual = x
    h, self_cache = multi_head_attention(
        lp["self_attn"], x, bias=self_bias,
        num_heads=cfg.decoder_attention_heads,
        dropout_rate=cfg.attention_dropout, rng=rngs["attn"],
        train=train, dtype=dtype,
        cache=None if cache is None else cache["self"],
        cache_index=cache_index, cache_reorder_idx=cache_reorder_idx,
        key_mask=self_key_mask, causal=causal)
    h = dropout(h, cfg.dropout, rngs["res1"], train)
    x = _res_ln(residual, h, lp["self_attn_layer_norm"])

    residual = x
    if cache is not None:
        # decode: reuse precomputed cross K/V
        h, _ = multi_head_attention(
            lp["encoder_attn"], x, bias=cross_bias,
            num_heads=cfg.decoder_attention_heads,
            dropout_rate=cfg.attention_dropout, rng=rngs["xattn"],
            train=train, dtype=dtype, cache=cache["cross"], cache_index=None)
        new_cache = {"self": self_cache, "cross": cache["cross"]}
    else:
        h, _ = multi_head_attention(
            lp["encoder_attn"], x, kv_hidden=enc_hidden, bias=cross_bias,
            num_heads=cfg.decoder_attention_heads,
            dropout_rate=cfg.attention_dropout, rng=rngs["xattn"],
            train=train, dtype=dtype, key_mask=cross_key_mask)
    h = dropout(h, cfg.dropout, rngs["res2"], train)
    x = _res_ln(residual, h, lp["encoder_attn_layer_norm"])

    return _residual_ffn(x, lp, cfg, rngs, train, dtype, act), new_cache


def _maybe_layerdrop(x_new, x_old, p, rng, train):
    """HF LayerDrop: during training skip a layer with probability p."""
    if not train or p == 0.0 or rng is None:
        return x_new
    drop = jax.random.bernoulli(rng, p=p)
    return jnp.where(drop, x_old, x_new)


# --------------------------------------------------------------------------
# Encoder / decoder
# --------------------------------------------------------------------------

def _encoder_embed(params, cfg, input_ids, image_features, train, rng):
    """Pre-layer encoder embedding (multimodal splice + positions +
    optional embed-LN + dropout). Shared by ``encode`` and the pipeline-
    parallel path (parallel/pp.py)."""
    dtype = jnp.dtype(cfg.dtype)
    T = input_ids.shape[1]
    embed_scale = math.sqrt(cfg.d_model) if cfg.scale_embedding else 1.0
    x = embed_multimodal(params, cfg, input_ids, image_features, dtype) * embed_scale
    offset = 0 if cfg.static_position_embeddings else cfg.extra_pos_embeddings
    x = x + _positions(params["encoder"]["embed_positions"], T, offset)[None]
    if cfg.normalize_embedding:
        ln = params["encoder"]["layernorm_embedding"]
        x = layer_norm(x, ln["scale"], ln["bias"])
    if rng is not None:
        rng, sub = jax.random.split(rng)
        x = dropout(x, cfg.dropout, sub, train)
    # residual stream in compute dtype from here on
    return x.astype(dtype), rng


def encode(params, cfg: MultiModalBartConfig, input_ids, image_features=None,
           attention_mask=None, *, train=False, rng=None):
    """Multimodal encoder forward. Returns [B, T, D] hidden states in the
    compute dtype (the residual stream stays bf16 under the default
    mixed-precision policy; fp32 when cfg.dtype is float32)."""
    dtype = jnp.dtype(cfg.dtype)
    act = ACTIVATIONS[cfg.activation_function]

    x, rng = _encoder_embed(params, cfg, input_ids, image_features, train, rng)
    x = sp.constrain(x)  # sequence-parallel entry point (no-op by default)

    def body(carry, scanned):
        x, rng = carry
        lp, i = scanned
        if rng is not None:
            lrng = jax.random.fold_in(rng, i)
            lrng, drop_rng = jax.random.split(lrng)
        else:
            lrng = drop_rng = None
        y = _encoder_layer(x, lp, attention_mask, cfg, lrng, train, dtype, act)
        y = _maybe_layerdrop(y, x, cfg.encoder_layerdrop, drop_rng, train)
        return (y, rng), None

    if cfg.remat:
        body = jax.checkpoint(body)
    n_layers = cfg.encoder_layers
    if cfg.train_unroll_layers and not cfg.remat:
        # unrolled layer loop: no scan residual stacking (config.py knob)
        for i in range(n_layers):
            lp = jax.tree.map(lambda a: a[i], params["encoder"]["layers"])
            (x, _), _ = body((x, rng), (lp, jnp.int32(i)))
    else:
        (x, _), _ = jax.lax.scan(
            body, (x, rng), (params["encoder"]["layers"], jnp.arange(n_layers)))

    if cfg.normalize_before:
        ln = params["encoder"]["layer_norm"]
        x = layer_norm(x, ln["scale"], ln["bias"])
    return x


def _decoder_embed(params, cfg, decoder_input_ids, pos_start, train, rng):
    dtype = jnp.dtype(cfg.dtype)
    embed_scale = math.sqrt(cfg.d_model) if cfg.scale_embedding else 1.0
    T = decoder_input_ids.shape[1]
    x = jnp.take(params["shared"], decoder_input_ids, axis=0) * embed_scale
    offset = 0 if cfg.static_position_embeddings else cfg.extra_pos_embeddings
    if getattr(pos_start, "ndim", 0) >= 1:
        # per-row positions (continuous-batching pool: each slot sits at
        # its own decode depth); T == 1 incremental step only
        x = x + jnp.take(params["decoder"]["embed_positions"],
                         pos_start + offset, axis=0)[:, None, :]
    else:
        x = x + _positions(params["decoder"]["embed_positions"], T, offset,
                           start=pos_start)[None]
    if cfg.normalize_embedding:
        ln = params["decoder"]["layernorm_embedding"]
        x = layer_norm(x, ln["scale"], ln["bias"])
    if rng is not None:
        rng, sub = jax.random.split(rng)
        x = dropout(x, cfg.dropout, sub, train)
    return sp.constrain(x.astype(dtype)), rng


def decode(params, cfg: MultiModalBartConfig, decoder_input_ids, enc_hidden,
           enc_attention_mask=None, decoder_attention_mask=None, *,
           train=False, rng=None):
    """Full (teacher-forced) decoder forward. Returns [B, T, D] in the
    compute dtype (see encode)."""
    dtype = jnp.dtype(cfg.dtype)
    act = ACTIVATIONS[cfg.activation_function]
    B, T = decoder_input_ids.shape

    x, rng = _decoder_embed(params, cfg, decoder_input_ids, 0, train, rng)

    def body(carry, scanned):
        x, rng = carry
        lp, i = scanned
        if rng is not None:
            lrng = jax.random.fold_in(rng, i)
            lrng, drop_rng = jax.random.split(lrng)
        else:
            lrng = drop_rng = None
        y, _ = _decoder_layer(x, lp, None, None, enc_hidden, cfg,
                              lrng, train, dtype, act,
                              self_key_mask=decoder_attention_mask,
                              cross_key_mask=enc_attention_mask,
                              causal=True)
        y = _maybe_layerdrop(y, x, cfg.decoder_layerdrop, drop_rng, train)
        return (y, rng), None

    if cfg.remat:
        body = jax.checkpoint(body)
    if cfg.train_unroll_layers and not cfg.remat:
        for i in range(cfg.decoder_layers):
            lp = jax.tree.map(lambda a: a[i], params["decoder"]["layers"])
            (x, _), _ = body((x, rng), (lp, jnp.int32(i)))
    else:
        (x, _), _ = jax.lax.scan(
            body, (x, rng),
            (params["decoder"]["layers"], jnp.arange(cfg.decoder_layers)))

    if cfg.add_final_layer_norm:
        ln = params["decoder"]["layer_norm"]
        x = layer_norm(x, ln["scale"], ln["bias"])
    return x


# --------------------------------------------------------------------------
# Incremental decode with preallocated KV cache
# --------------------------------------------------------------------------

def init_decode_cache(params, cfg: MultiModalBartConfig, enc_hidden, max_len,
                      cache_dtype=None, self_batch=None):
    """Preallocate the static decode cache.

    self K/V: [L, self_batch, max_len, D] zero-filled; cross K/V projected
    once from the encoder output: [L, B, Tenc, D]. K/V are stored flat
    (pre-head-split, D = H*hd): [T, D] tiles perfectly on the TPU and the
    split is a free reshape at read time. This replaces the reference's
    per-layer dict cache (HF 3.0.2 ``decoder_cached_states``) with a single
    fixed-shape pytree an XLA while-loop can carry.

    ``self_batch`` (default B) lets beam search keep per-beam self K/V while
    the cross K/V stay *deduplicated* per sample — the attention layer folds
    the beam group into the query length (ops/attention.py), so the hot
    decode loop streams each sample's encoder K/V once instead of
    ``num_beams`` times.
    """
    dtype = cache_dtype or jnp.dtype(cfg.dtype)
    L = cfg.decoder_layers
    B, Tenc, D = enc_hidden.shape
    if self_batch is None:
        self_batch = B

    def project(lp):
        k = dense(enc_hidden, lp["encoder_attn"]["k_kernel"],
                  lp["encoder_attn"]["k_bias"], dtype)
        v = dense(enc_hidden, lp["encoder_attn"]["v_kernel"],
                  lp["encoder_attn"]["v_bias"], dtype)
        return k.astype(dtype), v.astype(dtype)

    cross_k, cross_v = jax.vmap(project)(params["decoder"]["layers"])
    return {
        "self_k": jnp.zeros((L, self_batch, max_len, D), dtype),
        "self_v": jnp.zeros((L, self_batch, max_len, D), dtype),
        "cross_k": cross_k,
        "cross_v": cross_v,
    }


def decode_step(params, cfg: MultiModalBartConfig, token_ids, cache, cache_index,
                enc_attention_mask=None, reorder_idx=None):
    """One incremental decoder step.

    token_ids: [B, 1] the newest tokens; cache_index: scalar int32 position
    to write (0-based). ``reorder_idx`` ([B] int32) permutes the self-cache
    rows before use — beam-search parent reordering fused into the per-layer
    scan (one gather+update per layer slice instead of whole-cache copies
    with layout churn, a large profiled win on v5e).
    Returns (hidden [B, 1, D] compute dtype, updated cache)."""
    dtype = jnp.dtype(cfg.dtype)
    act = ACTIVATIONS[cfg.activation_function]
    max_len = cache["self_k"].shape[2]

    x, _ = _decoder_embed(params, cfg, token_ids, cache_index, False, None)

    # mask future (unwritten) cache slots
    key_pos = jnp.arange(max_len)[None, None, None, :]
    self_bias = jnp.where(key_pos <= cache_index, 0.0, NEG_INF).astype(jnp.float32)
    cross_bias = None if enc_attention_mask is None else padding_bias(enc_attention_mask)

    def body(x, scanned):
        lp, sk, sv, ck, cv = scanned
        layer_cache = {"self": {"k": sk, "v": sv}, "cross": {"k": ck, "v": cv}}
        # the beam parent permutation is applied inside the attention layer,
        # fused with the new-row write into a single full-cache pass
        y, new_cache = _decoder_layer(
            x, lp, self_bias, cross_bias, None, cfg, None, False, dtype, act,
            cache=layer_cache, cache_index=cache_index,
            cache_reorder_idx=reorder_idx)
        return y, (new_cache["self"]["k"], new_cache["self"]["v"])

    if cfg.decode_unroll_layers:
        # Python-unrolled layer loop: every cache access is a *static* slice,
        # so XLA fuses the bf16->f32 upcast into the QK/AV reduce instead of
        # materialising a per-step f32 copy of each cross-K/V layer (the
        # lax.scan dynamic-slice blocks that fusion; profiled on v5e).
        n_layers = cache["self_k"].shape[0]
        layers = params["decoder"]["layers"]
        new_sk, new_sv = [], []
        for i in range(n_layers):
            lp = jax.tree_util.tree_map(lambda a: a[i], layers)
            x, (sk_i, sv_i) = body(x, (lp, cache["self_k"][i],
                                       cache["self_v"][i],
                                       cache["cross_k"][i],
                                       cache["cross_v"][i]))
            new_sk.append(sk_i)
            new_sv.append(sv_i)
        new_sk = jnp.stack(new_sk)
        new_sv = jnp.stack(new_sv)
    else:
        x, (new_sk, new_sv) = jax.lax.scan(
            body, x,
            (params["decoder"]["layers"], cache["self_k"], cache["self_v"],
             cache["cross_k"], cache["cross_v"]))

    if cfg.add_final_layer_norm:
        ln = params["decoder"]["layer_norm"]
        x = layer_norm(x, ln["scale"], ln["bias"])

    new_cache = dict(cache, self_k=new_sk, self_v=new_sv)
    return x, new_cache


def init_decode_cache_layers(params, cfg: MultiModalBartConfig, enc_hidden,
                             max_len, num_beams, cache_dtype=None):
    """Per-layer (unstacked) decode cache for the beam-stationary path.

    Returns a tuple of L dicts {self_k, self_v [B, num_beams, max_len, D];
    cross_k, cross_v [B, Tenc, D]}. Unstacked per-layer arrays let the
    beam loop unroll the layer loop with *static* cache references: no
    lax.scan ys re-stacking of the multi-MB cache and no dynamic parameter
    slices — each step touches the cache through one one-row
    dynamic_update_slice per layer. The [B, K, T, D] layout is exactly
    what the kernel consumes, so the carried buffers flow into
    pallas_call with no relayout copies.
    """
    dtype = cache_dtype or jnp.dtype(cfg.dtype)
    L = cfg.decoder_layers
    B, Tenc, D = enc_hidden.shape

    layers = []
    for i in range(L):
        lp = jax.tree_util.tree_map(lambda a: a[i],
                                    params["decoder"]["layers"])
        k = dense(enc_hidden, lp["encoder_attn"]["k_kernel"],
                  lp["encoder_attn"]["k_bias"], dtype)
        v = dense(enc_hidden, lp["encoder_attn"]["v_kernel"],
                  lp["encoder_attn"]["v_bias"], dtype)
        layers.append({
            "self_k": jnp.zeros((B, num_beams, max_len, D), dtype),
            "self_v": jnp.zeros((B, num_beams, max_len, D), dtype),
            "cross_k": k.astype(dtype),
            "cross_v": v.astype(dtype),
        })
    return tuple(layers)


def decode_step_stationary(params, cfg: MultiModalBartConfig, token_ids,
                           caches, cache_index, sel, enc_attention_mask=None,
                           num_beams=1, seq_positions=None):
    """One incremental decoder step over a beam-stationary cache.

    Beam parent history is resolved *inside* the self-attention
    (ops/pallas_beam_attention.py): the cache rows never move; ``sel``
    (from ``build_selection_mask``) carries the ancestry one-hot. The only
    cache write per layer is this step's own K/V row.

    token_ids: [BK, 1]; caches: tuple from init_decode_cache_layers;
    Returns (hidden [BK, 1, D], updated caches).
    """
    from kmbart_tpu.ops.pallas_beam_attention import (
        beam_attention_supported, beam_gather_attention,
        beam_gather_attention_reference)

    dtype = jnp.dtype(cfg.dtype)
    act = ACTIVATIONS[cfg.activation_function]
    H = cfg.decoder_attention_heads
    B, K, max_len, D = caches[0]["self_k"].shape
    scale = (D // H) ** -0.5

    x, _ = _decoder_embed(params, cfg, token_ids,
                          cache_index if seq_positions is None
                          else seq_positions, False, None)
    cross_bias = None if enc_attention_mask is None \
        else padding_bias(enc_attention_mask)
    use_kernel = beam_attention_supported(num_beams, H, D // H, max_len)

    new_caches = []
    for i in range(cfg.decoder_layers):
        lp = jax.tree_util.tree_map(lambda a: a[i],
                                    params["decoder"]["layers"])
        cache = caches[i]

        residual = x
        sa = lp["self_attn"]
        qkv_kernel = jnp.concatenate(
            [sa["q_kernel"], sa["k_kernel"], sa["v_kernel"]], axis=1)
        qkv_bias = jnp.concatenate([sa["q_bias"], sa["k_bias"], sa["v_bias"]])
        q, k_new, v_new = jnp.split(
            dense(x, qkv_kernel, qkv_bias, dtype), 3, axis=-1)  # [BK, 1, D]
        q_flat = (q[:, 0, :] * scale)
        cdt = cache["self_k"].dtype

        self_k = jax.lax.dynamic_update_slice(
            cache["self_k"], k_new.astype(cdt).reshape(B, K, 1, D),
            (0, 0, cache_index, 0))
        self_v = jax.lax.dynamic_update_slice(
            cache["self_v"], v_new.astype(cdt).reshape(B, K, 1, D),
            (0, 0, cache_index, 0))
        attend = beam_gather_attention if use_kernel \
            else beam_gather_attention_reference
        # 4 samples per kernel program amortise per-program overhead
        # (473 vs 452 sent/s at the beam bench, S=8 regresses to 454)
        kw = {"samples_per_block": 4} if use_kernel else {}
        attn = attend(q_flat, self_k, self_v, sel,
                      num_beams=num_beams, num_heads=H, **kw)
        cache_update = dict(self_k=self_k, self_v=self_v)
        h = dense(attn[:, None, :], sa["o_kernel"], sa["o_bias"], dtype)
        x = layer_norm(residual + h, lp["self_attn_layer_norm"]["scale"],
                       lp["self_attn_layer_norm"]["bias"])

        residual = x
        h, _ = multi_head_attention(
            lp["encoder_attn"], x, bias=cross_bias, num_heads=H,
            dtype=dtype, cache={"k": cache["cross_k"], "v": cache["cross_v"]},
            cache_index=None)
        x = layer_norm(residual + h, lp["encoder_attn_layer_norm"]["scale"],
                       lp["encoder_attn_layer_norm"]["bias"])

        x = _residual_ffn(x, lp, cfg, {}, False, dtype, act)
        new_caches.append(dict(cache, **cache_update))

    if cfg.add_final_layer_norm:
        ln = params["decoder"]["layer_norm"]
        x = layer_norm(x, ln["scale"], ln["bias"])
    return x, tuple(new_caches)


def lm_logits(params, cfg: MultiModalBartConfig, hidden, final_logits_bias=None,
              logits_dtype=jnp.float32):
    """Tied LM head: hidden @ shared.T + final_logits_bias
    (reference: src/model/model.py:291,397).

    ``logits_dtype``: fp32 by default (decode-time score processors read
    exact logits); the train loss passes the compute dtype so the
    [B, T, vocab] tensor is written at half width — the CE computes its
    statistics in fp32 either way.

    ``final_logits_bias`` is a non-trainable BUFFER in the reference
    (transformers 3.0.2 registers it with register_buffer; it stays zeros
    for new vocab rows forever), so gradients are stopped here — training
    it would silently diverge from the reference's dynamics."""
    dtype = jnp.dtype(cfg.dtype)
    logits = jnp.dot(hidden.astype(dtype), params["shared"].T.astype(dtype),
                     preferred_element_type=jnp.float32)
    if final_logits_bias is not None:
        logits = logits + jax.lax.stop_gradient(
            final_logits_bias.astype(jnp.float32))
    return logits.astype(logits_dtype)


def forward(params, cfg: MultiModalBartConfig, input_ids, image_features=None,
            attention_mask=None, decoder_input_ids=None,
            decoder_attention_mask=None, *, train=False, rng=None,
            encoder_outputs=None):
    """Trunk forward (reference: MultiModalBartModel.forward,
    src/model/model.py:39-103). Returns (decoder_hidden, encoder_hidden)."""
    if rng is not None:
        rng_enc, rng_dec = jax.random.split(rng)
    else:
        rng_enc = rng_dec = None
    enc = encoder_outputs
    if enc is None:
        enc = encode(params, cfg, input_ids, image_features, attention_mask,
                     train=train, rng=rng_enc)
    dec = decode(params, cfg, decoder_input_ids, enc,
                 enc_attention_mask=attention_mask,
                 decoder_attention_mask=decoder_attention_mask,
                 train=train, rng=rng_dec)
    return dec, enc


def shift_tokens_right(input_ids, pad_token_id):
    """HF 3.0.2 BART shift: wrap the last non-pad token to position 0."""
    idx = (jnp.argmax((input_ids != pad_token_id)[:, ::-1], axis=1))
    last = input_ids.shape[1] - 1 - idx
    prev = jnp.roll(input_ids, 1, axis=1)
    first = jnp.take_along_axis(input_ids, last[:, None], axis=1)[:, 0]
    return prev.at[:, 0].set(first)
