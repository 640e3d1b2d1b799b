"""GPT-1 style decoder-only LM in functional JAX (the COMET trunk).

Parity target: the ``comet-commonsense`` submodule's model the reference's
``AtomicGenerator`` drives (scripts/atomic_generator.py:16-41): OpenAI GPT
(12 post-LN blocks, d=768) whose *position ids are extra vocabulary rows*
(ids n_vocab .. n_vocab+n_ctx-1) — token and position embeddings come from
one table and are summed (COMET feeds [token_id, position_id] pairs).

TPU design: same recipe as the BART trunk — stacked layers under
``lax.scan``, preallocated KV cache for the jitted sampling loop, bf16
matmuls with fp32 accumulation.
"""

import jax
import jax.numpy as jnp

from kmbart_tpu.ops.attention import causal_bias, multi_head_attention, NEG_INF
from kmbart_tpu.ops.layers import dense, gelu, layer_norm


def init_gpt_params(rng, n_vocab, n_ctx, d_model=768, n_layers=12, n_heads=12,
                    init_std=0.02):
    keys = jax.random.split(rng, 4)
    n_embed = n_vocab + n_ctx  # positions live in the embedding table
    L, D = n_layers, d_model
    lk = jax.random.split(keys[1], 4)
    layers = {
        "attn": {
            "q_kernel": jax.random.normal(lk[0], (L, D, D)) * init_std,
            "q_bias": jnp.zeros((L, D)),
            "k_kernel": jax.random.normal(lk[1], (L, D, D)) * init_std,
            "k_bias": jnp.zeros((L, D)),
            "v_kernel": jax.random.normal(lk[2], (L, D, D)) * init_std,
            "v_bias": jnp.zeros((L, D)),
            "o_kernel": jax.random.normal(lk[3], (L, D, D)) * init_std,
            "o_bias": jnp.zeros((L, D)),
        },
        "ln1": {"scale": jnp.ones((L, D)), "bias": jnp.zeros((L, D))},
        "fc_kernel": jax.random.normal(keys[2], (L, D, 4 * D)) * init_std,
        "fc_bias": jnp.zeros((L, 4 * D)),
        "proj_kernel": jax.random.normal(keys[3], (L, 4 * D, D)) * init_std,
        "proj_bias": jnp.zeros((L, D)),
        "ln2": {"scale": jnp.ones((L, D)), "bias": jnp.zeros((L, D))},
    }
    return {
        "embed": jax.random.normal(keys[0], (n_embed, D)) * init_std,
        "layers": layers,
        "n_vocab": n_vocab,
        "n_ctx": n_ctx,
    }


def _block(x, lp, bias, n_heads, dtype, cache=None, cache_index=None):
    """GPT-1 post-LN block: x = ln1(x + attn(x)); x = ln2(x + mlp(x))."""
    a, new_cache = multi_head_attention(
        lp["attn"], x, bias=bias, num_heads=n_heads, dtype=dtype,
        cache=cache, cache_index=cache_index)
    x = layer_norm(x + a, lp["ln1"]["scale"], lp["ln1"]["bias"])
    m = dense(gelu(dense(x, lp["fc_kernel"], lp["fc_bias"], dtype)),
              lp["proj_kernel"], lp["proj_bias"], dtype)
    x = layer_norm(x + m, lp["ln2"]["scale"], lp["ln2"]["bias"])
    return x, new_cache


def gpt_forward(params, token_ids, n_heads=12, dtype=jnp.bfloat16):
    """Full forward: token_ids [B, T] -> hidden [B, T, D]. Positions are the
    embedding rows n_vocab + t (COMET convention)."""
    B, T = token_ids.shape
    n_vocab = params["n_vocab"]
    pos_ids = n_vocab + jnp.arange(T)
    x = jnp.take(params["embed"], token_ids, axis=0) \
        + jnp.take(params["embed"], pos_ids, axis=0)[None]
    bias = causal_bias(T, T)

    def body(x, lp):
        y, _ = _block(x, lp, bias, n_heads, dtype)
        return y, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def gpt_logits(params, hidden, dtype=jnp.bfloat16):
    """Tied LM head over the *token* rows only."""
    table = params["embed"][: params["n_vocab"]]
    return jnp.dot(hidden.astype(dtype), table.T.astype(dtype),
                   preferred_element_type=jnp.float32)


def init_gpt_cache(params, batch, max_len, n_heads=12, dtype=jnp.bfloat16):
    L = params["layers"]["ln1"]["scale"].shape[0]
    D = params["embed"].shape[1]
    # flat (pre-head-split) K/V storage — see ops/attention.py cache notes
    return {"k": jnp.zeros((L, batch, max_len, D), dtype),
            "v": jnp.zeros((L, batch, max_len, D), dtype)}


def gpt_step(params, token_ids, cache, cache_index, n_heads=12,
             dtype=jnp.bfloat16):
    """Incremental step: token_ids [B, 1] at position cache_index."""
    n_vocab = params["n_vocab"]
    x = jnp.take(params["embed"], token_ids, axis=0) \
        + params["embed"][n_vocab + cache_index][None, None]
    max_len = cache["k"].shape[2]
    key_pos = jnp.arange(max_len)[None, None, None, :]
    bias = jnp.where(key_pos <= cache_index, 0.0, NEG_INF).astype(jnp.float32)

    def body(x, scanned):
        lp, k, v = scanned
        y, new_cache = _block(x, lp, bias, n_heads, dtype,
                              cache={"k": k, "v": v}, cache_index=cache_index)
        return y, (new_cache["k"], new_cache["v"])

    x, (nk, nv) = jax.lax.scan(body, x,
                               (params["layers"], cache["k"], cache["v"]))
    return x, {"k": nk, "v": nv}


def import_openai_gpt_state_dict(sd, params):
    """Map a COMET/openai-gpt torch state dict onto the pytree.

    openai-gpt uses Conv1D: weights are stored [in, out] (NO transpose);
    c_attn packs q|k|v along the output dim."""
    import numpy as np
    new_layers = {k: (dict(v) if isinstance(v, dict) else v)
                  for k, v in params["layers"].items()}
    attn = dict(new_layers["attn"])
    L = np.shape(attn["q_kernel"])[0]
    D = np.shape(attn["q_kernel"])[1]

    def get(*names):
        for n in names:
            if n in sd:
                return np.asarray(sd[n], np.float32)
        return None

    embed = get("transformer.tokens_embed.weight", "tokens_embed.weight",
                "transformer.embed.weight", "embed.weight")
    out = dict(params)
    if embed is not None:
        n = min(embed.shape[0], np.shape(params["embed"])[0])
        base = np.asarray(params["embed"], np.float32).copy()
        base[:n] = embed[:n]
        out["embed"] = jnp.asarray(base)

    qk = {k: [] for k in ("q_kernel", "k_kernel", "v_kernel", "q_bias",
                          "k_bias", "v_bias", "o_kernel", "o_bias")}
    stacked = {"fc_kernel": [], "fc_bias": [], "proj_kernel": [],
               "proj_bias": [], "ln1s": [], "ln1b": [], "ln2s": [], "ln2b": []}
    ok = True
    for i in range(L):
        base = f"transformer.h.{i}"
        cattn_w = get(f"{base}.attn.c_attn.weight", f"h.{i}.attn.c_attn.weight")
        cattn_b = get(f"{base}.attn.c_attn.bias", f"h.{i}.attn.c_attn.bias")
        cproj_w = get(f"{base}.attn.c_proj.weight", f"h.{i}.attn.c_proj.weight")
        cproj_b = get(f"{base}.attn.c_proj.bias", f"h.{i}.attn.c_proj.bias")
        if cattn_w is None:
            ok = False
            break
        qk["q_kernel"].append(cattn_w[:, :D])
        qk["k_kernel"].append(cattn_w[:, D:2 * D])
        qk["v_kernel"].append(cattn_w[:, 2 * D:])
        qk["q_bias"].append(cattn_b[:D])
        qk["k_bias"].append(cattn_b[D:2 * D])
        qk["v_bias"].append(cattn_b[2 * D:])
        qk["o_kernel"].append(cproj_w)
        qk["o_bias"].append(cproj_b)
        stacked["fc_kernel"].append(get(f"{base}.mlp.c_fc.weight"))
        stacked["fc_bias"].append(get(f"{base}.mlp.c_fc.bias"))
        stacked["proj_kernel"].append(get(f"{base}.mlp.c_proj.weight"))
        stacked["proj_bias"].append(get(f"{base}.mlp.c_proj.bias"))
        stacked["ln1s"].append(get(f"{base}.ln_1.weight"))
        stacked["ln1b"].append(get(f"{base}.ln_1.bias"))
        stacked["ln2s"].append(get(f"{base}.ln_2.weight"))
        stacked["ln2b"].append(get(f"{base}.ln_2.bias"))
    if ok:
        for k, v in qk.items():
            attn[k] = jnp.asarray(np.stack(v))
        new_layers["attn"] = attn
        new_layers["fc_kernel"] = jnp.asarray(np.stack(stacked["fc_kernel"]))
        new_layers["fc_bias"] = jnp.asarray(np.stack(stacked["fc_bias"]))
        new_layers["proj_kernel"] = jnp.asarray(np.stack(stacked["proj_kernel"]))
        new_layers["proj_bias"] = jnp.asarray(np.stack(stacked["proj_bias"]))
        new_layers["ln1"] = {"scale": jnp.asarray(np.stack(stacked["ln1s"])),
                             "bias": jnp.asarray(np.stack(stacked["ln1b"]))}
        new_layers["ln2"] = {"scale": jnp.asarray(np.stack(stacked["ln2s"])),
                             "bias": jnp.asarray(np.stack(stacked["ln2b"]))}
        out["layers"] = new_layers
    return out, ok
