"""Fused FFN kernel correctness (interpret mode on CPU).

Covers ops/pallas_ffn.py: forward/backward parity vs the composite
dense -> gelu -> dense chain (ops/layers.py, the HF 3.0.2 fc1/fc2 block
the reference inherits at src/model/modules.py:8-14), the selection
gate, and the custom_partitioning row-sharding (zero all-gathers of the
activations under DP).

The kernel evaluates GELU via the Abramowitz-Stegun erf polynomial in
fp32 on bf16-rounded activations (Pallas TPU has no erf), so parity vs
the composite bf16 chain is to bf16 tolerance, not bit-exact.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np

from kmbart_tpu.ops.layers import dense, gelu
from kmbart_tpu.ops.pallas_ffn import fused_ffn, fused_ffn_supported


def _params(np_rng, n=16, d=32, f=64):
    x = np_rng.normal(size=(2, n // 2, d)).astype(np.float32)
    w1 = (np_rng.normal(size=(d, f)) * 0.3).astype(np.float32)
    b1 = np_rng.normal(size=(f,)).astype(np.float32)
    w2 = (np_rng.normal(size=(f, d)) * 0.3).astype(np.float32)
    b2 = np_rng.normal(size=(d,)).astype(np.float32)
    return x, w1, b1, w2, b2


def _composite(x, w1, b1, w2, b2):
    h = dense(jnp.asarray(x).astype(jnp.bfloat16), jnp.asarray(w1),
              jnp.asarray(b1), jnp.bfloat16)
    h = gelu(h)
    return dense(h, jnp.asarray(w2), jnp.asarray(b2), jnp.bfloat16)


def _fused(x, w1, b1, w2, b2):
    return fused_ffn(jnp.asarray(x).astype(jnp.bfloat16), jnp.asarray(w1),
                     jnp.asarray(b1), jnp.asarray(w2), jnp.asarray(b2),
                     interpret=True)


def test_forward_matches_composite(np_rng, monkeypatch):
    monkeypatch.setenv("KMBART_FUSED_FFN_TILES", "8,32")
    x, w1, b1, w2, b2 = _params(np_rng)
    ref = np.asarray(_composite(x, w1, b1, w2, b2), np.float32)
    out = np.asarray(_fused(x, w1, b1, w2, b2), np.float32)
    assert out.shape == x.shape and out.dtype == np.float32
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=0.03 * scale)


def test_gradients_match_composite(np_rng, monkeypatch):
    monkeypatch.setenv("KMBART_FUSED_FFN_TILES", "8,32")
    x, w1, b1, w2, b2 = _params(np_rng)
    cot = np_rng.normal(size=x.shape).astype(np.float32)

    def loss(fn):
        def g(x_, w1_, b1_, w2_, b2_):
            y = fn(x_, w1_, b1_, w2_, b2_).astype(jnp.float32)
            return jnp.sum(y * jnp.asarray(cot))
        return jax.grad(g, argnums=(0, 1, 2, 3, 4))(
            jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
            jnp.asarray(w2), jnp.asarray(b2))

    g_ref = loss(_composite)
    g_fused = loss(_fused)
    # param grads must come back fp32 (the optimizer dtype)
    for gr in g_fused[1:]:
        assert gr.dtype == jnp.float32
    for name, a, b in zip("x w1 b1 w2 b2".split(), g_fused, g_ref):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=0.05 * scale,
                                   err_msg=f"grad {name}")


def test_gate(monkeypatch):
    # CPU backend (the test env) -> gated off
    assert not fused_ffn_supported(9216, 768, 3072, "gelu", 0.0, True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert fused_ffn_supported(9216, 768, 3072, "gelu", 0.0, True)
    # misaligned rows / dims
    assert not fused_ffn_supported(9217, 768, 3072, "gelu", 0.0, True)
    assert not fused_ffn_supported(9216, 768, 3000, "gelu", 0.0, True)
    # active activation-dropout only matters in train mode
    assert not fused_ffn_supported(9216, 768, 3072, "gelu", 0.1, True)
    assert fused_ffn_supported(9216, 768, 3072, "gelu", 0.1, False)
    # non-erf activations and non-bf16 compute stay composite
    assert not fused_ffn_supported(9216, 768, 3072, "relu", 0.0, True)
    assert not fused_ffn_supported(9216, 768, 3072, "gelu", 0.0, True,
                                   dtype=jnp.float32)
    # escape hatch
    monkeypatch.setenv("KMBART_NO_FUSED_FFN", "1")
    assert not fused_ffn_supported(9216, 768, 3072, "gelu", 0.0, True)


def test_partitions_on_mesh(np_rng, monkeypatch):
    """custom_partitioning: rows split over DP with zero all-gathers,
    gradients identical to the single-device trace."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    monkeypatch.setenv("KMBART_FUSED_FFN_TILES", "8,32")
    x, w1, b1, w2, b2 = _params(np_rng, n=64)
    x16 = jnp.asarray(x).astype(jnp.bfloat16).reshape(8, 8, -1)

    def f(x_, w1_, b1_, w2_, b2_):
        y = fused_ffn(x_, w1_, b1_, w2_, b2_, interpret=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    args = (x16, jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2),
            jnp.asarray(b2))
    g_single = jax.grad(f, argnums=(0, 1, 3))(*args)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    rows = NamedSharding(mesh, P("data", None, None))
    rep = NamedSharding(mesh, P())
    jf = jax.jit(jax.grad(f, argnums=(0, 1, 3)),
                 in_shardings=(rows, rep, rep, rep, rep))
    g = jf(*args)
    for a, b in zip(g, g_single):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-5)
    txt = jf.lower(*args).compile().as_text()
    assert not re.search(r"all-gather", txt)


def test_model_ffn_path_uses_fused_when_supported(np_rng, monkeypatch):
    """_residual_ffn routes through the kernel when the gate passes and
    matches the composite route to bf16 tolerance (CPU: interpret off,
    so force the gate + interpret through the module seam)."""
    import kmbart_tpu.models.bart as bart_mod
    from kmbart_tpu.config import MultiModalBartConfig

    monkeypatch.setenv("KMBART_FUSED_FFN_TILES", "8,32")
    cfg = MultiModalBartConfig(
        vocab_size=64, d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, dtype="bfloat16")
    d, f = 32, 64
    lp = {
        "fc1_kernel": jnp.asarray((np_rng.normal(size=(d, f)) * 0.3),
                                  jnp.float32),
        "fc1_bias": jnp.asarray(np_rng.normal(size=(f,)), jnp.float32),
        "fc2_kernel": jnp.asarray((np_rng.normal(size=(f, d)) * 0.3),
                                  jnp.float32),
        "fc2_bias": jnp.asarray(np_rng.normal(size=(d,)), jnp.float32),
        "final_layer_norm": {"scale": jnp.ones((d,), jnp.float32),
                             "bias": jnp.zeros((d,), jnp.float32)},
    }
    x = jnp.asarray(np_rng.normal(size=(2, 8, d)), jnp.bfloat16)
    composite_out = bart_mod._residual_ffn(
        x, lp, cfg, {}, False, jnp.bfloat16, gelu)

    calls = {}

    def force_gate(*a, **k):
        calls["gated"] = True
        return True

    import kmbart_tpu.ops.pallas_ffn as ffn_mod
    orig_fn = ffn_mod._fused_ffn_fn
    monkeypatch.setattr(ffn_mod, "fused_ffn_supported", force_gate)
    monkeypatch.setattr(ffn_mod, "_fused_ffn_fn",
                        lambda interpret: orig_fn(True))
    fused_out = bart_mod._residual_ffn(
        x, lp, cfg, {}, False, jnp.bfloat16, gelu)
    assert calls.get("gated")
    a = np.asarray(fused_out, np.float32)
    b = np.asarray(composite_out, np.float32)
    np.testing.assert_allclose(a, b, atol=0.05 * max(np.abs(b).max(), 1.0))
