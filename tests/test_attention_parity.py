"""Attention-module parity vs straight-line torch oracles.

These pin the exact reference semantics (channel-head packing order,
L2-normalized q/k with per-head temperature, PG prompt-bank contraction,
window rel-pos bias) against independently written torch formulas with
shared weights — the tests that catch rearrange/transpose mistakes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from mp_hsir_tpu.models.layers import PGSpectralAttention, SpatialAttention, SpectralAttention

RNG = np.random.default_rng(21)


def test_spectral_attention_torch_oracle():
    dim, heads, b, h, w = 8, 2, 2, 4, 4
    x = RNG.standard_normal((b, h, w, dim)).astype(np.float32)
    mod = SpectralAttention(dim, heads, use_bias=False)
    params = mod.init(jax.random.key(0), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    # torch oracle with the module's own weights (HWIO -> OIHW)
    w_qkv = torch.from_numpy(np.transpose(np.asarray(params["qkv"]["weight"]), (3, 2, 0, 1)))
    w_dw = torch.from_numpy(np.transpose(np.asarray(params["qkv_dwconv"]["weight"]), (3, 2, 0, 1)))
    w_out = torch.from_numpy(np.transpose(np.asarray(params["project_out"]["weight"]), (3, 2, 0, 1)))
    temp = torch.from_numpy(np.asarray(params["temperature"]))

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    qkv = F.conv2d(xt, w_qkv)
    qkv = F.conv2d(qkv, w_dw, padding=1, groups=3 * dim)
    q, k, v = qkv.chunk(3, dim=1)
    # reference packing: channel index = head * dh + c
    def heads_(t):
        return t.reshape(b, heads, dim // heads, h * w)

    q, k, v = heads_(q), heads_(k), heads_(v)
    q = F.normalize(q, dim=-1)
    k = F.normalize(k, dim=-1)
    attn = (q @ k.transpose(-2, -1)) * temp
    attn = attn.softmax(dim=-1)
    out = (attn @ v).reshape(b, dim, h, w)
    want = F.conv2d(out, w_out)
    np.testing.assert_allclose(got, np.transpose(want.numpy(), (0, 2, 3, 1)), atol=2e-5)


def test_pg_spectral_attention_torch_oracle():
    dim, ratio, plen, bw, n = 16, 8, 12, 3, 9
    x = RNG.standard_normal((bw, n, dim)).astype(np.float32)
    mod = PGSpectralAttention(dim, ratio, plen, use_bias=False)
    params = mod.init(jax.random.key(1), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    cr = dim // ratio
    W = {k: torch.from_numpy(np.asarray(v["weight"])) for k, v in params.items() if isinstance(v, dict) and "weight" in v}
    bank = torch.from_numpy(np.asarray(params["prompt_param"]))
    proj_b = torch.from_numpy(np.asarray(params["proj"]["bias"]))

    xt = torch.from_numpy(x)
    pooled = xt.mean(dim=1, keepdim=True)
    pw = torch.softmax(pooled @ W["linear_prompt"], dim=-1)  # (bw,1,plen)
    down = pooled @ W["linear_down"]
    prompt = (pw.unsqueeze(-1) * bank.repeat(bw, 1, 1, 1)).sum(dim=2)  # (bw,1,cr)
    q = prompt @ W["q"]
    kv = down @ W["kv"]
    k, v = kv.chunk(2, dim=2)
    attn = torch.softmax(q.transpose(-2, -1) @ k * cr**-0.5, dim=-1)
    out = (attn @ v.transpose(-2, -1)).transpose(-2, -1)
    out = out @ W["proj"] + proj_b
    out = out @ W["linear_up"]
    want = (out * xt).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_spatial_attention_torch_oracle():
    dim, heads, ws = 8, 2, 4
    n = ws * ws
    bw = 6
    x = RNG.standard_normal((bw, n, dim)).astype(np.float32)
    mod = SpatialAttention(dim, ws, heads)
    params = mod.init(jax.random.key(2), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    w_qkv = torch.from_numpy(np.asarray(params["qkv"]["weight"]))
    b_qkv = torch.from_numpy(np.asarray(params["qkv"]["bias"]))
    w_p = torch.from_numpy(np.asarray(params["proj"]["weight"]))
    b_p = torch.from_numpy(np.asarray(params["proj"]["bias"]))
    table = torch.from_numpy(np.asarray(params["relative_position_bias_table"]))

    from mp_hsir_tpu.models.layers import _relative_position_index

    idx = torch.from_numpy(np.asarray(_relative_position_index(ws))).long()

    xt = torch.from_numpy(x)
    qkv = (xt @ w_qkv + b_qkv).reshape(bw, n, 3, heads, dim // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (dim // heads) ** -0.5
    attn = q @ k.transpose(-2, -1)
    bias = table[idx.view(-1)].view(n, n, heads).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(bw, n, dim)
    want = (out @ w_p + b_p).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_cross_attention_sharded_matches_unsharded():
    """CrossAttention's pixel-global gram/norm statistics must psum over a
    spatial mesh axis (regression: round-3 review — the advertised
    axis_name parameter haloed the dwconvs but skipped the psums)."""
    import numpy as np
    import pytest
    from jax.sharding import PartitionSpec as P

    from mp_hsir_tpu.models.layers import CrossAttention
    from mp_hsir_tpu.parallel.mesh import SPATIAL_AXIS, make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh = make_mesh(data=1, spatial=2)

    dim, heads = 8, 2
    rng = np.random.default_rng(21)
    xq = jnp.asarray(rng.standard_normal((1, 8, 8, dim)).astype(np.float32))
    xkv = jnp.asarray(rng.standard_normal((1, 8, 8, dim)).astype(np.float32))
    plain = CrossAttention(dim, heads)
    params = plain.init(jax.random.key(11), xq, xkv)["params"]
    want = np.asarray(plain.apply({"params": params}, xq, xkv))

    sharded = CrossAttention(dim, heads, axis_name=SPATIAL_AXIS)
    bspec = P(None, SPATIAL_AXIS, None, None)
    f_sh = jax.jit(jax.shard_map(
        lambda p, a, b: sharded.apply({"params": p}, a, b),
        mesh=mesh, in_specs=(P(), bspec, bspec), out_specs=bspec,
        check_vma=False,
    ))
    got = np.asarray(f_sh(params, xq, xkv))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
