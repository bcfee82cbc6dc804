"""Backward (custom_vjp) Pallas kernels == jax.grad of the jnp twins
(interpret mode on CPU). These guards let training run the fused kernels:
trainer.py only drops its use_pallas override because every kernel's VJP is
asserted here against the differentiable jnp formulation."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mp_hsir_tpu.ops.basic import gelu_exact, layer_norm

RNG = np.random.default_rng(0)


def _grad_check(fused_fn, ref_fn, args, atol, rtol=1e-3, argnums=None):
    """Compare value + grads of sum(out * cot) between the fused path and
    the jnp reference, for every (or selected) argument."""
    argnums = tuple(range(len(args))) if argnums is None else argnums
    out_ref = ref_fn(*args)
    cot = jnp.asarray(RNG.standard_normal(out_ref.shape), out_ref.dtype)

    def loss(fn):
        def f(*a):
            return jnp.sum(fn(*a).astype(jnp.float32) * cot.astype(jnp.float32))
        return f

    val_f, grads_f = jax.value_and_grad(loss(fused_fn), argnums=argnums)(*args)
    val_r, grads_r = jax.value_and_grad(loss(ref_fn), argnums=argnums)(*args)
    np.testing.assert_allclose(float(val_f), float(val_r), rtol=1e-4, atol=atol)
    for i, (gf, gr) in enumerate(zip(grads_f, grads_r)):
        scale = max(1.0, float(jnp.max(jnp.abs(gr))))
        np.testing.assert_allclose(
            np.asarray(gf, np.float32), np.asarray(gr, np.float32),
            atol=atol * scale, rtol=rtol, err_msg=f"grad arg {argnums[i]}")


@pytest.mark.parametrize("residual", [False, True])
def test_mlp_vjp(residual):
    from mp_hsir_tpu.ops.pallas_vjp import mlp_fused

    b, h, w, c = 1, 16, 16, 8
    hidden = 12  # exercises the lane padding (padded to 128)
    x = jnp.asarray(RNG.standard_normal((b, h, w, c)), jnp.float32)
    ln_w = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(c), jnp.float32)
    ln_b = jnp.asarray(0.1 * RNG.standard_normal(c), jnp.float32)
    w1 = jnp.asarray(RNG.standard_normal((c, 2 * hidden)) * 0.3, jnp.float32)
    b1 = jnp.asarray(0.1 * RNG.standard_normal(2 * hidden), jnp.float32)
    w2 = jnp.asarray(RNG.standard_normal((hidden, c)) * 0.3, jnp.float32)
    b2 = jnp.asarray(0.1 * RNG.standard_normal(c), jnp.float32)

    def ref(x, ln_w, ln_b, w1, b1, w2, b2):
        xn = layer_norm(x, ln_w, ln_b, 1e-5)
        hh = xn @ w1 + b1
        a, g = jnp.split(hh, 2, axis=-1)
        y = (a * gelu_exact(g)) @ w2 + b2
        return x + y if residual else y

    def fused(x, ln_w, ln_b, w1, b1, w2, b2):
        from mp_hsir_tpu.ops.pallas_attention import fused_ln_gated_mlp_nhwc
        return fused_ln_gated_mlp_nhwc(x, ln_w, ln_b, w1, b1, w2, b2,
                                       residual=residual, interpret=True)

    _grad_check(fused, ref, (x, ln_w, ln_b, w1, b1, w2, b2), atol=1e-4)


@pytest.mark.parametrize("residual", [False, True])
def test_gdfn_vjp(residual):
    """GDFN backward incl. the depthwise-3x3 halo-row gradient routing
    (3 slabs so interior slabs have both neighbors)."""
    from mp_hsir_tpu.ops.conv import conv2d

    b, h, w, c = 1, 24, 16, 8
    hidden = 12
    x = jnp.asarray(RNG.standard_normal((b, h, w, c)), jnp.float32)
    ln_w = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(c), jnp.float32)
    ln_b = jnp.asarray(0.1 * RNG.standard_normal(c), jnp.float32)
    w_in = jnp.asarray(RNG.standard_normal((1, 1, c, 2 * hidden)) * 0.3, jnp.float32)
    w_dw = jnp.asarray(RNG.standard_normal((3, 3, 1, 2 * hidden)) * 0.3, jnp.float32)
    w_out = jnp.asarray(RNG.standard_normal((1, 1, hidden, c)) * 0.3, jnp.float32)

    def ref(x, ln_w, ln_b, w_in, w_dw, w_out):
        xn = layer_norm(x, ln_w, ln_b, 1e-5)
        t = conv2d(xn, w_in, None)
        t = conv2d(t, w_dw, None, padding=1, groups=2 * hidden)
        x1, x2 = jnp.split(t, 2, axis=-1)
        y = conv2d(gelu_exact(x1) * x2, w_out, None)
        return x + y if residual else y

    def fused(x, ln_w, ln_b, w_in, w_dw, w_out):
        from mp_hsir_tpu.ops.pallas_attention import fused_ln_gdfn_nhwc
        return fused_ln_gdfn_nhwc(x, ln_w, ln_b, w_in, w_dw, w_out,
                                  residual=residual, interpret=True)

    _grad_check(fused, ref, (x, ln_w, ln_b, w_in, w_dw, w_out), atol=2e-4)


@pytest.mark.parametrize("masked,b,c", [(False, 1, 8), (True, 1, 8),
                                        (False, 4, 8), (True, 4, 8),
                                        (False, 1, 64), (True, 1, 64),
                                        (False, 1, 128), (True, 1, 128)])
def test_window_attention_vjp(masked, b, c, monkeypatch):
    """LN + window-MSA backward: both outputs (map + per-window pooled
    means) carry cotangents; rel-pos-bias grads flow through segment_bias's
    gather; the shift-region mask blocks cross-region gradient exactly.
    b=4 exercises the batched backward tiling (nb=4, rows=2 per grid step —
    _win_bwd_tiles); b=1 the single-sample rows=2 case. c=64 (dh=32) and
    c=128 (dh=64) route through the head-pair-packed seg_w=8 kernels
    (seg_packed / seg_bwd_packed) — the production flagship tiles, which
    the small-dim cases never reach (pack_ok needs dh in {32, 64}).
    PALLAS_PACK_DH64=1 forces the dh=64 packing at this 16-wide test map
    (production gates it to eval widths W >= 128)."""
    from mp_hsir_tpu.ops.window import shifted_region_map, window_partition, window_reverse

    monkeypatch.setenv("PALLAS_PACK_DH64", "1")
    h, w, heads = 16, 16, 2
    dh = c // heads
    n = 64
    x = jnp.asarray(RNG.standard_normal((b, h, w, c)), jnp.float32)
    ln_w = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(c), jnp.float32)
    ln_b = jnp.asarray(0.1 * RNG.standard_normal(c), jnp.float32)
    wqkv = jnp.asarray(RNG.standard_normal((c, 3 * c)) * 0.3, jnp.float32)
    bqkv = jnp.asarray(0.1 * RNG.standard_normal(3 * c), jnp.float32)
    rel_bias = jnp.asarray(0.2 * RNG.standard_normal((heads, n, n)), jnp.float32)
    wp = jnp.asarray(RNG.standard_normal((c, c)) * 0.3, jnp.float32)
    bp = jnp.asarray(0.1 * RNG.standard_normal(c), jnp.float32)
    region = jnp.asarray(shifted_region_map(h, w, 8, 4)) if masked else None

    def ref(x, ln_w, ln_b, wqkv, bqkv, rel_bias, wp, bp):
        xn = layer_norm(x, ln_w, ln_b, 1e-5)
        win = window_partition(xn, 8)  # (Bw, 64, C)
        bw_ = win.shape[0]
        qkv = win @ wqkv + bqkv
        qkv = qkv.reshape(bw_, n, 3, heads, dh).transpose(2, 0, 3, 1, 4)
        q = qkv[0] * (dh ** -0.5)
        att = jnp.einsum("whnd,whmd->whnm", q, qkv[1]) + rel_bias[None]
        if masked:
            lab = window_partition(
                jnp.broadcast_to(region.reshape(1, h, w, 1),
                                 (b, h, w, 1)).astype(jnp.float32), 8
            )[..., 0]  # (B*nW, 64)
            off = lab[:, :, None] != lab[:, None, :]
            att = jnp.where(off[:, None], -jnp.inf, att)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("whnm,whmd->wnhd", att, qkv[2]).reshape(bw_, n, c)
        y = window_reverse(o @ wp + bp, 8, h, w)
        pooled = y.reshape(b, h // 8, 8, w // 8, 8, c).mean(axis=(2, 4))
        return y, pooled

    def fused(x, ln_w, ln_b, wqkv, bqkv, rel_bias, wp, bp):
        from mp_hsir_tpu.ops.pallas_attention import fused_ln_window_attention_nhwc
        return fused_ln_window_attention_nhwc(
            x, ln_w, ln_b, wqkv, bqkv, rel_bias, wp, bp, region, heads,
            interpret=True)

    args = (x, ln_w, ln_b, wqkv, bqkv, rel_bias, wp, bp)
    out_ref = ref(*args)
    cots = tuple(jnp.asarray(RNG.standard_normal(o.shape), jnp.float32)
                 for o in out_ref)

    def loss(fn):
        def f(*a):
            ys = fn(*a)
            return sum(jnp.sum(y.astype(jnp.float32) * ct) for y, ct in zip(ys, cots))
        return f

    val_f, gf = jax.value_and_grad(loss(fused), argnums=tuple(range(8)))(*args)
    val_r, gr = jax.value_and_grad(loss(ref), argnums=tuple(range(8)))(*args)
    np.testing.assert_allclose(float(val_f), float(val_r), rtol=1e-4)
    for i, (a_, b_) in enumerate(zip(gf, gr)):
        scale = max(1.0, float(jnp.max(jnp.abs(b_))))
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=2e-4 * scale, rtol=1e-3,
                                   err_msg=f"grad arg {i}")


@pytest.mark.parametrize("ln_residual", [False, True])
def test_spectral_vjp(ln_residual):
    """Two-phase spectral (MDTA) backward: global Gram/norm/softmax VJP,
    dwconv halo-row gradient routing, temperature grad, and the folded
    LayerNorm + residual variant (TransformerBlock's fused form)."""
    from mp_hsir_tpu.ops.conv import conv2d

    b, h, w, c, heads = 1, 24, 16, 8, 2
    x = jnp.asarray(RNG.standard_normal((b, h, w, c)), jnp.float32)
    wqkv = jnp.asarray(RNG.standard_normal((1, 1, c, 3 * c)) * 0.3, jnp.float32)
    wdw = jnp.asarray(RNG.standard_normal((3, 3, 1, 3 * c)) * 0.3, jnp.float32)
    temp = jnp.asarray(1.0 + 0.2 * RNG.standard_normal((heads, 1, 1)), jnp.float32)
    wout = jnp.asarray(RNG.standard_normal((1, 1, c, c)) * 0.3, jnp.float32)
    ln_w = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(c), jnp.float32)
    ln_b = jnp.asarray(0.1 * RNG.standard_normal(c), jnp.float32)
    dh = c // heads

    def ref(x, wqkv, wdw, temp, wout, ln_w, ln_b):
        xin = layer_norm(x, ln_w, ln_b, 1e-5) if ln_residual else x
        qkv = conv2d(xin, wqkv, None)
        qkv = conv2d(qkv, wdw, None, padding=1, groups=3 * c)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def r(t):
            return t.reshape(b, h * w, heads, dh)

        q, k, v = r(q), r(k), r(v)
        gram = jnp.einsum("bphd,bphe->bhde", q, k)
        nq = jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(q), axis=1)), 1e-12)
        nk = jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(k), axis=1)), 1e-12)
        attn = gram / (nq[..., :, None] * nk[..., None, :])
        attn = jax.nn.softmax(attn * temp, axis=-1)
        wr = wout.reshape(c, c).reshape(heads, dh, c)
        comb = jnp.einsum("bhde,hdo->bheo", attn, wr)
        out = jnp.einsum("bphe,bheo->bpo", v, comb).reshape(b, h, w, c)
        return x + out if ln_residual else out

    def fused(x, wqkv, wdw, temp, wout, ln_w, ln_b):
        from mp_hsir_tpu.ops.pallas_attention import fused_spectral_attention_nhwc
        kw = dict(ln_w=ln_w, ln_b=ln_b, residual=True) if ln_residual else {}
        return fused_spectral_attention_nhwc(x, wqkv, wdw, temp, wout, heads,
                                             interpret=True, **kw)

    args = (x, wqkv, wdw, temp, wout, ln_w, ln_b)
    argnums = tuple(range(7)) if ln_residual else tuple(range(5))
    _grad_check(fused, ref, args, atol=3e-4, argnums=argnums)


def _interp_kernels(monkeypatch):
    """Force interpret mode on every fused kernel entry point."""
    import mp_hsir_tpu.ops.pallas_attention as PA

    for name in ("fused_ln_window_attention_nhwc", "fused_spectral_attention_nhwc",
                 "fused_ln_gated_mlp_nhwc", "fused_ln_gdfn_nhwc",
                 "fused_conv3x3_nhwc", "fused_spectral_attention_split"):
        orig = getattr(PA, name)

        def interp(*a, _orig=orig, **kw):
            kw["interpret"] = True
            return _orig(*a, **kw)

        monkeypatch.setattr(PA, name, interp)


@pytest.mark.parametrize("shifted", [False, True])
def test_pgsstb_grad_parity(shifted, monkeypatch):
    """Full PGSSTB training-path gradients (use_pallas=True, the branch
    trainer.py now runs) == the jnp path, same params — the round-1 VERDICT
    'done' criterion for turning the kernels on in training."""
    from mp_hsir_tpu.models.layers import PGSSTB

    _interp_kernels(monkeypatch)
    dim, heads = 16, 2
    x = jnp.asarray(RNG.standard_normal((1, 16, 16, dim)) * 0.5, jnp.float32)

    def block(use_pallas):
        return PGSSTB(dim=dim, num_heads=heads, window_size=8,
                      shift_size=4 if shifted else 0, mlp_ratio=2.0,
                      compress_ratio=4, prompt_len=8,
                      input_resolution=(64, 64), use_pallas=use_pallas)

    params = block(False).init(jax.random.key(0), x, True)["params"]

    def loss(use_pallas):
        def f(p, xx):
            y = block(use_pallas).apply({"params": p}, xx, False)
            return jnp.sum(y * y)
        return f

    v_r, gx_r = jax.value_and_grad(loss(False), argnums=(0, 1))(params, x)
    v_f, gx_f = jax.value_and_grad(loss(True), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=2e-4)
    flat_r = jax.tree_util.tree_leaves_with_path(gx_r[0])
    flat_f = jax.tree_util.tree_leaves(gx_f[0])
    for (path, gr), gf in zip(flat_r, flat_f):
        scale = max(1.0, float(jnp.max(jnp.abs(gr))))
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4 * scale, rtol=2e-3,
            err_msg=jax.tree_util.keystr(path))
    scale = max(1.0, float(jnp.max(jnp.abs(gx_r[1]))))
    np.testing.assert_allclose(np.asarray(gx_f[1]), np.asarray(gx_r[1]),
                               atol=5e-4 * scale, rtol=2e-3, err_msg="dx")


def test_transformer_block_grad_parity(monkeypatch):
    """TransformerBlock fused path (spectral ln+residual kernel + GDFN
    residual kernel) gradients == jnp path."""
    from mp_hsir_tpu.models.layers import TransformerBlock

    _interp_kernels(monkeypatch)
    dim, heads = 16, 2
    x = jnp.asarray(RNG.standard_normal((1, 16, 16, dim)) * 0.5, jnp.float32)
    params = TransformerBlock(dim, heads).init(jax.random.key(0), x)["params"]

    def loss(use_pallas):
        def f(p, xx):
            y = TransformerBlock(dim, heads, use_pallas=use_pallas).apply(
                {"params": p}, xx)
            return jnp.sum(y * y)
        return f

    v_r, g_r = jax.value_and_grad(loss(False), argnums=(0, 1))(params, x)
    v_f, g_f = jax.value_and_grad(loss(True), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=2e-4)
    for (path, gr), gf in zip(jax.tree_util.tree_leaves_with_path(g_r[0]),
                              jax.tree_util.tree_leaves(g_f[0])):
        scale = max(1.0, float(jnp.max(jnp.abs(gr))))
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4 * scale, rtol=2e-3,
            err_msg=jax.tree_util.keystr(path))


def test_conv3x3_vjp():
    from mp_hsir_tpu.ops.conv import conv2d

    b, h, w, cin, cout = 2, 16, 12, 8, 16
    x = jnp.asarray(RNG.standard_normal((b, h, w, cin)), jnp.float32)
    wk = jnp.asarray(RNG.standard_normal((3, 3, cin, cout)) * 0.3, jnp.float32)

    def ref(x, wk):
        return conv2d(x, wk, None, padding=1)

    def fused(x, wk):
        from mp_hsir_tpu.ops.pallas_attention import fused_conv3x3_nhwc
        return fused_conv3x3_nhwc(x, wk, interpret=True)

    _grad_check(fused, ref, (x, wk), atol=1e-4)


@pytest.mark.parametrize("shifted", [False, True])
def test_sharded_pgsstb_train_grad_parity(shifted, monkeypatch):
    """MESH TRAINING on the fused kernel path (round-2 VERDICT #2): grads of
    a spatially sharded PGSSTB in train mode (deterministic=False, batch 2)
    routed through the differentiable split-phase sharded spectral kernel
    (sp0/sp1 custom_vjp cores; ppermute/psum transposed by JAX in the traced
    glue) == the plain unsharded jnp path. The routing is call-counted AND
    asserted via the FUSED_PATH_STATS coverage counters (VERDICT #6): every
    block must take the sharded fused epilogue, shifted included."""
    from jax.sharding import PartitionSpec as P

    import mp_hsir_tpu.ops.pallas_attention as PA
    from mp_hsir_tpu.models import layers as L
    from mp_hsir_tpu.models.layers import PGSSTB
    from mp_hsir_tpu.parallel.mesh import SPATIAL_AXIS, make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh = make_mesh(data=1, spatial=2)
    _interp_kernels(monkeypatch)
    calls = {"sharded": 0}
    orig_sh = PA.fused_spectral_attention_sharded

    def counted(*a, **kw):
        calls["sharded"] += 1
        kw["interpret"] = True
        return orig_sh(*a, **kw)

    monkeypatch.setattr(PA, "fused_spectral_attention_sharded", counted)

    dim, heads = 16, 2
    x = jnp.asarray(RNG.standard_normal((2, 16, 32, dim)) * 0.5, jnp.float32)
    plain = PGSSTB(dim=dim, num_heads=heads, window_size=8,
                   shift_size=4 if shifted else 0, mlp_ratio=2.0,
                   compress_ratio=4, prompt_len=8, input_resolution=(64, 64))
    params = plain.init(jax.random.key(0), x, True)["params"]

    def loss_plain(p, xx):
        y = plain.apply({"params": p}, xx, False)
        return jnp.sum(jnp.square(y.astype(jnp.float32)))

    want_l, (want_gp, want_gx) = jax.value_and_grad(
        loss_plain, argnums=(0, 1))(params, x)

    sharded = PGSSTB(dim=dim, num_heads=heads, window_size=8,
                     shift_size=4 if shifted else 0, mlp_ratio=2.0,
                     compress_ratio=4, prompt_len=8, input_resolution=(64, 64),
                     axis_name=SPATIAL_AXIS, use_pallas=True)
    bspec = P(None, SPATIAL_AXIS, None, None)

    def local(p, xx):
        def loss(pp, xl):
            y = sharded.apply({"params": pp}, xl, False)
            return jnp.sum(jnp.square(y.astype(jnp.float32)))

        l, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(p, xx)
        return (jax.lax.psum(l, SPATIAL_AXIS),
                jax.lax.psum(gp, SPATIAL_AXIS), gx)

    f_sh = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), bspec),
        out_specs=(P(), P(), bspec), check_vma=False))
    L.reset_fused_path_stats()
    got_l, got_gp, got_gx = f_sh(params, x)

    # the TRAIN step must have taken the Pallas sharded spectral path
    assert calls["sharded"] > 0
    assert L.FUSED_PATH_STATS.get("pgsstb_fused_sharded_epilogue", 0) > 0
    assert L.FUSED_PATH_STATS.get("pgsstb_fused_explicit", 0) == 0
    assert L.FUSED_PATH_STATS.get("pgsstb_unfused", 0) == 0

    np.testing.assert_allclose(float(got_l), float(want_l), rtol=2e-4)
    flat_want = jax.tree_util.tree_leaves_with_path(want_gp)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(got_gp))
    for path, gr in flat_want:
        scale = max(1.0, float(jnp.max(jnp.abs(gr))))
        np.testing.assert_allclose(
            np.asarray(flat_got[path]), np.asarray(gr), atol=5e-4 * scale,
            rtol=2e-3, err_msg=jax.tree_util.keystr(path))
    scale = max(1.0, float(jnp.max(jnp.abs(want_gx))))
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(want_gx),
                               atol=5e-4 * scale, rtol=2e-3, err_msg="dx")


def test_spectral_tp_fused_grad_parity(monkeypatch):
    """Spectral TP on the fused sp0/sp1 custom-VJP cores (round-3 VERDICT
    #5): head-parallel kernel route (local head-block qkv/dwconv slices,
    (CL, C) local comb, psum'd partial projections over `spectral`,
    composed with spatial halo sharding) — forward AND grads == the
    unsharded jnp module. SURVEY §2.6 band-sharding; the reference has no
    analogue (single GPU, net/MP_HSIR.py:85-114)."""
    from jax.sharding import PartitionSpec as P

    import mp_hsir_tpu.ops.pallas_attention as PA
    from mp_hsir_tpu.models import layers as L
    from mp_hsir_tpu.models.layers import SpectralAttention
    from mp_hsir_tpu.parallel.mesh import (SPATIAL_AXIS, SPECTRAL_AXIS,
                                           make_mesh)

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh(data=1, spatial=2, spectral=2)
    calls = {"tp": 0}
    orig = PA.fused_spectral_attention_tp

    def counted(*a, **kw):
        calls["tp"] += 1
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(PA, "fused_spectral_attention_tp", counted)

    dim, heads = 16, 4  # cl = 8 per spectral member
    x = jnp.asarray(RNG.standard_normal((1, 16, 16, dim)) * 0.5, jnp.float32)
    plain = SpectralAttention(dim, heads)
    params = plain.init(jax.random.key(0), x)["params"]

    def loss_plain(p, xx):
        return jnp.sum(jnp.square(plain.apply({"params": p}, xx)))

    want_l, (want_gp, want_gx) = jax.value_and_grad(
        loss_plain, argnums=(0, 1))(params, x)

    sharded = SpectralAttention(dim, heads, axis_name=SPATIAL_AXIS,
                                spectral_axis=SPECTRAL_AXIS, use_pallas=True)
    bspec = P(None, SPATIAL_AXIS, None, None)

    def local(p, xx):
        def loss(pp, xl):
            return jnp.sum(jnp.square(sharded.apply({"params": pp}, xl)))

        l, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(p, xx)
        # loss/param grads sum over spatial rows; over the spectral axis the
        # trainer-style PMEAN is exact — the forward psum's transpose already
        # multiplies each member's partial cotangent by n (parallel/tp.py
        # gradient accounting); the same holds for dx (each member's dx is
        # n x its own head-block contribution)
        return (jax.lax.psum(l, SPATIAL_AXIS),
                jax.lax.pmean(jax.lax.psum(gp, SPATIAL_AXIS), SPECTRAL_AXIS),
                jax.lax.pmean(gx, SPECTRAL_AXIS))

    f_sh = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), bspec),
        out_specs=(P(), P(), bspec), check_vma=False))
    L.reset_fused_path_stats()
    got_l, got_gp, got_gx = f_sh(params, x)

    assert calls["tp"] > 0, "the TP kernel route must have engaged"
    assert L.FUSED_PATH_STATS.get("spectral_jnp", 0) == 0
    assert L.FUSED_PATH_STATS.get("spectral_pallas_tp", 0) > 0

    np.testing.assert_allclose(float(got_l), float(want_l), rtol=2e-4)
    flat_want = jax.tree_util.tree_leaves_with_path(want_gp)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(got_gp))
    for path, gr in flat_want:
        scale = max(1.0, float(jnp.max(jnp.abs(gr))))
        np.testing.assert_allclose(
            np.asarray(flat_got[path]), np.asarray(gr), atol=5e-4 * scale,
            rtol=2e-3, err_msg=jax.tree_util.keystr(path))
    scale = max(1.0, float(jnp.max(jnp.abs(want_gx))))
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(want_gx),
                               atol=5e-4 * scale, rtol=2e-3, err_msg="dx")


@pytest.mark.parametrize("shifted", [False, True])
def test_pgsstb_spectral_tp_epilogue_grad_parity(shifted, monkeypatch):
    """PGSSTB under SPECTRAL TP runs the fused TP epilogue (round-4 VERDICT
    #4): gate / gate_map / shortcut consumed by the head-parallel sp0/sp1
    kernel route (gate terms 1/n_sp-scaled per member, shortcut added once
    post-psum) — forward AND grads == the plain unsharded jnp block, and
    the explicit composition must NOT engage."""
    from jax.sharding import PartitionSpec as P

    import mp_hsir_tpu.ops.pallas_attention as PA
    from mp_hsir_tpu.models import layers as L
    from mp_hsir_tpu.models.layers import PGSSTB
    from mp_hsir_tpu.parallel.mesh import SPECTRAL_AXIS, make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh = make_mesh(data=1, spatial=1, spectral=2)
    _interp_kernels(monkeypatch)
    calls = {"tp": 0}
    orig = PA.fused_spectral_attention_tp

    def counted(*a, **kw):
        calls["tp"] += 1
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(PA, "fused_spectral_attention_tp", counted)

    dim, heads = 16, 2
    x = jnp.asarray(RNG.standard_normal((2, 16, 32, dim)) * 0.5, jnp.float32)
    plain = PGSSTB(dim=dim, num_heads=heads, window_size=8,
                   shift_size=4 if shifted else 0, mlp_ratio=2.0,
                   compress_ratio=4, prompt_len=8, input_resolution=(64, 64))
    params = plain.init(jax.random.key(0), x, True)["params"]

    def loss_plain(p, xx):
        y = plain.apply({"params": p}, xx, False)
        return jnp.sum(jnp.square(y.astype(jnp.float32)))

    want_l, (want_gp, want_gx) = jax.value_and_grad(
        loss_plain, argnums=(0, 1))(params, x)

    tp = PGSSTB(dim=dim, num_heads=heads, window_size=8,
                shift_size=4 if shifted else 0, mlp_ratio=2.0,
                compress_ratio=4, prompt_len=8, input_resolution=(64, 64),
                spectral_axis=SPECTRAL_AXIS, use_pallas=True)

    def local(p, xx):
        def loss(pp, xl):
            y = tp.apply({"params": pp}, xl, False)
            return jnp.sum(jnp.square(y.astype(jnp.float32)))

        l, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(p, xx)
        # over the spectral axis the trainer-style PMEAN is exact: the
        # forward psum's transpose hands every member the full cotangent
        # (see test_spectral_tp_fused_grad_parity)
        return (l, jax.lax.pmean(gp, SPECTRAL_AXIS),
                jax.lax.pmean(gx, SPECTRAL_AXIS))

    f_sh = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P(), P()),
        check_vma=False))
    L.reset_fused_path_stats()
    got_l, got_gp, got_gx = f_sh(params, x)

    assert calls["tp"] > 0, "the TP kernel route must have engaged"
    assert L.FUSED_PATH_STATS.get("pgsstb_fused_tp_epilogue", 0) > 0
    assert L.FUSED_PATH_STATS.get("pgsstb_fused_explicit", 0) == 0
    assert L.FUSED_PATH_STATS.get("pgsstb_unfused", 0) == 0
    assert L.FUSED_PATH_STATS.get("spectral_jnp", 0) == 0

    np.testing.assert_allclose(float(got_l), float(want_l), rtol=2e-4)
    flat_want = jax.tree_util.tree_leaves_with_path(want_gp)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(got_gp))
    for path, gr in flat_want:
        scale = max(1.0, float(jnp.max(jnp.abs(gr))))
        np.testing.assert_allclose(
            np.asarray(flat_got[path]), np.asarray(gr), atol=5e-4 * scale,
            rtol=2e-3, err_msg=jax.tree_util.keystr(path))
    scale = max(1.0, float(jnp.max(jnp.abs(want_gx))))
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(want_gx),
                               atol=5e-4 * scale, rtol=2e-3, err_msg="dx")


@pytest.mark.parametrize("shifted", [False, True])
def test_pgsstb_droppath_grad_parity(shifted, monkeypatch):
    """drop_path > 0 TRAINING on the fused path: the split-epilogue route
    consumes the per-sample stochastic-depth scales IN-KERNEL (sp1 + MLP
    kernels, exact ds cotangents) and must match the jnp path bit-for-mask:
    both draw the masks through the same DropPath module in the same order,
    so with identical rngs the values AND grads agree."""
    from mp_hsir_tpu.models import layers as L
    from mp_hsir_tpu.models.layers import PGSSTB

    _interp_kernels(monkeypatch)
    dim, heads = 16, 2
    x = jnp.asarray(RNG.standard_normal((4, 16, 16, dim)) * 0.5, jnp.float32)
    rngs = {"droppath": jax.random.key(42)}

    def block(use_pallas):
        return PGSSTB(dim=dim, num_heads=heads, window_size=8,
                      shift_size=4 if shifted else 0, mlp_ratio=2.0,
                      compress_ratio=4, prompt_len=8, drop_path=0.4,
                      input_resolution=(64, 64), use_pallas=use_pallas)

    params = block(False).init(jax.random.key(0), x, True)["params"]

    def loss(use_pallas):
        def f(p, xx):
            y = block(use_pallas).apply({"params": p}, xx, False, rngs=rngs)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return f

    L.reset_fused_path_stats()
    v_r, g_r = jax.value_and_grad(loss(False), argnums=(0, 1))(params, x)
    v_f, g_f = jax.value_and_grad(loss(True), argnums=(0, 1))(params, x)
    # the fused path must have routed through the train epilogue
    assert L.FUSED_PATH_STATS.get("pgsstb_fused_train_epilogue", 0) > 0
    assert L.FUSED_PATH_STATS.get("pgsstb_fused_explicit", 0) == 0
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=2e-4)
    for (path, gr), gf in zip(jax.tree_util.tree_leaves_with_path(g_r[0]),
                              jax.tree_util.tree_leaves(g_f[0])):
        scale = max(1.0, float(jnp.max(jnp.abs(gr))))
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4 * scale, rtol=2e-3,
            err_msg=jax.tree_util.keystr(path))
    scale = max(1.0, float(jnp.max(jnp.abs(g_r[1]))))
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_r[1]),
                               atol=5e-4 * scale, rtol=2e-3, err_msg="dx")
