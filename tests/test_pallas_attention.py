"""Pallas fused window attention == jnp SpatialAttention (interpret mode on
CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mp_hsir_tpu.models.layers import SpatialAttention, _relative_position_index
from mp_hsir_tpu.ops.pallas_attention import fused_window_attention
from mp_hsir_tpu.ops.window import shifted_window_labels, shifted_window_mask

RNG = np.random.default_rng(33)


@pytest.mark.parametrize("masked", [False, True])
def test_fused_matches_module(masked):
    dim, heads, ws = 16, 2, 8
    n = ws * ws
    h = w = 16  # 4 windows
    nw = (h // ws) * (w // ws)
    x = RNG.standard_normal((nw, n, dim)).astype(np.float32)

    mod = SpatialAttention(dim, ws, heads)
    params = mod.init(jax.random.key(0), jnp.asarray(x))["params"]
    mask = jnp.asarray(shifted_window_mask(h, w, ws, ws // 2)) if masked else None
    labels = jnp.asarray(shifted_window_labels(h, w, ws, ws // 2)) if masked else None
    want = np.asarray(mod.apply({"params": params}, jnp.asarray(x), mask))

    table = np.asarray(params["relative_position_bias_table"])
    idx = _relative_position_index(ws)
    bias = table[idx.reshape(-1)].reshape(n, n, heads).transpose(2, 0, 1)
    got = np.asarray(
        fused_window_attention(
            jnp.asarray(x),
            jnp.asarray(params["qkv"]["weight"]),
            jnp.asarray(params["qkv"]["bias"]),
            jnp.asarray(bias),
            jnp.asarray(params["proj"]["weight"]),
            jnp.asarray(params["proj"]["bias"]),
            labels,
            heads,
            block_windows=2,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_module_pallas_flag_matches_plain():
    """SpatialAttention(use_pallas=True) in interpret mode == plain module,
    same params."""
    dim, heads, ws = 8, 2, 8
    n = ws * ws
    x = RNG.standard_normal((4, n, dim)).astype(np.float32)
    plain = SpatialAttention(dim, ws, heads)
    params = plain.init(jax.random.key(1), jnp.asarray(x))["params"]
    want = np.asarray(plain.apply({"params": params}, jnp.asarray(x)))

    import mp_hsir_tpu.ops.pallas_attention as PA

    orig = PA.fused_window_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    PA.fused_window_attention = interp
    try:
        fused = SpatialAttention(dim, ws, heads, use_pallas=True)
        got = np.asarray(fused.apply({"params": params}, jnp.asarray(x)))
    finally:
        PA.fused_window_attention = orig
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("batch", [1, 2])
@pytest.mark.parametrize("shifted", [False, True])
def test_nhwc_fused_matches_pgsstb_plain(shifted, batch):
    """The fused NHWC slab path (LN + window MSA in-kernel, PG gate on
    pooled maps, merged spectral phase 0) must reproduce the plain-jnp
    PGSSTB bit-for-bit-ish — incl. batch > 1 (the merged kernel's scratch
    ring and Gram accumulators reset per batch element). The batch-1 case
    uses H=24 (3 slabs) so the merged kernel's INTERIOR-slab halo branches
    run (n_slab=2 never exercises the shifted mid-slab bottom halo)."""
    import mp_hsir_tpu.ops.pallas_attention as PA
    from mp_hsir_tpu.models.layers import PGSSTB

    dim, heads = 16, 2
    h = 24 if batch == 1 else 16
    x = jnp.asarray(RNG.standard_normal((batch, h, 32, dim)).astype(np.float32))
    plain = PGSSTB(dim=dim, num_heads=heads, window_size=8,
                   shift_size=4 if shifted else 0, mlp_ratio=2.0,
                   compress_ratio=8, prompt_len=16, input_resolution=(64, 64))
    params = plain.init(jax.random.key(2), x)["params"]
    want = np.asarray(plain.apply({"params": params}, x))

    names = ["fused_ln_window_attention_nhwc", "fused_spectral_attention_nhwc",
             "fused_ln_gated_mlp_nhwc", "fused_spectral_attention_sharded"]
    origs = {n: getattr(PA, n) for n in names}

    def make_interp(fn):
        def interp(*args, **kw):
            kw["interpret"] = True
            return fn(*args, **kw)

        return interp

    for n in names:
        setattr(PA, n, make_interp(origs[n]))
    try:
        fused = PGSSTB(dim=dim, num_heads=heads, window_size=8,
                       shift_size=4 if shifted else 0, mlp_ratio=2.0,
                       compress_ratio=8, prompt_len=16,
                       input_resolution=(64, 64), use_pallas=True)
        got = np.asarray(fused.apply({"params": params}, x))
    finally:
        for n in names:
            setattr(PA, n, origs[n])
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)


@pytest.mark.parametrize("dim,shifted", [(64, True), (128, True),
                                         (128, False), (96, True),
                                         (96, False)])
def test_nhwc_fused_packed_matches_pgsstb_plain(dim, shifted, monkeypatch):
    """Same as above at production head widths: dim 64/128/96 with 2 heads
    → dh 32/64/48; dh 32/64 route the window kernels through the
    head-pair-packed seg_w=8 tiles (seg_packed) and dh 48 through the
    head-lane-PADDED packed path (_pad_head_lanes, the RS preset's eval
    route) — incl. the shifted path's in-kernel roll + region-label
    masking, which the small-dim cases never reach. The PACK env vars
    force the packing at this 16-wide test map (production gates it to
    eval widths W >= 128)."""
    import mp_hsir_tpu.ops.pallas_attention as PA
    from mp_hsir_tpu.models.layers import PGSSTB

    monkeypatch.setenv("PALLAS_PACK_DH64", "1")
    monkeypatch.setenv("PALLAS_PACK_DH48", "1")
    heads = 2
    x = jnp.asarray(RNG.standard_normal((1, 16, 16, dim)).astype(np.float32))
    plain = PGSSTB(dim=dim, num_heads=heads, window_size=8,
                   shift_size=4 if shifted else 0, mlp_ratio=2.0,
                   compress_ratio=8, prompt_len=16, input_resolution=(64, 64))
    params = plain.init(jax.random.key(2), x)["params"]
    want = np.asarray(plain.apply({"params": params}, x))

    names = ["fused_ln_window_attention_nhwc", "fused_spectral_attention_nhwc",
             "fused_ln_gated_mlp_nhwc", "fused_spectral_attention_sharded"]
    origs = {n: getattr(PA, n) for n in names}

    def make_interp(fn):
        def interp(*args, **kw):
            kw["interpret"] = True
            return fn(*args, **kw)

        return interp

    for n in names:
        setattr(PA, n, make_interp(origs[n]))
    try:
        fused = PGSSTB(dim=dim, num_heads=heads, window_size=8,
                       shift_size=4 if shifted else 0, mlp_ratio=2.0,
                       compress_ratio=8, prompt_len=16,
                       input_resolution=(64, 64), use_pallas=True)
        got = np.asarray(fused.apply({"params": params}, x))
    finally:
        for n in names:
            setattr(PA, n, origs[n])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_fused_spectral_matches_module():
    """Two-phase fused spectral attention kernel == jnp SpectralAttention
    (interpret mode; exercises the in-kernel dwconv halos and the global
    Gram/norm accumulation across slabs)."""
    from mp_hsir_tpu.models.layers import SpectralAttention
    from mp_hsir_tpu.ops.pallas_attention import fused_spectral_attention_nhwc

    dim, heads = 16, 2
    x = jnp.asarray(RNG.standard_normal((2, 24, 8, dim)).astype(np.float32))
    mod = SpectralAttention(dim, heads)
    params = mod.init(jax.random.key(3), x)["params"]
    want = np.asarray(mod.apply({"params": params}, x))
    got = np.asarray(fused_spectral_attention_nhwc(
        x,
        jnp.asarray(params["qkv"]["weight"]),
        jnp.asarray(params["qkv_dwconv"]["weight"]),
        jnp.asarray(params["temperature"]),
        jnp.asarray(params["project_out"]["weight"]),
        heads,
        interpret=True,
    ))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)


def test_spectral_module_pallas_flag_matches_plain():
    from mp_hsir_tpu.models.layers import SpectralAttention
    import mp_hsir_tpu.ops.pallas_attention as PA

    dim, heads = 16, 2
    x = jnp.asarray(RNG.standard_normal((1, 16, 16, dim)).astype(np.float32))
    plain = SpectralAttention(dim, heads)
    params = plain.init(jax.random.key(4), x)["params"]
    want = np.asarray(plain.apply({"params": params}, x))

    orig = PA.fused_spectral_attention_nhwc

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    PA.fused_spectral_attention_nhwc = interp
    try:
        fused = SpectralAttention(dim, heads, use_pallas=True)
        got = np.asarray(fused.apply({"params": params}, x))
    finally:
        PA.fused_spectral_attention_nhwc = orig
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)


def test_fused_transformer_block_matches_plain():
    """TransformerBlock with the fused spectral + GDFN kernels == plain."""
    from mp_hsir_tpu.models.layers import TransformerBlock
    import mp_hsir_tpu.ops.pallas_attention as PA

    dim, heads = 16, 2
    x = jnp.asarray(RNG.standard_normal((1, 16, 16, dim)).astype(np.float32))
    plain = TransformerBlock(dim, heads)
    params = plain.init(jax.random.key(5), x)["params"]
    want = np.asarray(plain.apply({"params": params}, x))

    names = ["fused_spectral_attention_nhwc", "fused_ln_gdfn_nhwc"]
    origs = {n: getattr(PA, n) for n in names}

    def make_interp(fn):
        def interp(*args, **kw):
            kw["interpret"] = True
            return fn(*args, **kw)

        return interp

    for n in names:
        setattr(PA, n, make_interp(origs[n]))
    try:
        fused = TransformerBlock(dim, heads, use_pallas=True)
        got = np.asarray(fused.apply({"params": params}, x))
    finally:
        for n in names:
            setattr(PA, n, origs[n])
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)


def test_fused_conv3x3_matches_conv2d():
    from mp_hsir_tpu.ops.conv import conv2d
    from mp_hsir_tpu.ops.pallas_attention import fused_conv3x3_nhwc

    x = jnp.asarray(RNG.standard_normal((2, 24, 8, 5)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((3, 3, 5, 7)).astype(np.float32))
    want = np.asarray(conv2d(x, w, padding=1))
    got = np.asarray(fused_conv3x3_nhwc(x, w, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)


def test_fused_pgsstb_non_pow2_width():
    """Eval cubes are 64-multiples, not powers of two (e.g. W=192): every
    fused kernel must handle such widths."""
    import mp_hsir_tpu.ops.pallas_attention as PA
    from mp_hsir_tpu.models.layers import PGSSTB

    dim, heads = 16, 2
    x = jnp.asarray(RNG.standard_normal((1, 8, 48, dim)).astype(np.float32))
    plain = PGSSTB(dim=dim, num_heads=heads, window_size=8, shift_size=4,
                   mlp_ratio=2.0, compress_ratio=8, prompt_len=16,
                   input_resolution=(64, 64))
    params = plain.init(jax.random.key(6), x)["params"]
    want = np.asarray(plain.apply({"params": params}, x))

    names = ["fused_ln_window_attention_nhwc", "fused_spectral_attention_nhwc",
             "fused_ln_gated_mlp_nhwc", "fused_spectral_attention_sharded"]
    origs = {n: getattr(PA, n) for n in names}

    def make_interp(fn):
        def interp(*args, **kw):
            kw["interpret"] = True
            return fn(*args, **kw)

        return interp

    for n in names:
        setattr(PA, n, make_interp(origs[n]))
    try:
        fused = PGSSTB(dim=dim, num_heads=heads, window_size=8, shift_size=4,
                       mlp_ratio=2.0, compress_ratio=8, prompt_len=16,
                       input_resolution=(64, 64), use_pallas=True)
        got = np.asarray(fused.apply({"params": params}, x))
    finally:
        for n in names:
            setattr(PA, n, origs[n])
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)


@pytest.mark.parametrize("shifted", [False, True])
def test_sharded_pgsstb_with_pallas_matches_plain(shifted):
    """Spatially sharded PGSSTB with the Pallas kernels (the real multi-chip
    eval combination: local slab kernels + ppermute rolls + the split-phase
    sharded spectral kernel with psum'd Gram partials) == the plain
    unsharded module. Since round 3 BOTH unshifted and shifted blocks run
    the FUSED epilogue through fused_spectral_attention_sharded (shifted:
    explicit ppermute roll-back + a rolled full-res gate map; round-2
    VERDICT #2), and the routing is asserted via the trace-time
    FUSED_PATH_STATS coverage counters (round-2 VERDICT #6)."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    import mp_hsir_tpu.ops.pallas_attention as PA
    from mp_hsir_tpu.models import layers as L
    from mp_hsir_tpu.models.layers import PGSSTB
    from mp_hsir_tpu.parallel.mesh import SPATIAL_AXIS, make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh = make_mesh(data=1, spatial=2)

    dim, heads = 16, 2
    x = jnp.asarray(RNG.standard_normal((1, 16, 32, dim)).astype(np.float32))
    plain = PGSSTB(dim=dim, num_heads=heads, window_size=8,
                   shift_size=4 if shifted else 0, mlp_ratio=2.0,
                   compress_ratio=8, prompt_len=16, input_resolution=(64, 64))
    params = plain.init(jax.random.key(7), x)["params"]
    want = np.asarray(plain.apply({"params": params}, x))

    names = ["fused_ln_window_attention_nhwc", "fused_spectral_attention_nhwc",
             "fused_ln_gated_mlp_nhwc", "fused_spectral_attention_sharded"]
    origs = {n: getattr(PA, n) for n in names}

    def make_interp(fn):
        def interp(*args, **kw):
            kw["interpret"] = True
            return fn(*args, **kw)

        return interp

    sharded = PGSSTB(dim=dim, num_heads=heads, window_size=8,
                     shift_size=4 if shifted else 0, mlp_ratio=2.0,
                     compress_ratio=8, prompt_len=16, input_resolution=(64, 64),
                     axis_name=SPATIAL_AXIS, use_pallas=True)

    def local_fwd(p, xx):
        return sharded.apply({"params": p}, xx)

    bspec = P(None, SPATIAL_AXIS, None, None)
    f_sh = jax.jit(jax.shard_map(local_fwd, mesh=mesh, in_specs=(P(), bspec),
                                 out_specs=bspec, check_vma=False))
    calls = {"sharded": 0, "sharded_epilogue": 0}

    def counted_sharded(*args, **kw):
        calls["sharded"] += 1
        if kw.get("gate") is not None or kw.get("gate_map") is not None:
            calls["sharded_epilogue"] += 1
        kw["interpret"] = True
        return origs["fused_spectral_attention_sharded"](*args, **kw)

    for n in names:
        setattr(PA, n, make_interp(origs[n]))
    PA.fused_spectral_attention_sharded = counted_sharded
    L.reset_fused_path_stats()
    try:
        got = np.asarray(f_sh(params, x))
    finally:
        for n in names:
            setattr(PA, n, origs[n])
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)
    # the split-phase sharded kernel must actually carry the computation —
    # with the fused EPILOGUE (gate+shortcut in-kernel) on ALL blocks,
    # shifted included (rolled gate map)
    assert calls["sharded"] > 0
    assert calls["sharded_epilogue"] > 0
    # coverage metric: every shard's trace routed the block through the
    # sharded fused epilogue, no fallback (VERDICT round-2 #6)
    assert L.FUSED_PATH_STATS.get("pgsstb_fused_sharded_epilogue", 0) > 0
    assert L.FUSED_PATH_STATS.get("pgsstb_fused_explicit", 0) == 0
    assert L.FUSED_PATH_STATS.get("pgsstb_unfused", 0) == 0


def test_fused_pgsstb_with_bias_falls_back():
    """use_bias=True is outside the bias-free kernel epilogue's domain: the
    fused path must fall back to the jnp spectral formulation instead of
    tripping the epilogue-kwargs assert (regression: round-3 review)."""
    import mp_hsir_tpu.ops.pallas_attention as PA
    from mp_hsir_tpu.models.layers import PGSSTB

    dim, heads = 16, 2
    x = jnp.asarray(RNG.standard_normal((1, 8, 32, dim)).astype(np.float32))
    plain = PGSSTB(dim=dim, num_heads=heads, window_size=8, shift_size=0,
                   mlp_ratio=2.0, compress_ratio=8, prompt_len=16,
                   input_resolution=(64, 64), use_bias=True)
    params = plain.init(jax.random.key(8), x)["params"]
    want = np.asarray(plain.apply({"params": params}, x))

    names = ["fused_ln_window_attention_nhwc", "fused_spectral_attention_nhwc",
             "fused_ln_gated_mlp_nhwc", "fused_spectral_attention_sharded"]
    origs = {n: getattr(PA, n) for n in names}

    def make_interp(fn):
        def interp(*args, **kw):
            kw["interpret"] = True
            return fn(*args, **kw)

        return interp

    for n in names:
        setattr(PA, n, make_interp(origs[n]))
    try:
        fused = PGSSTB(dim=dim, num_heads=heads, window_size=8, shift_size=0,
                       mlp_ratio=2.0, compress_ratio=8, prompt_len=16,
                       input_resolution=(64, 64), use_bias=True, use_pallas=True)
        got = np.asarray(fused.apply({"params": params}, x))
    finally:
        for n in names:
            setattr(PA, n, origs[n])
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)


def test_fused_gdfn_nonzero_ln_bias_edges():
    """The GDFN kernel must zero its out-of-image dwconv halo rows AFTER the
    LayerNorm: LN(0) = ln_bias != 0, so masking the raw rows first leaked
    the bias into the top/bottom image rows (regression: round-3 review,
    confirmed 1.4e-2 edge-row error with a random LN bias)."""
    from mp_hsir_tpu.models.layers import GDFN, RestormerLayerNorm
    from mp_hsir_tpu.ops.pallas_attention import fused_ln_gdfn_nhwc

    dim = 8
    x = jnp.asarray(RNG.standard_normal((1, 16, 16, dim)).astype(np.float32))
    ln = RestormerLayerNorm(dim)
    lp = ln.init(jax.random.key(9), x)["params"]
    ln_b = jnp.asarray(RNG.standard_normal(dim).astype(np.float32))  # nonzero!
    gd = GDFN(dim, 2.0)
    gp = gd.init(jax.random.key(10), x)["params"]
    want = np.asarray(gd.apply({"params": gp},
                               ln.apply({"params": {"weight": lp["weight"], "bias": ln_b}}, x)))
    got = np.asarray(fused_ln_gdfn_nhwc(
        x, jnp.asarray(lp["weight"]), ln_b,
        jnp.asarray(gp["project_in"]["weight"]),
        jnp.asarray(gp["dwconv"]["weight"]),
        jnp.asarray(gp["project_out"]["weight"]),
        interpret=True,
    ))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)


def test_prompt_fusion_fused_entry_exit():
    """PromptFusion eval path with the in-kernel entry concat (two-input
    spectral kernel) and the exit 1x1 conv riding the GDFN writeback ==
    the explicit concat -> TransformerBlock -> conv chain, same params.
    dim 64 halves: the lane-alignment gate only fuses 64/128-multiple
    channel halves (96+96 measured a regression on the RS preset)."""
    import mp_hsir_tpu.ops.pallas_attention as PA
    from mp_hsir_tpu.models.layers import PromptFusion

    dim = 64
    x = jnp.asarray(RNG.standard_normal((1, 16, 16, dim)).astype(np.float32))
    p = jnp.asarray(RNG.standard_normal((1, 16, 16, dim)).astype(np.float32))
    plain = PromptFusion(2 * dim, dim, num_heads=2)
    params = plain.init(jax.random.key(7), x, p)["params"]
    want = np.asarray(plain.apply({"params": params}, x, p))

    names = ["fused_spectral_attention_nhwc", "fused_ln_gdfn_nhwc"]
    origs = {n: getattr(PA, n) for n in names}
    seen = {"x2": 0, "proj": 0}

    def make_interp(name, fn):
        def interp(*args, **kw):
            kw["interpret"] = True
            if name == "fused_spectral_attention_nhwc" and kw.get("x2") is not None:
                seen["x2"] += 1
            if name == "fused_ln_gdfn_nhwc" and kw.get("proj_w") is not None:
                seen["proj"] += 1
            return fn(*args, **kw)

        return interp

    for n in names:
        setattr(PA, n, make_interp(n, origs[n]))
    try:
        fused = PromptFusion(2 * dim, dim, num_heads=2, use_pallas=True)
        got = np.asarray(fused.apply({"params": params}, x, p, True))
    finally:
        for n in names:
            setattr(PA, n, origs[n])
    assert seen["x2"] == 1 and seen["proj"] == 1, seen  # fusion actually ran
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)


def test_fused_conv3x3_down_up_matches_shuffles():
    """conv3x3 + pixel (un)shuffle fused in one writeback == the explicit
    conv -> shuffle chain (torch channel order), and gradients flow through
    the shuffled-cotangent VJP."""
    from mp_hsir_tpu.ops.basic import pixel_shuffle, pixel_unshuffle
    from mp_hsir_tpu.ops.conv import conv2d
    from mp_hsir_tpu.ops.pallas_attention import (
        fused_conv3x3_down_nhwc,
        fused_conv3x3_up_nhwc,
    )

    x = jnp.asarray(RNG.standard_normal((2, 16, 8, 6)).astype(np.float32))
    wdn = jnp.asarray(RNG.standard_normal((3, 3, 6, 3)).astype(np.float32))
    want = np.asarray(pixel_unshuffle(conv2d(x, wdn, padding=1), 2))
    got = np.asarray(fused_conv3x3_down_nhwc(x, wdn, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)

    wup = jnp.asarray(RNG.standard_normal((3, 3, 6, 8)).astype(np.float32))
    want = np.asarray(pixel_shuffle(conv2d(x, wup, padding=1), 2))
    got = np.asarray(fused_conv3x3_up_nhwc(x, wup, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)

    def loss_fused(xx, ww):
        return jnp.sum(fused_conv3x3_down_nhwc(xx, ww, interpret=True) ** 2)

    def loss_plain(xx, ww):
        return jnp.sum(pixel_unshuffle(conv2d(xx, ww, padding=1), 2) ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, wdn)
    gx_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(x, wdn)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_p), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_p), atol=2e-3, rtol=1e-4)


def test_fused_conv3x3_res_matches_add():
    """conv3x3 + residual writeback == conv then f32 add, with gradients
    (the model's global input-residual head)."""
    from mp_hsir_tpu.ops.conv import conv2d
    from mp_hsir_tpu.ops.pallas_attention import fused_conv3x3_res_nhwc

    x = jnp.asarray(RNG.standard_normal((2, 16, 8, 6)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((3, 3, 6, 4)).astype(np.float32))
    r = jnp.asarray(RNG.standard_normal((2, 16, 8, 4)).astype(np.float32))
    want = np.asarray(conv2d(x, w, padding=1).astype(jnp.float32) + r)
    got = np.asarray(fused_conv3x3_res_nhwc(x, w, r, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)

    def loss_f(xx, ww, rr):
        return jnp.sum(fused_conv3x3_res_nhwc(xx, ww, rr, interpret=True) ** 2)

    def loss_p(xx, ww, rr):
        return jnp.sum((conv2d(xx, ww, padding=1).astype(jnp.float32) + rr) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, w, r)
    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, r)
    for a, b, tol in zip(gf, gp, (2e-4, 2e-3, 1e-5)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol, rtol=1e-4)
