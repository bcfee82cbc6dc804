"""Building blocks of MP-HSIR-TPU, as flax.linen modules over NHWC arrays.

Behavioral contract is the reference model (net/MP_HSIR.py); the
implementation is TPU-first: channels-last layouts, reshape-only window
bookkeeping, resize-as-matmul, fp32 softmax/LN islands inside a bf16-capable
compute path, and optional mesh-axis awareness for spatially sharded
execution (halo convs, ppermute rolls, psum'd pixel reductions).

Parameter names deliberately mirror the torch attribute names so the
Lightning checkpoint converter (training/checkpoint.py) is a mechanical
rename.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mp_hsir_tpu.ops.basic import gelu_exact, layer_norm, pixel_shuffle, pixel_unshuffle
from mp_hsir_tpu.ops.conv import conv2d
from mp_hsir_tpu.ops.resize import resize_bilinear, resize_bilinear_row_block, resize_nearest
from mp_hsir_tpu.ops.window import (
    roll_hw,
    shifted_region_map,
    shifted_window_mask,
    window_partition,
    window_reverse,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# Fused-path coverage counters (round-2 VERDICT #6)
# ---------------------------------------------------------------------------
#
# Trace-time counters: jit traces each program once, so the counts recorded
# during a trace reflect exactly which routing each block compiled to. Keys:
#   pgsstb_fused_epilogue          single-device fused epilogue (all adds
#                                  ride kernel writebacks)
#   pgsstb_fused_sharded_epilogue  mesh: split-phase sharded spectral kernel
#                                  with the PGSSTB epilogue fused
#   pgsstb_fused_explicit          fused kernels, explicit composition
#                                  (training with drop-path, etc.)
#   pgsstb_unfused                 jnp windowed path (no Pallas)
#   spectral_pallas / spectral_pallas_sharded / spectral_jnp
# Reset with reset_fused_path_stats() before tracing; read FUSED_PATH_STATS
# after jit/apply. scripts/profile_stages.py prints these under --mesh.

FUSED_PATH_STATS: dict = {}


def reset_fused_path_stats() -> None:
    FUSED_PATH_STATS.clear()


def _count_path(name: str) -> None:
    FUSED_PATH_STATS[name] = FUSED_PATH_STATS.get(name, 0) + 1


# ---------------------------------------------------------------------------
# torch-default initializers (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)))
# ---------------------------------------------------------------------------

def _torch_uniform(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def trunc_normal_init(std: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        # timm trunc_normal_: truncated at +-2 std
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


# ---------------------------------------------------------------------------
# Parameterized primitives
# ---------------------------------------------------------------------------


class Conv2d(nn.Module):
    """Conv with torch nn.Conv2d init/naming; weight stored HWIO.

    With ``use_pallas`` and an eligible shape (3x3, stride 1, pad 1, no
    groups/bias/sharding), runs through the fused slab kernel — XLA's NHWC
    conv at small channel counts measures 10-15x off roofline."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True
    axis_name: Optional[str] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        fan_in = (cin // self.groups) * self.kernel * self.kernel
        w = self.param(
            "weight", _torch_uniform(fan_in), (self.kernel, self.kernel, cin // self.groups, self.features)
        )
        b = self.param("bias", _torch_uniform(fan_in), (self.features,)) if self.use_bias else None
        if (self.use_pallas and self.kernel == 3 and self.stride == 1
                and self.padding == 1 and self.groups == 1 and b is None
                and self.axis_name is None and x.shape[1] % 8 == 0):
            from mp_hsir_tpu.ops.pallas_attention import fused_conv3x3_nhwc

            return fused_conv3x3_nhwc(x, w)
        return conv2d(x, w, b, stride=self.stride, padding=self.padding, groups=self.groups, axis_name=self.axis_name)


class ConvParams(nn.Module):
    """Declares conv-shaped parameters (same names/shapes/init as Conv2d)
    without applying the convolution — for algebraic fusions that consume
    the weight directly while keeping checkpoint paths identical."""

    features: int
    kernel: int = 1
    groups: int = 1
    use_bias: bool = True
    in_features: Optional[int] = None

    @nn.compact
    def __call__(self, cin: Optional[int] = None):
        cin = cin or self.in_features or self.features
        fan_in = (cin // self.groups) * self.kernel * self.kernel
        w = self.param(
            "weight", _torch_uniform(fan_in), (self.kernel, self.kernel, cin // self.groups, self.features)
        )
        b = self.param("bias", _torch_uniform(fan_in), (self.features,)) if self.use_bias else None
        return w, b


class Linear(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        w = self.param("weight", _torch_uniform(cin), (cin, self.features))
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            y = y + self.param("bias", _torch_uniform(cin), (self.features,)).astype(y.dtype)
        return y


class LinearParams(nn.Module):
    """Declares Linear-shaped parameters (same names/shapes/init) without
    applying them — for fused kernels that consume weights directly."""

    features: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        w = self.param("weight", _torch_uniform(self.in_features), (self.in_features, self.features))
        b = self.param("bias", _torch_uniform(self.in_features), (self.features,)) if self.use_bias else None
        return w, b


class LayerNorm(nn.Module):
    """Standard LN over the channel axis (torch nn.LayerNorm semantics)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return layer_norm(x, w, b, self.eps)


class LayerNormParams(nn.Module):
    """Declares LayerNorm parameters (same names/shapes/init) without
    applying them — for kernels that fuse the normalization."""

    dim: int

    @nn.compact
    def __call__(self):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return w, b


class DropPath(nn.Module):
    """Per-sample stochastic depth on the leading (batch) axis."""

    rate: float

    @nn.compact
    def __call__(self, x: Array, deterministic: bool) -> Array:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# MLPs
# ---------------------------------------------------------------------------


def _pallas_spectral_epilogue_ok(use_bias: bool, axis_name, spectral_axis) -> bool:
    """Whether SpectralAttention's fused Pallas path (and therefore the
    PGSSTB/TransformerBlock in-kernel epilogues that depend on it) is
    available for this configuration: bias-free, no mesh axes. Kept in ONE
    place — a drifted copy of this predicate caused a use_bias crash once
    (callers passed epilogue kwargs that the module's own check rejected)."""
    return not use_bias and axis_name is None and spectral_axis is None


class GatedMlp(nn.Module):
    """Token MLP with gated exact-GELU (reference: net/MP_HSIR.py:66-82)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = Linear(self.hidden * 2, name="fc1")(x)
        x_fc, x_gate = jnp.split(h, 2, axis=-1)
        return Linear(self.dim, name="fc2")(x_fc * gelu_exact(x_gate))


class GDFNFusedNHWC(nn.Module):
    """RestormerLayerNorm + GDFN fused via the Pallas halo-slab kernel —
    parameter tree identical to GDFN (project_in/dwconv/project_out),
    LN params passed in. Bias-free."""

    dim: int
    expansion: float
    residual: bool = False  # write x + gdfn(ln(x)) in-kernel

    @nn.compact
    def __call__(self, x_map: Array, ln_w: Array, ln_b: Array,
                 proj_w: Optional[Array] = None) -> Array:
        from mp_hsir_tpu.ops.pallas_attention import fused_ln_gdfn_nhwc

        hidden = int(self.dim * self.expansion)
        w_in, _ = ConvParams(hidden * 2, 1, use_bias=False, in_features=self.dim, name="project_in")()
        w_dw, _ = ConvParams(hidden * 2, 3, groups=hidden * 2, use_bias=False,
                             in_features=hidden * 2, name="dwconv")()
        w_out, _ = ConvParams(self.dim, 1, use_bias=False, in_features=hidden, name="project_out")()
        return fused_ln_gdfn_nhwc(x_map, ln_w, ln_b, w_in, w_dw, w_out,
                                  residual=self.residual, proj_w=proj_w)


class GatedMlpParams(nn.Module):
    """Declares GatedMlp parameters (fc1/fc2, same names/shapes/init)
    without applying them — for the spectral kernel's fused PGSSTB-tail
    epilogue, which consumes the weights directly."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = LinearParams(self.hidden * 2, self.dim, name="fc1")()
        w2, b2 = LinearParams(self.dim, self.hidden, name="fc2")()
        return w1, b1, w2, b2


class GatedMlpFusedNHWC(nn.Module):
    """LayerNorm + GatedMlp fused via the Pallas NHWC tile kernel —
    parameter tree identical to GatedMlp (fc1/fc2), LN params passed in."""

    dim: int
    hidden: int
    residual: bool = False  # write x + mlp(ln(x)) in-kernel

    @nn.compact
    def __call__(self, x_map: Array, ln_w: Array, ln_b: Array,
                 dp_scale: Optional[Array] = None) -> Array:
        from mp_hsir_tpu.ops.pallas_attention import fused_ln_gated_mlp_nhwc

        w1, b1 = LinearParams(self.hidden * 2, self.dim, name="fc1")()
        w2, b2 = LinearParams(self.dim, self.hidden, name="fc2")()
        return fused_ln_gated_mlp_nhwc(x_map, ln_w, ln_b, w1, b1, w2, b2,
                                       residual=self.residual,
                                       dp_scale=dp_scale)


class GDFN(nn.Module):
    """Gated-DConv feed-forward network (Restormer GDFN; reference
    net/MP_HSIR.py:374-391 / FFN at :251-265). NHWC in/out."""

    dim: int
    expansion: float
    use_bias: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        hidden = int(self.dim * self.expansion)
        x = Conv2d(hidden * 2, 1, use_bias=self.use_bias, name="project_in")(x)
        x = Conv2d(
            hidden * 2, 3, padding=1, groups=hidden * 2, use_bias=self.use_bias,
            axis_name=self.axis_name, name="dwconv",
        )(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        return Conv2d(self.dim, 1, use_bias=self.use_bias, name="project_out")(gelu_exact(x1) * x2)


# ---------------------------------------------------------------------------
# Attention blocks
# ---------------------------------------------------------------------------


class SpectralAttention(nn.Module):
    """Transposed (C x C) multi-head self-attention over the spectral axis
    with L2-normalized q/k and a learnable per-head temperature
    (MDTA; reference net/MP_HSIR.py:85-114 and the duplicate at :394-427).

    Cost is linear in pixel count — the attention matrix is (c_head, c_head).
    Under spatial sharding, pixels are distributed: the q@k^T contraction and
    the L2 norms psum over the mesh axis; softmax and attn@v stay local.

    With ``spectral_axis`` set (and num_heads divisible by the axis size),
    the attention is head-parallel Megatron-style over that mesh axis: each
    member slices its head block out of the (replicated) qkv / dwconv /
    temperature / projection weights via ``tp_slice``, computes only its
    heads end to end, and the partial projected outputs are psum'd. This is
    the band-sharding analogue for very large C (SURVEY.md section 2.6) —
    the reference has no such dimension (single-GPU, net/MP_HSIR.py:85-114).
    """

    dim: int
    num_heads: int
    use_bias: bool = False
    axis_name: Optional[str] = None
    spectral_axis: Optional[str] = None
    use_pallas: bool = False
    # Route spatially-sharded calls through the split-phase Pallas kernel
    # (psum'd Gram partials; ops/pallas_attention.py
    # fused_spectral_attention_sharded). DIFFERENTIABLE since round 3
    # (ops/pallas_vjp.py sp0_sharded/sp1_sharded) — mesh training runs the
    # fused path too.
    allow_sharded_kernel: bool = True

    @nn.compact
    def __call__(self, x: Array, ln_w: Optional[Array] = None,
                 ln_b: Optional[Array] = None, residual: bool = False,
                 gate: Optional[Array] = None,
                 gate_map: Optional[Array] = None,
                 shortcut: Optional[Array] = None,
                 dp_scale: Optional[Array] = None,
                 shifted: bool = False,
                 split: bool = False,
                 mlp_params=None, x2: Optional[Array] = None) -> Array:
        """The optional kwargs are Pallas-path fused epilogues (caller must
        only pass them on kernel-eligible shapes/configs):

        * ``ln_w``/``ln_b``: fold the pre-attention LayerNorm in;
        * ``residual``: return ``x + attn(...)``;
        * ``gate`` (B, H/8, W/8, C) / ``shortcut``: the PGSSTB epilogue —
          return ``[shortcut +] x * gate + attn(x)`` (``shifted``: x is the
          rolled frame; the kernel rolls back and shifts the gate indexing);
        * ``x2``: the logical input is ``cat([x, x2], -1)`` joined in VMEM
          (PromptFusion entry) — Pallas-eligible configs only.
        """
        from mp_hsir_tpu.parallel.tp import tp_slice

        b, h, w, c = x.shape
        if x2 is not None:
            c = c + x2.shape[-1]
        dh = c // self.num_heads
        p = h * w
        sp = self.spectral_axis
        n_sp = jax.lax.axis_size(sp) if sp is not None else 1
        use_tp = n_sp > 1 and self.num_heads % n_sp == 0

        # weights declared full-size (replicated, checkpoint-stable layout)
        wqkv, bqkv = ConvParams(c * 3, 1, use_bias=self.use_bias, in_features=c, name="qkv")()
        wdw, bdw = ConvParams(c * 3, 3, groups=c * 3, use_bias=self.use_bias,
                              in_features=c * 3, name="qkv_dwconv")()
        temp = self.param("temperature", nn.initializers.ones, (self.num_heads, 1, 1))
        wout, bout = ConvParams(c, 1, use_bias=self.use_bias, in_features=c, name="project_out")()

        if (self.use_pallas and not self.use_bias and not use_tp
                and self.axis_name is None and h % 8 == 0 and split):
            # the differentiable TRAINING twin of the eval epilogue kernels:
            # same sp0/sp1 custom_vjp cores as the sharded path, zero halos,
            # gate / gate_map / shortcut / per-sample drop-path in-kernel
            from mp_hsir_tpu.ops.pallas_attention import fused_spectral_attention_split

            assert mlp_params is None and x2 is None and not shifted
            _count_path("spectral_pallas_split")
            return fused_spectral_attention_split(
                x, wqkv, wdw, temp, wout, self.num_heads,
                ln_w=ln_w, ln_b=ln_b, residual=residual, gate=gate,
                gate_map=gate_map, shortcut=shortcut, dp_scale=dp_scale,
            )
        if (self.use_pallas and not self.use_bias and not use_tp
                and self.axis_name is None and h % 8 == 0):
            from mp_hsir_tpu.ops.pallas_attention import fused_spectral_attention_nhwc

            assert gate_map is None, "gate_map needs the split/sharded path"
            assert dp_scale is None, "dp_scale needs the split/sharded path"
            _count_path("spectral_pallas")
            return fused_spectral_attention_nhwc(
                x, wqkv, wdw, temp, wout, self.num_heads,
                ln_w=ln_w, ln_b=ln_b, residual=residual, gate=gate,
                shortcut=shortcut, shifted=shifted, mlp=mlp_params, x2=x2,
            )
        if (self.use_pallas and self.allow_sharded_kernel and not self.use_bias
                and not use_tp and self.axis_name is not None and h % 8 == 0
                and not shifted and x2 is None):
            from mp_hsir_tpu.ops.pallas_attention import fused_spectral_attention_sharded

            _count_path("spectral_pallas_sharded")
            return fused_spectral_attention_sharded(
                x, wqkv, wdw, temp, wout, self.num_heads, self.axis_name,
                ln_w=ln_w, ln_b=ln_b, residual=residual, gate=gate,
                gate_map=gate_map, shortcut=shortcut, dp_scale=dp_scale,
            )
        if (self.use_pallas and self.allow_sharded_kernel and not self.use_bias
                and use_tp and h % 8 == 0 and ln_w is None
                and not residual and not shifted and mlp_params is None
                and x2 is None):
            # spectral TP on the fused sp0/sp1 kernels (round-3 VERDICT #5):
            # slice this member's head block with the SAME tp_slice custom
            # VJP as the jnp path (weight cotangents psum over the axis),
            # run the custom-vjp cores on the local slices, psum the partial
            # projections over `spectral`. Composes with spatial sharding.
            # Since round 5 the PGSSTB epilogue (gate / gate_map / shortcut /
            # drop-path) is fused here too — gate terms scaled 1/n_sp per
            # member, shortcut added once post-psum (round-4 VERDICT #4).
            from mp_hsir_tpu.ops.pallas_attention import fused_spectral_attention_tp

            heads_l = self.num_heads // n_sp
            cl = heads_l * dh
            idx = jax.lax.axis_index(sp)

            def slice_qkv_tp(t, axis):
                parts = [tp_slice(t, s * c + idx * cl, cl, axis, sp)
                         for s in range(3)]
                return jnp.concatenate(parts, axis=axis)

            _count_path("spectral_pallas_tp")
            return fused_spectral_attention_tp(
                x, slice_qkv_tp(wqkv, 3), slice_qkv_tp(wdw, 3),
                tp_slice(temp, idx * heads_l, heads_l, 0, sp),
                tp_slice(wout.reshape(c, c), idx * cl, cl, 0, sp),
                heads_l, sp, spatial_axis=self.axis_name,
                gate=gate, gate_map=gate_map, shortcut=shortcut,
                dp_scale=dp_scale,
            )
        assert (ln_w is None and gate is None and gate_map is None
                and shortcut is None and dp_scale is None
                and not residual and not shifted and mlp_params is None
                and x2 is None), (
            "fused epilogue kwargs require the Pallas-eligible configuration")
        _count_path("spectral_jnp")

        if use_tp:
            heads = self.num_heads // n_sp
            cl = heads * dh
            idx = jax.lax.axis_index(sp)

            def slice_qkv(t, axis):
                # q, k, v segments each have width c along `axis`; take this
                # member's head block from each
                parts = [tp_slice(t, s * c + idx * cl, cl, axis, sp) for s in range(3)]
                return jnp.concatenate(parts, axis=axis)

            wqkv = slice_qkv(wqkv, 3)
            bqkv = slice_qkv(bqkv, 0) if bqkv is not None else None
            wdw = slice_qkv(wdw, 3)
            bdw = slice_qkv(bdw, 0) if bdw is not None else None
            temp = tp_slice(temp, idx * heads, heads, 0, sp)
            wr = tp_slice(wout.reshape(c, c), idx * cl, cl, 0, sp).reshape(heads, dh, c)
        else:
            heads = self.num_heads
            wr = wout.reshape(heads, dh, c)  # Cin=(head, d) -> Cout

        qkv = conv2d(x, wqkv, bqkv)
        qkv = conv2d(qkv, wdw, bdw, padding=1, groups=qkv.shape[-1], axis_name=self.axis_name)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # Layout-free formulation: channels stay in the lane dimension and
        # the pixel axis is contracted directly — no (B, heads, c, HW)
        # transposed copies (those cost ~3 HBM round-trips of the 3C-wide
        # activation per block). L2 normalization is folded into the tiny
        # C x C Gram matrix: qhat@khat^T = (q@k^T) / outer(|q|, |k|).
        def r(t):  # (B,H,W,C_local) -> (B, P, heads, dh), a free reshape
            return t.reshape(b, p, heads, dh)

        q, k, v = r(q), r(k), r(v)
        gram = jnp.einsum("bphd,bphe->bhde", q, k, preferred_element_type=jnp.float32)
        nq = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=1)  # (B, heads, dh)
        nk = jnp.sum(jnp.square(k.astype(jnp.float32)), axis=1)
        if self.axis_name is not None:
            gram = jax.lax.psum(gram, self.axis_name)
            nq = jax.lax.psum(nq, self.axis_name)
            nk = jax.lax.psum(nk, self.axis_name)
        nq = jnp.maximum(jnp.sqrt(nq), 1e-12)
        nk = jnp.maximum(jnp.sqrt(nk), 1e-12)
        attn = gram / (nq[..., :, None] * nk[..., None, :])
        attn = jax.nn.softmax(attn * temp, axis=-1)

        # Fold attn@v and the 1x1 output projection into ONE pixel matmul:
        # y[p, o] = sum_{h,e} (sum_d Wp[(h,d), o] attn[b,h,d,e]) v[b,p,h,e].
        # attn is constant over pixels, so the combined (B, C, C_out) matrix
        # costs O(C^3) once per image and the C-wide attn@v intermediate is
        # never materialized in HBM. Under TP each member contracts only its
        # local heads; the psum below completes the input-channel reduction.
        comb = jnp.einsum(
            "bhde,hdo->bheo", attn, wr.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        out = jnp.einsum("bphe,bheo->bpo", v, comb.astype(v.dtype))
        if use_tp:
            out = jax.lax.psum(out, sp)
        if bout is not None:
            out = out + bout.astype(out.dtype)
        return out.reshape(b, h, w, c)


class PGSpectralAttention(nn.Module):
    """Prompt-guided local spectral attention over window tokens
    (reference: net/MP_HSIR.py:116-155).

    Pools each window to one token, soft-selects a low-rank spectral prompt
    from a learnable bank, cross-attends prompt (q) against the pooled token
    (k, v) in a dim/ratio space, and multiplicatively gates the window.
    """

    dim: int
    compress_ratio: int
    prompt_len: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Optional[Array] = None, pooled: Optional[Array] = None) -> Array:
        """Two call modes, identical parameters:

        * window tokens ``x`` (Bw, N, C): pools internally and returns the
          GATED tokens (reference semantics, out * shortcut);
        * ``pooled`` (B, T, C) per-window descriptors: returns only the
          (B, T, C) GATES — used by the fused NHWC path, where the
          per-window gate is broadcast onto the map outside.
        """
        if pooled is None:
            assert x is not None
            shortcut = x
            p = jnp.mean(x, axis=1, keepdims=True)  # (Bw, 1, C)
        else:
            bt = pooled.shape
            p = pooled.reshape(bt[0] * bt[1], 1, bt[2])

        cr = self.dim // self.compress_ratio
        scale = cr ** -0.5
        pw = jax.nn.softmax(
            Linear(self.prompt_len, use_bias=self.use_bias, name="linear_prompt")(p).astype(jnp.float32),
            axis=-1,
        ).astype(p.dtype)  # (M, 1, L)
        down = Linear(cr, use_bias=self.use_bias, name="linear_down")(p)  # (M, 1, cr)
        bank = self.param(
            "prompt_param",
            lambda key, shape: jax.random.uniform(key, shape),  # torch.rand
            (1, 1, self.prompt_len, cr),
        )
        prompt = jnp.einsum("bol,olr->bor", pw, bank[0].astype(p.dtype))  # (M, 1, cr)
        q = Linear(cr, use_bias=self.use_bias, name="q")(prompt)
        kv = Linear(2 * cr, use_bias=self.use_bias, name="kv")(down)
        k, v = jnp.split(kv, 2, axis=-1)
        # q,k,v: (M, 1, cr). attn[b, i, j] = q[b,0,i] * k[b,0,j] * scale
        attn = jnp.einsum("boi,boj->bij", q, k, preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(p.dtype)
        out = jnp.einsum("bij,boj->boi", attn, v)  # (M, 1, cr)
        out = Linear(cr, use_bias=True, name="proj")(out)
        out = Linear(self.dim, use_bias=self.use_bias, name="linear_up")(out)  # (M, 1, C)
        if pooled is None:
            return out * shortcut
        return out.reshape(bt)


class SpatialAttention(nn.Module):
    """Swin window MSA with relative position bias
    (reference: net/MP_HSIR.py:158-218)."""

    dim: int
    window_size: int
    num_heads: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 shift_labels: Optional[Array] = None) -> Array:
        bw, n, c = x.shape
        ws = self.window_size

        if self.use_pallas:
            from mp_hsir_tpu.ops.pallas_attention import fused_window_attention

            wqkv, bqkv = LinearParams(c * 3, c, name="qkv")()
            table = self.param(
                "relative_position_bias_table", trunc_normal_init(0.02), ((2 * ws - 1) ** 2, self.num_heads)
            )
            idx = _relative_position_index(ws)
            bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads).transpose(2, 0, 1)
            wp, bp = LinearParams(c, c, name="proj")()
            return fused_window_attention(
                x, wqkv.astype(x.dtype), bqkv.astype(jnp.float32),
                bias.astype(jnp.float32), wp.astype(x.dtype),
                bp.astype(jnp.float32), shift_labels, self.num_heads,
            )

        dh = c // self.num_heads
        qkv = Linear(c * 3, use_bias=True, name="qkv")(x)
        # measured: the single 5-D permute beats strided mid-axis slicing
        # here (3.0 vs 4.2 ms at 4096x64x64 on v5e); the Pallas path above
        # avoids both
        qkv = qkv.reshape(bw, n, 3, self.num_heads, dh).transpose(2, 0, 3, 1, 4)
        q = qkv[0] * (dh ** -0.5)  # (Bw, nH, N, dh)
        k = qkv[1]
        v = qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)

        table = self.param(
            "relative_position_bias_table", trunc_normal_init(0.02), ((2 * ws - 1) ** 2, self.num_heads)
        )
        idx = _relative_position_index(ws)  # (N, N) numpy constant
        bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, self.num_heads, n, n) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bw, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bnhd", attn, v).reshape(bw, n, c)
        return Linear(c, use_bias=True, name="proj")(out)


class SpatialAttentionNHWC(nn.Module):
    """Fused LayerNorm + Swin window MSA over the NHWC map via the Pallas
    slab kernel — parameter tree identical to SpatialAttention (so PGSSTB
    can swap paths without touching checkpoints). Returns the attention
    output MAP plus the per-window pooled means (for the PG gate); window
    partition/reverse never materialize."""

    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x_map: Array, ln_w: Array, ln_b: Array,
                 region_map: Optional[Array], shift_in: bool = False,
                 sp_qk=None):
        from mp_hsir_tpu.ops.pallas_attention import fused_ln_window_attention_nhwc

        c = x_map.shape[-1]
        ws = self.window_size
        n = ws * ws
        wqkv, bqkv = LinearParams(c * 3, c, name="qkv")()
        table = self.param(
            "relative_position_bias_table", trunc_normal_init(0.02),
            ((2 * ws - 1) ** 2, self.num_heads),
        )
        idx = _relative_position_index(ws)
        bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        wp, bp = LinearParams(c, c, name="proj")()
        # raw f32 params: the kernel cores cast to the compute dtype inside
        # the custom_vjp primal so weight gradients stay f32.
        # ``sp_qk``: merge the following spectral attention's phase 0 into
        # this kernel (returns (map, pooled, gram, nq, nk)).
        return fused_ln_window_attention_nhwc(
            x_map, ln_w, ln_b, wqkv, bqkv, bias.astype(jnp.float32), wp, bp,
            region_map, self.num_heads, shift_in=shift_in, sp_qk=sp_qk,
        )


class SpectralAttentionParams(nn.Module):
    """Declares SpectralAttention's parameters (identical names/shapes/init
    — qkv, qkv_dwconv, temperature, project_out) without applying the
    module, for the merged window+phase-0 kernel path that consumes the
    weights directly in two kernels. Bias-free configurations only."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self):
        c = self.dim
        wqkv, _ = ConvParams(c * 3, 1, use_bias=False, in_features=c, name="qkv")()
        wdw, _ = ConvParams(c * 3, 3, groups=c * 3, use_bias=False,
                            in_features=c * 3, name="qkv_dwconv")()
        temp = self.param("temperature", nn.initializers.ones, (self.num_heads, 1, 1))
        wout, _ = ConvParams(c, 1, use_bias=False, in_features=c, name="project_out")()
        return wqkv, wdw, temp, wout


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))  # 2,ws,ws
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class RestormerLayerNorm(nn.Module):
    """Channels-last LN applied to an NHWC map (reference LayerNorm wrapper
    at net/MP_HSIR.py:360-370; WithBias variant)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return layer_norm(x, w, b, 1e-5)


class CrossAttention(nn.Module):
    """Channel-wise cross attention: q from the text-prompt map, k/v from the
    visual prompt (reference: net/MP_HSIR.py:220-249)."""

    dim: int
    num_heads: int
    use_bias: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x_q: Array, x_kv: Array) -> Array:
        b, h, w, c = x_q.shape
        q = Conv2d(c, 1, use_bias=self.use_bias, name="q")(x_q)
        q = Conv2d(c, 3, padding=1, groups=c, use_bias=self.use_bias, axis_name=self.axis_name, name="q_dwconv")(q)
        kv = Conv2d(c * 2, 1, use_bias=self.use_bias, name="kv")(x_kv)
        kv = Conv2d(c * 2, 3, padding=1, groups=c * 2, use_bias=self.use_bias, axis_name=self.axis_name, name="kv_dwconv")(kv)
        k, v = jnp.split(kv, 2, axis=-1)
        dh = c // self.num_heads
        p = h * w

        def r(t):  # free reshape; see SpectralAttention for the layout notes
            return t.reshape(b, p, self.num_heads, dh)

        q, k, v = r(q), r(k), r(v)
        gram = jnp.einsum("bphd,bphe->bhde", q, k, preferred_element_type=jnp.float32)
        nq2 = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=1)
        nk2 = jnp.sum(jnp.square(k.astype(jnp.float32)), axis=1)
        if self.axis_name is not None:
            # pixel-global statistics must span every spatial shard, like
            # SpectralAttention's (the dwconvs above already halo-exchange)
            gram = jax.lax.psum(gram, self.axis_name)
            nq2 = jax.lax.psum(nq2, self.axis_name)
            nk2 = jax.lax.psum(nk2, self.axis_name)
        nq = jnp.maximum(jnp.sqrt(nq2), 1e-12)
        nk = jnp.maximum(jnp.sqrt(nk2), 1e-12)
        attn = gram / (nq[..., :, None] * nk[..., None, :])
        temp = self.param("temperature", nn.initializers.ones, (self.num_heads, 1, 1))
        attn = jax.nn.softmax(attn * temp, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhde,bphe->bphd", attn, v).reshape(b, h, w, c)
        return Conv2d(c, 1, use_bias=self.use_bias, name="project_out")(out)


class CrossTransformer(nn.Module):
    """Cross attention + GDFN with pre-norms (reference: net/MP_HSIR.py:267-287)."""

    dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False
    cross_residual: bool = True

    @nn.compact
    def __call__(self, x_q: Array, x_kv: Array) -> Array:
        attn_out = CrossAttention(self.dim, self.num_heads, self.use_bias, name="attn")(
            RestormerLayerNorm(self.dim, name="norm11")(x_q),
            RestormerLayerNorm(self.dim, name="norm12")(x_kv),
        )
        x = x_q + attn_out if self.cross_residual else attn_out
        return x + GDFN(self.dim, self.expansion, self.use_bias, name="ffn")(
            RestormerLayerNorm(self.dim, name="norm2")(x)
        )


class TransformerBlock(nn.Module):
    """MDTA + GDFN block used inside PromptFusion (reference: net/MP_HSIR.py:466-479)."""

    dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False
    axis_name: Optional[str] = None
    spectral_axis: Optional[str] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, x2: Optional[Array] = None,
                 proj_w: Optional[Array] = None) -> Array:
        """``x2``/``proj_w`` are PromptFusion's eval-only in-kernel fusions:
        the entry ``cat([x, x2])`` is joined in VMEM inside the spectral
        kernel and the exit 1x1 conv (weight ``proj_w``) rides the GDFN
        writeback — neither the concatenated map nor the pre-conv output
        takes its own HBM round trip. Callers must pass them only on
        Pallas-eligible configurations (PromptFusion gates on
        ``deterministic``)."""
        fused = (self.use_pallas and x.shape[1] % 8 == 0
                 and _pallas_spectral_epilogue_ok(self.use_bias, self.axis_name,
                                                 self.spectral_axis))
        if not fused:
            assert proj_w is None, "proj_w requires the fused Pallas path"
            if x2 is not None:
                x = jnp.concatenate([x, x2], axis=-1)
                x2 = None
        if fused:
            # norm1 + MDTA + residual in ONE kernel (2 reads + 1 write of the
            # map); the standalone LN and the separate residual add each cost
            # full extra HBM passes
            lnw1, lnb1 = LayerNormParams(self.dim, name="norm1")()
            x = SpectralAttention(self.dim, self.num_heads, self.use_bias,
                                  use_pallas=True, name="attn")(
                x, ln_w=lnw1, ln_b=lnb1, residual=True, x2=x2
            )
            lnw2, lnb2 = LayerNormParams(self.dim, name="norm2")()
            return GDFNFusedNHWC(self.dim, self.expansion, residual=True,
                                 name="ffn")(x, lnw2, lnb2, proj_w=proj_w)
        x = x + SpectralAttention(self.dim, self.num_heads, self.use_bias, self.axis_name,
                                  self.spectral_axis, self.use_pallas, name="attn")(
            RestormerLayerNorm(self.dim, name="norm1")(x)
        )
        return x + GDFN(self.dim, self.expansion, self.use_bias, self.axis_name, name="ffn")(
            RestormerLayerNorm(self.dim, name="norm2")(x)
        )


# ---------------------------------------------------------------------------
# Resizing / embedding
# ---------------------------------------------------------------------------


class Downsample(nn.Module):
    """3x3 conv C->C/2 + PixelUnshuffle(2): spatial /2, channels x2
    (reference: net/MP_HSIR.py:432-440)."""

    n_feat: int
    axis_name: Optional[str] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if (self.use_pallas and self.axis_name is None and x.shape[1] % 8 == 0
                and x.shape[2] % 2 == 0):
            # conv + unshuffle in ONE kernel: the unshuffle's standalone XLA
            # relayout pass over the map never happens (differentiable)
            from mp_hsir_tpu.ops.pallas_attention import fused_conv3x3_down_nhwc

            w, _ = ConvParams(self.n_feat // 2, 3, use_bias=False,
                              in_features=self.n_feat, name="conv")()
            return fused_conv3x3_down_nhwc(x, w)
        x = Conv2d(self.n_feat // 2, 3, padding=1, use_bias=False, axis_name=self.axis_name,
                   use_pallas=self.use_pallas, name="conv")(x)
        return pixel_unshuffle(x, 2)


class Upsample(nn.Module):
    """3x3 conv C->2C + PixelShuffle(2): spatial x2, channels /2
    (reference: net/MP_HSIR.py:442-450)."""

    n_feat: int
    axis_name: Optional[str] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if (self.use_pallas and self.axis_name is None and x.shape[1] % 8 == 0
                and (self.n_feat * 2) % 4 == 0):
            from mp_hsir_tpu.ops.pallas_attention import fused_conv3x3_up_nhwc

            w, _ = ConvParams(self.n_feat * 2, 3, use_bias=False,
                              in_features=self.n_feat, name="conv")()
            return fused_conv3x3_up_nhwc(x, w)
        x = Conv2d(self.n_feat * 2, 3, padding=1, use_bias=False, axis_name=self.axis_name,
                   use_pallas=self.use_pallas, name="conv")(x)
        return pixel_shuffle(x, 2)


class OverlapPatchEmbed(nn.Module):
    embed_dim: int
    use_bias: bool = False
    axis_name: Optional[str] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return Conv2d(self.embed_dim, 3, padding=1, use_bias=self.use_bias, axis_name=self.axis_name,
                      use_pallas=self.use_pallas, name="proj")(x)


# ---------------------------------------------------------------------------
# Prompt machinery
# ---------------------------------------------------------------------------


class TVSP(nn.Module):
    """Text–Visual Synergistic Prompt (reference: net/MP_HSIR.py:538-583).

    The learnable per-task text prompts are initialized by pushing the frozen
    CLIP sentence embeddings through a randomly initialized linear map (the
    reference does this under no_grad at construction, :557-563); at runtime
    the CLIP embedding modulates the task prompt, the product is broadcast
    into a (prompt_size, prompt_size) map via torch-nearest expansion of the
    512-dim axis, cross-attends against a learnable visual prompt, and is
    bilinearly resized onto the feature map.
    """

    task_classes: int
    prompt_size: int
    prompt_dim: int
    out_dim: int
    clip_table: Any = None  # np.ndarray (T, 512), static
    axis_name: Optional[str] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, clip_prompt: Array, prompt_weights: Array) -> Array:
        b, h, w, _ = x.shape
        d = self.prompt_dim

        def init_text_prompt(key, shape):
            # replicate: Linear(512, d) with torch default init, applied to
            # the frozen CLIP table
            kw, kb = jax.random.split(key)
            bound = 1.0 / math.sqrt(512)
            wl = jax.random.uniform(kw, (512, d), jnp.float32, -bound, bound)
            bl = jax.random.uniform(kb, (d,), jnp.float32, -bound, bound)
            table = jnp.asarray(self.clip_table, jnp.float32)  # (T, 512)
            return (table @ wl + bl).reshape(shape)

        text_learnable = self.param("text_prompt_learnable", init_text_prompt, (self.task_classes, d))
        visual_prompt = self.param(
            "visual_prompt", nn.initializers.normal(1.0), (self.prompt_size, self.prompt_size, d)
        )

        # (B, d): task-weighted learnable prompt, averaged over task axis
        t = (prompt_weights.astype(jnp.float32) @ text_learnable.astype(jnp.float32)) / self.task_classes
        # DELIBERATE DEVIATION: the reference's (B,d,1,1) * (B,512) broadcast
        # yields (B, d, B, 512) — at B>1 its nearest interpolation then runs
        # over the BATCH axis, mixing samples' clip embeddings
        # (net/MP_HSIR.py:574-575; only coherent at B=1). Here the product is
        # per-sample, (B, 1, 512, d) in NHWC — identical to the reference for
        # B=1 (the eval regime every parity test covers) and sane for B>1.
        tp = t[:, None, None, :] * clip_prompt.astype(jnp.float32)[:, None, :, None]
        tp = resize_nearest(tp, self.prompt_size, self.prompt_size).astype(x.dtype)

        vis = jnp.broadcast_to(visual_prompt[None], (b,) + visual_prompt.shape).astype(x.dtype)
        # the prompt maps are replicated across spatial shards (they are
        # (prompt_size, prompt_size), independent of the feature grid), so the
        # cross transformer runs unsharded on every shard
        prompts = CrossTransformer(d, num_heads=2, expansion=2.66, use_bias=False, name="cross_transformer")(tp, vis)
        n_sp = jax.lax.axis_size(self.axis_name) if self.axis_name is not None else 1
        if n_sp > 1:
            # each shard materializes only its row block of the global resize
            start = jax.lax.axis_index(self.axis_name) * h
            out = resize_bilinear_row_block(prompts, h * n_sp, w, start, h)
        else:
            out = resize_bilinear(prompts, h, w, align_corners=False)
        return Conv2d(self.out_dim, 3, padding=1, use_bias=False, axis_name=self.axis_name,
                      use_pallas=self.use_pallas, name="conv_last")(out)


class PromptFusion(nn.Module):
    """Fuse a feature map with its prompt map: concat -> transformer at 2*dim
    -> 1x1 conv back (reference: net/MP_HSIR.py:587-599)."""

    dim: int
    out_dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False
    axis_name: Optional[str] = None
    spectral_axis: Optional[str] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, prompt: Array,
                 deterministic: bool = True) -> Array:
        block = TransformerBlock(self.dim, self.num_heads, self.expansion, self.use_bias,
                                 self.axis_name, self.spectral_axis, self.use_pallas,
                                 name="transformer")
        # Lane-alignment gate (MEASURED): the in-kernel entry concat and
        # exit-conv fold win when the halves pack into whole 128-lane
        # vregs (64+64, 128+128: flagship fusion1 7.8 -> 6.0 ms) but the
        # remote-sensing preset's 96+96 (and its 192-lane GDFN-proj store)
        # REGRESSED the RS bench 33.2 -> ~25 cubes/s — Mosaic's misaligned
        # lane concat/stores cost more than the saved HBM passes.
        ch = x.shape[-1]
        lane_ok = (ch == 64 or ch % 128 == 0) and prompt.shape[-1] == ch
        fused = (self.use_pallas and deterministic and lane_ok
                 and x.shape[1] % 8 == 0
                 and _pallas_spectral_epilogue_ok(self.use_bias, self.axis_name,
                                                 self.spectral_axis))
        if fused:
            # eval: the entry concat is joined in VMEM inside the spectral
            # kernel and the exit 1x1 conv rides the GDFN writeback — two
            # full-map HBM round trips (concat write+read, conv read+write)
            # never happen. Training keeps the explicit composition (the
            # fused forms have no VJP).
            w_conv, b_conv = ConvParams(self.out_dim, 1, use_bias=self.use_bias,
                                        in_features=self.dim, name="conv")()
            assert b_conv is None
            return block(x, x2=prompt, proj_w=w_conv)
        out = jnp.concatenate([x, prompt], axis=-1)
        out = block(out)
        return Conv2d(self.out_dim, 1, use_bias=self.use_bias, name="conv")(out)


# ---------------------------------------------------------------------------
# Core block
# ---------------------------------------------------------------------------


class PGSSTB(nn.Module):
    """Prompt-Guided Spatial-Spectral Transformer Block
    (reference: net/MP_HSIR.py:601-723).

    LN -> (shifted) window spatial MSA -> two branches:
      (a) prompt-guided local spectral gate on the window tokens,
      (b) window-reverse + global C x C spectral attention;
    sum, residual w/ drop-path, then gated MLP.
    """

    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    compress_ratio: int
    prompt_len: int
    # the resolution this block was *configured* for: the reference freezes
    # the window-size/shift decision at construction from input_resolution
    # (net/MP_HSIR.py:613-616) and only recomputes masks for runtime shapes
    input_resolution: Tuple[int, int] = (64, 64)
    drop_path: float = 0.0
    use_bias: bool = False
    axis_name: Optional[str] = None
    use_pallas: bool = False
    spectral_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        b, h, w, c = x.shape
        n_sp = jax.lax.axis_size(self.axis_name) if self.axis_name is not None else 1
        gh = h * n_sp  # global height when H is mesh-sharded

        ws = self.window_size
        shift = self.shift_size
        if min(self.input_resolution) <= ws:
            shift = 0
            ws = min(self.input_resolution)
        ws = min(ws, gh, w)
        assert h % ws == 0, "sharded rows must be a multiple of the window size"

        shortcut = x
        fused = self.use_pallas and ws == 8 and w % 16 == 0
        # Routing: single-device EVAL keeps the one-call epilogue kernel
        # variants (merged phase-0, mlp-tail writeback — raw, no VJP).
        # TRAINING (single-device or mesh) and mesh eval route through the
        # differentiable split/sharded spectral cores (sp0/sp1 custom VJPs),
        # which consume the gate, shortcut and the per-sample drop-path
        # scales IN-KERNEL — stochastic depth no longer forces the explicit
        # composition (round-2 VERDICT #1/#2).

        if fused:
            # NHWC fused path: LN + window MSA inside one Pallas slab kernel
            # (no window tensors materialize — the (nW, 64, C) formulation
            # poisoned whole-program XLA layout assignment); the PG gate is
            # computed from 8x8 block means; the gate multiply, the branch
            # sum and (unshifted) the outer residual all ride the spectral
            # kernel's writeback instead of separate full-map HBM passes.
            ln_w, ln_b = LayerNormParams(self.dim, name="norm1")()
            region = None
            if shift > 0:
                region = jnp.asarray(shifted_region_map(gh, w, ws, shift))
                if n_sp > 1:
                    start = jax.lax.axis_index(self.axis_name) * h
                    region = jax.lax.dynamic_slice_in_dim(region, start, h, axis=0)
            # in-kernel roll: the shifted-window (-4,-4) cyclic roll is built
            # inside the slab kernel (reads this + the next wrapped block)
            # when the single-device epilogue path is active; mesh axes keep
            # the explicit ppermute roll.
            # Under a spatial mesh, ALL blocks (shifted too, any batch, train
            # or eval when drop-path is inactive) run the fused epilogue via
            # the split-phase sharded spectral kernel (psum'd Gram partials +
            # halo ppermute, differentiable custom_vjp cores); shifted blocks
            # roll back into the unrolled frame with one explicit ppermute
            # roll and index the per-window gates through it as a full-res
            # gate map.
            sharded_epilogue = (self.axis_name is not None
                                and not self.use_bias
                                and self.spectral_axis is None)
            # single-device TRAINING epilogue: the split sp0/sp1 custom_vjp
            # route with gate/shortcut/drop-path folded into the kernels
            # (the eval-only one-call epilogue variants stay deterministic)
            train_epilogue = (not deterministic and self.axis_name is None
                              and not self.use_bias
                              and self.spectral_axis is None)
            # spectral-TP epilogue (round-4 VERDICT #4): the TP kernel route
            # now consumes gate / gate_map / shortcut / drop-path (gate terms
            # 1/n_sp-scaled per member, shortcut post-psum) — PGSSTB under
            # band sharding no longer decomposes into explicit composition
            n_spect = (jax.lax.axis_size(self.spectral_axis)
                       if self.spectral_axis is not None else 1)
            tp_epilogue = (n_spect > 1 and not self.use_bias
                           and self.num_heads % n_spect == 0)
            epilogue_ok = (deterministic and _pallas_spectral_epilogue_ok(
                self.use_bias, self.axis_name, self.spectral_axis)
            ) or sharded_epilogue or train_epilogue or tp_epilogue
            # the window kernel's in-kernel roll wraps within the LOCAL map
            # and has no VJP — single-device eval only; sharded/train shifted
            # blocks keep the explicit roll-in
            kernel_rolls = (shift > 0 and epilogue_ok and deterministic
                            and self.axis_name is None)
            xr = (roll_hw(x, -shift, -shift, self.axis_name)
                  if shift > 0 and not kernel_rolls else x)
            # merged window + spectral-phase-0 kernel: the global Gram/norm
            # statistics of the spectral attention are accumulated INSIDE
            # the window kernel (one slab behind — ops/pallas_attention.py
            # _nhwc_sp0_kernel), so the spectral kernel's separate phase-0
            # read of sa_map never happens
            merged = (epilogue_ok and deterministic and not sharded_epilogue
                      and not tp_epilogue and h // 8 >= 2)
            sp_w = None
            if merged:
                sp_wqkv, sp_wdw, sp_temp, sp_wout = SpectralAttentionParams(
                    self.dim, self.num_heads, name="gobal_spectral_attn")()
                sp_w = (sp_wqkv.reshape(c, 3 * c), sp_wdw.reshape(9, 3 * c),
                        self.num_heads)
                sa_map, pooled, sp_gram, sp_nq, sp_nk = SpatialAttentionNHWC(
                    self.dim, ws, self.num_heads, name="attn")(
                    xr, ln_w, ln_b, region, shift_in=kernel_rolls, sp_qk=sp_w)
            else:
                sa_map, pooled = SpatialAttentionNHWC(self.dim, ws, self.num_heads, name="attn")(
                    xr, ln_w, ln_b, region, shift_in=kernel_rolls
                )  # pooled: (B, H/ws, W/ws, C) per-window descriptors, in-kernel
            gate = PGSpectralAttention(
                self.dim, self.compress_ratio, self.prompt_len, self.use_bias,
                name="local_spectral_attn",
            )(pooled=pooled.reshape(b, -1, c)).reshape(b, h // ws, w // ws, c)
            spectral = None
            if not merged:
                spectral = SpectralAttention(
                    self.dim, self.num_heads, self.use_bias, self.axis_name,
                    self.spectral_axis, True, name="gobal_spectral_attn",
                )
            hidden = int(self.dim * self.mlp_ratio)
            lnw2, lnb2 = LayerNormParams(self.dim, name="norm2")()
            # the in-kernel epilogue needs the single-device bias-free
            # pallas spectral path (mesh axes and use_bias fall back to the
            # psum'd / biased jnp formulation)
            if epilogue_ok:
                # one kernel: x = shortcut + sa_map*gate + attn(sa_map),
                # then (single-device) the block's tail MLP rides the same
                # phase-1 writeback: out = x + GatedMlp(LN2(x)) — the final
                # map never takes the standalone MLP kernel's extra
                # read+write pass. The reference applies the global spectral
                # attention in the UNROLLED frame (its dwconv zero padding
                # lives there); for shifted blocks the kernel performs the
                # (+4,+4) roll-back internally and indexes the per-window
                # gates through it.
                if merged:
                    from mp_hsir_tpu.ops.pallas_attention import (
                        fused_spectral_attention_nhwc,
                    )

                    _count_path("pgsstb_fused_epilogue")
                    w1, b1, w2, b2 = GatedMlpParams(self.dim, hidden, name="mlp")()
                    return fused_spectral_attention_nhwc(
                        sa_map, sp_wqkv, sp_wdw, sp_temp, sp_wout,
                        self.num_heads, gate=gate, shortcut=shortcut,
                        shifted=shift > 0,
                        mlp=(lnw2, lnb2, w1, b1, w2, b2),
                        precomputed=(sp_gram, sp_nq, sp_nk))
                if deterministic and not sharded_epilogue and not tp_epilogue:
                    _count_path("pgsstb_fused_epilogue")
                    w1, b1, w2, b2 = GatedMlpParams(self.dim, hidden, name="mlp")()
                    return spectral(sa_map, gate=gate, shortcut=shortcut,
                                    shifted=shift > 0,
                                    mlp_params=(lnw2, lnb2, w1, b1, w2, b2))
                # sharded (train or eval) or single-device training: the
                # split/sharded spectral kernel consumes gate + shortcut +
                # the per-sample drop-path scales IN-KERNEL (differentiable
                # custom_vjp cores), and the tail MLP's residual + drop-path
                # ride its own kernel writeback.
                _count_path("pgsstb_fused_tp_epilogue" if tp_epilogue else
                            "pgsstb_fused_sharded_epilogue"
                            if sharded_epilogue else
                            "pgsstb_fused_train_epilogue")
                dp1 = dp2 = None
                if not deterministic and self.drop_path > 0.0:
                    # draw the per-sample scales through the DropPath module
                    # on ones — same module name and call order as the
                    # explicit branch, so the rng stream (and thus the mask
                    # sequence) is IDENTICAL to the unfused path
                    dpm = DropPath(self.drop_path, name="drop_path")
                    ones = jnp.ones((b, 1, 1, 1), jnp.float32)
                    dp1 = dpm(ones, deterministic).reshape(b)
                    dp2 = dpm(ones, deterministic).reshape(b)
                use_split = self.axis_name is None
                if shift > 0:
                    # back to the unrolled frame (the reference applies the
                    # global spectral attention there) with ONE explicit
                    # roll (ppermute rows under a mesh); the per-window
                    # gates ride along as a rolled full-resolution gate map
                    sa_unrolled = roll_hw(sa_map, shift, shift, self.axis_name)
                    gmap = jnp.repeat(jnp.repeat(gate, ws, axis=1), ws, axis=2)
                    gmap = roll_hw(gmap, shift, shift, self.axis_name)
                    x = spectral(sa_unrolled, gate_map=gmap, shortcut=shortcut,
                                 dp_scale=dp1, split=use_split)
                else:
                    x = spectral(sa_map, gate=gate, shortcut=shortcut,
                                 dp_scale=dp1, split=use_split)
                return GatedMlpFusedNHWC(self.dim, hidden, residual=True,
                                         name="mlp")(x, lnw2, lnb2, dp2)
            _count_path("pgsstb_fused_explicit")
            gate_map = jnp.repeat(jnp.repeat(gate, ws, axis=1), ws, axis=2)
            x1 = sa_map * gate_map
            x2 = sa_map
            if shift > 0:
                x1 = roll_hw(x1, shift, shift, self.axis_name)
                x2 = roll_hw(x2, shift, shift, self.axis_name)
            x2 = spectral(x2)
            dp = DropPath(self.drop_path, name="drop_path")
            x = shortcut + dp(x1 + x2, deterministic)
            mlp_out = GatedMlpFusedNHWC(self.dim, hidden, name="mlp")(x, lnw2, lnb2)
            return x + dp(mlp_out, deterministic)
        else:
            _count_path("pgsstb_unfused")
            xn = LayerNorm(self.dim, name="norm1")(x)
            if shift > 0:
                xn = roll_hw(xn, -shift, -shift, self.axis_name)
            windows = window_partition(xn, ws)  # (B*nW_local, ws*ws, C)

            if shift > 0:
                mask = jnp.asarray(shifted_window_mask(gh, w, ws, shift))
                if n_sp > 1:
                    # this shard owns a contiguous block of global window rows
                    nw_local = (h // ws) * (w // ws)
                    start = jax.lax.axis_index(self.axis_name) * nw_local
                    mask = jax.lax.dynamic_slice_in_dim(mask, start, nw_local, axis=0)
            else:
                mask = None
            sa = SpatialAttention(self.dim, ws, self.num_heads, name="attn")(windows, mask)

            # branch (a): prompt-guided local spectral gate on window tokens
            x1 = PGSpectralAttention(self.dim, self.compress_ratio, self.prompt_len, self.use_bias, name="local_spectral_attn")(sa)
            x1 = window_reverse(x1, ws, h, w)
            if shift > 0:
                x1 = roll_hw(x1, shift, shift, self.axis_name)

            # branch (b): global spectral attention on the un-windowed map
            x2 = window_reverse(sa, ws, h, w)
            if shift > 0:
                x2 = roll_hw(x2, shift, shift, self.axis_name)
        x2 = SpectralAttention(self.dim, self.num_heads, self.use_bias, self.axis_name,
                               self.spectral_axis, self.use_pallas,
                               name="gobal_spectral_attn")(x2)

        y = x1 + x2
        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(y, deterministic)
        hidden = int(self.dim * self.mlp_ratio)
        mlp_out = GatedMlp(self.dim, hidden, name="mlp")(
            LayerNorm(self.dim, name="norm2")(x)
        )
        return x + dp(mlp_out, deterministic)


class BaseBlock(nn.Module):
    """`depth` PGSSTBs with alternating shift and an outer residual
    (reference: net/MP_HSIR.py:727-761)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    compress_ratio: int
    prompt_len: int
    input_resolution: Tuple[int, int] = (64, 64)
    drop_path: Tuple[float, ...] = ()
    use_bias: bool = False
    axis_name: Optional[str] = None
    use_pallas: bool = False
    spectral_axis: Optional[str] = None
    use_remat: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        shortcut = x
        block_cls = PGSSTB
        if self.use_remat:
            # activation checkpointing: recompute each PGSSTB in the backward
            # pass instead of keeping its activations (the reference carries
            # an unexercised use_checkpoint flag at net/MP_HSIR.py:740-743;
            # here it is a working remat for the big remote-sensing preset)
            block_cls = nn.remat(PGSSTB, static_argnums=(2,))
        for i in range(self.depth):
            x = block_cls(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio,
                compress_ratio=self.compress_ratio,
                prompt_len=self.prompt_len,
                input_resolution=self.input_resolution,
                drop_path=self.drop_path[i] if self.drop_path else 0.0,
                use_bias=self.use_bias,
                axis_name=self.axis_name,
                use_pallas=self.use_pallas,
                spectral_axis=self.spectral_axis,
                name=f"blocks_{i}",
            )(x, deterministic)
        return x + shortcut
