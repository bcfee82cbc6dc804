"""Zoo torch-oracle parity: convert the ACTUAL vendored reference
comparison networks' state_dicts and assert forward allclose on tiny
configs (round-1 VERDICT next-step #2 — the zoo's faithfulness previously
rested on smoke tests alone).

Each test builds the reference torch net (CPU, eval mode), the zoo flax
net at the same config, converts every tensor (full-coverage asserted by
convert_zoo_state), and compares fp32 forwards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zoo_ref_util import convert_zoo_state, load_ref

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(42)


def _fwd_jax(model, params, x):
    f = jax.jit(lambda p, xx: model.apply({"params": p}, xx))
    return np.asarray(f(params, jnp.asarray(x)))


def _fwd_torch(net, x):
    with torch.no_grad():
        return net(torch.from_numpy(x)).numpy()


_SEQ_STAGES = (r"(encoder_level\d|decoder_level\d|latent|refinement)\.(\d+)\.",
               r"\1_\2.")
_UPDOWN_BODY = (r"\b(down\d_\d|up\d_\d)\.body\.0\.", r"\1.conv.")


def test_stripformer_parity():
    """reference: deblur/stripformer_arch.py:331 (Stripformer — fixed
    31-band architecture, dims 64/128/320)."""
    mod = load_ref("deblur/stripformer_arch.py")
    torch.manual_seed(0)
    ref = mod.Stripformer().eval()

    from mp_hsir_tpu.models.zoo.stripformer import Stripformer

    model = Stripformer()
    x = RNG.uniform(0, 1, (1, 31, 32, 32)).astype(np.float32)
    target = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    rules = [
        (r"^encoder\.", ""),
        (r"^decoder\.", ""),
        (r"\.PEG\.PEG\.", r".PEG."),
        (r"^(en_layer\d_1)\.0\.", r"\1_0."),
        (r"^(en_layer\d_\d)\.0\.", r"\1.c0."),
        (r"^(en_layer\d_\d)\.2\.", r"\1.c1."),
        (r"^(de_layer\d_\d)\.0\.", r"\1_0."),
        (r"^(de_layer\d_\d)\.2\.", r"\1_2."),
    ]

    def deconv(v):  # (in, out, k, k) -> OIHW of the equivalent conv
        return np.flip(v, (2, 3)).transpose(1, 0, 2, 3).copy()

    params = convert_zoo_state(
        ref, target, rules=rules,
        value_hooks=[(r"de_layer(3_1|2_1)\.0\.weight$", deconv)])
    np.testing.assert_allclose(_fwd_jax(model, params, x), _fwd_torch(ref, x),
                               atol=5e-5, rtol=1e-4)


def test_lkfn_parity():
    """reference: sr/LKFN_arch.py:231 (LKFN). Its rgb_mean buffer only
    broadcasts for 3-channel inputs (the vendored __main__'s 31-channel call
    would crash) — tested at 3 channels with a zero mean, upscale 1."""
    mod = load_ref("sr/LKFN_arch.py")
    torch.manual_seed(0)
    ref = mod.LKFN(num_in_ch=3, num_out_ch=3, num_feat=8, num_atten=8,
                   num_block=8, upscale=1, num_in=1,
                   upsampler="pixelshuffledirect", rgb_mean=(0, 0, 0)).eval()

    from mp_hsir_tpu.models.zoo.lkfn import LKFN

    model = LKFN(in_channels=3, num_feat=8, num_atten=8, num_block=8,
                 upscale=1, num_in=1)
    x = RNG.uniform(0, 1, (1, 3, 16, 16)).astype(np.float32)
    target = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    rules = [
        (r"^upsampler\.0\.", "upsampler."),
        (r"\.pixel_norm\.weight$", ".pixel_norm_weight"),
        (r"\.pixel_norm\.bias$", ".pixel_norm_bias"),
    ]
    params = convert_zoo_state(ref, target, rules=rules, skip=(r"^mean$",))
    np.testing.assert_allclose(_fwd_jax(model, params, x), _fwd_torch(ref, x),
                               atol=3e-5, rtol=1e-4)


def test_mlwnet_parity():
    """reference: deblur/MLWNet_arch.py:307 (MLWNet) — NAFBlock encoder +
    learnable-Haar-wavelet fusion/decoder blocks (LWN), eval head1 path.
    Block counts are hard-coded in the reference; only dim/channels scale."""
    mod = load_ref("deblur/MLWNet_arch.py")
    torch.manual_seed(0)
    ref = mod.MLWNet(inp_channels=5, out_channels=5, dim=4).eval()

    from mp_hsir_tpu.models.zoo.mlwnet import MLWNet

    model = MLWNet(in_channels=5, dim=4)
    x = RNG.uniform(0, 1, (1, 5, 16, 16)).astype(np.float32)
    target = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    rules = [
        (r"^encoder\.feature_embed\.", "feature_embed."),
        (r"^encoder\.b(\d)\.(\d+)\.", r"enc_b\1_\2."),
        (r"^encoder\.down(\d)\.", r"down\1."),
        (r"^fusion\.up(\d\d)\.0\.", r"fusion_up\1."),
        (r"^fusion\.d(\d)\.(\d+)\.", r"fusion_d\1_\2."),
        (r"^decoder\.head(\d)\.block\.0\.", r"head\1."),
        (r"^decoder\.up(\d\d)\.0\.", r"dec_up\1."),
        (r"^decoder\.d(\d)\.(\d+)\.", r"dec_d\1_\2."),
        (r"^decoder\.alpha$", "alpha"),
        (r"\.sca\.1\.", r".sca."),
        (r"\.(norm\d)\.weight", r".\1.scale"),
    ]
    params = convert_zoo_state(
        ref, target, rules=rules,
        value_hooks=[(r"(\.|^)(beta|gamma|alpha)$",
                      lambda v: v.transpose(0, 2, 3, 1))],
        # the DWT/IDWT submodules alias the SAME filter Parameters the LWN
        # owns — state_dict lists them twice; keep the canonical copy
        skip=(r"\.wavedec\.", r"\.waverec\."))
    with torch.no_grad():
        want = ref(torch.from_numpy(x))[0].numpy()  # eval: (head1+inp, None...)
    np.testing.assert_allclose(_fwd_jax(model, params, x), want,
                               atol=3e-5, rtol=1e-4)


def test_srformer_parity():
    """reference: sr/srformer_arch.py:762 (SRFormer, denoising head at
    upscale 1 — the MP-HSIR usage SRFormer(in_chans=31, upscale=1))."""
    mod = load_ref("sr/srformer_arch.py")
    torch.manual_seed(0)
    ref = mod.SRFormer(img_size=16, in_chans=5, embed_dim=8, depths=[2, 2],
                       num_heads=[2, 2], window_size=8, mlp_ratio=2.0,
                       upscale=1, upsampler="", img_range=1.0).eval()

    from mp_hsir_tpu.models.zoo.srformer import SRFormer

    model = SRFormer(in_channels=5, embed_dim=8, depths=(2, 2),
                     num_heads=(2, 2), window_size=8, mlp_ratio=2.0, upscale=1)
    x = RNG.uniform(0, 1, (1, 5, 16, 16)).astype(np.float32)
    target = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    rules = [
        (r"^layers\.(\d+)\.residual_group\.blocks\.(\d+)\.", r"group\1_block\2."),
        (r"^layers\.(\d+)\.conv\.", r"group\1_conv."),
        (r"^patch_embed\.norm\.", "patch_norm."),
        (r"\.dwconv\.depthwise_conv\.0\.", ".dwconv."),
        (r"\.(norm\d)\.weight", r".\1.scale"),
    ]
    params = convert_zoo_state(
        ref, target, rules=rules,
        skip=(r"^mean$", r"aligned_relative_position_index$", r"attn_mask"))
    np.testing.assert_allclose(_fwd_jax(model, params, x), _fwd_torch(ref, x),
                               atol=5e-5, rtol=1e-4)
    x_odd = RNG.uniform(0, 1, (1, 5, 13, 11)).astype(np.float32)
    np.testing.assert_allclose(_fwd_jax(model, params, x_odd),
                               _fwd_torch(ref, x_odd), atol=5e-5, rtol=1e-4)


def test_loformer_parity():
    """reference: deblur/LoFormer_arch.py:639 (LoFormer, default
    cs='channel_mlp': full-map DCT around window channel attention with a
    token-axis v-gating MLP, NO qk norm, paired blocks)."""
    mod = load_ref("deblur/LoFormer_arch.py")
    torch.manual_seed(0)
    ref = mod.LoFormer(inp_channels=5, out_channels=5, dim=8,
                       enc_blk_nums=[1, 1, 1], middle_blk_num=1,
                       dec_blk_nums=[1, 1, 1], heads_enc=[1, 2, 2],
                       heads_mid=2).eval()

    from mp_hsir_tpu.models.zoo.loformer import LoFormer

    model = LoFormer(in_channels=5, dim=8, enc_blocks=(1, 1, 1),
                     middle_blocks=1, dec_blocks=(1, 1, 1), heads=(1, 2, 2),
                     heads_mid=2)
    # 64x64 so the deepest level is 8x8 (the reference reflect-pads maps
    # smaller than one window in a way torch itself rejects)
    x = RNG.uniform(0, 1, (1, 5, 64, 64)).astype(np.float32)
    target = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    rules = [
        (r"^encoders\.(\d+)\.(\d+)\.", r"enc\1_\2."),
        (r"^middle_blks\.(\d+)\.", r"mid_\1."),
        (r"^decoders\.(\d+)\.(\d+)\.", r"dec\1_\2."),
        (r"^downs\.(\d+)\.body\.0\.", r"down\1."),
        (r"^ups\.(\d+)\.body\.0\.", r"up\1."),
        (r"^reduce_chan\.(\d+)\.", r"reduce\1."),
        (r"^patch_embed\.proj\.", "patch_embed."),
        (r"\.attn\.0\.", ".attn."),
        (r"\.ffn\.0\.", ".ffn."),
        (r"\.mlp\.0\.", ".mlp."),
    ]
    params = convert_zoo_state(ref, target, rules=rules)
    np.testing.assert_allclose(_fwd_jax(model, params, x), _fwd_torch(ref, x),
                               atol=5e-5, rtol=1e-4)


def test_fftformer_parity():
    """reference: deblur/fftformer_arch.py:734 (fftformer) — bilinear
    resample down/up, Fuse skips, FSAS/DFFN patch-FFT blocks."""
    mod = load_ref("deblur/fftformer_arch.py")
    torch.manual_seed(0)
    ref = mod.fftformer(inp_channels=5, out_channels=5, dim=8,
                        num_blocks=[1, 1, 2], num_refinement_blocks=1).eval()

    from mp_hsir_tpu.models.zoo.fftformer import FFTformer

    model = FFTformer(in_channels=5, dim=8, num_blocks=(1, 1, 2),
                      num_refinement=1)
    x = RNG.uniform(0, 1, (1, 5, 32, 32)).astype(np.float32)
    target = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    rules = [
        _SEQ_STAGES,
        (r"^(down\d_\d|up\d_\d)\.body\.1\.", r"\1."),
        (r"^patch_embed\.proj\.", "patch_embed."),
    ]

    def gate(v):  # (2h, 1, 1, 8, 5) -> (8, 5, 2h)
        return v[:, 0, 0].transpose(1, 2, 0)

    params = convert_zoo_state(ref, target, rules=rules,
                               value_hooks=[(r"\.fft$", gate)])
    np.testing.assert_allclose(_fwd_jax(model, params, x), _fwd_torch(ref, x),
                               atol=5e-5, rtol=1e-4)


def test_sgnet_parity():
    """reference: dehaze/SGNet_arch.py:162 (SGNet) — its layer widths are
    hard-coded to the 100-band preset, so the oracle runs at 100 bands."""
    mod = load_ref("dehaze/SGNet_arch.py")
    torch.manual_seed(0)
    ref = mod.SGNet(input_image_channel=100).eval()

    from mp_hsir_tpu.models.zoo.sgnet import SGNet

    model = SGNet(in_channels=100)
    x = RNG.uniform(0, 1, (1, 100, 16, 16)).astype(np.float32)
    target = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    rules = [
        (r"^SPCA_Block\.conv_sp_atten_(\d)_layer\.0\.", r"spca.sp\1."),
        (r"^SPCA_Block\.conv_sp_atten_(\d_\d)\.", r"spca.sp\1."),
        (r"^SPCA_Block\.conv_sp_atten_(\d)\.", r"spca.sp\1."),
        (r"^SPCA_Block\.conv_ca_atten_1\.", "spca.ca1."),
        (r"^SPCA_Block\.conv_ca_layer_1\.0\.", "spca.ca2."),
        (r"^SPCA_Block\.conv_ca_layer_2\.0\.", "spca.ca3."),
        (r"^SPCA_Block\.conv_pa_layer_1\.0\.", "spca.pa."),
        (r"^SPCA_Block\.conv_layer\.0\.", "spca.out."),
        (r"^Fusion_Block\.conv1\.0\.", "fusion.conv1."),
        (r"^Fusion_Block\.conv2\.", "fusion.conv2."),
        (r"^Basic_Residual\.conv_layer(\d)\.0\.", r"basic_residual.conv\1."),
        (r"^(conv1_layer\d|conv2|conv3)\.0\.", r"\1."),
    ]
    params = convert_zoo_state(ref, target, rules=rules,
                               skip=(r"^conv4\.",))  # declared, never used
    np.testing.assert_allclose(_fwd_jax(model, params, x), _fwd_torch(ref, x),
                               atol=3e-5, rtol=1e-4)


def test_essa_parity():
    """reference: sr/ESSA.py:191 (ESSA, upscale 1 — its __main__ config;
    the up/downsample Sequentials are empty at scale 1)."""
    mod = load_ref("sr/ESSA.py")
    torch.manual_seed(0)
    ref = mod.ESSA(inch=5, dim=8, upscale=1).eval()

    from mp_hsir_tpu.models.zoo.essa import ESSA

    model = ESSA(in_channels=5, dim=8, upscale=1)
    x = RNG.uniform(0, 1, (1, 5, 16, 16)).astype(np.float32)
    target = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    rules = [
        (r"^blockup\.", ""),
        (r"\.conv[du]\.0\.", ".conv_a."),
        (r"\.conv[du]\.3\.", ".conv_b."),
        (r"\.conv[du]\.6\.", ".conv_c."),
        (r"\.norm\.weight$", ".norm.scale"),
    ]
    params = convert_zoo_state(ref, target, rules=rules)
    np.testing.assert_allclose(_fwd_jax(model, params, x), _fwd_torch(ref, x),
                               atol=3e-5, rtol=1e-4)


def test_instructir_parity():
    """reference: instructir.py:271 (InstructIR with CLIP Text_Prompt) —
    ICBs on every encoder/decoder level, 1/T-scaled one-hot CLIP routing.
    Both sides share the identical frozen text table (ref_torch clip stub ==
    models/text_prompts.clip_text_table)."""
    mod = load_ref("instructir.py")
    torch.manual_seed(0)
    ref = mod.InstructIR(img_channel=5, width=8, middle_blk_num=2,
                         enc_blk_nums=[1, 1], dec_blk_nums=[1, 1],
                         txtdim=512, task_classes=6).eval()

    from mp_hsir_tpu.models.zoo.instructir import InstructIR

    model = InstructIR(in_channels=5, width=8, enc_blocks=(1, 1),
                       middle_blocks=2, dec_blocks=(1, 1), txtdim=512,
                       task_classes=6)
    x = RNG.uniform(0, 1, (1, 5, 16, 16)).astype(np.float32)
    tid = np.array([2], np.int64)
    target = model.init(jax.random.key(0), jnp.asarray(x),
                        jnp.asarray(tid, jnp.int32))["params"]
    rules = [
        (r"^encoders\.(\d+)\.(\d+)\.", r"enc\1_\2."),
        (r"^decoders\.(\d+)\.(\d+)\.", r"dec\1_\2."),
        (r"^middle_blks\.(\d+)\.", r"mid_\1."),
        (r"^downs\.(\d+)\.", r"down\1."),
        (r"^ups\.(\d+)\.0\.", r"up\1_conv."),
        (r"^enc_cond\.(\d+)\.", r"enc_icb\1."),
        (r"^dec_cond\.(\d+)\.", r"dec_icb\1."),
        (r"\.sca\.1\.", r".sca."),
        (r"\.(norm\d)\.weight", r".\1.scale"),
    ]
    params = convert_zoo_state(
        ref, target, rules=rules,
        value_hooks=[(r"(\.|^)(beta|gamma)$", lambda v: v.transpose(0, 2, 3, 1))])
    f = jax.jit(lambda p, xx, t: model.apply({"params": p}, xx, t))
    got = np.asarray(f(params, jnp.asarray(x), jnp.asarray(tid, jnp.int32)))
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(tid)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_restormer_parity():
    """reference: general/restormer_arch.py:193 (Restormer)."""
    mod = load_ref("general/restormer_arch.py")
    torch.manual_seed(0)
    ref = mod.Restormer(inp_channels=5, out_channels=5, dim=8,
                        num_blocks=[1, 1, 1, 1], num_refinement_blocks=1,
                        heads=[1, 2, 2, 2], ffn_expansion_factor=2.66,
                        bias=False, LayerNorm_type="WithBias").eval()

    from mp_hsir_tpu.models.zoo.restormer import Restormer

    model = Restormer(in_channels=5, out_channels=5, dim=8,
                      num_blocks=(1, 1, 1, 1), num_refinement=1,
                      heads=(1, 2, 2, 2))
    x = RNG.uniform(0, 1, (1, 5, 16, 16)).astype(np.float32)
    target = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    params = convert_zoo_state(ref, target, rules=[_SEQ_STAGES, _UPDOWN_BODY])
    np.testing.assert_allclose(_fwd_jax(model, params, x), _fwd_torch(ref, x),
                               atol=2e-5, rtol=1e-4)


def test_nafnet_parity():
    """reference: general/NAFNet_arch.py:86 (NAFNet)."""
    mod = load_ref("general/NAFNet_arch.py")
    torch.manual_seed(0)
    ref = mod.NAFNet(img_channel=5, width=8, middle_blk_num=2,
                     enc_blk_nums=[1, 1, 1, 1], dec_blk_nums=[1, 1, 1, 1]).eval()

    from mp_hsir_tpu.models.zoo.nafnet import NAFNet

    model = NAFNet(in_channels=5, width=8, middle_blocks=2,
                   enc_blocks=(1, 1, 1, 1), dec_blocks=(1, 1, 1, 1))
    x = RNG.uniform(0, 1, (1, 5, 16, 16)).astype(np.float32)
    target = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    rules = [
        (r"^encoders\.(\d+)\.(\d+)\.", r"enc\1_\2."),
        (r"^decoders\.(\d+)\.(\d+)\.", r"dec\1_\2."),
        (r"^middle_blks\.(\d+)\.", r"mid_\1."),
        (r"^downs\.(\d+)\.", r"down\1."),
        (r"^ups\.(\d+)\.0\.", r"up\1_conv."),
        (r"\.sca\.1\.", r".sca."),
        (r"\.(norm\d)\.weight", r".\1.scale"),
    ]

    def squeeze_bg(v):  # beta/gamma (1, C, 1, 1) -> (1, 1, 1, C)
        return v.transpose(0, 2, 3, 1)

    params = convert_zoo_state(
        ref, target, rules=rules,
        value_hooks=[(r"\.(beta|gamma)$", squeeze_bg)])
    x_big = RNG.uniform(0, 1, (1, 5, 24, 24)).astype(np.float32)  # pads to 32
    np.testing.assert_allclose(_fwd_jax(model, params, x), _fwd_torch(ref, x),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(_fwd_jax(model, params, x_big),
                               _fwd_torch(ref, x_big), atol=2e-5, rtol=1e-4)


def test_swinir_parity():
    """reference: general/network_swinir.py:618 (SwinIR, denoising head,
    its `__main__` config SwinIR(in_chans=31) scaled down)."""
    mod = load_ref("general/network_swinir.py")
    torch.manual_seed(0)
    ref = mod.SwinIR(img_size=16, in_chans=5, embed_dim=8, depths=[2, 2],
                     num_heads=[2, 2], window_size=8, mlp_ratio=4.0,
                     upscale=1, img_range=1.0, upsampler="",
                     resi_connection="1conv").eval()

    from mp_hsir_tpu.models.zoo.swinir import SwinIR

    model = SwinIR(in_channels=5, embed_dim=8, depths=(2, 2),
                   num_heads=(2, 2), window_size=8, mlp_ratio=4.0, upscale=1)
    rules = [
        (r"^layers\.(\d+)\.residual_group\.blocks\.(\d+)\.", r"layer_\1.block_\2."),
        (r"^layers\.(\d+)\.conv\.", r"layer_\1.conv."),
        (r"^patch_embed\.norm\.", r"patch_norm."),
    ]
    x = RNG.uniform(0, 1, (1, 5, 16, 16)).astype(np.float32)
    target = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    params = convert_zoo_state(ref, target, rules=rules, skip=(r"^mean$",))
    np.testing.assert_allclose(_fwd_jax(model, params, x), _fwd_torch(ref, x),
                               atol=2e-5, rtol=1e-4)
    # shifted-window masks recompute for non-multiple sizes (reflect pad)
    x_odd = RNG.uniform(0, 1, (1, 5, 13, 11)).astype(np.float32)
    np.testing.assert_allclose(_fwd_jax(model, params, x_odd),
                               _fwd_torch(ref, x_odd), atol=2e-5, rtol=1e-4)


def test_sst_parity():
    """reference: denosie/SST.py:347 (SST) — sequential window->spectral
    attention inside one residual, plain MLP."""
    mod = load_ref("denosie/SST.py")
    torch.manual_seed(0)
    ref = mod.SST(inp_channels=5, dim=8, window_size=8, depths=[2, 2],
                  num_heads=[2, 2], mlp_ratio=2).eval()

    from mp_hsir_tpu.models.zoo.sst import SST

    model = SST(in_channels=5, dim=8, depths=(2, 2), num_heads=(2, 2),
                window_size=8, mlp_ratio=2.0)
    rules = [
        (r"^layers\.(\d+)\.smsblock\.(\d+)\.", r"group\1_block\2."),
        (r"^layers\.(\d+)\.conv\.", r"group\1_conv."),
        (r"\.spectral_attn\.", r".spectral_attn."),
    ]
    x = RNG.uniform(0, 1, (1, 5, 16, 16)).astype(np.float32)
    target = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    params = convert_zoo_state(ref, target, rules=rules)
    np.testing.assert_allclose(_fwd_jax(model, params, x), _fwd_torch(ref, x),
                               atol=2e-5, rtol=1e-4)


def test_sert_parity():
    """reference: denosie/sert.py:414 (SERT) — dual-rectangle LePE window
    attention, CAB memory-bank channel branch, maskless shifts."""
    mod = load_ref("denosie/sert.py")
    torch.manual_seed(0)
    ref = mod.SERT(inp_channels=5, dim=8, window_sizes=[8, 8], depths=[2, 2],
                   num_heads=[2, 2], split_sizes=[1, 2], mlp_ratio=2,
                   down_rank=4, memory_blocks=16).eval()

    from mp_hsir_tpu.models.zoo.sert import SERT

    model = SERT(in_channels=5, dim=8, depths=(2, 2), num_heads=(2, 2),
                 window_sizes=(8, 8), split_sizes=(1, 2), mlp_ratio=2.0,
                 down_rank=4, memory_blocks=16)
    rules = [
        (r"^layers\.(\d+)\.smsblock\.(\d+)\.", r"group\1_block\2."),
        (r"^layers\.(\d+)\.conv\.", r"group\1_conv."),
        (r"\.attns\.attns\.(\d)\.", r".attns.attns_\1."),
        (r"\.c_attns\.cab\.0\.", r".c_attns.cab_0."),
        (r"\.c_attns\.cab\.2\.", r".c_attns.cab_2."),
        (r"\.c_attns\.cab\.3\.subnet\.0\.", r".c_attns.cab_3.subnet_0."),
        (r"\.c_attns\.cab\.3\.upnet\.0\.", r".c_attns.cab_3.upnet_0."),
        (r"\.c_attns\.cab\.3\.mb$", r".c_attns.cab_3.mb"),
    ]
    x = RNG.uniform(0, 1, (1, 5, 16, 16)).astype(np.float32)
    target = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    params = convert_zoo_state(ref, target, rules=rules)
    np.testing.assert_allclose(_fwd_jax(model, params, x), _fwd_torch(ref, x),
                               atol=2e-5, rtol=1e-4)


def test_qrnn3d_parity():
    """reference: denosie/qrnn/{qrnn3d,utils,combinations}.py (QRNNREDC3D).
    The associative-scan recurrence must match the sequential torch loop;
    decoder ConvTranspose3d(k3,s1,p1) layers convert to flipped convs; the
    upsample is ALIGN-CORNERS trilinear (combinations.py:105)."""
    mod = load_ref("denosie/qrnn/qrnn3d.py")
    torch.manual_seed(0)
    nhl, sample_idx = 3, [1]
    ref = mod.QRNNREDC3D(1, 4, nhl, sample_idx).eval()

    from mp_hsir_tpu.models.zoo.qrnn3d import QRNNREDC3D

    model = QRNNREDC3D(channels=4, num_half_layer=nhl, sample_idx=tuple(sample_idx))
    x = RNG.uniform(0, 1, (1, 8, 16, 16)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x))

    rules = [
        (r"^feature_extractor\.conv\.bn\.", "feature_extractor.bn.bn."),
        (r"^feature_extractor\.conv\.conv\.weight$", "feature_extractor.conv.kernel"),
        (r"^reconstructor\.conv\.bn\.", "reconstructor.bn.bn."),
        (r"^reconstructor\.conv\.deconv\.weight$", "reconstructor.conv.kernel"),
        (r"^reconstructor\.conv\.deconv\.bias$", "reconstructor.conv.bias"),
        (r"^encoder\.layers\.(\d+)\.conv\.bn\.", r"enc_\1.bn.bn."),
        (r"^encoder\.layers\.(\d+)\.conv\.conv\.weight$", r"enc_\1.conv.kernel"),
    ]
    for j in range(nhl):
        i = nhl - 1 - j
        rules += [
            (rf"^decoder\.layers\.{j}\.conv\.bn\.", f"dec_{i}.bn.bn."),
            (rf"^decoder\.layers\.{j}\.conv\.deconv\.weight$", f"dec_{i}.conv.kernel"),
            (rf"^decoder\.layers\.{j}\.conv\.upsample_conv\.conv3d\.weight$",
             f"dec_{i}.conv.kernel"),
        ]
    value_hooks = [
        (r"(\.conv\.conv|\.conv3d)\.weight$", lambda v: v.transpose(2, 3, 4, 1, 0)),
        (r"\.deconv\.weight$",
         lambda v: np.flip(v, (2, 3, 4)).transpose(2, 3, 4, 0, 1).copy()),
    ]
    from zoo_ref_util import convert_zoo_variables

    variables = convert_zoo_variables(ref, variables, rules=rules,
                                      value_hooks=value_hooks,
                                      skip=(r"num_batches_tracked$",))
    f = jax.jit(lambda v, xx: model.apply(v, xx))
    got = np.asarray(f(variables, jnp.asarray(x)))
    with torch.no_grad():
        # torch side takes (B, 1, D, H, W): bands ride the depth axis
        want = ref(torch.from_numpy(x[:, None])).numpy()[:, 0]
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_promptir_parity():
    """reference: promptir.py:385 (PromptIR_2, the parameterized HSI
    variant; PromptIR at :242 is the same net with dim=48 hard-coded),
    decoder=True."""
    mod = load_ref("promptir.py")
    torch.manual_seed(0)
    ref = mod.PromptIR_2(in_channel=5, out_channel=5, dim=8,
                         num_blocks=[1, 1, 1, 1], prompt_dim=[8, 16, 24],
                         num_refinement_blocks=1, heads=[1, 2, 2, 2],
                         decoder=True).eval()

    from mp_hsir_tpu.models.zoo.promptir import PromptIR

    model = PromptIR(in_channels=5, dim=8, num_blocks=(1, 1, 1, 1),
                     num_refinement=1, heads=(1, 2, 2, 2),
                     prompt_dims=(8, 16, 24), prompt_sizes=(64, 32, 16))
    x = RNG.uniform(0, 1, (1, 5, 16, 16)).astype(np.float32)
    target = model.init(jax.random.key(0), jnp.asarray(x))["params"]

    def bank(v):  # (1, L, C, s, s) -> (L, s, s, C)
        return v[0].transpose(0, 2, 3, 1)

    params = convert_zoo_state(
        ref, target, rules=[_SEQ_STAGES, _UPDOWN_BODY],
        value_hooks=[(r"prompt_param$", bank)])
    np.testing.assert_allclose(_fwd_jax(model, params, x), _fwd_torch(ref, x),
                               atol=3e-5, rtol=1e-4)


def test_ref_deform_conv_matches_jax():
    """The pure-torch DeformConv2d oracle (zoo_ref_util._make_ref_deform_conv,
    torchvision layout: (dy, dx) per row-major tap, bilinear zero-pad) must
    agree with ops/deform.deform_conv2d — it anchors the MB-TaylorFormer
    parity test below."""
    from zoo_ref_util import _make_ref_deform_conv

    from mp_hsir_tpu.ops.deform import deform_conv2d

    torch.manual_seed(3)
    dcn = _make_ref_deform_conv()(6, 4, 3, padding=1, groups=2, bias=True)
    x = RNG.uniform(-1, 1, (2, 6, 9, 9)).astype(np.float32)
    off = RNG.uniform(-2, 2, (2, 18, 9, 9)).astype(np.float32)
    with torch.no_grad():
        want = dcn(torch.from_numpy(x), torch.from_numpy(off)).numpy()
    w_hwio = dcn.weight.detach().numpy().transpose(2, 3, 1, 0)
    got = np.asarray(deform_conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(off.transpose(0, 2, 3, 1)),
        jnp.asarray(w_hwio), bias=jnp.asarray(dcn.bias.detach().numpy()),
        padding=1, groups=2)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_mbtaylorformer_parity():
    """reference: dehaze/MB_TaylorFormer_arch.py:714 (MB_TaylorFormer) —
    heads (1,2,4,8) exercises all four refine_att window buckets
    (:182-200), num_path 2 the SKFF fusion, and every DWCPatchEmbed runs
    the deformable conv through the runnable torch oracle."""
    mod = load_ref("dehaze/MB_TaylorFormer_arch.py")
    torch.manual_seed(0)
    ref = mod.MB_TaylorFormer(
        inp_channels=3, out_channels=3, dim=[8, 16, 24, 32],
        num_blocks=[1, 1, 1, 1], num_refinement_blocks=1,
        heads=[1, 2, 4, 8], num_path=[2, 2, 2, 2]).eval()

    from mp_hsir_tpu.models.zoo.mbtaylorformer import MBTaylorFormer

    model = MBTaylorFormer(in_channels=3, out_channels=3, dims=(8, 16, 24, 32),
                           num_blocks=(1, 1, 1, 1), heads=(1, 2, 4, 8),
                           num_path=(2, 2, 2, 2))
    x = RNG.uniform(0, 1, (1, 3, 16, 16)).astype(np.float32)
    target = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    rules = [
        (r"^patch_embed\.proj\.", "patch_embed."),
        (r"^patch_embed_encoder_level(\d)\.patch_embeds\.(\d+)\.patch_conv\.",
         r"encoder_level\1.patch_embed_\2."),
        (r"^patch_embed_decoder_level(\d)\.patch_embeds\.(\d+)\.patch_conv\.",
         r"decoder_level\1.patch_embed_\2."),
        (r"^patch_embed_latent\.patch_embeds\.(\d+)\.patch_conv\.",
         r"latent.patch_embed_\1."),
        (r"^patch_embed_refinement\.patch_embeds\.(\d+)\.patch_conv\.",
         r"refinement.patch_embed_\1."),
        (r"\.offset_generator\.0\.", ".offset_dw."),
        (r"\.offset_generator\.1\.", ".offset_pw."),
        (r"\.dcn\.weight$", ".dcn_weight"),
        (r"\.mhca_blks\.(\d+)\.MHCA_layers\.(\d+)\.", r".path\1_block\2."),
        (r"\.norm(\d)\.body\.", r".norm\1."),
        (r"\.refine_att\.conv_list\.(\d+)\.", r".refine_att.conv_list_\1."),
        (r"\.aggregate\.conv_du\.1\.weight$", ".aggregate.prelu"),
        (r"\.aggregate\.conv_du\.0\.", ".aggregate.conv_du."),
        (r"\.aggregate\.fcs\.(\d+)\.", r".aggregate.fc\1."),
        (r"^(down\d_\d|up\d_\d)\.body\.0\.", r"\1_dw."),
        (r"^(down\d_\d|up\d_\d)\.body\.1\.", r"\1_pw."),
        (r"^reduce_chan_level(\d)\.0\.", r"reduce_chan_level\1."),
        (r"^output\.0\.", "output."),
    ]
    params = convert_zoo_state(
        ref, target, rules=rules,
        value_hooks=[(r"\.dcn\.weight$",
                      lambda v: v.transpose(2, 3, 1, 0))])
    np.testing.assert_allclose(_fwd_jax(model, params, x), _fwd_torch(ref, x),
                               atol=5e-5, rtol=1e-4)


def test_prompthsi_parity():
    """reference: promptHSI.py:1138 (PromptHSI) — encoder BN running stats,
    dense Swin RDGs, grouped RDBs, cross/spatial/spectral attentions, shared
    text-FiLM adapter; both sides read the SAME frozen clip table (the torch
    side through the stubbed clip.load). 32x32 input exercises the shifted
    windows at decoder2 and the window clamp at decoder4/3."""
    from zoo_ref_util import convert_zoo_variables

    mod = load_ref("promptHSI.py")
    torch.manual_seed(0)
    ref = mod.PromptHSI(img_size=(32, 32, 32), in_channel=5, embeding_dim=8,
                        task_classes=6, num_blocks_tf=1, num_layers=(1, 1),
                        num_heads=8, window_size=(8, 8, 8)).eval()

    from mp_hsir_tpu.models.zoo.prompthsi import PromptHSI

    model = PromptHSI(in_channels=5, embed_dim=8, task_classes=6,
                      num_blocks_tf=1, num_layers=(1, 1), num_heads=8)
    x = RNG.uniform(0, 1, (1, 5, 32, 32)).astype(np.float32)
    tid = np.array([3], dtype=np.int64)
    target = jax.jit(lambda r: model.init(r, jnp.asarray(x), jnp.asarray(tid)))(
        jax.random.key(0))
    rules = [
        (r"^enhance\.(\d+)\.", r"enhance_\1."),
        (r"^enhance_(\d+)\.ffn\.", r"enhance_\1."),
        (r"\.spectral_branch\.(\d+)\.", r".spectral_branch_\1."),
        (r"\.spatial_branch\.layers\.(\d+)\.", r".spatial_branch.layers_\1."),
        (r"\.spatial_branch\.patch_embed\.norm\.", ".spatial_branch.patch_norm."),
        (r"\.feature_fusion\.fusion_proj\.", ".fusion_proj."),
        (r"\.MLP\.0\.", ".mlp_fc1."),
        (r"\.MLP\.2\.", ".mlp_fc2."),
        (r"\.attention_spectral\.norm\.body\.", ".attention_spectral.norm."),
        (r"\.norm(\d)\.body\.", r".norm\1."),
        (r"^encoder\.conv([234])\.0\.", r"encoder.conv\1.dw."),
        (r"^encoder\.conv([234])\.1\.", r"encoder.conv\1.pw."),
        (r"^encoder\.conv([234])\.2\.", r"encoder.conv\1.bn."),
    ]
    variables = convert_zoo_variables(
        ref, target, rules=rules,
        skip=(r"relative_position_index", r"attn_mask", r"num_batches_tracked"))
    got = np.asarray(jax.jit(
        lambda v, xx, t: model.apply(v, xx, t))(variables, jnp.asarray(x),
                                                jnp.asarray(tid)))
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(x.copy()),
                   torch.from_numpy(tid))[0].numpy()
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_diacmpn_parity():
    """reference: dehaze/DIACMPN_arch.py:404 (DIACMPN) with its REAL
    assistance nets (UNet.py:107 BN UNet, DepthNet.py:48 DN depth pyramid).
    The reference hard-codes 100 bands (DN's DRDB_layer1 in_ch=100,
    DIACMPN_arch.py:475-509 fusion widths for embed_dims 96/192/384), so
    the test runs the full widths at 32x32 with depths (2,2,2,2,2) —
    attention (incl. the shifted reflect-pad window path and LayNormal
    conditioning) is exercised at stages 2 and 3 by attn_ratio (1/2, 3/4).
    conv11/conv22/conv_fu/ccc are dead parameters in the reference forward
    and are skipped."""
    from zoo_ref_util import convert_zoo_variables

    mod = load_ref("dehaze/DIACMPN_arch.py")
    torch.manual_seed(0)
    ref = mod.DIACMPN(in_chans=100, out_chans=100,
                      embed_dims=[96, 192, 384, 192, 96],
                      depths=[2, 2, 2, 2, 2]).eval()

    from mp_hsir_tpu.models.zoo.diacmpn import DIACMPN

    model = DIACMPN(in_channels=100, out_channels=100,
                    dims=(96, 192, 384, 192, 96), depths=(2, 2, 2, 2, 2),
                    num_heads=(2, 4, 6, 1, 1))
    x = RNG.uniform(0, 1, (1, 100, 32, 32)).astype(np.float32)
    target = jax.jit(lambda r: model.init(r, jnp.asarray(x)))(jax.random.key(0))
    rules = [
        # assistance UNet: Sequential DoubleConv (conv.0/1/3/4 -> c0/bn0/c1/bn1)
        (r"^Unet1\.down(\d)\.mpconv\.1\.", r"Unet1.down\1."),
        (r"^Unet1\.up(\d)\.conv\.", r"Unet1.up\1."),
        (r"\.conv\.0\.", ".c0."), (r"\.conv\.1\.", ".bn0."),
        (r"\.conv\.3\.", ".c1."), (r"\.conv\.4\.", ".bn1."),
        # depth pyramid: custom dilated-conv / deconv params
        (r"\.Dcov(\d)\.weight$", r".Dcov\1_weight"),
        (r"\.Dcov(\d)\.bias$", r".Dcov\1_bias"),
        (r"^dpn\.up(\d)\.weight$", r"dpn.up\1_weight"),
        (r"^dpn\.up(\d)\.bias$", r"dpn.up\1_bias"),
        # backbone embeds
        (r"^patch_embed\.proj\.", "patch_embed."),
        (r"^patch_merge(\d)\.proj\.", r"patch_merge\1."),
        (r"^patch_split(\d)\.proj\.0\.", r"patch_split\1."),
        (r"^patch_unembed\.proj\.0\.", "patch_unembed."),
        # transformer blocks
        (r"\.blocks\.(\d+)\.", r".blocks_\1."),
        (r"\.attn\.attn\.meta\.0\.", ".attn.meta_fc1."),
        (r"\.attn\.attn\.meta\.2\.", ".attn.meta_fc2."),
        (r"\.attn\.(V|QK|proj|conv)\.", r".\1."),
        (r"\.mlp\.mlp\.0\.", ".mlp1."),
        (r"\.mlp\.mlp\.2\.", ".mlp2."),
        # fusion heads
        (r"^mfm(\d)\.mlp\.0\.", r"mfm\1.mlp1."),
        (r"^mfm(\d)\.mlp\.2\.", r"mfm\1.mlp2."),
        (r"^ca\.0\.", "ca1."), (r"^ca\.2\.", "ca2."),
        (r"^fuse_conv(\d)\.0\.", r"fuse_conv\1."),
    ]
    variables = convert_zoo_variables(
        ref, target, rules=rules,
        value_hooks=[
            (r"\.norm1\.(weight|bias)$", lambda v: v.reshape(-1)),
            (r"\.Dcov\d\.weight$", lambda v: v.transpose(2, 3, 1, 0)),
            (r"^dpn\.up\d\.weight$",
             lambda v: np.flip(v, (2, 3)).transpose(2, 3, 0, 1).copy()),
        ],
        skip=(r"relative_positions$", r"num_batches_tracked",
              r"^(conv11|conv22|conv_fu|ccc)\."))
    got = jax.jit(lambda v, xx: model.apply(v, xx))(variables, jnp.asarray(x))
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w.numpy(),
                                   atol=2e-4, rtol=1e-3)


def test_pipnet_parity():
    """reference: PIP_Net.py:15 (PIPNet_Restormer_onskip_inter,
    prompt_interaction_mode='pip_cross_topm'). The reference hard-codes
    reduce_chan_level3 = Conv2d(dim*2 + 192, ...) (PIP_Net.py:100) which
    only type-checks at dim=48, so the test runs dim=48 with 1-block
    stages. low_prompt_dims (64, 48, 24) exercise all three channel-align
    branches of the Topm interaction (PIP_utils.py:556-575): level1
    feat48<prompt64 (zero-pad + reduce_channel), levels 2/3 feat>prompt
    (split + re-concat). reduce_noise_channel_* are created-but-unused in
    the reference forward and are skipped."""
    mod = load_ref("PIP_Net.py")
    torch.manual_seed(0)
    ref = mod.PIPNet_Restormer_onskip_inter(
        inp_channels=5, out_channels=5, dim=48, num_blocks=[1, 1, 1, 1],
        num_refinement_blocks=1, heads=[1, 2, 4, 8],
        low_prompt_dims=[64, 48, 24], low_prompt_sizes=[16, 8, 4],
        degradation_num=6).eval()

    from mp_hsir_tpu.models.zoo.pipnet import PIPNet

    model = PIPNet(in_channels=5, out_channels=5, dim=48,
                   num_blocks=(1, 1, 1, 1), num_refinement=1,
                   heads=(1, 2, 4, 8), task_classes=6,
                   low_prompt_dims=(64, 48, 24), low_prompt_sizes=(16, 8, 4))
    x = RNG.uniform(0, 1, (1, 5, 32, 32)).astype(np.float32)
    tid = np.array([3], dtype=np.int64)
    target = jax.jit(lambda r: model.init(r, jnp.asarray(x), jnp.asarray(tid)))(
        jax.random.key(0))["params"]
    rules = [
        _SEQ_STAGES, _UPDOWN_BODY,
        # PromptToFeature wraps the Topm block (PIP.py:505-555)
        (r"\.prompt_transformer_cross\.", "."),
        (r"\.norm(1[12]?|2)\.body\.", r".norm\1."),
    ]
    params = convert_zoo_state(
        ref, target, rules=rules,
        skip=(r"^reduce_noise_channel_\d\.",))
    got = np.asarray(jax.jit(
        lambda p, xx, t: model.apply({"params": p}, xx, t))(
            params, jnp.asarray(x), jnp.asarray(tid)))
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(tid))[0].numpy()
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
