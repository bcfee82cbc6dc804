"""Full-model numerical parity against the ACTUAL PyTorch reference.

Imports /root/reference/net/MP_HSIR.py (clip/timm stubbed — see
ref_torch.py), builds the same tiny config on both sides, converts the real
torch state_dict through training/checkpoint.py, and asserts forward parity.
This is the strongest parity proof obtainable without published checkpoints:
it exercises every converted tensor and every layer of the real reference
network end to end (reference: net/MP_HSIR.py:763-844).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mp_hsir_tpu.config import ModelConfig
from mp_hsir_tpu.models.mp_hsir import MPHSIRNet, init_params
from mp_hsir_tpu.training.checkpoint import _flatten, convert_torch_state

from ref_torch import reference_mp_hsir

torch = pytest.importorskip("torch")

TINY = ModelConfig(
    in_channels=5, out_channels=5, dim=16, num_blocks=(1, 1, 1),
    num_refinement_blocks=1, heads=(2, 2, 2), task_classes=6,
)


@pytest.fixture(scope="module")
def ref_net():
    mod = reference_mp_hsir()
    torch.manual_seed(7)
    net = mod.MP_HSIR_Net(
        in_channel=TINY.in_channels, out_channel=TINY.out_channels,
        dim=TINY.dim, num_blocks=list(TINY.num_blocks),
        window_size=list(TINY.window_size), task_classes=TINY.task_classes,
        num_refinement_blocks=TINY.num_refinement_blocks,
        heads=list(TINY.heads),
    )
    return net.eval()


@pytest.fixture(scope="module")
def converted(ref_net):
    sd = {k: v.detach().float().numpy() for k, v in ref_net.state_dict().items()}
    target = init_params(TINY, jax.random.key(0), sample_hw=32)
    params, report = convert_torch_state(sd, target)
    return params, report, target


def test_every_reference_tensor_converts(converted):
    """The real reference state_dict must cover the whole flax tree: no
    unmatched torch keys, no shape skips, every flax leaf written."""
    params, report, target = converted
    assert not report["unmatched"], f"unmatched: {report['unmatched'][:8]}"
    assert not report["shape_skipped"], f"shape-skipped: {report['shape_skipped'][:8]}"
    assert len(report["loaded"]) == len(_flatten(target))


@pytest.mark.parametrize("task_id", [0, 3])
def test_forward_parity_vs_reference(ref_net, converted, task_id):
    """fp32 forward of the converted model matches the torch reference on a
    random 32x32 cube (reference forward: net/MP_HSIR.py:810-844)."""
    params, _, _ = converted
    rng = np.random.default_rng(11 + task_id)
    x = rng.uniform(0.0, 1.0, (1, TINY.in_channels, 32, 32)).astype(np.float32)

    with torch.no_grad():
        want = ref_net(torch.from_numpy(x), torch.tensor([task_id])).numpy()

    model = MPHSIRNet(TINY)
    fwd = jax.jit(lambda p, xx, t: model.apply({"params": p}, xx, t, deterministic=True))
    got = np.asarray(fwd(params, jnp.asarray(x), jnp.asarray([task_id], jnp.int32)))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_mixed_task_label_parity(ref_net, converted):
    """(B, 2) mixed-task ids average one-hots identically on both sides
    (reference: net/MP_HSIR.py:519-525)."""
    params, _, _ = converted
    rng = np.random.default_rng(3)
    x = rng.uniform(0.0, 1.0, (1, TINY.in_channels, 32, 32)).astype(np.float32)
    pair = np.array([[1, 4]], dtype=np.int64)

    with torch.no_grad():
        want = ref_net(torch.from_numpy(x), torch.from_numpy(pair)).numpy()

    model = MPHSIRNet(TINY)
    fwd = jax.jit(lambda p, xx, t: model.apply({"params": p}, xx, t, deterministic=True))
    got = np.asarray(fwd(params, jnp.asarray(x), jnp.asarray(pair, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
