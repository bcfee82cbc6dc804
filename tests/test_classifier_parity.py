"""FFCResNet numerical parity against the ACTUAL PyTorch reference
classifier (/root/reference/net/classifier.py:416), with the real torch
state_dict converted through convert_torch_classifier_state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mp_hsir_tpu.models.classifier import FFCResNet
from mp_hsir_tpu.training.checkpoint import _flatten, convert_torch_classifier_state

from ref_torch import reference_classifier

torch = pytest.importorskip("torch")

IN_CH, INPLANES, NUM_CLASSES, SIZE = 5, 16, 5, (64, 64)
LAYERS = (1, 1, 1, 1)


@pytest.fixture(scope="module")
def both_models():
    mod = reference_classifier()
    torch.manual_seed(5)
    ref = mod.FFCResNet(
        list(LAYERS), in_channel=IN_CH, inplanes=INPLANES, size=SIZE,
        num_classes=NUM_CLASSES,
    ).eval()
    # perturb running stats away from (0, 1) so the test actually checks
    # running_mean/var conversion, not just fresh-BN luck
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.4)

    model = FFCResNet(
        in_channel=IN_CH, layers=LAYERS, inplanes=INPLANES,
        num_classes=NUM_CLASSES, size=SIZE,
    )
    x0 = jnp.zeros((1, IN_CH, 32, 32), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x0, train=False))(jax.random.key(0))

    sd = {k: v.detach().float().numpy() for k, v in ref.state_dict().items()}
    new_vars, report = convert_torch_classifier_state(sd, variables)
    return ref, model, new_vars, report, variables


def test_every_classifier_tensor_converts(both_models):
    _, _, _, report, variables = both_models
    assert not report["unmatched"], f"unmatched: {report['unmatched'][:8]}"
    assert not report["shape_skipped"], f"shape-skipped: {report['shape_skipped'][:8]}"
    want = len(_flatten(variables["params"])) + len(_flatten(variables["batch_stats"]))
    assert len(report["loaded"]) == want


def test_classifier_forward_parity(both_models):
    ref, model, new_vars, _, _ = both_models
    rng = np.random.default_rng(21)
    x = rng.uniform(0.0, 1.0, (2, IN_CH, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    fwd = jax.jit(lambda v, xx: model.apply(v, xx, train=False))
    got = np.asarray(fwd(new_vars, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)
