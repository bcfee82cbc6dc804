"""SyncBN: with bn_axis set, BatchNorm moments computed on a data-sharded
batch must equal the full-batch (unsharded) moments — the psum'd-moments
analogue of the reference's sync_batchnorm package (SURVEY.md section 2.6)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mp_hsir_tpu.models.classifier import FFCResNet
from mp_hsir_tpu.parallel.mesh import make_mesh
from mp_hsir_tpu.training.checkpoint import _flatten


def test_syncbn_stats_match_full_batch():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    kw = dict(in_channel=4, layers=(1, 1, 1, 1), inplanes=16,
              num_classes=5, size=(32, 32))
    model = FFCResNet(**kw)
    model_sync = FFCResNet(bn_axis="data", **kw)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (4, 4, 32, 32)).astype(np.float32))
    variables = jax.jit(lambda r: model.init(r, x[:1], train=False))(jax.random.key(0))

    # unsharded: one train step over the full batch
    _, want = jax.jit(
        lambda v, xx: model.apply(v, xx, train=True, mutable=["batch_stats"])
    )(variables, x)

    mesh = make_mesh(data=2)

    def local(v, xx):
        _, mut = model_sync.apply(v, xx, train=True, mutable=["batch_stats"])
        return mut

    f_sh = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P("data")), out_specs=P(),
        check_vma=False,
    ))
    got = f_sh(variables, x)

    a = _flatten(want["batch_stats"])
    b = _flatten(got["batch_stats"])
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(np.asarray(b[k]), np.asarray(a[k]),
                                   atol=1e-5, rtol=1e-4, err_msg=str(k))
