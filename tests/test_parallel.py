"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4 item
5: the pjit-sharding substitute for a fake backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from snsde.parallel import make_mesh, replicate, shard_batch


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(("data",))


def test_shard_batch_places_leading_dim(mesh):
    batch = {"x": np.ones((16, 4), np.float32),
             "y": np.arange(16, dtype=np.int64)}
    sharded = shard_batch(batch, mesh)
    shard_counts = {len(v.sharding.device_set) for v in sharded.values()}
    assert shard_counts == {8}


def test_data_parallel_fit_on_mesh(mesh):
    """fit_classifier with mesh: batch sharded across 8 devices, grads
    all-reduced by XLA, same learning behavior."""
    from snsde.data.common import preprocess_classification
    from snsde.data.synthetic import synthetic_uea
    from snsde.harness.classification import make_model
    from snsde.train.loop import TrainConfig, fit_classifier

    X, y, t = synthetic_uea(n=128, length=10, channels=3)
    data = preprocess_classification(X, y, seed=0)
    key = jax.random.PRNGKey(0)
    model, reg_fn = make_model(key, "neurallsde", data["input_channels"],
                               8, 8, 1, 4)
    times = data["times"]

    def apply_fn(m, batch, key, train):
        return m(times, batch["coeffs"], batch["final_index"], key=key,
                 train=train)

    tc = TrainConfig(num_classes=4, batch_size=32, max_epochs=2,
                     step_mode="valaccuracy", verbose=False)
    res = fit_classifier(model, apply_fn, reg_fn, data["train"],
                         data["val"], data["test"], tc, mesh=mesh)
    assert np.isfinite(res.test_metrics.loss)


def test_multichip_dryrun_entry():
    """The driver-facing dryrun must pass on the 8-device CPU mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_solve_matches_single_device(mesh):
    """Same key => identical SDE solution whether the batch lives on one
    device or is sharded across eight (order-independent Brownian)."""
    from snsde.ops.solve import sdeint

    key = jax.random.PRNGKey(0)
    ts = np.linspace(0, 1, 6)
    y0 = jnp.ones((16, 4))
    f = lambda t, y: -y
    g = lambda t, y: 0.1 * jnp.ones_like(y)
    ys_single = sdeint(f, g, y0, ts, key=key, dt=0.1)
    y0_sharded = jax.device_put(
        y0, jax.sharding.NamedSharding(mesh,
                                       jax.sharding.PartitionSpec("data"))
    )
    ys_sharded = sdeint(f, g, y0_sharded, ts, key=key, dt=0.1)
    np.testing.assert_allclose(np.asarray(ys_single),
                               np.asarray(ys_sharded), atol=1e-6)
