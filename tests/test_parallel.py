"""Multi-device sharding tests on the 8-device virtual CPU mesh — the
JAX-idiomatic way to validate the multi-chip path without a TPU pod
(SURVEY.md section 4 implications)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl8_tpu import AlgorithmConfig, RecurrentAlgorithmConfig
from rl8_tpu.data import DataKeys
from rl8_tpu.env import DiscreteDummyEnv
from rl8_tpu.parallel import ENV_AXIS, create_mesh, shard_state

NUM_ENVS = 16
HORIZON = 4


def test_create_mesh_over_all_devices() -> None:
    mesh = create_mesh()
    assert mesh.shape[ENV_AXIS] == 8


def test_sharded_state_placement() -> None:
    mesh = create_mesh()
    algo = AlgorithmConfig(
        num_envs=NUM_ENVS,
        horizon=HORIZON,
        model_config={"hiddens": (8,)},
        mesh=mesh,
    ).build(DiscreteDummyEnv)
    # Env-batched leaves sharded over devices; params replicated.
    env_leaf = algo.state.env_state["position"]
    assert len(env_leaf.sharding.device_set) == 8
    buffer_leaf = algo.state.buffer[DataKeys.OBS]
    assert not buffer_leaf.sharding.is_fully_replicated
    params_leaf = jax.tree_util.tree_leaves(algo.state.params)[0]
    assert params_leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_sharded_training_matches_single_device() -> None:
    """GSPMD exact mode computes bit-equal math to single-device
    execution (global program, global reductions)."""
    kwargs = dict(
        num_envs=NUM_ENVS,
        horizon=HORIZON,
        model_config={"hiddens": (8,)},
        seed=3,
        entropy_coeff=0.01,
    )
    single = AlgorithmConfig(**kwargs).build(DiscreteDummyEnv)
    single.collect()
    stats_single = single.step()

    sharded = AlgorithmConfig(
        **kwargs, mesh=create_mesh(), exact_sharding=True
    ).build(DiscreteDummyEnv)
    sharded.collect()
    stats_sharded = sharded.step()

    for key in ("losses/total", "losses/policy", "losses/vf", "monitors/kl_div"):
        assert abs(stats_single[key] - stats_sharded[key]) < 1e-4, key
    params_a = jax.device_get(single.state.params)
    params_b = jax.device_get(sharded.state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        params_a,
        params_b,
    )


@pytest.mark.slow
def test_sharded_training_learns() -> None:
    mesh = create_mesh()
    algo = AlgorithmConfig(
        num_envs=128,
        horizon=16,
        seed=1,
        model_config={"hiddens": (32, 32)},
        mesh=mesh,
    ).build(DiscreteDummyEnv)
    first = None
    for _ in range(20):
        stats = algo.collect(env_config={"bounds": 10.0})
        if first is None:
            first = stats["returns/mean"]
        algo.step()
    assert stats["returns/mean"] > first


@pytest.mark.slow
def test_sharded_recurrent_trains() -> None:
    mesh = create_mesh()
    algo = RecurrentAlgorithmConfig(
        num_envs=NUM_ENVS,
        horizon=HORIZON,
        seq_len=2,
        seqs_per_state_reset=2,
        model_config={"hidden_size": 8},
        mesh=mesh,
    ).build(DiscreteDummyEnv)
    algo.collect()
    stats = algo.step()
    assert "losses/total" in stats


def test_shard_state_helper_specs() -> None:
    mesh = create_mesh()
    algo = AlgorithmConfig(
        num_envs=NUM_ENVS, horizon=HORIZON, model_config={"hiddens": (8,)}
    ).build(DiscreteDummyEnv)
    state = shard_state(algo.state, mesh, NUM_ENVS)
    # Time-major buffer leaves shard along axis 1 (the env axis).
    rewards = state.buffer[DataKeys.REWARDS]
    spec = rewards.sharding.spec
    assert spec[1] == ENV_AXIS


@pytest.mark.slow
def test_shard_map_training_statistically_consistent() -> None:
    """The default shard_map mode uses per-shard RNG streams (rollouts
    differ bit-wise from single-device at equal seeds) but preserves
    GLOBAL semantics: stats reduce over all shards, params stay
    replicated, gradients average, and the policy learns."""
    mesh = create_mesh()
    algo = AlgorithmConfig(
        num_envs=128,
        horizon=16,
        seed=1,
        model_config={"hiddens": (32, 32)},
        entropy_coeff=0.01,
        mesh=mesh,
    ).build(DiscreteDummyEnv)
    assert algo._axis is not None  # shard_map mode
    first = None
    for _ in range(20):
        stats = algo.collect(env_config={"bounds": 10.0})
        if first is None:
            first = stats["returns/mean"]
        step_stats = algo.step()
    assert stats["returns/mean"] > first
    assert stats["returns/min"] <= stats["returns/mean"] <= stats["returns/max"]
    assert "losses/total" in step_stats
    # Params remain replicated (every shard applied identical updates).
    leaf = jax.tree_util.tree_leaves(algo.state.params)[0]
    assert leaf.sharding.is_fully_replicated
    shards = [np.asarray(x.data) for x in leaf.addressable_shards]
    for other in shards[1:]:
        np.testing.assert_array_equal(shards[0], other)


@pytest.mark.slow
def test_shard_map_fused_train_steps() -> None:
    """The fused multi-step train path works under shard_map too."""
    mesh = create_mesh()
    algo = AlgorithmConfig(
        num_envs=NUM_ENVS,
        horizon=HORIZON,
        model_config={"hiddens": (8,)},
        mesh=mesh,
    ).build(DiscreteDummyEnv)
    records = algo.train_steps(3)
    assert len(records) == 3
    assert all("losses/total" in r for r in records)


@pytest.mark.slow
def test_shard_map_global_stat_reductions() -> None:
    """Collect stats are global: an 8-shard run's return stats must span
    the full batch, not one shard (min <= mean <= max with a nonzero
    spread for random policies)."""
    mesh = create_mesh()
    algo = AlgorithmConfig(
        num_envs=64,
        horizon=8,
        seed=0,
        model_config={"hiddens": (8,)},
        mesh=mesh,
    ).build(DiscreteDummyEnv)
    stats = algo.collect(env_config={"bounds": 10.0})
    assert stats["returns/min"] < stats["returns/max"]
    assert stats["returns/std"] > 0.0


def test_gstd_is_cancellation_safe() -> None:
    """Global std must be centered (two-pass): huge means with small
    spreads would cancel catastrophically in E[x^2] - E[x]^2 form."""
    from functools import partial

    from rl8_tpu.parallel import gstd

    mesh = create_mesh()
    x = 1e5 + jnp.linspace(0.0, 1.0, 64).reshape(8, 8)

    fn = jax.jit(
        jax.shard_map(
            partial(gstd, axis_name=ENV_AXIS),
            mesh=mesh,
            in_specs=jax.sharding.PartitionSpec(ENV_AXIS),
            out_specs=jax.sharding.PartitionSpec(),
            check_vma=False,
        )
    )
    np.testing.assert_allclose(
        float(fn(x)), float(jnp.std(x, ddof=1)), rtol=1e-3
    )


def test_state_pspecs_ignore_coincidental_dims() -> None:
    """Param/optimizer leaves whose dims equal num_envs must stay
    replicated: spec classification is field-based, not shape-based."""
    from jax.sharding import PartitionSpec as P

    from rl8_tpu.parallel import state_pspecs

    # hidden width == num_envs == horizon-ish: the classic collision.
    algo = AlgorithmConfig(
        num_envs=16, horizon=4, model_config={"hiddens": (16, 16)}
    ).build(DiscreteDummyEnv)
    specs = state_pspecs(algo.state, 16)
    for leaf in jax.tree_util.tree_leaves(
        (specs.params, specs.opt_state), is_leaf=lambda x: isinstance(x, P)
    ):
        assert leaf == P(), leaf
    assert specs.buffer[DataKeys.REWARDS] == P(None, ENV_AXIS)
    assert specs.env_state["position"] == P(ENV_AXIS)


@pytest.mark.slow
def test_shard_map_with_coincidental_hidden_width_trains() -> None:
    """End-to-end: shard_map training works when hiddens == num_envs."""
    algo = AlgorithmConfig(
        num_envs=16,
        horizon=4,
        model_config={"hiddens": (16,)},
        mesh=create_mesh(),
    ).build(DiscreteDummyEnv)
    algo.collect()
    stats = algo.step()
    assert "losses/total" in stats


def test_ambiguous_env_state_leaf_rejected() -> None:
    """An env-state leaf carrying ``num_envs`` on a non-leading axis
    (``[K, num_envs]``) must be loudly rejected, never silently sharded
    on the wrong axis."""
    import pytest

    from rl8_tpu.parallel import _batch_leaf_spec

    with pytest.raises(ValueError, match="Ambiguous"):
        _batch_leaf_spec(jnp.zeros((3, 16)), 16, ENV_AXIS)
    # Batch-leading leaves and unbatched scalars classify fine.
    assert _batch_leaf_spec(jnp.zeros((16, 3)), 16, ENV_AXIS) == (
        jax.sharding.PartitionSpec(ENV_AXIS)
    )
    assert _batch_leaf_spec(jnp.zeros(()), 16, ENV_AXIS) == (
        jax.sharding.PartitionSpec()
    )
    # Time-major buffer leaves classify on axis 1 only.
    assert _batch_leaf_spec(
        jnp.zeros((4, 16, 1)), 16, ENV_AXIS, True
    ) == jax.sharding.PartitionSpec(None, ENV_AXIS)
    with pytest.raises(ValueError, match="Ambiguous"):
        _batch_leaf_spec(jnp.zeros((16, 3, 1)), 16, ENV_AXIS, True)


def test_ambiguous_env_state_shard_state_rejected() -> None:
    """`shard_state` surfaces the ambiguity error for adversarial env
    states end to end."""
    import pytest

    from rl8_tpu.parallel import shard_state

    algo = AlgorithmConfig(
        num_envs=16, horizon=4, model_config={"hiddens": (8,)}
    ).build(DiscreteDummyEnv)
    bad_state = algo.state.replace(
        env_state={**algo.state.env_state, "table": jnp.zeros((3, 16))}
    )
    with pytest.raises(ValueError, match="Ambiguous"):
        shard_state(bad_state, create_mesh(), 16)


def test_create_mesh_multi_slice_orders_ici_inner_dcn_outer() -> None:
    """Devices spanning 2 slices (DCN-connected) come out grouped
    slice-contiguous — ICI-inner/DCN-outer — so the gradient all-reduce
    decomposes hierarchically instead of threading one ring across
    arbitrary ICI/DCN interleavings (SURVEY section 2.3: DCN only for
    multi-slice scale-out)."""

    class FakeDevice:
        platform = "cpu"
        device_kind = "cpu"

        def __init__(self, id, slice_index, process_index=0):
            self.id = id
            self.slice_index = slice_index
            self.process_index = process_index

    # Worst-case input: slices interleaved device by device.
    devices = [FakeDevice(i, slice_index=i % 2) for i in range(8)]
    mesh = create_mesh(devices)
    order = [d.slice_index for d in mesh.devices.ravel()]
    assert order == [0] * 4 + [1] * 4, order

    # Three slices, shuffled input.
    devices = [FakeDevice(i, slice_index=i % 3) for i in range(12)]
    devices = devices[::-1]
    mesh = create_mesh(devices)
    order = [d.slice_index for d in mesh.devices.ravel()]
    for s in set(order):
        first = order.index(s)
        assert order[first : first + 4] == [s] * 4, order

    # Single-slice and slice-less (CPU) device lists still mesh fine.
    mesh = create_mesh(jax.devices())
    assert mesh.devices.size == len(jax.devices())
    mesh = create_mesh(jax.devices()[:3])
    assert mesh.devices.size == 3


def test_shard_state_places_every_field() -> None:
    """shard_state is field-driven: state-subclass extras (e.g.
    RecurrentAlgorithmState.seqs) are globally placed like their
    siblings — a field silently left process-local would break the
    first multi-host step."""
    import dataclasses

    import jax

    from rl8_tpu import RecurrentAlgorithmConfig
    from rl8_tpu.env import DiscreteDummyEnv
    from rl8_tpu.parallel import create_mesh

    algo = RecurrentAlgorithmConfig(
        num_envs=16,
        horizon=4,
        seq_len=2,
        seqs_per_state_reset=2,
        model_config={"hidden_size": 8},
        mesh=create_mesh(),
    ).build(DiscreteDummyEnv)
    n = len(jax.devices())
    for field in dataclasses.fields(algo.state):
        for leaf in jax.tree_util.tree_leaves(getattr(algo.state, field.name)):
            assert len(leaf.sharding.device_set) == n, field.name


def test_create_mesh_multi_slice_fallback_warns(monkeypatch) -> None:
    """When the slice-aware layout can't be built for a MULTI-slice
    device list, the fallback to arbitrary order is loud (cross-slice
    collectives may ride DCN suboptimally)."""
    import warnings

    import pytest
    from jax.experimental import mesh_utils

    from rl8_tpu.parallel import create_mesh

    class FakeDevice:
        def __init__(self, id, slice_index):
            self.id = id
            self.slice_index = slice_index
            self.process_index = 0
            self.platform = "cpu"

        def __repr__(self):
            return f"fake:{self.id}"

    def boom(*args, **kwargs):
        raise NotImplementedError("no topology info for fakes")

    monkeypatch.setattr(mesh_utils, "create_hybrid_device_mesh", boom)
    devices = [FakeDevice(i, slice_index=i % 2) for i in range(8)]
    with pytest.warns(RuntimeWarning, match="slice-aware"):
        mesh = create_mesh(devices)
    assert mesh.devices.size == 8

    # Single-slice fallbacks stay silent (benign: all-to-all ICI).
    monkeypatch.setattr(mesh_utils, "create_device_mesh", boom)
    single = [FakeDevice(i, slice_index=0) for i in range(4)]
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        mesh = create_mesh(single)
    assert mesh.devices.size == 4


@pytest.mark.slow
def test_two_slice_hybrid_mesh_train_step() -> None:
    """A full shard_map train step executes over a mesh laid out by the
    MULTI-SLICE (ICI-inner/DCN-outer) ordering path.

    CPU devices carry no ``slice_index``, so the hybrid layout is
    computed on stand-in device objects (two interleaved fake slices)
    via ``_order_devices`` and mapped back onto the real devices — the
    resulting mesh is in genuinely hybrid (non-default) device order,
    and the fused collect + PPO update runs over it end to end."""
    from rl8_tpu.parallel import _order_devices

    real = jax.devices()[:8]

    class FakeDevice:
        platform = "cpu"
        device_kind = "cpu"

        def __init__(self, id, slice_index):
            self.id = id
            self.slice_index = slice_index
            self.process_index = 0

    # Worst-case input: the two slices interleaved device by device.
    fakes = [FakeDevice(i, slice_index=i % 2) for i in range(8)]
    ordered = _order_devices(fakes)
    order = [f.slice_index for f in ordered]
    assert order == [0] * 4 + [1] * 4, order  # slice-contiguous

    from jax.sharding import Mesh

    mesh = Mesh(np.asarray([real[f.id] for f in ordered]), (ENV_AXIS,))
    algo = AlgorithmConfig(
        num_envs=NUM_ENVS,
        horizon=HORIZON,
        model_config={"hiddens": (8,)},
        seed=5,
        entropy_coeff=0.01,
        mesh=mesh,
    ).build(DiscreteDummyEnv)
    algo.collect()
    stats = algo.step()
    assert np.isfinite(stats["losses/total"])
    fused = algo.train_steps(2)
    assert all(np.isfinite(s["losses/total"]) for s in fused)
