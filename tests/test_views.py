"""Table-driven golden tests for views, mirroring the strategy of
``/root/reference/tests/test_views.py``."""

import jax.numpy as jnp
import numpy as np
import pytest

from rl8_tpu.data import DataKeys
from rl8_tpu.views import (
    PaddedRollingWindow,
    RollingWindow,
    ViewRequirement,
    pad_last_sequence,
    pad_whole_sequence,
    rolling_window,
)

# x: [B=2, T=4, F=1]
X = jnp.arange(8, dtype=jnp.float32).reshape(2, 4, 1)


def test_rolling_window_shapes_and_values() -> None:
    w = rolling_window(X, 2)
    assert w.shape == (2, 3, 2, 1)
    np.testing.assert_array_equal(
        np.asarray(w[0, :, :, 0]), [[0, 1], [1, 2], [2, 3]]
    )
    w3 = rolling_window(X, 3)
    assert w3.shape == (2, 2, 3, 1)
    w_step = rolling_window(X, 2, step=2)
    assert w_step.shape == (2, 2, 2, 1)
    np.testing.assert_array_equal(np.asarray(w_step[0, :, :, 0]), [[0, 1], [2, 3]])


def test_pad_last_sequence_no_padding_needed() -> None:
    out = pad_last_sequence(X, 2)
    assert out[DataKeys.INPUTS].shape == (2, 2, 1)
    np.testing.assert_array_equal(np.asarray(out[DataKeys.INPUTS][0, :, 0]), [2, 3])
    assert not bool(out[DataKeys.PADDING_MASK].any())


def test_pad_last_sequence_with_padding() -> None:
    out = pad_last_sequence(X, 6)
    assert out[DataKeys.INPUTS].shape == (2, 6, 1)
    np.testing.assert_array_equal(
        np.asarray(out[DataKeys.INPUTS][0, :, 0]), [0, 0, 0, 1, 2, 3]
    )
    np.testing.assert_array_equal(
        np.asarray(out[DataKeys.PADDING_MASK][0]),
        [True, True, False, False, False, False],
    )


def test_pad_whole_sequence() -> None:
    out = pad_whole_sequence(X, 3)
    assert out[DataKeys.INPUTS].shape == (2, 6, 1)
    np.testing.assert_array_equal(
        np.asarray(out[DataKeys.INPUTS][0, :, 0]), [0, 0, 0, 1, 2, 3]
    )
    np.testing.assert_array_equal(
        np.asarray(out[DataKeys.PADDING_MASK][0]),
        [True, True, False, False, False, False],
    )


def test_rolling_window_view_apply_all() -> None:
    out = RollingWindow.apply_all(X, 2)
    # [B * (T - size + 1), size, F] = [6, 2, 1]
    assert out.shape == (6, 2, 1)
    np.testing.assert_array_equal(
        np.asarray(out[:, :, 0]),
        [[0, 1], [1, 2], [2, 3], [4, 5], [5, 6], [6, 7]],
    )


def test_rolling_window_view_apply_last() -> None:
    out = RollingWindow.apply_last(X, 3)
    assert out.shape == (2, 3, 1)
    np.testing.assert_array_equal(np.asarray(out[1, :, 0]), [5, 6, 7])
    assert RollingWindow.drop_size(3) == 2


def test_padded_rolling_window_apply_all() -> None:
    out = PaddedRollingWindow.apply_all(X, 2)
    # [B * T, size, F] = [8, 2, 1]
    assert out[DataKeys.INPUTS].shape == (8, 2, 1)
    np.testing.assert_array_equal(
        np.asarray(out[DataKeys.INPUTS][:4, :, 0]),
        [[0, 0], [0, 1], [1, 2], [2, 3]],
    )
    np.testing.assert_array_equal(
        np.asarray(out[DataKeys.PADDING_MASK][:4]),
        [[True, False], [False, False], [False, False], [False, False]],
    )
    assert PaddedRollingWindow.drop_size(2) == 0


def test_padded_rolling_window_apply_last() -> None:
    out = PaddedRollingWindow.apply_last(X, 6)
    assert out[DataKeys.INPUTS].shape == (2, 6, 1)
    assert out[DataKeys.PADDING_MASK].shape == (2, 6)


def test_view_requirement_shift_zero() -> None:
    batch = {DataKeys.OBS: X}
    vr = ViewRequirement(shift=0)
    out_all = vr.apply_all(DataKeys.OBS, batch)
    assert out_all.shape == (8, 1)
    out_last = vr.apply_last(DataKeys.OBS, batch)
    assert out_last.shape == (2, 1)
    np.testing.assert_array_equal(np.asarray(out_last[:, 0]), [3, 7])
    assert vr.drop_size == 0


def test_view_requirement_shifted_padded() -> None:
    batch = {DataKeys.OBS: X}
    vr = ViewRequirement(shift=1, method="padded_rolling_window")
    out = vr.apply_all(DataKeys.OBS, batch)
    assert out[DataKeys.INPUTS].shape == (8, 2, 1)
    out_last = vr.apply_last(DataKeys.OBS, batch)
    assert out_last[DataKeys.INPUTS].shape == (2, 2, 1)
    assert vr.drop_size == 0


def test_view_requirement_shifted_rolling() -> None:
    batch = {DataKeys.OBS: X}
    vr = ViewRequirement(shift=1, method="rolling_window")
    out = vr.apply_all(DataKeys.OBS, batch)
    assert out.shape == (6, 2, 1)
    assert vr.drop_size == 1


def test_view_requirement_nested_key() -> None:
    batch = {DataKeys.OBS: {"prices": X}}
    vr = ViewRequirement(shift=0)
    out = vr.apply_last((DataKeys.OBS, "prices"), batch)
    assert out.shape == (2, 1)


def test_view_requirement_negative_shift_raises() -> None:
    with pytest.raises(ValueError):
        ViewRequirement(shift=-1)


def test_views_on_pytree_batch() -> None:
    batch = {"a": X, "b": X + 100}
    out = RollingWindow.apply_all(batch, 2)
    assert out["a"].shape == (6, 2, 1)
    assert out["b"].shape == (6, 2, 1)


# ---------------------------------------------------------------------------
# Reference golden tables (`/root/reference/tests/test_views.py:15-505`):
# every parametrized case ported 1:1, with the same construction style —
# hand-built pad/window arrays, literal expected values.
# ---------------------------------------------------------------------------


def _arange(*shape):
    return jnp.arange(int(np.prod(shape)), dtype=jnp.float32).reshape(*shape)


def _assert_view_equal(actual, expected) -> None:
    """Structural equality over {INPUTS, PADDING_MASK} dicts / bare arrays."""
    if isinstance(expected, dict):
        assert isinstance(actual, dict) and set(actual) == set(expected)
        for k in expected:
            _assert_view_equal(actual[k], expected[k])
    else:
        np.testing.assert_array_equal(np.asarray(actual), np.asarray(expected))


# pad_last_sequence (reference cases 0-3, `test_views.py:15-107`)
PAD_LAST_CASES = [
    # (inputs, expected_inputs, expected_mask, size)
    (  # B=4, T=1, SIZE=2: left-pad one zero per row
        _arange(4, 1),
        jnp.asarray([[0, 0], [0, 1], [0, 2], [0, 3]], jnp.float32),
        jnp.asarray([[1, 0]] * 4, bool),
        2,
    ),
    (  # B=2, T=2, SIZE=2: no padding needed
        _arange(2, 2, 2),
        _arange(2, 2, 2),
        jnp.zeros((2, 2), bool),
        2,
    ),
    (  # B=2, T=4, SIZE=2, trailing [1,1,1] feature dims: tail selection
        _arange(2, 4, 1, 1, 1),
        _arange(2, 4, 1, 1, 1)[:, -2:, ...],
        jnp.zeros((2, 2), bool),
        2,
    ),
    (  # B=2, T=1, SIZE=3: two pad slots
        _arange(2, 1, 1, 1, 1),
        jnp.concatenate(
            [jnp.zeros((2, 2, 1, 1, 1)), _arange(2, 1, 1, 1, 1)], axis=1
        ),
        jnp.asarray([[1, 1, 0]] * 2, bool),
        3,
    ),
]


@pytest.mark.parametrize("inputs,exp_inputs,exp_mask,size", PAD_LAST_CASES)
def test_pad_last_sequence_golden(inputs, exp_inputs, exp_mask, size) -> None:
    out = pad_last_sequence(inputs, size)
    _assert_view_equal(
        out, {DataKeys.INPUTS: exp_inputs, DataKeys.PADDING_MASK: exp_mask}
    )


# pad_whole_sequence (reference cases 0-3, `test_views.py:110-207`)
PAD_WHOLE_CASES = [
    (  # B=4, T=1, SIZE=2
        _arange(4, 1),
        jnp.asarray([[0, 0], [0, 1], [0, 2], [0, 3]], jnp.float32),
        jnp.asarray([[1, 0]] * 4, bool),
        2,
    ),
    (  # B=2, T=2, SIZE=2
        _arange(2, 2, 2),
        jnp.concatenate([jnp.zeros((2, 1, 2)), _arange(2, 2, 2)], axis=1),
        jnp.asarray([[1, 0, 0]] * 2, bool),
        2,
    ),
    (  # B=2, T=4, SIZE=2, trailing [1,1,1] dims
        _arange(2, 4, 1, 1, 1),
        jnp.concatenate(
            [jnp.zeros((2, 1, 1, 1, 1)), _arange(2, 4, 1, 1, 1)], axis=1
        ),
        jnp.asarray([[1, 0, 0, 0, 0]] * 2, bool),
        2,
    ),
    (  # B=2, T=1, SIZE=3
        _arange(2, 1, 1, 1, 1),
        jnp.concatenate(
            [jnp.zeros((2, 2, 1, 1, 1)), _arange(2, 1, 1, 1, 1)], axis=1
        ),
        jnp.asarray([[1, 1, 0]] * 2, bool),
        3,
    ),
]


@pytest.mark.parametrize("inputs,exp_inputs,exp_mask,size", PAD_WHOLE_CASES)
def test_pad_whole_sequence_golden(inputs, exp_inputs, exp_mask, size) -> None:
    out = pad_whole_sequence(inputs, size)
    _assert_view_equal(
        out, {DataKeys.INPUTS: exp_inputs, DataKeys.PADDING_MASK: exp_mask}
    )


# PaddedRollingWindow.apply_all (reference cases 0-1, `test_views.py:210-259`):
# expected = RollingWindow.apply_all over hand-built padded arrays, exactly
# the reference's construction.
PADDED_RW_ALL_CASES = [
    (  # B=2, T=1, SIZE=2
        {"x": _arange(2, 1)},
        {
            "x": {
                DataKeys.INPUTS: RollingWindow.apply_all(
                    jnp.concatenate([jnp.zeros((2, 1)), _arange(2, 1)], axis=1), 2
                ),
                DataKeys.PADDING_MASK: RollingWindow.apply_all(
                    jnp.asarray([[1, 0]] * 2, bool), 2
                ),
            }
        },
        2,
    ),
    (  # B=2, T=4, SIZE=2
        {"x": _arange(2, 4, 1)},
        {
            "x": {
                DataKeys.INPUTS: RollingWindow.apply_all(
                    jnp.concatenate(
                        [jnp.zeros((2, 1, 1)), _arange(2, 4, 1)], axis=1
                    ),
                    2,
                ),
                DataKeys.PADDING_MASK: RollingWindow.apply_all(
                    jnp.asarray([[1, 0, 0, 0, 0]] * 2, bool), 2
                ),
            }
        },
        2,
    ),
]


@pytest.mark.parametrize("inputs,expected,size", PADDED_RW_ALL_CASES)
def test_padded_rolling_window_apply_all_golden(inputs, expected, size) -> None:
    _assert_view_equal(PaddedRollingWindow.apply_all(inputs, size), expected)


# PaddedRollingWindow.apply_last (reference cases 0-2, `test_views.py:262-329`)
PADDED_RW_LAST_CASES = [
    (  # B=2, T=1, SIZE=2
        {"x": _arange(2, 1)},
        {
            "x": {
                DataKeys.INPUTS: jnp.concatenate(
                    [jnp.zeros((2, 1)), _arange(2, 1)], axis=1
                ),
                DataKeys.PADDING_MASK: jnp.asarray([[1, 0]] * 2, bool),
            }
        },
        2,
    ),
    (  # B=2, T=4, SIZE=2: plain tail, no padding
        {"x": _arange(2, 4, 1)},
        {
            "x": {
                DataKeys.INPUTS: _arange(2, 4, 1)[:, -2:, ...],
                DataKeys.PADDING_MASK: jnp.zeros((2, 2), bool),
            }
        },
        2,
    ),
    (  # B=2, T=1, SIZE=3
        {"x": _arange(2, 1, 1)},
        {
            "x": {
                DataKeys.INPUTS: jnp.concatenate(
                    [jnp.zeros((2, 2, 1)), _arange(2, 1, 1)], axis=1
                ),
                DataKeys.PADDING_MASK: jnp.asarray([[1, 1, 0]] * 2, bool),
            }
        },
        3,
    ),
]


@pytest.mark.parametrize("inputs,expected,size", PADDED_RW_LAST_CASES)
def test_padded_rolling_window_apply_last_golden(inputs, expected, size) -> None:
    _assert_view_equal(PaddedRollingWindow.apply_last(inputs, size), expected)


# rolling_window (reference cases 0-1, `test_views.py:332-365`): literal values
ROLLING_WINDOW_CASES = [
    (
        _arange(2, 4),
        jnp.asarray(
            [[[0, 1], [1, 2], [2, 3]], [[4, 5], [5, 6], [6, 7]]], jnp.float32
        ),
        2,
    ),
    (
        _arange(2, 4, 1),
        jnp.asarray(
            [
                [[[0], [1]], [[1], [2]], [[2], [3]]],
                [[[4], [5]], [[5], [6]], [[6], [7]]],
            ],
            jnp.float32,
        ),
        2,
    ),
]


@pytest.mark.parametrize("inputs,expected,size", ROLLING_WINDOW_CASES)
def test_rolling_window_golden(inputs, expected, size) -> None:
    _assert_view_equal(rolling_window(inputs, size), expected)


# RollingWindow.apply_all (reference cases 0-1, `test_views.py:368-393`)
@pytest.mark.parametrize(
    "inputs,expected,size",
    [
        (ROLLING_WINDOW_CASES[0][0], ROLLING_WINDOW_CASES[0][1].reshape(-1, 2), 2),
        (
            ROLLING_WINDOW_CASES[1][0],
            ROLLING_WINDOW_CASES[1][1].reshape(-1, 2, 1),
            2,
        ),
    ],
)
def test_rolling_window_apply_all_golden(inputs, expected, size) -> None:
    _assert_view_equal(RollingWindow.apply_all(inputs, size), expected)


# RollingWindow.apply_last (reference cases 0-1, `test_views.py:396-431`)
@pytest.mark.parametrize(
    "inputs,size",
    [({"x": _arange(2, 4)}, 2), ({"x": _arange(2, 4, 1)}, 2)],
)
def test_rolling_window_apply_last_golden(inputs, size) -> None:
    out = RollingWindow.apply_last(inputs, size)
    _assert_view_equal(out, {"x": inputs["x"][:, -size:, ...]})


# ViewRequirement shift=0 apply_all/apply_last over flat and nested batches
# (reference cases, `test_views.py:434-505`; B=20, T=5)
@pytest.mark.parametrize(
    "batch,key,expected_all,expected_last",
    [
        (
            {"x": _arange(20, 5)},
            "x",
            _arange(20, 5).reshape(-1),
            _arange(20, 5)[:, -1],
        ),
        (
            {"x": {"y": _arange(20, 5, 1, 1)}},
            "x",
            {"y": _arange(20, 5, 1, 1).reshape(-1, 1, 1)},
            {"y": _arange(20, 5, 1, 1)[:, -1]},
        ),
    ],
)
def test_view_requirement_golden(batch, key, expected_all, expected_last) -> None:
    vr = ViewRequirement(shift=0)
    _assert_view_equal(vr.apply_all(key, batch), expected_all)
    _assert_view_equal(vr.apply_last(key, batch), expected_last)


# ---------------------------------------------------------------------------
# Shift x size x method x kind sweep against an independent numpy oracle —
# wider than the reference tables (which fix shift via SIZE only).
# ---------------------------------------------------------------------------


def _np_view(x: np.ndarray, shift: int, method: str, kind: str):
    """Straight-line numpy re-derivation of the reference view semantics
    (`/root/reference/src/rl8/views.py:312-453`)."""
    B, T = x.shape[:2]
    size = shift + 1
    if shift == 0:
        return x.reshape(-1, *x.shape[2:]) if kind == "all" else x[:, -1]
    if method == "rolling_window":
        if kind == "last":
            return x[:, -size:]
        wins = [x[:, s : s + size] for s in range(T - size + 1)]
        return np.stack(wins, axis=1).reshape(-1, size, *x.shape[2:])
    # padded_rolling_window
    pad = np.zeros((B, size - 1, *x.shape[2:]), x.dtype)
    mask_pad = np.ones((B, size - 1), bool)
    xp = np.concatenate([pad, x], axis=1)
    mp = np.concatenate([mask_pad, np.zeros((B, T), bool)], axis=1)
    if kind == "last":
        return {
            DataKeys.INPUTS: xp[:, -size:],
            DataKeys.PADDING_MASK: mp[:, -size:],
        }
    wins = [xp[:, s : s + size] for s in range(T)]
    mwins = [mp[:, s : s + size] for s in range(T)]
    return {
        DataKeys.INPUTS: np.stack(wins, axis=1).reshape(-1, size, *x.shape[2:]),
        DataKeys.PADDING_MASK: np.stack(mwins, axis=1).reshape(-1, size),
    }


@pytest.mark.parametrize("shift", [0, 1, 2, 3])
@pytest.mark.parametrize("method", ["rolling_window", "padded_rolling_window"])
@pytest.mark.parametrize("kind", ["all", "last"])
@pytest.mark.parametrize("T", [4, 6])
def test_view_requirement_sweep_vs_numpy_oracle(shift, method, kind, T) -> None:
    rng = np.random.default_rng(shift * 100 + T)
    x = rng.normal(size=(3, T, 2)).astype(np.float32)
    batch = {DataKeys.OBS: jnp.asarray(x)}
    vr = ViewRequirement(shift=shift, method=method)
    out = (
        vr.apply_all(DataKeys.OBS, batch)
        if kind == "all"
        else vr.apply_last(DataKeys.OBS, batch)
    )
    _assert_view_equal(out, _np_view(x, shift, method, kind))
