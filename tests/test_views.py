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
