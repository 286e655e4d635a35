"""maximum_path DP vs a straightforward numpy implementation of the
published VITS algorithm (the reference's Cython monotonic_align,
used at lib/infer_pack/models.py:1353)."""
import numpy as np

import jax.numpy as jnp

from rvc_tpu.ops.monotonic_align import maximum_path


def _maximum_path_np(value, t_y, t_x):
    """Reference algorithm (per-sample, O(t_y*t_x))."""
    v = value[:t_y, :t_x].copy().astype(np.float64)
    for y in range(t_y):
        for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
            v_cur = -np.inf if x == y else v[y - 1, x]
            if x == 0:
                v_prev = 0.0 if y == 0 else -np.inf
            else:
                v_prev = v[y - 1, x - 1]
            v[y, x] += max(v_prev, v_cur)
    path = np.zeros_like(value)
    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[y, index] = 1
        if index != 0 and (index == y or v[y - 1, index] < v[y - 1, index - 1]):
            index -= 1
    return path


def test_maximum_path_matches_reference_algorithm(rng):
    B, T_y, T_x = 4, 13, 7
    neg_cent = rng.standard_normal((B, T_y, T_x)).astype(np.float32)
    t_ys = [13, 10, 8, 7]
    t_xs = [7, 5, 3, 7]
    mask = np.zeros((B, T_y, T_x), np.float32)
    for b in range(B):
        mask[b, : t_ys[b], : t_xs[b]] = 1

    got = np.asarray(maximum_path(jnp.asarray(neg_cent), jnp.asarray(mask)))
    for b in range(B):
        want = _maximum_path_np(neg_cent[b], t_ys[b], t_xs[b])
        np.testing.assert_array_equal(got[b], want, err_msg=f"sample {b}")


def test_maximum_path_properties(rng):
    """Monotonic non-decreasing path covering exactly one x per valid y."""
    B, T_y, T_x = 2, 20, 9
    neg_cent = rng.standard_normal((B, T_y, T_x)).astype(np.float32)
    mask = np.ones((B, T_y, T_x), np.float32)
    path = np.asarray(maximum_path(jnp.asarray(neg_cent), jnp.asarray(mask)))
    assert np.all(path.sum(-1) == 1)  # one token per frame
    idx = path.argmax(-1)
    assert np.all(np.diff(idx, axis=1) >= 0)  # monotonic
    assert np.all(idx[:, 0] == 0) and np.all(idx[:, -1] == T_x - 1)
