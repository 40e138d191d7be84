"""Type-2 NUFFT (uniform modes -> nonuniform points) vs the dense oracle.

The type-2 is the exact transpose of this library's type-1 (shared fine
grid, kernel, deconvolution; +i sign convention), so beyond oracle
accuracy we assert the transpose identity against the type-1 executor
itself. The reference consumes only finufft types 1 and 3 (ref
cpu/nufft.py:11-175); type-2 rounds out the standalone library for
degridding / model-prediction workflows.
"""

import numpy as np
import pytest

from fftvis_tpu.nufft import (
    direct_type2_np,
    make_type1_fn,
    make_type2_fn,
    plan_type1,
    plan_type2,
)


def _problem(rng, d, n, m_modes, kmax=12):
    x = rng.uniform(-np.pi, np.pi, size=(d, n))
    modes = rng.integers(-kmax, kmax + 1, size=(d, m_modes))
    f = rng.standard_normal((3, m_modes)) + 1j * rng.standard_normal((3, m_modes))
    return x, modes, f


@pytest.mark.parametrize("d", [1, 2, 3])
@pytest.mark.parametrize("eps", [1e-4, 1e-7, 1e-11])
def test_type2_matches_dense_oracle(d, eps):
    rng = np.random.default_rng(7 + d)
    x, modes, f = _problem(rng, d, n=57, m_modes=40)
    plan = plan_type2(x, modes, eps)
    out = np.asarray(make_type2_fn(plan)(f.astype(np.complex128)))
    ref = direct_type2_np(x, f, modes)
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 10 * eps


@pytest.mark.parametrize("sigma", [1.25, 2.0])
def test_type2_sigma_variants(sigma):
    rng = np.random.default_rng(3)
    x, modes, f = _problem(rng, 2, n=33, m_modes=25)
    plan = plan_type2(x, modes, 1e-6, upsample_factor=sigma)
    out = np.asarray(make_type2_fn(plan)(f.astype(np.complex128)))
    ref = direct_type2_np(x, f, modes)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5


def test_type2_is_type1_transpose():
    """<f, type1(c)> == <type2(f), c> with a plain (non-conjugated) dot.

    Both pipelines share the plan tables; the only numerical difference is
    the device kernel evaluation in spread vs the host fp64 taps, so the
    identity holds far below the transform's own eps.
    """
    rng = np.random.default_rng(11)
    d, n, m = 2, 41, 30
    x = rng.uniform(-np.pi, np.pi, size=(d, n))
    modes = rng.integers(-10, 11, size=(d, m))
    c = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    f = rng.standard_normal((2, m)) + 1j * rng.standard_normal((2, m))

    t1 = np.asarray(make_type1_fn(plan_type1(modes, 1e-9))(x, c.astype(np.complex128)))
    t2 = np.asarray(make_type2_fn(plan_type2(x, modes, 1e-9))(f.astype(np.complex128)))
    lhs = np.sum(f * t1)
    rhs = np.sum(t2 * c)
    assert abs(lhs - rhs) / abs(lhs) < 1e-11


def test_type2_duplicate_modes_sum():
    """Duplicate mode entries scatter-add (the gather transpose)."""
    rng = np.random.default_rng(5)
    x = rng.uniform(-np.pi, np.pi, size=(1, 19))
    modes = np.array([[3, -2, 3]])  # mode 3 listed twice
    f = np.array([[1.0 + 2.0j, 0.5 - 1.0j, -2.0 + 0.25j]])
    out = np.asarray(make_type2_fn(plan_type2(x, modes, 1e-9))(f))
    ref = direct_type2_np(x, f, modes)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-8


def test_type2_point_block_equivalence():
    rng = np.random.default_rng(9)
    x, modes, f = _problem(rng, 2, n=101, m_modes=30)
    plan = plan_type2(x, modes, 1e-7)
    full = np.asarray(make_type2_fn(plan)(f.astype(np.complex128)))
    blocked = np.asarray(
        make_type2_fn(plan, point_block=17)(f.astype(np.complex128))
    )
    np.testing.assert_allclose(blocked, full, rtol=0, atol=1e-12 * np.abs(full).max())


def test_type2_complex64_pipeline():
    rng = np.random.default_rng(13)
    x, modes, f = _problem(rng, 2, n=29, m_modes=20)
    plan = plan_type2(x, modes, 1e-5)
    out = np.asarray(make_type2_fn(plan)(f.astype(np.complex64)))
    assert out.dtype == np.complex64
    ref = direct_type2_np(x, f, modes)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4


def test_type2_dim_mismatch_raises():
    rng = np.random.default_rng(1)
    x = rng.uniform(-np.pi, np.pi, size=(2, 5))
    with pytest.raises(ValueError, match="dims"):
        plan_type2(x, np.zeros((1, 4), dtype=int), 1e-6)


def test_type2_jits_and_grads():
    """The executor is a pure jittable function of the mode coefficients."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(21)
    x, modes, f = _problem(rng, 2, n=23, m_modes=15)
    run = make_type2_fn(plan_type2(x, modes, 1e-6))
    jitted = jax.jit(run)
    np.testing.assert_allclose(
        np.asarray(jitted(jnp.asarray(f))), np.asarray(run(jnp.asarray(f))),
        rtol=0, atol=1e-12,
    )

    def loss(fr):
        out = run(fr + 0j)
        return jnp.sum(jnp.abs(out) ** 2)

    g = jax.grad(loss)(jnp.asarray(f.real))
    # Central finite difference on one coordinate.
    e = np.zeros_like(f.real)
    e[1, 3] = 1.0
    h = 1e-5
    fd = (loss(jnp.asarray(f.real + h * e)) - loss(jnp.asarray(f.real - h * e))) / (
        2 * h
    )
    assert abs(float(g[1, 3]) - float(fd)) < 1e-4 * max(1.0, abs(float(fd)))


def test_type2_degenerate_points_and_bad_block():
    """n_points == 0 returns an empty (C, 0) result instead of a confusing
    range() error; an explicit point_block < 1 raises (advisor findings)."""
    from fftvis_tpu.nufft.transform import Type2Executor

    rng = np.random.default_rng(5)
    modes = rng.integers(-6, 7, size=(2, 10))
    f = rng.standard_normal((3, 10)) + 1j * rng.standard_normal((3, 10))

    empty_plan = plan_type2(np.zeros((2, 0)), modes, 1e-6)
    ex = Type2Executor(empty_plan)
    out = np.asarray(ex.interp(ex.transform(ex.scatter(f))))
    assert out.shape == (3, 0)

    x = rng.uniform(-np.pi, np.pi, size=(2, 7))
    plan = plan_type2(x, modes, 1e-6)
    ex = Type2Executor(plan)
    g = ex.transform(ex.scatter(f))
    with pytest.raises(ValueError, match="point_block"):
        ex.interp(g, point_block=0)


def test_plan_rejects_int32_overflowing_grids():
    """Grids whose flat index space exceeds int32 raise at plan time
    instead of silently wrapping device gather indices (advisor finding)."""
    from fftvis_tpu.nufft.transform import plan_type1_exact

    # 3D modes with kmax ~ 1500 per axis -> fine grid ~ (2*2*1500)^3 > 2^31.
    big = np.array([[1500], [1500], [1500]], dtype=np.int64)
    with pytest.raises(ValueError, match="int32"):
        plan_type1(big, eps=1e-6)
    huge = np.array([[70000], [70000], [70000]], dtype=np.int64)
    with pytest.raises(ValueError, match="int32"):
        plan_type1_exact(huge)
