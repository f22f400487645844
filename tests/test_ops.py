import jax.numpy as jnp
import numpy as np
import pytest

from vic_tpu.ops import (batched_bisection, batched_brent, hermite,
                         linear_interp, thomas_solve)


class TestBatchedBrent:
    def test_simple_roots(self):
        # f(x) = x^2 - k, roots sqrt(k), bracketed
        k = jnp.array([1.0, 2.0, 9.0, 16.0])

        def f(x):
            return x * x - k

        # float32 default tolerance is 1e-4 (rootfind.py: an absolute 1e-7
        # is below f32 step quantization and would spin to max_iter)
        res = batched_brent(f, jnp.zeros(4), jnp.full((4,), 10.0))
        np.testing.assert_allclose(res.root, np.sqrt(np.array(k)), atol=2e-4)
        assert bool(res.converged.all())

    def test_bracket_expansion(self):
        # root at 15, initial bracket [0, 10] requires expansion (TSTEP=10)
        def f(x):
            return x - 15.0

        res = batched_brent(f, jnp.zeros(3), jnp.full((3,), 10.0))
        np.testing.assert_allclose(res.root, 15.0, atol=1e-5)
        assert bool(res.bracketed.all())

    def test_unbracketable_flagged(self):
        # f > 0 everywhere: never brackets; TFALLBACK applies at call site
        def f(x):
            return x * x + 1.0

        res = batched_brent(f, jnp.array([-1.0]), jnp.array([1.0]))
        assert not bool(res.converged.any())
        assert not bool(res.bracketed.any())

    def test_mixed_lanes(self):
        k = jnp.array([4.0, -1.0])  # lane 1 has no real root

        def f(x):
            return x * x - k

        res = batched_brent(f, jnp.zeros(2), jnp.full((2,), 10.0))
        assert bool(res.converged[0])
        np.testing.assert_allclose(res.root[0], 2.0, rtol=1e-5)
        assert not bool(res.converged[1])

    def test_transcendental(self):
        # nonlinear EB-like residual: cos(x) - x, root ~0.739085
        def f(x):
            return jnp.cos(x) - x

        res = batched_brent(f, jnp.zeros(1), jnp.ones(1))
        np.testing.assert_allclose(res.root, 0.7390851, rtol=1e-5)

    def test_2d_batch(self):
        k = jnp.arange(1.0, 13.0).reshape(3, 4)

        def f(x):
            return x * x * x - k

        res = batched_brent(f, jnp.zeros((3, 4)), jnp.full((3, 4), 3.0))
        np.testing.assert_allclose(res.root, np.cbrt(np.array(k)), rtol=1e-4)


class TestBisection:
    def test_roots(self):
        k = jnp.array([2.0, 5.0])

        def f(x):
            return x - k

        res = batched_bisection(f, jnp.zeros(2), jnp.full((2,), 10.0), n_iter=40)
        np.testing.assert_allclose(res.root, np.array(k), atol=1e-5)


class TestThomas:
    @pytest.mark.parametrize("n", [3, 7, 20])
    def test_vs_dense(self, n):
        rng = np.random.default_rng(0)
        batch = 5
        dl = rng.uniform(0.1, 1.0, (batch, n)).astype(np.float32)
        du = rng.uniform(0.1, 1.0, (batch, n)).astype(np.float32)
        d = 4.0 + rng.uniform(0.0, 1.0, (batch, n)).astype(np.float32)  # diag dominant
        b = rng.uniform(-1.0, 1.0, (batch, n)).astype(np.float32)

        x = thomas_solve(jnp.array(dl), jnp.array(d), jnp.array(du), jnp.array(b))
        for i in range(batch):
            A = np.diag(d[i]) + np.diag(du[i][:-1], 1) + np.diag(dl[i][1:], -1)
            ref = np.linalg.solve(A.astype(np.float64), b[i].astype(np.float64))
            np.testing.assert_allclose(np.asarray(x[i]), ref, rtol=2e-4, atol=2e-4)


class TestInterp:
    def test_hermite_endpoints(self):
        y = hermite(jnp.array(0.0), 0.0, 1.0, 2.0, 5.0, 0.0, 0.0)
        np.testing.assert_allclose(y, 2.0, atol=1e-6)
        y = hermite(jnp.array(1.0), 0.0, 1.0, 2.0, 5.0, 0.0, 0.0)
        np.testing.assert_allclose(y, 5.0, atol=1e-6)

    def test_hermite_midpoint_zero_slope(self):
        # with zero end slopes, midpoint = average
        y = hermite(jnp.array(0.5), 0.0, 1.0, 2.0, 6.0, 0.0, 0.0)
        np.testing.assert_allclose(y, 4.0, atol=1e-6)

    def test_linear(self):
        np.testing.assert_allclose(
            linear_interp(jnp.array(5.0), 0.0, 10.0, 0.0, 100.0), 50.0)
