"""Pallas batched-linalg kernels: correctness vs jnp, including gradients.

On the CPU test backend the kernels run in Pallas interpret mode; on TPU the
same code paths compile to Mosaic. Shapes mirror the MRA sweep's hot
configuration (batch ~1k of 17x17 leaf blocks — see sweep.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.linalg import solve_triangular

from pymra_tpu.ops.pallas.linalg import (
    cholesky,
    cholesky_jittered,
    solve_triangular_batched,
)


def _spd(key, b, p, dtype=jnp.float32):
    a = jax.random.normal(key, (b, p, p), dtype=dtype)
    return a @ jnp.swapaxes(a, -1, -2) + p * jnp.eye(p, dtype=dtype)


@pytest.mark.parametrize("b,p", [(3, 4), (9, 17), (130, 5), (1, 1)])
def test_cholesky_matches_jnp(b, p):
    m = _spd(jax.random.key(0), b, p)
    got = cholesky(m)
    want = jnp.linalg.cholesky(m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_cholesky_unbatched_and_multi_batch_dims():
    m = _spd(jax.random.key(1), 6, 5)
    np.testing.assert_allclose(
        np.asarray(cholesky(m[0])), np.asarray(jnp.linalg.cholesky(m[0])),
        rtol=1e-4, atol=1e-5)
    m2 = m.reshape(2, 3, 5, 5)
    np.testing.assert_allclose(
        np.asarray(cholesky(m2)), np.asarray(jnp.linalg.cholesky(m2)),
        rtol=1e-4, atol=1e-5)


def test_cholesky_nan_propagation():
    # indefinite input must yield NaNs (the sweep's jitter-retry contract)
    m = -jnp.eye(4)[None]
    got = cholesky(m)
    assert np.isnan(np.asarray(got)).any()


def test_cholesky_gradient_matches_jnp():
    m = _spd(jax.random.key(2), 4, 6)

    def f_pallas(x):
        return jnp.sum(jnp.sin(cholesky(x)))

    def f_jnp(x):
        return jnp.sum(jnp.sin(jnp.linalg.cholesky(x)))

    g1 = jax.grad(f_pallas)(m)
    g2 = jax.grad(f_jnp)(m)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("transpose", [False, True])
@pytest.mark.parametrize("q", [1, 7, 17])
def test_triangular_solve_matches_jnp(transpose, q):
    m = _spd(jax.random.key(3), 5, 9)
    l = jnp.linalg.cholesky(m)
    rhs = jax.random.normal(jax.random.key(4), (5, 9, q), dtype=jnp.float32)
    got = solve_triangular_batched(l, rhs, transpose)
    want = solve_triangular(l, rhs, lower=True,
                            trans="T" if transpose else "N")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("transpose", [False, True])
def test_triangular_solve_gradient_matches_jnp(transpose):
    m = _spd(jax.random.key(5), 3, 6)
    l = jnp.linalg.cholesky(m)
    rhs = jax.random.normal(jax.random.key(6), (3, 6, 4), dtype=jnp.float32)

    def f_pallas(ll, bb):
        return jnp.sum(jnp.cos(solve_triangular_batched(ll, bb, transpose)))

    def f_jnp(ll, bb):
        return jnp.sum(jnp.cos(solve_triangular(
            ll, bb, lower=True, trans="T" if transpose else "N")))

    g1 = jax.grad(f_pallas, argnums=(0, 1))(l, rhs)
    g2 = jax.grad(f_jnp, argnums=(0, 1))(l, rhs)
    # jnp's solve grad w.r.t. L is dense; ours is tril-projected. Both are
    # valid cotangents for a lower-triangular factor — compare tril parts.
    np.testing.assert_allclose(np.asarray(jnp.tril(g1[0])),
                               np.asarray(jnp.tril(g2[0])),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-3, atol=1e-4)


def test_cholesky_jittered_matches_reference_escalation():
    # one well-conditioned member, one needing the base jitter, one needing
    # the 100x escalation
    p = 5
    good = _spd(jax.random.key(7), 1, p)[0]
    ones = jnp.ones((p, p), dtype=jnp.float32)  # rank-1 PSD, singular
    neg = ones - 1e-4 * jnp.eye(p)  # indefinite beyond the base jitter
    m = jnp.stack([good, ones, neg])
    jit = jnp.full((3,), 1e-6, dtype=jnp.float32)
    got = cholesky_jittered(m, jit)
    assert not np.isnan(np.asarray(got)).any()
    # reference semantics: escalate by 1e2 / 1e4 on NaN
    def ref(mat, j):
        eye = jnp.eye(p, dtype=jnp.float32)
        c = jnp.linalg.cholesky(mat + j * eye)
        for f in (1e2, 1e4):
            bad = jnp.any(jnp.isnan(c), axis=(-2, -1))[..., None, None]
            c = jnp.where(bad, jnp.linalg.cholesky(mat + f * j * eye), c)
        return c
    want = ref(m, jit[:, None, None])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_cholesky_jittered_exact_zero_pivot_escalates():
    """An EXACTLY-zero pivot yields a -inf log-pivot sum with a NaN
    factor (0/0 in the column scale) — the escalation must retry on any
    non-finite accumulator, not just NaN (ADVICE r4: the pre-r5 any-NaN
    test let -inf escape with a NaN factor). Engineered input: the
    first-attempt jittered matrix is diag(1, ..., 1, 0)."""
    from pymra_tpu.ops.pallas.linalg import cholesky_logdet

    p, js = 6, jnp.float32(1e-4)
    d = np.ones(p, dtype=np.float32)
    d[-1] = -float(js)  # + factors[0]*js -> exactly 0
    m = jnp.stack([jnp.diag(jnp.asarray(d)),
                   jnp.eye(p, dtype=jnp.float32)])
    jit = jnp.full((2,), js, dtype=jnp.float32)
    got = cholesky_jittered(m, jit)
    assert np.isfinite(np.asarray(got)).all(), (
        "zero-pivot member escaped escalation with a non-finite factor"
    )
    # retry at 100x: last diagonal = -js + 100 js = 99 js
    want_last = np.sqrt(99.0 * float(js))
    np.testing.assert_allclose(float(got[0, p - 1, p - 1]), want_last,
                               rtol=1e-4)
    # the fused log-determinant kernel shares the escalation structure;
    # at the 100x retry every pivot carries the 100*js jitter
    ld = cholesky_logdet(m, jit)
    assert np.isfinite(np.asarray(ld)).all()
    want_ld = (p - 1) * 0.5 * np.log(1.0 + 100.0 * float(js)) + np.log(
        want_last)
    np.testing.assert_allclose(float(ld[0]), want_ld, rtol=1e-3,
                               atol=1e-5)


def test_cholesky_jittered_gradient():
    m = _spd(jax.random.key(8), 3, 4)
    jit = jnp.full((3,), 1e-5, dtype=jnp.float32)

    def f_pallas(x):
        return jnp.sum(jnp.sin(cholesky_jittered(x, jit)))

    def f_jnp(x):
        return jnp.sum(jnp.sin(jnp.linalg.cholesky(
            x + 1e-5 * jnp.eye(4, dtype=jnp.float32))))

    g1 = jax.grad(f_pallas)(m)
    g2 = jax.grad(f_jnp)(m)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


def test_sweep_dispatch_cpu_uses_jnp():
    # on the CPU test backend the sweep must keep the float64 jnp path
    from pymra_tpu.ops.pallas.linalg import pallas_available

    assert not pallas_available()


class TestCholeskyBlocked:
    """Blocked factorization for P > 80 (removes VERDICT r1's silent
    dispatch cliff: the plain lane-batched kernel cannot compile past
    P~80 because the whole [P, P, lanes] tile must fit VMEM)."""

    @pytest.mark.parametrize("b,p", [(4, 96), (2, 150), (3, 64), (2, 130)])
    def test_matches_jnp(self, b, p):
        from pymra_tpu.ops.pallas.linalg import cholesky_blocked

        m = _spd(jax.random.key(2), b, p)
        got = cholesky_blocked(m)
        want = jnp.linalg.cholesky(m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-4)
        # strictly lower triangular output
        assert np.allclose(np.triu(np.asarray(got), 1), 0.0)

    def test_nan_propagation(self):
        from pymra_tpu.ops.pallas.linalg import cholesky_blocked

        m = _spd(jax.random.key(3), 2, 96)
        m = m.at[1, 90, 90].set(-1e6)  # indefinite trailing block, member 1
        got = np.asarray(cholesky_blocked(m))
        assert np.isnan(got[1]).any()
        assert np.isfinite(got[0]).all()

    def test_gradient_flows(self):
        from pymra_tpu.ops.pallas.linalg import cholesky_blocked

        m = _spd(jax.random.key(4), 1, 96).astype(jnp.float64)

        def f_blocked(s):
            return jnp.sum(jnp.log(jnp.diagonal(
                cholesky_blocked(m * s), axis1=-2, axis2=-1)))

        def f_jnp(s):
            return jnp.sum(jnp.log(jnp.diagonal(
                jnp.linalg.cholesky(m * s), axis1=-2, axis2=-1)))

        g0 = float(jax.grad(f_blocked)(1.3))
        g1 = float(jax.grad(f_jnp)(1.3))
        np.testing.assert_allclose(g0, g1, rtol=1e-6)

    def test_sweep_dispatch_at_p96(self):
        """End-to-end: a leaf pad over 80 must factorize through the
        blocked path on TPU; on this CPU test backend it exercises the
        jnp path, but the op itself is verified above and the dispatch
        boundary is tested by construction (P=96 > 80)."""
        from pymra_tpu.tree.sweep import _chol

        m = _spd(jax.random.key(5), 2, 96)
        got = _chol(m, jitter=1e-8)
        want = jnp.linalg.cholesky(
            m + 1e-8 * (jnp.mean(jnp.abs(jnp.diagonal(
                m, axis1=-2, axis2=-1)), axis=-1)[:, None, None] + 1.0)
            * jnp.eye(96, dtype=m.dtype))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


class TestTriangularInverse:
    """triangular_inverse_lower: recursion path, lane-kernel path, VJP."""

    def test_recursive_matches_solve(self):
        from pymra_tpu.ops.pallas.linalg import triangular_inverse_lower

        for p in (3, 8, 17, 28, 96):
            l = jnp.tril(_spd(jax.random.key(3), 5, p))
            got = triangular_inverse_lower(l)
            want = solve_triangular(
                l, jnp.broadcast_to(jnp.eye(p, dtype=l.dtype), l.shape),
                lower=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-3, atol=2e-4)

    def test_lane_kernel_matches_recursive(self):
        # exercise the Pallas kernel directly (interpret mode on CPU; the
        # public dispatcher only selects it on a TPU backend)
        from pymra_tpu.ops.pallas.linalg import (
            _from_lanes,
            _to_lanes,
            _tri_inv_lanes,
            _tri_inv_recursive,
        )

        l = jnp.tril(_spd(jax.random.key(4), 140, 17)).astype(jnp.float32)
        l_t, batch = _to_lanes(l)
        got = _from_lanes(_tri_inv_lanes(l_t), batch)
        want = _tri_inv_recursive(l)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-4)

    def test_vjp_matches_solve_autodiff(self):
        from pymra_tpu.ops.pallas.linalg import triangular_inverse_lower

        l0 = jnp.tril(_spd(jax.random.key(5), 2, 6))

        def f_ours(s):
            return jnp.sum(jnp.sin(triangular_inverse_lower(l0 * s)))

        def f_ref(s):
            ls = l0 * s
            inv = solve_triangular(
                ls, jnp.broadcast_to(jnp.eye(6, dtype=ls.dtype), ls.shape),
                lower=True)
            return jnp.sum(jnp.sin(inv))

        g0 = jax.grad(f_ours)(1.3)
        g1 = jax.grad(f_ref)(1.3)
        np.testing.assert_allclose(float(g0), float(g1), rtol=1e-5)


def test_cholesky_cascade_lanes_matches_jnp_cascade():
    """One-relayout cascade == per-attempt jnp cascade (NaN-select semantics),
    including an indefinite member that needs escalation."""
    from pymra_tpu.ops.pallas.linalg import cholesky_cascade_lanes

    m = np.array(_spd(jax.random.key(7), 6, 9), dtype=np.float32, copy=True)
    # member 2: indefinite enough that the base jitter fails
    m[2] -= 12.0 * np.eye(9, dtype=np.float32)
    jit = np.full((6,), 1e-2, dtype=np.float32)
    got = cholesky_cascade_lanes(jnp.asarray(m), jnp.asarray(jit))
    c = jnp.linalg.cholesky(jnp.asarray(m) + jit[:, None, None] * jnp.eye(9))
    for f in (1e2, 1e4):
        bad = jnp.any(jnp.isnan(c), axis=(-2, -1))[:, None, None]
        retry = jnp.linalg.cholesky(
            jnp.asarray(m) + (f * jit)[:, None, None] * jnp.eye(9))
        c = jnp.where(bad, retry, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(c),
                               rtol=2e-4, atol=2e-5)


class TestCholeskyLogdet:
    """Factor-free jittered log-determinant kernel (cholesky_logdet)."""

    def test_matches_cascade_logdiag(self):
        from pymra_tpu.ops.pallas.linalg import cholesky_logdet

        m = np.array(_spd(jax.random.key(12), 7, 13), dtype=np.float32,
                     copy=True)
        m[3] -= 16.0 * np.eye(13, dtype=np.float32)  # needs escalation
        jit = np.full((7,), 1e-2, dtype=np.float32)
        got = cholesky_logdet(jnp.asarray(m), jnp.asarray(jit))
        # reference: explicit cascade + logdiag
        c = jnp.linalg.cholesky(
            jnp.asarray(m) + jit[:, None, None] * jnp.eye(13))
        for f in (1e2, 1e4):
            bad = jnp.any(jnp.isnan(c), axis=(-2, -1))[:, None, None]
            retry = jnp.linalg.cholesky(
                jnp.asarray(m) + (f * jit)[:, None, None] * jnp.eye(13))
            c = jnp.where(bad, retry, c)
        want = jnp.sum(jnp.log(jnp.diagonal(c, axis1=-2, axis2=-1)), -1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-5)

    def test_vjp_matches_logdet_grad(self):
        from pymra_tpu.ops.pallas.linalg import cholesky_logdet

        m = _spd(jax.random.key(13), 3, 6).astype(jnp.float32)
        jit = jnp.full((3,), 1e-4, dtype=jnp.float32)

        def f_ours(s):
            return jnp.sum(cholesky_logdet(m * s, jit))

        def f_ref(s):
            c = jnp.linalg.cholesky(m * s + jit[:, None, None] * jnp.eye(6))
            return jnp.sum(jnp.log(jnp.diagonal(c, axis1=-2, axis2=-1)))

        g0 = jax.grad(f_ours)(jnp.float32(1.4))
        g1 = jax.grad(f_ref)(jnp.float32(1.4))
        np.testing.assert_allclose(float(g0), float(g1), rtol=1e-3)


class TestCholeskyInvLogdet:
    """Fused inverse-factor + log-determinant kernel (cholesky_inv_logdet)."""

    def test_matches_explicit_pipeline(self):
        from pymra_tpu.ops.pallas.linalg import cholesky_inv_logdet

        m = np.array(_spd(jax.random.key(20), 5, 11), dtype=np.float32,
                     copy=True)
        m[1] -= 14.0 * np.eye(11, dtype=np.float32)  # escalation member
        jit = np.full((5,), 1e-2, dtype=np.float32)
        x, ld = cholesky_inv_logdet(jnp.asarray(m), jnp.asarray(jit))
        c = jnp.linalg.cholesky(
            jnp.asarray(m) + jit[:, None, None] * jnp.eye(11))
        for f in (1e2, 1e4):
            bad = jnp.any(jnp.isnan(c), axis=(-2, -1))[:, None, None]
            retry = jnp.linalg.cholesky(
                jnp.asarray(m) + (f * jit)[:, None, None] * jnp.eye(11))
            c = jnp.where(bad, retry, c)
        want_ld = jnp.sum(jnp.log(jnp.diagonal(c, axis1=-2, axis2=-1)), -1)
        want_x = solve_triangular(
            c, jnp.broadcast_to(jnp.eye(11, dtype=c.dtype), c.shape),
            lower=True)
        np.testing.assert_allclose(np.asarray(ld), np.asarray(want_ld),
                                   rtol=3e-5)
        np.testing.assert_allclose(np.asarray(x), np.asarray(want_x),
                                   rtol=2e-3, atol=2e-4)

    def test_vjp_matches_autodiff(self):
        from pymra_tpu.ops.pallas.linalg import cholesky_inv_logdet

        m = _spd(jax.random.key(21), 2, 5).astype(jnp.float32)
        jit = jnp.full((2,), 1e-4, dtype=jnp.float32)

        def f_ours(s):
            x, ld = cholesky_inv_logdet(m * s, jit)
            return jnp.sum(jnp.sin(x)) + 2.0 * jnp.sum(ld)

        def f_ref(s):
            c = jnp.linalg.cholesky(m * s + jit[:, None, None] * jnp.eye(5))
            x = solve_triangular(
                c, jnp.broadcast_to(jnp.eye(5, dtype=c.dtype), c.shape),
                lower=True)
            ld = jnp.sum(jnp.log(jnp.diagonal(c, axis1=-2, axis2=-1)))
            return jnp.sum(jnp.sin(x)) + 2.0 * ld

        g0 = jax.grad(f_ours)(jnp.float32(1.3))
        g1 = jax.grad(f_ref)(jnp.float32(1.3))
        np.testing.assert_allclose(float(g0), float(g1), rtol=1e-3)


class TestLeafFactor:
    """Whole-leaf-stage fused kernel (leaf_factor): in-kernel K_leaf
    assembly + prior logdet + posterior inverse factor + logdet."""

    def _case(self, key, b=9, p=12, jitter=1e-2, indefinite=None):
        c = np.array(_spd(key, b, p, dtype=jnp.float64), copy=True)
        if indefinite is not None:
            c[indefinite] -= (p / 2 + 4.0) * np.eye(p)
        rng = np.random.default_rng(3)
        kmask = (rng.random((b, p)) < 0.7).astype(np.float64)
        kmask[1] = 0.0  # fully masked (dummy-leaf) member: K_leaf = I
        a2 = rng.standard_normal((b, p, p))
        a_oo = a2 @ np.swapaxes(a2, -1, -2) * 0.1
        # contract: a_oo vanishes outside the knot rows/cols (the sweep's
        # B_own-based Gram guarantees this by construction)
        a_oo = a_oo * kmask[:, :, None] * kmask[:, None, :]
        return c, kmask, a_oo, jitter

    def _oracle(self, c, kmask, a_oo, jitter):
        b, p = kmask.shape
        lds_p, lds_q, lis = [], [], []
        for i in range(b):
            kl = (c[i] * np.outer(kmask[i], kmask[i])
                  + np.eye(p) * (1 - kmask[i]))
            s = np.abs(np.diag(kl)).mean() + 1.0
            for f in (1.0, 1e2, 1e4):
                try:
                    Lp = np.linalg.cholesky(kl + f * jitter * s * np.eye(p))
                    break
                except np.linalg.LinAlgError:
                    continue
            for f in (1.0, 1e2, 1e4):
                try:
                    Lq = np.linalg.cholesky(
                        kl + f * jitter * s * np.eye(p) + a_oo[i])
                    break
                except np.linalg.LinAlgError:
                    continue
            lds_p.append(np.log(np.diag(Lp)).sum())
            lds_q.append(np.log(np.diag(Lq)).sum())
            lis.append(np.linalg.inv(Lq))
        return np.stack(lis), np.asarray(lds_p), np.asarray(lds_q)

    def test_matches_composed_pipeline(self):
        from pymra_tpu.ops.pallas.linalg import leaf_factor

        c, kmask, a_oo, jitter = self._case(jax.random.key(30),
                                            indefinite=4)
        li, ldp, ldq = leaf_factor(jnp.asarray(c), jnp.asarray(kmask),
                                   jnp.asarray(a_oo), jitter)
        want_li, want_ldp, want_ldq = self._oracle(c, kmask, a_oo, jitter)
        np.testing.assert_allclose(np.asarray(ldp), want_ldp, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(ldq), want_ldq, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(li), want_li, atol=1e-9)

    def test_vjp_finite_difference(self):
        from pymra_tpu.ops.pallas.linalg import leaf_factor

        c, kmask, a_oo, jitter = self._case(jax.random.key(31), b=3, p=7,
                                            jitter=1e-6)
        km = jnp.asarray(kmask)

        def f(cj, aj):
            li, ldp, ldq = leaf_factor(cj, km, aj, jitter)
            return ldp.sum() + 2.0 * ldq.sum() + jnp.sum(li * 0.01)

        g_c, g_a = jax.grad(f, argnums=(0, 1))(jnp.asarray(c),
                                               jnp.asarray(a_oo))
        eps = 1e-5
        for (i, j, k) in [(0, 2, 3), (1, 0, 0), (2, 5, 5)]:
            d = np.zeros_like(c)
            d[i, j, k] += eps / 2
            d[i, k, j] += eps / 2
            fd = (f(jnp.asarray(c + d), jnp.asarray(a_oo))
                  - f(jnp.asarray(c - d), jnp.asarray(a_oo))) / (2 * eps)
            an = (float(g_c[i, j, k]) + float(g_c[i, k, j])) / 2
            np.testing.assert_allclose(float(fd), an, rtol=1e-5,
                                       atol=1e-8)
            d2 = np.zeros_like(a_oo)
            d2[i, j, k] += eps / 2
            d2[i, k, j] += eps / 2
            fd2 = (f(jnp.asarray(c), jnp.asarray(a_oo + d2))
                   - f(jnp.asarray(c), jnp.asarray(a_oo - d2))) / (2 * eps)
            an2 = (float(g_a[i, j, k]) + float(g_a[i, k, j])) / 2
            np.testing.assert_allclose(float(fd2), an2, rtol=1e-5,
                                       atol=1e-8)
