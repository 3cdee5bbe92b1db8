"""Special functions needed on device.

``kv_frac`` — the modified Bessel function of the second kind ``K_nu(x)``
for *static* real order ``nu > 0`` and traced argument ``x`` — implemented
with the classic two-regime scheme (Temme's series for ``x <= 2``, Steed's
continued fraction CF2 for ``x > 2``; see Numerical Recipes ch. 6.7 /
Temme 1975), written as pure jnp arithmetic with fixed iteration counts so
it jits, vmaps and differentiates on TPU.

This replaces the host-only scipy fallback of round 1
(``kernels.matern``): the reference supports arbitrary smoothness via
sklearn's Matern wrapper (pyMRA/MRATools.py:273-277), which bottoms out in
the same ``scipy.special.kv`` — but is neither differentiable nor
device-executable. Here the order ``nu`` is a Python float fixed at trace
time (like the reference's, which bakes ``nu`` into the sklearn kernel
object), while the argument — and hence kernel hyper-parameters like the
length scale — are fully traced and differentiable.

Order-dependent constants (reflection/gamma factors) are evaluated on host
with ``math``/``scipy`` at trace time; everything touching ``x`` is jnp.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["kv_frac", "matern_general"]

_SERIES_ITERS = 40  # Temme series terms (x <= 2); converges ~geometric
_CF2_ITERS = 64  # Steed CF2 iterations (x > 2)


def _host_gam12(mu: float) -> tuple[float, float, float, float]:
    """Temme's gamma factors for static fractional order ``mu`` in [0, 1).

    gam1 = (1/Gamma(1-mu) - 1/Gamma(1+mu)) / (2 mu)   (limit -euler_gamma)
    gam2 = (1/Gamma(1-mu) + 1/Gamma(1+mu)) / 2
    gampl = Gamma(1+mu), gammi = Gamma(1-mu)
    """
    gampl = math.gamma(1.0 + mu)
    gammi = math.gamma(1.0 - mu)
    if abs(mu) < 1e-12:
        # 1/Gamma(1 +/- mu) = 1 +/- euler_gamma*mu + O(mu^2), so the
        # difference quotient tends to -euler_gamma
        gam1 = -0.5772156649015329
    else:
        gam1 = (1.0 / gammi - 1.0 / gampl) / (2.0 * mu)
    gam2 = (1.0 / gammi + 1.0 / gampl) / 2.0
    return gam1, gam2, gampl, gammi


def _kv_series(x: jnp.ndarray, mu: float):
    """Temme series for (K_mu, K_{mu+1}), valid for 0 < x <= 2, 0<=mu<1."""
    gam1, gam2, gampl, gammi = _host_gam12(mu)
    pimu = math.pi * mu
    fact = 1.0 if abs(pimu) < 1e-12 else pimu / math.sin(pimu)

    d = -jnp.log(x / 2.0)
    e = mu * d
    # sinh(e)/e with the removable singularity at e=0
    e_safe = jnp.where(jnp.abs(e) < 1e-12, 1.0, e)
    fact2 = jnp.where(jnp.abs(e) < 1e-12, 1.0, jnp.sinh(e_safe) / e_safe)
    ff = fact * (gam1 * jnp.cosh(e) + gam2 * fact2 * d)
    ee = jnp.exp(e)  # = (x/2)^(-mu)
    p = 0.5 * ee * gampl  # p_0 = (1/2)(x/2)^(-mu) Gamma(1+mu)
    q = 0.5 * gammi / ee  # q_0 = (1/2)(x/2)^(+mu) Gamma(1-mu)
    c = jnp.ones_like(x)
    dd = x * x / 4.0

    # lax.scan rather than a Python unroll: compiles as one loop and keeps
    # the reverse-mode graph linear (an unrolled 40-term chain made XLA
    # grad-compiles take minutes)
    def step(carry, i):
        ff, p, q, c, total, total1 = carry
        ff = (i * ff + p + q) / (i * i - mu * mu)
        c = c * dd / i
        p = p / (i - mu)
        q = q / (i + mu)
        total = total + c * ff
        total1 = total1 + c * (p - i * ff)
        return (ff, p, q, c, total, total1), None

    iters = jnp.arange(1, _SERIES_ITERS + 1, dtype=x.dtype)
    (_, _, _, _, total, total1), _ = jax.lax.scan(
        step, (ff, p, q, c, ff, p), iters
    )
    k_mu = total
    k_mup1 = total1 * 2.0 / x
    return k_mu, k_mup1


def _kv_cf2(x: jnp.ndarray, mu: float):
    """Steed's CF2 for (K_mu, K_{mu+1}), valid for x > 2 (any mu in [0,1))."""
    a1 = 0.25 - mu * mu
    b = 2.0 * (1.0 + x)
    d = 1.0 / b
    h = d
    delh = d
    q1 = jnp.zeros_like(x)
    q2 = jnp.ones_like(x)
    q = jnp.full_like(x, a1)
    c = jnp.full_like(x, a1)
    s = 1.0 + q * delh

    def step(carry, i):
        b, d, h, delh, q1, q2, q, c, s = carry
        # closed form of NR's running "a -= 2*(i-1)" from a = -a1:
        # a_i = -a1 - 2*sum_{k=2..i}(k-1) = -a1 - i(i-1)
        a = -a1 - (i - 1.0) * i
        c = -a * c / i
        qnew = (q1 - b * q2) / a
        q1, q2 = q2, qnew
        q = q + c * qnew
        b = b + 2.0
        d = 1.0 / (b + a * d)
        delh = (b * d - 1.0) * delh
        h = h + delh
        s = s + q * delh
        return (b, d, h, delh, q1, q2, q, c, s), None

    iters = jnp.arange(2, _CF2_ITERS + 1, dtype=x.dtype)
    (b, d, h, delh, q1, q2, q, c, s), _ = jax.lax.scan(
        step, (b, d, h, delh, q1, q2, q, c, s), iters
    )
    h = a1 * h
    k_mu = jnp.sqrt(jnp.pi / (2.0 * x)) * jnp.exp(-x) / s
    k_mup1 = k_mu * (mu + x + 0.5 - h) / x
    return k_mu, k_mup1


def kv_frac(nu: float, x: jnp.ndarray) -> jnp.ndarray:
    """``K_nu(x)`` for static ``nu > 0``, traced ``x > 0``; differentiable.

    Both regimes are evaluated on range-clamped copies of ``x`` and selected
    with ``jnp.where`` (the clamping keeps the inactive branch finite so
    reverse-mode gradients stay NaN-free — the standard double-where rule).
    The fractional-order pair (K_mu, K_{mu+1}) is lifted to order ``nu`` by
    the stable upward recurrence K_{m+1} = K_{m-1} + (2 m / x) K_m.
    """
    nu = float(nu)
    if nu < 0:
        nu = -nu  # K_{-nu} = K_nu
    n_up = int(nu + 0.5)  # number of recurrence steps; mu in [-0.5, 0.5)
    mu = nu - n_up
    if mu < 0:  # Temme series wants mu in [0, 1); shift one step down
        mu += 1.0
        n_up -= 1

    x = jnp.asarray(x)
    small = x <= 2.0
    xs = jnp.minimum(x, 2.0)  # series-safe copy
    xl = jnp.maximum(x, 2.0)  # CF2-safe copy
    ks_mu, ks_mup1 = _kv_series(jnp.maximum(xs, jnp.finfo(x.dtype).tiny), mu)
    kl_mu, kl_mup1 = _kv_cf2(xl, mu)
    k_mu = jnp.where(small, ks_mu, kl_mu)
    k_mup1 = jnp.where(small, ks_mup1, kl_mup1)

    k_prev, k_cur = k_mu, k_mup1
    order = mu + 1.0
    for _ in range(n_up - 1):
        k_prev, k_cur = k_cur, k_prev + (2.0 * order / x) * k_cur
        order += 1.0
    return k_mu if n_up == 0 else k_cur


def matern_general(d: jnp.ndarray, l, sig, nu: float) -> jnp.ndarray:
    """Matern covariance for arbitrary static smoothness ``nu``.

    ``sig * 2^(1-nu)/Gamma(nu) * s^nu K_nu(s)``, ``s = sqrt(2 nu) d / l``,
    with the removable singularity at d=0 handled exactly (value ``sig``).
    Differentiable in ``l``, ``sig`` and ``d``.
    """
    nu = float(nu)
    coef = 2.0 ** (1.0 - nu) / math.gamma(nu)
    s = jnp.sqrt(2.0 * nu) * d / l
    zero = s <= 0.0
    s_safe = jnp.where(zero, 1.0, s)
    val = coef * s_safe**nu * kv_frac(nu, s_safe)
    return sig * jnp.where(zero, 1.0, val)
