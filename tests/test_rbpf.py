"""Rao-Blackwellized particle filter tests.

Oracles: (1) with a degenerate nonlinear substate the RBPF IS a Kalman
filter — log-evidence and filtered means must match the closed form for any
particle count; (2) on a genuinely conditionally-linear model it must agree
with a high-N joint-state bootstrap filter within Monte-Carlo error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusmc_tpu.models.base import CustomSSM
from cusmc_tpu.models.clgssm import CLGSSM
from cusmc_tpu.smc.kalman import kalman_filter
from cusmc_tpu.smc.particle_filter import bootstrap_filter
from cusmc_tpu.smc.rbpf import rao_blackwell_filter

D, K = 3, 2
RNG = np.random.default_rng(0)
G_NP = (0.9 * np.eye(D) + 0.05 * RNG.standard_normal((D, D))).astype(np.float32)
F_NP = RNG.standard_normal((K, D)).astype(np.float32)
W_NP = (0.3 * np.eye(D)).astype(np.float32)
V_NP = (0.5 * np.eye(K)).astype(np.float32)
M0 = np.zeros(D, np.float32)
C0 = np.eye(D, dtype=np.float32)


def degenerate_model(mats_constant):
    """Nonlinear substate frozen at zero: RBPF reduces to exact Kalman."""
    return CLGSSM.create(
        nl_dim=1, lin_dim=D, obs_dim=K,
        sample_initial_nl=lambda p, key, n: jnp.zeros((n, 1), jnp.float32),
        propagate_nl=lambda p, key, u: u,
        Fmat=lambda p, u: jnp.asarray(F_NP),
        Gmat=lambda p, u: jnp.asarray(G_NP),
        Vcov=lambda p, u: jnp.asarray(V_NP),
        Wcov=lambda p, u: jnp.asarray(W_NP),
        m0=M0, C0=C0, mats_constant=mats_constant)


def offset_model():
    """u is a scalar random walk entering the observation offset
    c(u) = [sin u, cos u] — matrices constant, offsets nonlinear."""
    return CLGSSM.create(
        nl_dim=1, lin_dim=D, obs_dim=K,
        sample_initial_nl=lambda p, key, n:
            0.1 * jax.random.normal(key, (n, 1), jnp.float32),
        propagate_nl=lambda p, key, u:
            u + 0.15 * jax.random.normal(key, u.shape, u.dtype),
        Fmat=lambda p, u: jnp.asarray(F_NP),
        Gmat=lambda p, u: jnp.asarray(G_NP),
        Vcov=lambda p, u: jnp.asarray(V_NP),
        Wcov=lambda p, u: jnp.asarray(W_NP),
        c=lambda p, u: jnp.stack([jnp.sin(u[0]), jnp.cos(u[0])]),
        m0=M0, C0=C0, mats_constant=True)


def joint_bootstrap_model():
    """The offset model as a plain SSM on the joint state x = (u, z) —
    the brute-force comparison target for the RBPF."""
    Gj = jnp.asarray(G_NP)
    Fj = jnp.asarray(F_NP)
    w_chol = jnp.linalg.cholesky(jnp.asarray(W_NP))
    v_inv = jnp.linalg.inv(jnp.asarray(V_NP))
    v_logdet = jnp.linalg.slogdet(jnp.asarray(V_NP))[1]

    def sample_initial(params, key, shape):
        ku, kz = jax.random.split(key)
        u = 0.1 * jax.random.normal(ku, shape + (1,), jnp.float32)
        z = jax.random.normal(kz, shape + (D,), jnp.float32)  # C0 = I
        return jnp.concatenate([u, z], axis=-1)

    def propagate(params, key, x):
        ku, kz = jax.random.split(key)
        u = x[..., :1] + 0.15 * jax.random.normal(ku, x[..., :1].shape,
                                                  jnp.float32)
        noise = jax.random.normal(kz, x[..., 1:].shape,
                                  jnp.float32) @ w_chol.T
        z = x[..., 1:] @ Gj.T + noise
        return jnp.concatenate([u, z], axis=-1)

    def observation_logpdf(params, y, x):
        u, z = x[..., 0], x[..., 1:]
        c = jnp.stack([jnp.sin(u), jnp.cos(u)], axis=-1)
        r = y[None, :] - z @ Fj.T - c
        quad = jnp.einsum("nk,kl,nl->n", r, v_inv, r)
        return (-0.5 * (quad + v_logdet
                        + K * np.log(2.0 * np.pi))).astype(jnp.float32)

    return CustomSSM.create(dim=1 + D, sample_initial=sample_initial,
                            propagate=propagate,
                            observation_logpdf=observation_logpdf)


@pytest.fixture(scope="module")
def ys():
    rng = np.random.default_rng(7)
    out = rng.standard_normal((40, K)).astype(np.float32)
    out[0] = 0.0
    return jnp.asarray(out)


class TestKalmanReduction:
    @pytest.mark.parametrize("mats_constant", [False, True])
    def test_matches_kalman_exactly(self, ys, mats_constant, key):
        res = rao_blackwell_filter(key, degenerate_model(mats_constant),
                                   ys, num_particles=8)
        m, _, ll = kalman_filter(np.asarray(ys), F_NP, G_NP, V_NP, W_NP,
                                 M0, C0)
        np.testing.assert_allclose(float(res.log_evidence), float(ll),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(res.filtered_mean[1:]),
                                   np.asarray(m[1:]), atol=1e-4)

    def test_weights_stay_uniform_when_degenerate(self, ys, key):
        # Identical particles -> identical weights at every step.
        res = rao_blackwell_filter(key, degenerate_model(True), ys, 16)
        np.testing.assert_allclose(np.asarray(res.ess), 16.0, rtol=1e-5)


class TestAgainstJointBootstrap:
    def test_log_evidence_agrees(self, ys, key):
        rb = rao_blackwell_filter(key, offset_model(), ys,
                                  num_particles=1024)
        bf = bootstrap_filter(jax.random.fold_in(key, 1),
                              joint_bootstrap_model(), ys,
                              num_particles=16384, resampler="systematic",
                              layout="batch", return_history=False)
        assert abs(float(rb.log_evidence) - float(bf.log_evidence)) < 1.0

    def test_rbpf_low_n_matches_high_n(self, ys, key):
        # Marginalization makes even small N accurate: N=64 vs N=2048.
        lo = rao_blackwell_filter(key, offset_model(), ys, 64)
        hi = rao_blackwell_filter(jax.random.fold_in(key, 1),
                                  offset_model(), ys, 2048)
        assert abs(float(lo.log_evidence) - float(hi.log_evidence)) < 1.5
        np.testing.assert_allclose(np.asarray(lo.filtered_mean[-1]),
                                   np.asarray(hi.filtered_mean[-1]),
                                   atol=0.4)


class TestStructure:
    def test_shapes_history_jit_reproducible(self, ys, key):
        model = offset_model()
        fn = jax.jit(lambda k: rao_blackwell_filter(
            k, model, ys, 128, return_history=True))
        r1 = fn(key)
        r2 = rao_blackwell_filter(key, model, ys, 128, return_history=True)
        T = ys.shape[0]
        assert r1.nl_particles.shape == (T, 128, 1)
        assert r1.means.shape == (T, 128, D)
        assert r1.filtered_mean.shape == (T, D)
        assert r1.ess.shape == (T,)
        np.testing.assert_allclose(np.asarray(r1.log_evidence),
                                   np.asarray(r2.log_evidence), rtol=1e-5)

    def test_general_path_cov_per_particle(self, ys, key):
        model = offset_model().replace(mats_constant=False)
        res = rao_blackwell_filter(key, model, ys, 32)
        assert res.final_cov.shape == (32, D, D)
        # Constant mats -> per-particle covariances all equal.
        c = np.asarray(res.final_cov)
        np.testing.assert_allclose(c, np.broadcast_to(c[0], c.shape),
                                   atol=1e-5)

    def test_always_resample_and_resampler_choice(self, ys, key):
        res = rao_blackwell_filter(key, offset_model(), ys, 64,
                                   resampler="residual", ess_threshold=None)
        assert np.isfinite(float(res.log_evidence))
