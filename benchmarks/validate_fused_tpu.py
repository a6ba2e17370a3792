#!/usr/bin/env python
"""On-chip statistical validation of the fused Pallas filter step.

Run on a real TPU (``python benchmarks/validate_fused_tpu.py``). These are
the statistical assertions that CANNOT run in interpret mode (its PRNG
emulation returns constant bits — see tests/test_fused_step.py):

1. zero-noise ancestor/state/loglik exact consistency;
2. offspring counts track weights exactly as well as the indexed
   Metropolis resampler (same finite-B tolerance);
3. MVN process-noise moments; MVT scale-mixture variance;
4. end-to-end: pallas-engine filter log-evidence within the metropolis
   finite-B band of the Kalman oracle, close to the XLA engine.

All four were verified on TPU v5e during development; this script re-runs
them from scratch and prints PASS/FAIL per check.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cusmc_tpu.ops.fused_step import fused_filter_step
from cusmc_tpu.resampling.metropolis import metropolis_ancestors

FAILURES = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'}: {name} {detail}")
    if not ok:
        FAILURES.append(name)


def main():
    d, n = 2, 8192
    key = jax.random.key(0)
    X = jax.random.normal(key, (d, n), jnp.float32)
    logw = jax.random.normal(jax.random.fold_in(key, 1), (n,),
                             jnp.float32) * 2.0
    I = jnp.eye(d, dtype=jnp.float32)
    y = jnp.zeros((d,), jnp.float32)

    # 1. zero-noise consistency
    Xn, ll, a = fused_filter_step(key, X, logw, y, I, 0.0 * I, I, I, None,
                                  jnp.float32(0.0), noise="mvn")
    diff = np.abs(np.asarray(Xn) - np.asarray(X)[:, np.asarray(a)]).max()
    ll_exp = -0.5 * (np.asarray(Xn) ** 2).sum(0)
    ll_diff = np.abs(np.asarray(ll) - ll_exp).max()
    check("zero-noise consistency", diff == 0.0 and ll_diff < 1e-5,
          f"(state diff {diff}, ll diff {ll_diff:.2e})")

    # 2. offspring statistics vs indexed metropolis
    w = np.exp(np.asarray(logw) - np.asarray(logw).max())
    w /= w.sum()

    def offspring(fn, reps=30):
        tot = np.zeros(n)
        for i in range(reps):
            tot += np.bincount(np.asarray(fn(jax.random.fold_in(key, i))),
                               minlength=n)
        return tot / (reps * n)

    emp_pallas = offspring(lambda k: fused_filter_step(
        k, X, logw, y, I, 0.0 * I, I, I, None, jnp.float32(0.0),
        noise="mvn")[2])
    emp_indexed = offspring(jax.jit(
        lambda k: metropolis_ancestors(k, logw, 10)))
    err_p = np.abs(emp_pallas - w).mean() / w.mean()
    err_i = np.abs(emp_indexed - w).mean() / w.mean()
    check("offspring ~ weights (vs indexed metropolis)",
          err_p < 1.3 * err_i + 0.05,
          f"(pallas rel err {err_p:.3f}, indexed {err_i:.3f})")

    # 3. noise moments
    X0 = jnp.zeros((d, 1 << 17), jnp.float32)
    lw0 = jnp.zeros((1 << 17,), jnp.float32)
    Xn, _, _ = fused_filter_step(key, X0, lw0, y, 0.0 * I, 0.5 * I, I, I,
                                 None, jnp.float32(0.0), noise="mvn")
    xs = np.asarray(Xn)
    check("mvn noise moments", abs(xs.mean()) < 0.01
          and abs(xs.std() - 0.5) < 0.02,
          f"(mean {xs.mean():.4f}, std {xs.std():.4f})")
    df = 8.0
    Xt, _, _ = fused_filter_step(key, X0, lw0, y, 0.0 * I, 0.5 * I, I, I,
                                 df, jnp.float32(0.0), noise="mvt")
    vt = np.asarray(Xt).var()
    check("mvt scale-mixture variance",
          abs(vt - df / (df - 2.0) * 0.25) < 0.03, f"(var {vt:.4f})")

    # 4. end-to-end log-evidence vs Kalman oracle and XLA engine
    from cusmc_tpu.io.data import demo_model_params, load_y_sim
    from cusmc_tpu.models.dlm import DLM
    from cusmc_tpu.smc.kalman import kalman_filter
    from cusmc_tpu.smc.particle_filter import bootstrap_filter

    params = demo_model_params()
    model = DLM.create(noise="mvn", dtype=jnp.float32, **params)
    ys = jnp.asarray(load_y_sim()[:101], jnp.float32)
    _, _, kll = kalman_filter(np.asarray(ys),
                              **{k: params[k] for k in
                                 ("F", "G", "V", "W", "m0", "C0")})
    rp = bootstrap_filter(key, model, ys, 8192, engine="pallas",
                          return_history=False)
    rx = bootstrap_filter(key, model, ys, 8192, engine="xla",
                          return_history=False)
    zp, zx, zk = (float(rp.log_evidence), float(rx.log_evidence), float(kll))
    check("filter log-evidence (pallas vs xla vs kalman)",
          abs(zp - zk) < 0.08 * abs(zk) and abs(zp - zx) < 0.04 * abs(zk),
          f"(pallas {zp:.1f}, xla {zx:.1f}, kalman {zk:.1f})")

    # 5. fused inverse-CDF engine (round 4, ops/fused_cdf_step.py):
    # in-kernel PRNG noise + in-kernel positions on the real chip.
    # 5a. ancestors obey the inverse-CDF law (exact positions, real u).
    w32 = jax.random.uniform(jax.random.fold_in(key, 7), (n,),
                             jnp.float32, minval=0.01)
    from cusmc_tpu.ops.cumsum import blocked_cumsum
    from cusmc_tpu.ops.fused_cdf_step import fused_cdf_filter_step

    cdf, cdf128 = blocked_cumsum(w32)
    Xc, llc, ac = fused_cdf_filter_step(
        key, cdf, cdf128, X, y, I, 0.0 * I, I, I, None, jnp.float32(0.0),
        noise="mvn", mode="systematic", tile=1024)
    k_u, _ = jax.random.split(key)
    u = float(jax.random.uniform(k_u, (), jnp.float32))
    cdf_np = np.asarray(cdf)
    pos = (np.arange(n) + u) * (cdf_np[-1] / n)
    a_np = np.asarray(ac)
    lo = np.where(a_np > 0, cdf_np[np.maximum(a_np - 1, 0)], -np.inf)
    hi = cdf_np[np.minimum(a_np + 1, n - 1)]
    sandwich_ok = bool(((lo <= pos + 1e-5 * np.abs(pos))
                        & (pos <= hi + 1e-5 * np.abs(hi))).all())
    gather_ok = bool((np.asarray(Xc) == np.asarray(X)[:, a_np]).all())
    check("fused-cdf ancestors obey inverse-CDF law (zero noise)",
          sandwich_ok and gather_ok,
          f"(sandwich {sandwich_ok}, gather {gather_ok})")

    # 5b. noise moments through the fused-cdf propagate stage.
    cdf0, cdf0_128 = blocked_cumsum(jnp.ones((1 << 17,), jnp.float32))
    Xc2, _, _ = fused_cdf_filter_step(
        key, cdf0, cdf0_128, X0, y, 0.0 * I, 0.5 * I, I, I, None,
        jnp.float32(0.0), noise="mvn", mode="systematic")
    xs = np.asarray(Xc2)
    check("fused-cdf mvn noise moments", abs(xs.mean()) < 0.01
          and abs(xs.std() - 0.5) < 0.02,
          f"(mean {xs.mean():.4f}, std {xs.std():.4f})")
    Xc3, _, _ = fused_cdf_filter_step(
        key, cdf0, cdf0_128, X0, y, 0.0 * I, 0.5 * I, I, I,
        jnp.float32(5.0), jnp.float32(0.0), noise="mvt",
        mode="systematic", df_int=5)
    vt = np.asarray(Xc3).var()
    check("fused-cdf mvt scale-mixture variance (df_int=5)",
          abs(vt - 5.0 / 3.0 * 0.25) < 0.05, f"(var {vt:.4f})")

    # 5c. end-to-end: fused-cdf systematic filter matches the XLA
    # systematic filter AND the Kalman oracle (no finite-B band —
    # systematic is unbiased, so the tolerance is tight MC error).
    rc = bootstrap_filter(key, model, ys, 8192, resampler="systematic",
                          engine="pallas", return_history=False)
    rcx = bootstrap_filter(key, model, ys, 8192, resampler="systematic",
                           engine="xla", return_history=False)
    zc, zcx = float(rc.log_evidence), float(rcx.log_evidence)
    check("fused-cdf systematic log-evidence (vs xla vs kalman)",
          abs(zc - zk) < 0.02 * abs(zk) and abs(zc - zcx) < 0.02 * abs(zk),
          f"(fused {zc:.1f}, xla {zcx:.1f}, kalman {zk:.1f})")

    # 5d. stratified in-kernel positions: offspring ~ weights.
    wst = np.exp(np.asarray(logw) - np.asarray(logw).max())
    wst /= wst.sum()

    def cdf_offspring(reps=30):
        tot = np.zeros(n)
        wj = jnp.asarray(wst * n, jnp.float32)
        c, c128 = blocked_cumsum(wj)
        for i in range(reps):
            a = fused_cdf_filter_step(
                jax.random.fold_in(key, 100 + i), c, c128, X, y, I,
                0.0 * I, I, I, None, jnp.float32(0.0), noise="mvn",
                mode="stratified", tile=1024)[2]
            tot += np.bincount(np.asarray(a), minlength=n)
        return tot / (reps * n)

    emp_st = cdf_offspring()
    err_st = np.abs(emp_st - wst).mean() / wst.mean()
    check("fused-cdf stratified offspring ~ weights", err_st < 0.2,
          f"(rel err {err_st:.3f})")

    print("ALL PASS" if not FAILURES else f"FAILURES: {FAILURES}")
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
