"""Bootstrap particle filter on the bundled trace — the reference's main
workflow (CuSMC::run) in one call, plus the new diagnostics."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # run from anywhere

import numpy as np

import cusmc_tpu
from cusmc_tpu.io.data import demo_model_params, load_y_sim

p = demo_model_params()
ys = load_y_sim()

out = cusmc_tpu.run(
    N=10_000, d=2, timeSteps=1001, Y=ys,
    m0=p["m0"], C0=p["C0"], F=p["F"], G=p["G"], V=p["V"], W=p["W"],
    df=5.0, resampler="metropolis", distribution="mvt", key=0)

w = np.asarray(out["weights"])
px = np.asarray(out["posterior_x"])
wn = w / w.sum(axis=1, keepdims=True)
posterior_mean = (wn[:, :, None] * px).sum(axis=1)

print("posterior_x:", px.shape)
print("log evidence:", float(out["log_evidence"]))
print("mean ESS:", float(np.asarray(out["ess"]).mean()))
print("tracking RMSE vs observations:",
      float(np.sqrt(((posterior_mean[10:] - ys[10:]) ** 2).mean())))
