"""Full particle-state export to MATLAB .mat files.

Equivalent of writeParticlesMat (src/main.cpp:594-713, via matio): one
``particlesXXXXX.mat`` per step containing a struct with particle states
(6 x N), weights, variances, resample indices, and the per-particle static
and dynamic map mixtures (weights / means / covs as cell-style object
arrays) plus the MAP/EAP map variants. Consumable by
matlab/parseParticleFile.m and matlab/computeBatchResults.m.
"""

from __future__ import annotations

import os

import numpy as np
from scipy.io import savemat


def write_particles_mat(directory: str, t: int, state, prefix="particles",
                        max_map=None, exp_map=None):
    """state: SlamState (host or device). Writes <prefix>XXXXX.mat."""
    poses = np.asarray(state.pose)                   # [P, 6]
    n = poses.shape[0]
    w2 = np.asarray(state.map_static.w)
    m2 = np.asarray(state.map_static.mean)
    c2 = np.asarray(state.map_static.cov)

    def mixture_cells(w, mean, cov):
        weights = np.empty((n,), dtype=object)
        means = np.empty((n,), dtype=object)
        covs = np.empty((n,), dtype=object)
        for p in range(n):
            sel = w[p] > 0
            weights[p] = w[p][sel].astype(np.float64)
            # column layout like the reference (dims x n_features)
            means[p] = mean[p][sel].T.astype(np.float64)
            covs[p] = cov[p][sel].transpose(1, 2, 0).astype(np.float64)
        return dict(weights=weights, means=means, covs=covs)

    particles = dict(
        states=poses.T.astype(np.float64),           # 6 x N, like matio
        weights=np.asarray(state.log_weights, np.float64),
        variances=np.asarray(state.variances, np.float64),
        resample_idx=np.asarray(state.resample_idx, np.float64),
        maps_static=mixture_cells(w2, m2, c2),
    )
    if state.map_dynamic.max_features > 0:
        particles["maps_dynamic"] = mixture_cells(
            np.asarray(state.map_dynamic.w),
            np.asarray(state.map_dynamic.mean),
            np.asarray(state.map_dynamic.cov))
    if max_map is not None:
        particles["max_map"] = max_map
    if exp_map is not None:
        particles["exp_map"] = exp_map
    path = os.path.join(directory, f"{prefix}{t:05d}.mat")
    savemat(path, {"particles": particles}, do_compression=True)
    return path


def read_particles_mat(path: str):
    """Parse a particlesXXXXX.mat back into plain numpy structures
    (matlab/parseParticleFile.m equivalent)."""
    from scipy.io import loadmat

    d = loadmat(path, squeeze_me=False)
    p = d["particles"][0, 0]
    out = dict(
        states=np.asarray(p["states"]),
        weights=np.asarray(p["weights"]).ravel(),
        variances=np.asarray(p["variances"]).ravel(),
        resample_idx=np.asarray(p["resample_idx"]).ravel().astype(int),
    )
    for key in ("maps_static", "maps_dynamic"):
        if key in p.dtype.names:
            ms = p[key][0, 0]
            out[key] = dict(
                weights=[np.asarray(w).ravel() for w in ms["weights"].ravel()],
                means=[np.asarray(m) for m in ms["means"].ravel()],
                covs=[np.asarray(c) for c in ms["covs"].ravel()],
            )
    return out
