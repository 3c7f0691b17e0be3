"""Multi-chip evidence beyond compile-and-run (VERDICT round 1 item 8):

- the sharded step really shards the FLOPs: each device's HLO works on
  [P/n, ...] shapes, not [P, ...]
- the global-resample path's HLO contains heavyweight collectives that
  move the full particle maps (all-gather / all-to-all at map size)
- the island path's HLO moves only O(P_local) bytes per butterfly round
  (collective-permute on shard-sized arrays) and never all-gathers the
  global map
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phdslam_tpu.filter.state import Measurements, SlamState

COLLECTIVES = ("all-gather", "all-to-all", "all-reduce",
               "collective-permute", "reduce-scatter")

_SHAPE_RE = re.compile(r"\b(f32|s32|u32|pred|f64|s64)\[([\d,]*)\]")
_BYTES = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "f64": 8, "s64": 8}



pytestmark = pytest.mark.slow  # heavy e2e/interpret tests; unit core excludes via -m 'not slow'

def _collective_lines(hlo: str):
    out = {}
    for line in hlo.splitlines():
        for op in COLLECTIVES:
            if re.search(rf"\b{op}(-start|-done)?\(", line) or \
                    re.search(rf"= \S+ {op}", line):
                out.setdefault(op, []).append(line.strip())
    return out


def _max_bytes(lines):
    worst = 0
    for line in lines:
        for dt, dims in _SHAPE_RE.findall(line):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            worst = max(worst, n * _BYTES[dt])
    return worst


def _tiny_cfg(n_particles):
    from phdslam_tpu.config import load_config

    return load_config("cfg/ackerman_synth.cfg").replace(
        n_particles=n_particles, maxFeatures=32, maxMeasurements=16,
        y0=0.0, usePallas=False)


def _example(cfg, seed=0):
    state = SlamState.create(cfg)
    key = jax.random.PRNGKey(seed)
    m = cfg.maxMeasurements
    rng = np.random.default_rng(seed)
    k = m // 2
    rb = np.zeros((m, 2), np.float32)
    rb[:k, 0] = rng.uniform(1.0, cfg.maxRange, k)
    rb[:k, 1] = rng.uniform(-cfg.maxBearing, cfg.maxBearing, k)
    valid = np.zeros(m, bool)
    valid[:k] = True
    z = Measurements(rb=jnp.asarray(rb), label=jnp.zeros((m,), jnp.int32),
                     valid=jnp.asarray(valid))
    return state, key, (jnp.float32(1.5), jnp.float32(0.05)), z, \
        jnp.float32(cfg.dt), jnp.asarray(True)


@pytest.fixture(scope="module")
def mesh8():
    from phdslam_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


@pytest.fixture(scope="module")
def imesh8():
    from phdslam_tpu.parallel.island import make_island_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_island_mesh(8)


def test_global_path_hlo_shards_flops_and_gathers_maps(mesh8):
    """Fixed global P: per-device tensors must be [P/8, ...]; the global
    stratified resample must show up as full-map-size collectives."""
    from phdslam_tpu.parallel.mesh import (
        replicate_measurements, shard_state, sharded_step)

    cfg = _tiny_cfg(64)
    state, key, ctrl, z, dt, dop = _example(cfg)
    state = shard_state(state, mesh8)
    z = replicate_measurements(z, mesh8)
    step = sharded_step(cfg, mesh8)
    compiled = step.lower(state, key, ctrl, z, dt, dop).compile()
    hlo = compiled.as_text()

    colls = _collective_lines(hlo)
    assert colls, "sharded step compiled to zero collectives"
    # weight normalization -> an all-reduce (psum) must exist
    assert "all-reduce" in colls, sorted(colls)
    # the resample gather moves particle maps across devices: some
    # collective must carry at least one full map-sized array
    # (P * F * 4 bytes = 64 * 32 * 4)
    heavy = max(_max_bytes(v) for v in colls.values())
    assert heavy >= 64 * 32 * 4, (heavy, sorted(colls))
    # per-device FLOP share: the big per-particle arrays appear at [8, ...]
    # (P/8), and no non-collective op should touch [64, 32] directly
    assert re.search(r"f32\[8,32\]", hlo), "no [P/8, F] shard-shaped work"


def test_disparity_path_hlo_shards_and_normalizes(mesh8):
    """The sharded SC-PHD (disparity) step: per-device cloud tensors at
    [P/8, F, Npp], an all-reduce for weight normalization, and a
    cloud-sized collective for the global resample gather."""
    from phdslam_tpu.config import load_config
    from phdslam_tpu.filter.disparity import DisparityState
    from phdslam_tpu.parallel.mesh import (sharded_disparity_step,
                                           state_shardings)

    cfg = load_config("/root/reference/cfg/config.cfg").replace(
        n_particles=16, maxFeatures=8, maxMeasurements=8,
        particlesPerFeature=32, usePallas=False)
    sd = DisparityState.create(cfg)
    sd = jax.device_put(sd, state_shardings(sd, mesh8))
    z_uv = jnp.zeros((8, 2), jnp.float32)
    z_val = jnp.asarray(np.arange(8) < 4)
    step = sharded_disparity_step(cfg, mesh8)
    hlo = step.lower(sd, jax.random.PRNGKey(0), z_uv, z_val,
                     jnp.float32(cfg.dt), jnp.asarray(True)) \
              .compile().as_text()

    colls = _collective_lines(hlo)
    assert "all-reduce" in colls, sorted(colls)
    # resample gather carries at least one full cloud-sized array
    # (P * F * Npp * 4 bytes)
    heavy = max(_max_bytes(v) for v in colls.values())
    assert heavy >= 16 * 8 * 32 * 4, (heavy, sorted(colls))
    # per-device work on [P/8, F, Npp] shards
    assert re.search(r"f32\[2,8,32\]", hlo), "no shard-shaped cloud work"


def test_island_path_hlo_moves_only_shard_sized_data(imesh8):
    """Butterfly exchange = collective-permutes of P_local-sized arrays;
    no all-gather / all-to-all of the global map anywhere."""
    from phdslam_tpu.parallel.island import island_slam_step

    cfg = _tiny_cfg(64).replace(nPredictParticles=1)
    istep, iinit = island_slam_step(imesh8, cfg)
    istate, ilw = iinit()
    state, key, ctrl, z, dt, dop = _example(cfg)
    z_prev = jax.tree.map(jnp.zeros_like, z)
    compiled = istep.jitted.lower(istate, ilw, key, jnp.stack(ctrl), z,
                                  z_prev, dt, dop).compile()
    hlo = compiled.as_text()

    colls = _collective_lines(hlo)
    assert "collective-permute" in colls, sorted(colls)
    p_local = 64 // 8
    # permutes carry one island's particles: [P_local, F] = 8 * 32 * 4 per
    # map channel (pose is [P_local, 6]); nothing global-map-sized
    permute_bytes = _max_bytes(colls["collective-permute"])
    assert permute_bytes <= p_local * 32 * 4, permute_bytes
    gathers = colls.get("all-gather", []) + colls.get("all-to-all", [])
    gather_bytes = _max_bytes(gathers)
    assert gather_bytes <= p_local * 32 * 4, (
        "island path all-gathers more than one shard", gather_bytes)
    # island weight normalization is scalar collectives only
    assert _max_bytes(colls.get("all-reduce", [])) <= 64


def test_island_scaling_fixed_global_particles(imesh8):
    """1 shard vs 8 islands at the same GLOBAL particle count produce
    finite, comparable estimates (the correctness half of the scaling
    evidence; wall-clock scaling is measured on real chips in RESULTS.md)."""
    from phdslam_tpu.filter.step import slam_step
    from phdslam_tpu.parallel.island import island_slam_step

    cfg = _tiny_cfg(64).replace(nPredictParticles=1)
    state, key, ctrl, z, dt, dop = _example(cfg)
    s1, aux1 = slam_step(state, key, ctrl, z, dt, dop, cfg)

    istep, iinit = island_slam_step(imesh8, cfg)
    istate, ilw = iinit()
    istate, ilw, iaux = istep(istate, ilw, key, jnp.stack(ctrl), z, dt, dop)

    p1 = np.asarray(aux1.expected_pose)
    p8 = np.asarray(iaux.expected_pose)
    assert np.isfinite(p1).all() and np.isfinite(p8).all()
    # same filter, same data, different RNG partitioning: poses agree to
    # within the particle-spread scale
    assert np.linalg.norm(p1[:2] - p8[:2]) < 2.0, (p1[:2], p8[:2])
    assert abs(float(jnp.exp(jax.scipy.special.logsumexp(ilw))) - 1.0) < 1e-3


def test_sharded_run_scan_matches_single_device(mesh8):
    """The whole-run sharded scan (global-resample path) must equal the
    unsharded run_scan bit-for-bit-ish (same program, XLA-inserted
    collectives) and its HLO must contain collectives."""
    from phdslam_tpu.filter.step import run_scan
    from phdslam_tpu.parallel.mesh import shard_state, sharded_run_scan

    cfg = _tiny_cfg(64)
    T = 6
    rng = np.random.default_rng(1)
    m = cfg.maxMeasurements
    rb = np.zeros((T, m, 2), np.float32)
    rb[:, :4, 0] = rng.uniform(1.0, cfg.maxRange, (T, 4))
    rb[:, :4, 1] = rng.uniform(-cfg.maxBearing, cfg.maxBearing, (T, 4))
    valid = np.zeros((T, m), bool)
    valid[:, :4] = True
    zs = Measurements(rb=jnp.asarray(rb),
                      label=jnp.zeros((T, m), jnp.int32),
                      valid=jnp.asarray(valid))
    ctrl = np.zeros((T, 2), np.float32)
    ctrl[:, 0] = 1.5
    dts = jnp.full((T,), cfg.dt, jnp.float32)
    key = jax.random.PRNGKey(3)

    ref_final, ref_aux = run_scan(
        SlamState.create(cfg), key, jnp.asarray(ctrl), zs, dts, cfg, T)

    run = sharded_run_scan(cfg, mesh8)
    st = shard_state(SlamState.create(cfg), mesh8)
    out_final, out_aux = run(st, key, jnp.asarray(ctrl), zs, dts)

    np.testing.assert_allclose(np.asarray(out_aux.expected_pose),
                               np.asarray(ref_aux.expected_pose),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_final.log_weights),
                               np.asarray(ref_final.log_weights),
                               rtol=1e-5, atol=1e-5)

    hlo = run.lower(st, key, jnp.asarray(ctrl), zs, dts).compile().as_text()
    colls = _collective_lines(hlo)
    assert "all-reduce" in colls, sorted(colls)
