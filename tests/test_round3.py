"""Round-3 features: fast merge mode, vmapped Monte-Carlo batch,
CPHD cardinality-error reporting, sharded whole-run scan."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# fast merge mode (merge_mode = 1)
# ---------------------------------------------------------------------------

def test_fast_prune_renormalize_preserves_mass():
    from phdslam_tpu.ops.gm import fast_prune_renormalize

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.uniform(0.0, 1.0, (4, 64)).astype(np.float32))
    w = w.at[:, 40:].set(w[:, 40:] * 1e-4)     # a tail of tiny weights
    out = fast_prune_renormalize(w, 1e-3)
    # total mass per row preserved exactly (up to float32)
    np.testing.assert_allclose(np.sum(out, -1), np.sum(w, -1), rtol=1e-5)
    # sub-threshold candidates zeroed
    assert np.all(np.asarray(out)[np.asarray(w) < 1e-3] == 0.0)
    # survivors scaled UP (mass redistributed)
    big = np.asarray(w) >= 1e-3
    assert np.all(np.asarray(out)[big] >= np.asarray(w)[big])


def test_fast_prune_renormalize_all_below_threshold():
    from phdslam_tpu.ops.gm import fast_prune_renormalize

    w = jnp.full((2, 8), 1e-6, jnp.float32)
    out = np.asarray(fast_prune_renormalize(w, 1e-3))
    assert np.all(out == 0.0)
    assert np.all(np.isfinite(out))


def test_fast_merge_mode_runs_and_tracks(tiny_cfg):
    """End-to-end: fast mode produces a finite, comparable filter run on
    the tiny config (exact parity is NOT expected — documented deviation;
    statistical parity evidence is the MC envelope)."""
    from phdslam_tpu.filter.state import Measurements, SlamState
    from phdslam_tpu.filter.step import run_scan

    cfg = tiny_cfg.replace(mergeMode=1, mergeMinWeight=1e-3)
    T = 6
    rng = np.random.default_rng(0)
    rb = np.zeros((T, cfg.maxMeasurements, 2), np.float32)
    rb[:, :3, 0] = rng.uniform(2.0, 10.0, (T, 3))
    rb[:, :3, 1] = rng.uniform(-1.0, 1.0, (T, 3))
    valid = np.zeros((T, cfg.maxMeasurements), bool)
    valid[:, :3] = True
    zs = Measurements(rb=jnp.asarray(rb),
                      label=jnp.zeros((T, cfg.maxMeasurements), jnp.int32),
                      valid=jnp.asarray(valid))
    ctrl = np.zeros((T, 2), np.float32)
    ctrl[:, 0] = 1.0
    final, auxs = run_scan(
        SlamState.create(cfg), jax.random.PRNGKey(0), jnp.asarray(ctrl),
        zs, jnp.full((T,), cfg.dt, jnp.float32), cfg, T)
    assert np.all(np.isfinite(np.asarray(auxs.expected_pose)))
    assert np.all(np.isfinite(np.asarray(final.map_static.w)))
    # the map still carries mass (births survived the fast prune)
    assert float(np.asarray(final.map_static.w).sum()) > 0.0


# ---------------------------------------------------------------------------
# vmapped Monte-Carlo batch
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_vmapped_batch_matches_sequential(tiny_cfg, tmp_path):
    """vmap preserves per-run semantics: identical seeds -> the same runs
    (same pose-error and OSPA curves up to float reassociation)."""
    from phdslam_tpu.eval.batch import run_batch
    from phdslam_tpu.simdata import make_scenario

    cfg = tiny_cfg.replace(stdEncoder=0.05, stdAlpha=0.005)
    sc = make_scenario(np.random.default_rng(0), n_landmarks=8,
                       n_steps=12, clutter_rate=1.0)
    seq = run_batch(cfg, sc, n_runs=3, control_noise=(0.05, 0.005),
                    vmapped=False)
    vm = run_batch(cfg, sc, n_runs=3, control_noise=(0.05, 0.005),
                   vmapped=True)
    assert len(seq) == len(vm) == 3
    for a, b in zip(seq, vm):
        np.testing.assert_allclose(a.poses, b.poses, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(a.pose_err, b.pose_err, atol=5e-4)
        np.testing.assert_allclose(a.ospa, b.ospa, rtol=2e-3, atol=5e-3)


@pytest.mark.slow
def test_vmapped_batch_chunking(tiny_cfg):
    """Chunked vmap (vmap_chunk < n_runs) covers every run exactly once."""
    from phdslam_tpu.eval.batch import run_batch
    from phdslam_tpu.simdata import make_scenario

    cfg = tiny_cfg.replace(stdEncoder=0.05, stdAlpha=0.005)
    sc = make_scenario(np.random.default_rng(1), n_landmarks=6,
                       n_steps=8, clutter_rate=1.0)
    full = run_batch(cfg, sc, n_runs=3, control_noise=(0.05, 0.005),
                     vmapped=True, vmap_chunk=3, collect_maps_every=0)
    chunked = run_batch(cfg, sc, n_runs=3, control_noise=(0.05, 0.005),
                        vmapped=True, vmap_chunk=2, collect_maps_every=0)
    for a, b in zip(full, chunked):
        np.testing.assert_allclose(a.poses, b.poses, rtol=2e-4, atol=2e-4)


def test_merge_mode_cfg_keys():
    from phdslam_tpu.config import parse_config_text

    cfg = parse_config_text("merge_mode = 1\nmerge_min_weight = 5e-3\n")
    assert cfg.mergeMode == 1
    assert cfg.mergeMinWeight == pytest.approx(5e-3)
