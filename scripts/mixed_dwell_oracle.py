"""Mixed-mover dwell diagnosis on the float64 CPU oracle (verdict-r4
items 3+4): decompose WHY the labeled mode scores worse than unlabeled on
the paused-dwell leg, and pre-validate the birthWeightDynamic fix before
spending chip time.

Scenario: exactly scripts/mixed_evidence.py's paused-dwell leg (the
vehicle holds for 30 steps while one constant-velocity mover crosses the
FOV; scored over the post-lock-on window), run through
reference_cpu.update_mixed (dynamic shapes, float64) at 16 particles with
per-step instrumentation of the max-weight particle:

  - nearest SELECTED dynamic feature to the true mover (the
    mixed_evidence existence rule: w >= max(0.05, 0.25*max)) + its weight
    and velocity cosine;
  - nearest ANY-weight dynamic feature (confirmation-failure separator);
  - nearest STATIC feature to the mover (doppelganger presence: in
    unlabeled mode every mover detection also births/updates a static
    clone, which can sit near the mover and make the unlabeled dynamic
    map LOOK better than it is);
  - dynamic-map mass in FOV.

Variants: unlabeled/labeled x birthWeightDynamic in {off, 0.05, 0.1, 0.2}.

Writes results/mixed_dwell_oracle.json.
Run: python scripts/mixed_dwell_oracle.py  (CPU-only, no JAX)
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phdslam_tpu import reference_cpu as R
from phdslam_tpu.config import load_config
from phdslam_tpu.simdata import generate_mixed_run, make_scenario

QUICK = "--quick" in sys.argv

PM0 = np.array([[-5.51416556, -3.72010326]])   # mixed_evidence dwell mover
PMV = np.array([[-0.15390214, 0.2575153]])


def base_cfg(sc):
    return load_config("cfg/ackerman_synth.cfg").replace(
        n_particles=16, maxFeatures=128, maxMeasurements=64,
        featureModel=2, birthWeight=1e-2, covVxBirth=1.0, covVyBirth=1.0,
        stdAxMap=0.05, stdAyMap=0.05, ps=0.98, tau=-10.0, beta=10.0,
        x0=float(sc.traj[0, 0]), y0=float(sc.traj[0, 1]),
        yaw0=float(sc.traj[0, 2]))


def run_variant(name, cfg, sc, controls, meas, labels, truth, lo, hi,
                labeled):
    rows = []

    def cb(t, slam):
        i = int(np.argmax([p.log_weight for p in slam.particles]))
        p = slam.particles[i]
        pos = truth[t, 0]
        rec = dict(t=t)
        wd = p.wd if p.wd is not None else np.zeros(0)
        rec["dyn_mass"] = float(wd.sum())
        rec["n_dyn"] = int((wd > 0.01).sum())
        if wd.size and wd.max() > 0:
            sel = wd >= max(0.05, 0.25 * float(wd.max()))
            if sel.any():
                dd = np.linalg.norm(p.mean4[sel][:, :2] - pos, axis=1)
                j = int(np.argmin(dd))
                rec["sel_dist"] = float(dd[j])
                rec["sel_w"] = float(wd[sel][j])
                v = p.mean4[sel][j, 2:]
                nv = np.linalg.norm(v) * np.linalg.norm(PMV[0])
                rec["sel_cos"] = float(v @ PMV[0] / nv) if nv > 0 else None
            anyw = wd > 0.01
            if anyw.any():
                da = np.linalg.norm(p.mean4[anyw][:, :2] - pos, axis=1)
                ja = int(np.argmin(da))
                rec["any_dist"] = float(da[ja])
                rec["any_w"] = float(wd[anyw][ja])
        if len(p.w):
            ds = np.linalg.norm(p.mean - pos, axis=1)
            js = int(np.argmin(ds))
            rec["static_dist"] = float(ds[js])   # doppelganger proximity
            rec["static_w"] = float(p.w[js])
        rows.append(rec)

    poses = R.run(cfg, controls[:len(meas) - 1], meas, seed=2,
                  callback=cb, label_sets=labels if labeled else None)
    perr = np.linalg.norm(poses[:, :2] - sc.traj[:len(meas), :2], axis=1)
    win = [r for r in rows if lo <= r["t"] < hi]

    def stat(key, pred=None):
        vals = [r.get(key) for r in win]
        vals = [v for v in vals if v is not None]
        if not vals:
            return None, None
        mean = round(float(np.mean(vals)), 3)
        frac = round(float(np.mean([pred(v) for v in vals])), 3) \
            if pred else None
        return mean, frac

    sel_mean, sel_u2 = stat("sel_dist", lambda v: v < 2.0)
    any_mean, any_u2 = stat("any_dist", lambda v: v < 2.0)
    n_scored = len(win)
    n_sel = sum(1 for r in win if "sel_dist" in r)
    out = dict(
        name=name, labeled=labeled,
        birthWeightDynamic=cfg.birthWeightDynamic,
        pose_err_mean=round(float(perr.mean()), 3),
        dwell_steps=n_scored, steps_with_selected_feature=n_sel,
        sel_dist_mean=sel_mean, sel_under_2m=sel_u2,
        sel_w_mean=stat("sel_w")[0], sel_cos_mean=stat("sel_cos")[0],
        any_dist_mean=any_mean, any_under_2m=any_u2,
        any_w_mean=stat("any_w")[0],
        static_dist_mean=stat("static_dist")[0],
        static_doppel_under_2m=stat("static_dist", lambda v: v < 2.0)[1],
        dyn_mass_mean=stat("dyn_mass")[0], n_dyn_mean=stat("n_dyn")[0])
    print(json.dumps(out), flush=True)
    return out


def main():
    Tp = 40 if QUICK else 120
    sc = make_scenario(np.random.default_rng(11), n_landmarks=40,
                       n_steps=Tp, pause=(60, 30))
    rng = np.random.default_rng(900)   # mixed_evidence dwell run 0
    controls, meas, truth, labels = generate_mixed_run(
        rng, sc, PM0, PMV, control_noise=(0.2, 0.01), return_labels=True)
    meas, labels = meas[:Tp], labels[:Tp]
    lo, hi = (8, Tp) if QUICK else (68, 93)
    cfg0 = base_cfg(sc)

    variants = [
        ("unlabeled", cfg0, False),
        ("unlabeled_bwd0.05", cfg0.replace(birthWeightDynamic=0.05), False),
        ("unlabeled_bwd0.1", cfg0.replace(birthWeightDynamic=0.1), False),
        ("unlabeled_bwd0.2", cfg0.replace(birthWeightDynamic=0.2), False),
        ("labeled", cfg0.replace(labeledMeasurements=True), True),
        ("labeled_bwd0.1", cfg0.replace(labeledMeasurements=True,
                                        birthWeightDynamic=0.1), True),
    ]
    rowset = [run_variant(n, c, sc, controls, meas, labels, truth, lo, hi,
                          lab) for n, c, lab in variants]
    os.makedirs("results", exist_ok=True)
    with open("results/mixed_dwell_oracle.json", "w") as f:
        json.dump(dict(T=Tp, window=[lo, hi], n_particles=16,
                       rows=rowset), f, indent=1)
    print("wrote results/mixed_dwell_oracle.json")


if __name__ == "__main__":
    main()
