"""Generate the shipped synthetic disparity dataset (data/disparity_synth/).

The disparity pipeline's analog of the reference's synthetic range-bearing
datasets: a drifting 6-DOF camera over static 3-D landmarks, pd-thinned
pixel detections + Poisson clutter (see simdata.make_disparity_scenario).

    python scripts/gen_disparity_data.py [out_dir] [seed]
"""

import sys

import numpy as np

from phdslam_tpu.simdata import (
    generate_disparity_run,
    make_disparity_scenario,
    write_disparity_files,
)


def main(out_dir="data/disparity_synth", seed=7):
    rng = np.random.default_rng(seed)
    sc = make_disparity_scenario(rng, n_landmarks=30, n_steps=100)
    meas = generate_disparity_run(rng, sc)
    write_disparity_files(out_dir, sc, meas)
    sizes = [len(z) for z in meas]
    print(f"wrote {out_dir}: {len(meas)} steps, "
          f"{min(sizes)}-{max(sizes)} measurements/step, "
          f"{sc.landmarks.shape[0]} landmarks")


if __name__ == "__main__":
    main(*sys.argv[1:])
