"""BA facade demo (reference: src/ba_interface_example/Main.cpp:83-146):
drive bundle adjustment through the template-free BAOptimizer facade.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from slampp_tpu.apps.ba_optimizer import BAOptimizer
from slampp_tpu.io.datasets import make_ba_scene


def main():
    # synthesize a scene, then feed it through the facade API
    import tempfile, os

    from slampp_tpu.io.parser import parse_file

    text, (gt_cams, gt_pts) = make_ba_scene(n_cams=8, n_points=80, seed=0)
    with tempfile.NamedTemporaryFile("w", suffix=".g2o", delete=False) as f:
        f.write(text)
        path = f.name
    recs = parse_file(path)
    os.unlink(path)

    opt = BAOptimizer(use_schur=True, verbose=True)
    for r in recs:
        if r.kind == "vertex_cam":
            opt.add_camera(r.ids[0], r.values[:6], r.values[6:11])
        elif r.kind == "vertex_xyz":
            opt.add_point(r.ids[0], r.values)
        elif r.kind == "edge_p2c":
            opt.add_observation(r.ids[0], r.ids[1], r.values, r.info)

    print("initial chi2:", opt.chi2())
    opt.optimize(max_iterations=10, min_dx_norm=1e-6)
    print("final chi2:", opt.chi2())
    print("camera 0 pose:", np.round(opt.get_camera(0), 4))

    marg = opt.marginals()
    some_point = max(opt.system.vertex_index)
    print("point covariance diag:", np.diag(marg.block_diag[some_point]))


if __name__ == "__main__":
    main()
