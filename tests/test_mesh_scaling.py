"""Virtual-mesh sharding evidence (VERDICT r3 #8).

Virtual CPU devices share the host cores, so a wall-clock speedup is not
observable; what IS falsifiable is replication: if the distributed big-BA
step re-did the full computation on every device, a 4-device run would take
~4x the 1-device run.  The test asserts the sharded program stays well
under that bound (and that scripts/mesh_scaling.py runs end-to-end, so the
MESH_SCALING.json artifact can always be regenerated).
"""

import json
import os
import subprocess
import sys

_SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                       "mesh_scaling.py")


def test_big_ba_step_is_sharded_not_replicated(tmp_path):
    out_json = tmp_path / "mesh.json"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, _SCRIPT, "--out", str(out_json), "--reps", "10",
         "--counts", "1,4"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    data = json.loads(out_json.read_text())
    t = {r["n_devices"]: r["step_s"] for r in data["results"]}
    # replication would give t[4] ~ 4x t[1]; sharding keeps it ~flat.
    # 2.5x leaves headroom for collective + scheduling overhead on the
    # shared-core virtual mesh.
    assert t[4] < 2.5 * t[1], f"4-device step {t[4]:.3f}s vs 1-device {t[1]:.3f}s"
