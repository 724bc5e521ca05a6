"""Offline map visualization: overview PNG with optional node indices and
saved position traces.

Equivalent of the reference's examples/render_map.py:11-34 (used to find
spawn-point node indices for configs).
Usage: python examples/render_map.py [config.yaml] [--nodes] [--traces /tmp]
"""
import os
import sys

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

from examples._common import default_config
from tinycarlo_tpu import env as fenv
from tinycarlo_tpu.utils.helper import getenv
from tinycarlo_tpu.viz import render_static_overview

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    config = args[0] if args else default_config()
    params = fenv.make_env_params(config)
    background = (255, 255, 255) if getenv("WHITE") else None
    ppm = params.cfg.sim.overview_pixel_per_meter
    img = render_static_overview(
        params,
        ppm,
        background_color=background,
        render_node_names="--nodes" in sys.argv,
    )
    if "--traces" in sys.argv:
        import cv2

        trace_dir = sys.argv[sys.argv.index("--traces") + 1]
        for m in range(3):
            p = os.path.join(trace_dir, f"positions_m{m}.npy")
            if os.path.exists(p):
                for pos in np.load(p):
                    cv2.circle(
                        img, tuple(np.int32(pos * ppm)), 1, (255, 0, 255), -1
                    )
    out = "/tmp/map_overview.png"
    import cv2

    cv2.imwrite(out, img)
    print(f"wrote {out} ({img.shape[1]}x{img.shape[0]})")
