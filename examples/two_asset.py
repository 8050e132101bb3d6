"""Trade-size sweep — the TPU-native counterpart of the reference's
``python two-asset.py`` (``/root/reference/two-asset.py``).

The reference loops 50 serial cvxpy canonicalize+solve cycles
(``two-asset.py:40-91``); here the whole grid is ONE vmapped batched solve
on device.  Prints u(t) per grid point and writes the two figures
(per-pool net flows, utility frontier) to ``output/``.
"""
try:  # prefer the installed package (pip install -e .)
    import cfmm_routing_tpu  # noqa: F401
except ImportError:  # running straight from a source checkout
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

import os

import numpy as np

from cfmm_routing_tpu import api
from cfmm_routing_tpu.models.reference_instances import two_asset_instance
from cfmm_routing_tpu.solver.admm import AdmmOptions
from cfmm_routing_tpu.utils.plotting import save_sweep_figures


def main():
    spec, _ = two_asset_instance()
    amounts = np.linspace(0.0, 50.0, 50)
    sw = api.sweep(
        spec,
        give=0,
        receive=2,
        amounts=amounts,
        options=AdmmOptions(max_iters=8000, eps_abs=2e-6, eps_rel=2e-6),
    )
    for t, u in zip(sw.amounts, sw.utilities):
        print(f"t={t:8.3f}  u(t)={u:.6f}")

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "output")
    os.makedirs(outdir, exist_ok=True)
    save_sweep_figures(
        sw,
        os.path.join(outdir, "all_plot.pdf"),
        os.path.join(outdir, "u_plot.pdf"),
    )
    print(f"wrote {outdir}/all_plot.pdf and {outdir}/u_plot.pdf")


if __name__ == "__main__":
    main()
