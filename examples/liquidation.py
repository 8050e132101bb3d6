"""Liquidation workload — the TPU-native counterpart of the reference's
``python liquidation.py`` (``/root/reference/liquidation.py``).

Liquidates the basket [2, 1, 3, 5, 10] entirely into token 4 through the
5-pool / 5-asset demo network and prints the proceeds (pinned ground truth
15.883010, BASELINE.md).
"""
try:  # prefer the installed package (pip install -e .)
    import cfmm_routing_tpu  # noqa: F401
except ImportError:  # running straight from a source checkout
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

from cfmm_routing_tpu import api
from cfmm_routing_tpu.models.reference_instances import liquidation_instance
from cfmm_routing_tpu.solver.admm import AdmmOptions


def main():
    spec, obj = liquidation_instance()
    route = api.liquidate(
        spec,
        holdings=[2, 1, 3, 5, 10],
        numeraire=4,
        certify=True,
        options=AdmmOptions(max_iters=8000, eps_abs=2e-6, eps_rel=2e-6),
    )
    print(f"Liquidation proceeds (token 4): {route.psi[4]}")
    print(f"Certificate:                    {route.certificate.summary()}")


if __name__ == "__main__":
    main()
