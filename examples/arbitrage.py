"""Arbitrage workload — the TPU-native counterpart of the reference's
``python arbitrage.py`` (``/root/reference/arbitrage.py``).

Finds the profit-maximal zero-capital route through the 5-pool / 4-asset
demo network and prints the total output value (pinned ground truth
21.499805, BASELINE.md).
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
from cfmm_routing_tpu.models.reference_instances import arbitrage_instance
from cfmm_routing_tpu.solver.admm import AdmmOptions


def main():
    spec, obj = arbitrage_instance()
    route = api.arbitrage(
        spec,
        obj.c,
        certify=True,
        options=AdmmOptions(max_iters=6000, eps_abs=2e-6, eps_rel=2e-6),
    )
    print(f"Total output value: {route.objective}")
    print(f"Net trade psi:      {route.psi}")
    print(f"Certificate:        {route.certificate.summary()}")


if __name__ == "__main__":
    main()
