"""tpu-cfmm-router: TPU-native CFMM optimal-routing framework.

Public surface:

    from cfmm_routing_tpu import api                      # workloads
    from cfmm_routing_tpu import ProblemSpec, PoolTable   # problems
    from cfmm_routing_tpu import AdmmSolver, AdmmOptions  # solver
    from cfmm_routing_tpu import ChunkedDriver            # long runs
    from cfmm_routing_tpu import certify                  # certificates

See README.md for the architecture map and examples/ for runnable
mirrors of the reference scripts.
"""
from .models.pools import (  # noqa: F401
    BoundedProductPool,
    ConstantSumPool,
    GeoMeanPool,
    Pool,
    ProductPool,
)
from .models.utility import (  # noqa: F401
    ConcaveUtility,
    CustomUtility,
    Objective,
)
from .solver.admm import AdmmOptions, AdmmSolver, RouteResult  # noqa: F401
from .solver.certify import (  # noqa: F401
    Certificate,
    InfeasibilityCertificate,
    certify,
    certify_infeasible,
)
from .solver.compiler import (  # noqa: F401
    CompiledProblem,
    PoolTable,
    ProblemSpec,
    compile_spec,
    compile_table,
)
from .solver.driver import ChunkedDriver, SolveLog  # noqa: F401
from .solver.precondition import (  # noqa: F401
    Equilibration,
    equilibrate,
    unscale_result,
)
from .solver.fold import (  # noqa: F401
    fold_compiled,
    solve_batch_folded,
    solve_batch_reserves_folded,
)
from .solver.refine import RefineResult, refine  # noqa: F401
from .solver.refine_device import (  # noqa: F401
    DeltaAdmmSolver,
    refine_device,
    refine_sweep,
)
from .parallel.mesh import pool_batch_mesh, pool_mesh  # noqa: F401
from .parallel.sharded import (  # noqa: F401
    ShardedAdmmSolver,
    ShardedDeltaAdmmSolver,
)

__version__ = "0.1.0"

__all__ = [
    "AdmmOptions",
    "AdmmSolver",
    "BoundedProductPool",
    "Certificate",
    "ChunkedDriver",
    "CompiledProblem",
    "ConcaveUtility",
    "ConstantSumPool",
    "CustomUtility",
    "Equilibration",
    "GeoMeanPool",
    "InfeasibilityCertificate",
    "Objective",
    "Pool",
    "PoolTable",
    "ProblemSpec",
    "ProductPool",
    "RefineResult",
    "RouteResult",
    "SolveLog",
    "certify",
    "certify_infeasible",
    "compile_spec",
    "compile_table",
    "equilibrate",
    "refine",
    "refine_device",
    "refine_sweep",
    "fold_compiled",
    "solve_batch_folded",
    "solve_batch_reserves_folded",
    "DeltaAdmmSolver",
    "ShardedAdmmSolver",
    "ShardedDeltaAdmmSolver",
    "pool_mesh",
    "pool_batch_mesh",
    "unscale_result",
    "__version__",
]
